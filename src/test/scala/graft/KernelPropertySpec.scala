package graft

import graft.plans.HashOps
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native signature kernels — algebraic laws
  * that must hold for ANY input, not just the planted fixtures:
  * tokenizer equivalence to its documented regex form, shingle/ngram
  * window laws, minhash's min-merge law, simhash order-independence,
  * exact integer dots, and quantization range bounds. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', '!', '-')
    )).map(_.mkString)

  private def utf8Arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  /** The documented reference semantics: lowercase, split on
    * non-[a-z0-9] runs, drop empties. */
  private def refTokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("tokens == lowercase split on non-alnum runs, empties dropped") {
    check(Prop.forAll(asciiText) { s =>
      val got = HashOps.tokens(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == refTokens(s)
    }, "tokens")
  }

  test("wordShingles == distinct joined n-windows (single shingle when short)") {
    val gen = for { s <- asciiText; n <- Gen.choose(1, 5) } yield (s, n)
    check(Prop.forAll(gen) { case (s, n) =>
      val toks = refTokens(s)
      val expect =
        if (toks.isEmpty) Seq.empty
        else if (toks.length <= n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      val got = HashOps.wordShingles(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == expect
    }, "wordShingles")
  }

  test("wordNgrams == full multiset of n-windows, empty when short") {
    val gen = for { s <- asciiText; n <- Gen.choose(1, 4) } yield (s, n)
    check(Prop.forAll(gen) { case (s, n) =>
      val toks = refTokens(s)
      val expect =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val got = HashOps.wordNgrams(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == expect
    }, "wordNgrams")
  }

  test("minhash obeys the min-merge law: sig(A ++ B) = min(sig(A), sig(B))") {
    val toks = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
    check(Prop.forAll(toks, toks) { (a, b) =>
      val sa = HashOps.minhashSig(utf8Arr(a), 16).toLongArray
      val sb = HashOps.minhashSig(utf8Arr(b), 16).toLongArray
      val sab = HashOps.minhashSig(utf8Arr(a ++ b), 16).toLongArray
      sab.toSeq == sa.zip(sb).map { case (x, y) => math.min(x, y) }.toSeq
    }, "minhash-merge")
  }

  test("simhash is order-independent over the token multiset") {
    val gen = for {
      ts <- Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (ts, new scala.util.Random(seed).shuffle(ts))
    check(Prop.forAll(gen) { case (ts, shuffled) =>
      HashOps.simhash64(utf8Arr(ts)) == HashOps.simhash64(utf8Arr(shuffled))
    }, "simhash-perm")
  }

  test("dotInt equals the exact BigInt dot product") {
    val vec = Gen.listOfN(16, Gen.choose(-128, 127))
    check(Prop.forAll(vec, vec) { (a, b) =>
      val da = new GenericArrayData(a.toArray[Any])
      val db = new GenericArrayData(b.toArray[Any])
      val expect = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      BigInt(HashOps.dotInt(da, db)) == expect
    }, "dotInt")
  }

  test("quantizeI8 codes are bounded by 127 and hit it for the max element") {
    val vec = Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0))
      .suchThat(_.exists(v => math.abs(v) > 1e-9))
    check(Prop.forAll(vec) { v =>
      val q = HashOps.quantizeI8(new GenericArrayData(v.toArray[Any]), elemIsFloat = false)
        .toIntArray()
      q.forall(c => c >= -127 && c <= 127) && q.exists(c => math.abs(c) == 127)
    }, "quantizeI8")
  }

  test("cosine(v, v) == 1 for non-degenerate vectors") {
    val vec = Gen.listOfN(8, Gen.choose(-100.0, 100.0))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-6))
    check(Prop.forAll(vec) { v =>
      val arr = new GenericArrayData(v.toArray[Any])
      math.abs(HashOps.cosine(arr, arr, aIsFloat = false, bIsFloat = false) - 1.0) < 1e-12
    }, "cosine-self")
  }
}
