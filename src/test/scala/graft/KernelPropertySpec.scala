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

  test("bloom foldTo preserves membership; folded == built-small directly") {
    import graft.kv.BloomBits
    // the per-key manifest-bloom sizing law rests on this: folding a
    // power-of-two filter down (a) never loses an inserted key, and
    // (b) equals building at the small size directly — because
    // (h mod 2^a) mod 2^b = h mod 2^b for the double-hash positions
    val keys = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    val sizes = Gen.oneOf(Seq((1 << 17, 1 << 10), (1 << 17, 1 << 13),
      (1 << 20, 1 << 12), (4096, 1024), (1024, 1024)))
    val p = Prop.forAll(keys, sizes) { (ks: List[Long], sz: (Int, Int)) =>
      val (big, small) = sz
      val bigBits = new Array[Byte](big / 8)
      val smallBits = new Array[Byte](small / 8)
      ks.foreach { k => BloomBits.set(bigBits, k); BloomBits.set(smallBits, k) }
      val folded = BloomBits.foldTo(bigBits, small)
      java.util.Arrays.equals(folded, smallBits) &&
        ks.forall(BloomBits.mightContain(folded, _))
    }
    check(p, "bloom foldTo")
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

  // ---- PQ kernel laws (graft.plans.PqOps) ---------------------------

  /** Random (m, k, dsub, codebook, vector) instances. */
  private val pqGen = for {
    m <- Gen.choose(1, 3)
    k <- Gen.choose(1, 5)
    dsub <- Gen.choose(1, 4)
    cb <- Gen.listOfN(m * k * dsub, Gen.choose(-8.0, 8.0).map(_.toFloat))
    v <- Gen.listOfN(m * dsub, Gen.choose(-8.0, 8.0))
  } yield (m, k, dsub, cb.toArray, v.toArray)

  private def refDot(v: Array[Double], off: Int, cb: Array[Float],
                     base: Int, dsub: Int): Double = {
    var acc = 0.0; var j = 0
    while (j < dsub) { acc += v(off + j) * cb(base + j); j += 1 }
    acc
  }

  test("pq codes pick the argmin-L2 centroid per subspace, ties to lowest index") {
    check(Prop.forAll(pqGen) { case (m, k, dsub, cb, v) =>
      val codes = graft.plans.PqOps.codes(
        new GenericArrayData(v.toArray[Any]), cb, m, k, dsub, isFloat = false).toIntArray()
      (0 until m).forall { s =>
        val dists = (0 until k).map { c =>
          val base = ((s * k) + c) * dsub
          (0 until dsub).map(j => { val d = v(s * dsub + j) - cb(base + j); d * d }).sum
        }
        codes(s) == dists.indexOf(dists.min)
      }
    }, "pq-codes-argmin")
  }

  test("pq lut holds every (subspace, centroid) dot; adc sums the coded entries exactly") {
    check(Prop.forAll(pqGen, pqGen) { case ((m, k, dsub, cb, q), (_, _, _, _, x0)) =>
      val x = x0.take(m * dsub) ++ Array.fill(math.max(0, m * dsub - x0.length))(0.0)
      val lut = graft.plans.PqOps.lut(
        new GenericArrayData(q.toArray[Any]), cb, m, k, dsub, isFloat = false).toDoubleArray()
      val lutLaw = (0 until m).forall { s =>
        (0 until k).forall { c =>
          lut(s * k + c) == refDot(q, s * dsub, cb, ((s * k) + c) * dsub, dsub)
        }
      }
      val codes = graft.plans.PqOps.codes(
        new GenericArrayData(x.toArray[Any]), cb, m, k, dsub, isFloat = false)
      val adc = graft.plans.PqOps.adc(codes,
        new GenericArrayData(lut.toArray[Any]), k)
      val expect = (0 until m).map(s => lut(s * k + codes.getInt(s))).sum
      lutLaw && adc == expect
    }, "pq-lut-adc")
  }

  test("pq L2 lut holds exact squared distances per (subspace, centroid)") {
    check(Prop.forAll(pqGen) { case (m, k, dsub, cb, q) =>
      val lut2 = graft.plans.PqOps.lutL2(
        new GenericArrayData(q.toArray[Any]), cb, m, k, dsub, isFloat = false).toDoubleArray()
      (0 until m).forall { s =>
        (0 until k).forall { c =>
          val base = ((s * k) + c) * dsub
          var acc = 0.0; var j = 0
          while (j < dsub) {
            val d = q(s * dsub + j) - cb(base + j); acc += d * d; j += 1
          }
          lut2(s * k + c) == acc
        }
      }
    }, "pq-lutL2")
  }
}
