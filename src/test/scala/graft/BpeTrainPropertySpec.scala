package graft

import graft.plans.{BpeTrain, BpeVocab}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the BPE trainer, for ANY word histogram — the
  * property-level counterpart of BpeTrainSpec's distributed ==
  * single-JVM pin. */
class BpeTrainPropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, s"$name: $r")
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ ('0' to '2'))).map(_.mkString))

  private val histogram: Gen[List[(String, Long)]] =
    Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, for {
        w <- word; f <- Gen.chooseNum(1L, 50L)
      } yield (w, f))).map(_.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toList)

  test("learned table is independent of histogram row order") {
    check(Prop.forAll(histogram) { h =>
      BpeTrain.learn(h, 30) == BpeTrain.learn(h.reverse, 30) &&
        BpeTrain.learn(h, 30) == BpeTrain.learn(h.sortBy(_._1), 30)
    }, "order independence")
  }

  test("prefix law: the first k merges of a larger budget are the k-budget table") {
    check(Prop.forAll(histogram) { h =>
      val big = BpeTrain.learn(h, 40)
      BpeTrain.learn(h, 10) == big.take(10)
    }, "prefix")
  }

  test("every trained table round-trips through the application kernel") {
    check(Prop.forAll(histogram) { h =>
      val merges = BpeTrain.learn(h, 25)
      merges.isEmpty || {
        val vocab = new BpeVocab(merges)
        // subwords always concatenate back to the exact word, and the
        // training words themselves compress to >= 1 token
        h.forall { case (w, _) =>
          val enc = vocab.encodeWord(w)
          enc.mkString == w && enc.nonEmpty
        }
      }
    }, "roundtrip")
  }

  test("merge count is bounded by the symbol mass of the histogram") {
    check(Prop.forAll(histogram) { h =>
      // each merge shrinks at least one word by one symbol, and a
      // table of n distinct words of total length L supports at most
      // L - n merges before no adjacent pair remains
      val bound = h.map(_._1.length - 1).sum
      BpeTrain.learn(h, 1000).length <= bound
    }, "mass bound")
  }
}
