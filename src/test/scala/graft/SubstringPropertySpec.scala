package graft

import graft.dedup.Dedup
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the ExactSubstr span operator: on ARBITRARY
  * small corpora (tiny vocabulary so cross-doc window collisions
  * actually occur), Dedup.substringSpans must agree exactly with a
  * brute-force reference — duplicated-window detection by literal
  * set intersection, span merge by linear position walk. The planted
  * fixtures in DedupSpec pin specific shapes; this pins the operator
  * on shapes nobody thought of. */
class SubstringPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val W = 4
  private val Vocab = Vector("a", "b", "c")

  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    ws <- Gen.listOfN(n, Gen.oneOf(Vocab))
  } yield ws.mkString(" ")

  private val corpusGen: Gen[List[String]] =
    Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, docGen))

  /** Brute force: per doc, 1-based window starts whose W-gram occurs
    * in >= 2 DISTINCT docs; merge starts closer than or equal to W
    * apart; report (n_spans, dup_tokens, n_tokens). */
  private def reference(texts: List[String]): Map[Long, (Long, Long, Long)] = {
    val toks = texts.map(_.split("\\s+").filter(_.nonEmpty).toVector)
    val grams: List[Vector[String]] = toks.map { t =>
      if (t.length < W) Vector.empty
      else (0 to t.length - W).map(i => t.slice(i, i + W).mkString(" ")).toVector
    }
    val byGram = grams.zipWithIndex
      .flatMap { case (gs, d) => gs.map(g => (g, d)) }
      .distinct.groupBy(_._1).map { case (g, ds) => g -> ds.size }
    toks.indices.flatMap { d =>
      val starts = grams(d).zipWithIndex.collect {
        case (g, i) if byGram(g) >= 2 => i + 1
      }
      if (starts.isEmpty) None
      else {
        // merge: new span when the next start is more than W after
        // the previous duplicated start
        var spans = List.empty[(Int, Int)] // (start, lastStart)
        starts.foreach { p =>
          spans match {
            case (s, last) :: rest if p - last <= W => spans = (s, p) :: rest
            case _ => spans = (p, p) :: spans
          }
        }
        val dupTokens = spans.map { case (s, last) => last + W - 1 - s + 1 }.sum
        Some(d.toLong -> (spans.size.toLong, dupTokens.toLong, toks(d).length.toLong))
      }
    }.toMap
  }

  test("substringSpans agrees with the brute-force reference on random corpora") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.substringSpans(df, "doc_id", "text", w = W, minDocs = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val want = reference(texts)
      if (got != want) {
        println(s"MISMATCH corpus=$texts\n got=$got\n want=$want")
      }
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(r.passed, r.toString)
  }
}
