package graft

import graft.functions.HtmlFunctions
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the HTML main-content extractor — laws that
  * must hold for ANY document body, not just the gated plant: the
  * content paragraph always survives (whitespace-squeezed), pure-link
  * boilerplate always drops, no markup ever leaks into main_text, and
  * extraction is idempotent (re-dressing extracted text and
  * re-extracting returns it unchanged — the normal-form property). */
class HtmlPropertySpec extends AnyFunSuite {
  import TestSpark._

  // body text: words over letters/digits/punctuation (no '<'/'>' —
  // the operator's contract is tag-free body text; real pipelines
  // sanitize upstream), with runs of spaces so the squeeze law is
  // exercised, plus unicode letters
  private val word = Gen.oneOf(
    Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString),
    Gen.oneOf("a.b,c", "x-y_z", "it's", "50%", "naïve", "füll", "末尾"))
  private val gap = Gen.oneOf(" ", "  ", "   ", " \t ")
  private val bodyG: Gen[String] = for {
    n <- Gen.choose(1, 30)
    ws <- Gen.listOfN(n, word)
    gs <- Gen.listOfN(n, gap)
  } yield ws.zip(gs).map { case (w, g) => w + g }.mkString.trim

  /** The dressing shape the gated plant uses, parameterized by body:
    * head junk, a pure-link nav, the body paragraph, a link footer. */
  private def dress(body: String): String =
    "<html><head><title>t</title><script>var a=1;</script>" +
      "<style>p{margin:0}</style></head><body>" +
      "<nav><a href=\"/\">home</a> <a href=\"/a\">a</a></nav>" +
      s"<p>$body</p>" +
      "<footer><a href=\"/x\">x</a> <a href=\"/y\">y</a></footer>" +
      "</body></html>"

  private def squeeze(s: String): String =
    s.replaceAll("\\s+", " ").trim

  private def extractBatch(pages: Seq[String]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    HtmlFunctions.extractMain(
        pages.zipWithIndex.map { case (h, i) => (i.toLong, h) }
          .toDF("doc_id", "html"), "doc_id", "html")
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getAs[String]("main_text"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_dropped"))).toSeq
  }

  test("the content paragraph survives squeezed; boilerplate drops; no markup leaks") {
    val bodies = Gen.listOfN(120, bodyG).sample.getOrElse(Seq.fill(120)("a b"))
      .filter(_.nonEmpty)
    val out = extractBatch(bodies.map(dress))
    bodies.zip(out).foreach { case (body, (main, nBlocks, nDropped)) =>
      assert(main == squeeze(body),
        s"main_text diverged for body '$body': got '$main'")
      // nav + footer always drop; the body paragraph is the only keep
      assert(nDropped == 2, s"expected 2 dropped boilerplate blocks, $nDropped")
      assert(nBlocks == 3, s"expected 3 visible blocks, $nBlocks")
      assert(!main.contains("<") && !main.contains(">"),
        s"markup leaked into main_text: '$main'")
      assert(!main.contains("home") && !main.contains("footer"),
        s"boilerplate text leaked: '$main'")
    }
  }

  test("extraction is idempotent: re-dressing extracted text returns it unchanged") {
    val bodies = Gen.listOfN(60, bodyG).sample.getOrElse(Seq.fill(60)("a b"))
      .filter(_.nonEmpty)
    val once = extractBatch(bodies.map(dress)).map(_._1)
    val twice = extractBatch(once.map(dress)).map(_._1)
    assert(once == twice, "extract ∘ dress is not idempotent on its own output")
  }

  test("a block mixing text and links keeps or drops by the exact integer density rule") {
    // visible = "w1 .. wk home" with one 4-char anchor ("home"):
    // link_chars = len(visible) - len(non-anchor visible); the rule
    // keeps iff 2*link_chars <= len(visible). Constructed both sides
    // of the boundary.
    import spark.implicits._
    def page(words: Int): String =
      "<html><head></head><body><div>" +
        (1 to words).map(i => "w" + i).mkString(" ") +
        " <a href=\"/h\">home link text</a></div></body></html>"
    val df = Seq((1L, page(1)), (2L, page(20)))
      .toDF("doc_id", "html")
    val out = HtmlFunctions.extractMain(df, "doc_id", "html")
      .orderBy($"doc_id").collect()
    // 1 word + 14-char anchor text: density > 1/2 → dropped (empty main)
    assert(out(0).getAs[String]("main_text") == "",
      s"high-density block kept: '${out(0).getAs[String]("main_text")}'")
    assert(out(0).getAs[Long]("n_dropped") == 1L)
    // 20 words + the same anchor: density < 1/2 → kept, anchor text included
    val kept = out(1).getAs[String]("main_text")
    assert(kept.startsWith("w1 w2") && kept.endsWith("home link text"),
      s"low-density block mishandled: '$kept'")
  }
}
