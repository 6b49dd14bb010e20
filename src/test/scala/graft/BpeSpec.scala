package graft

import graft.plans.BpeOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the BPE subword kernel (txt_bpe_tokens is
  * rows-only — greedy merge loops aren't SQL-expressible). The
  * reference implementation here is Sennrich's ORIGINAL formulation
  * (apply each learned merge in rank order, everywhere in the word),
  * deliberately a different algorithm from the kernel's greedy
  * lowest-rank-present loop — the two provably coincide (a merge at
  * rank r only creates pairs learned later), so any divergence is an
  * implementation bug in one of them. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  /** Sennrich-order reference: for each merge in learned order,
    * replace all adjacent occurrences in the word. */
  private def referenceEncode(word: String): Vector[String] = {
    var parts = word.map(_.toString).toVector
    BpeOps.merges.foreach { case (a, b) =>
      if (parts.length > 1) {
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < parts.length) {
          if (i < parts.length - 1 && parts(i) == a && parts(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += parts(i); i += 1 }
        }
        parts = nb.result()
      }
    }
    parts
  }

  private def referenceTokens(text: String): Vector[String] = {
    val toks = graft.plans.HashOps.tokens(UTF8String.fromString(text))
    (0 until toks.numElements()).toVector
      .flatMap(i => referenceEncode(toks.getUTF8String(i).toString))
  }

  private def kernelTokens(text: String): Vector[String] = {
    val arr = BpeOps.bpeTokens(UTF8String.fromString(text))
    (0 until arr.numElements()).toVector.map(arr.getUTF8String(_).toString)
  }

  test("merges table is non-trivial and deterministic") {
    assert(BpeOps.merges.length == 200)
    // the common English fragments a real table learns
    val joined = BpeOps.merges.map { case (a, b) => a + b }.toSet
    assert(joined.contains("th") || joined.contains("he"))
    assert(BpeOps.merges == BpeOps.merges) // lazy val: one table per JVM
    // no merge pair contains the rank-map separator (space) — symbols
    // are lowercase alnum by construction of the tokenizer
    BpeOps.merges.foreach { case (a, b) =>
      assert(!a.contains(" ") && !b.contains(" "))
    }
  }

  test("kernel encoding matches the Sennrich-order reference") {
    // English-ish words, random alnum strings, digits, repeats
    val wordGen = Gen.oneOf(
      Gen.oneOf("the", "reading", "station", "internationalization",
        "aaaa", "abab", "x", "q7b3", "12345", "mississippi"),
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(24)),
      Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
        .map(_.mkString).map(_.take(24)))
    val prop = Prop.forAll(Gen.listOf(wordGen)) { words: List[String] =>
      val text = words.mkString(" ")
      kernelTokens(text) == referenceTokens(text)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.toString)
  }

  test("subwords concatenate back to the exact word tokens") {
    val prop = Prop.forAll(Gen.asciiPrintableStr) { text: String =>
      val toks = graft.plans.HashOps.tokens(UTF8String.fromString(text))
      val words = (0 until toks.numElements())
        .map(toks.getUTF8String(_).toString)
      kernelTokens(text).mkString == words.mkString &&
        BpeOps.bpeCount(UTF8String.fromString(text)) == kernelTokens(text).length
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.toString)
  }

  test("expression path through Spark matches the kernel, incl. SQL registration") {
    import spark.implicits._
    val texts = Seq("The reading station closed.", "", "a b c", "12 cats",
      "internationalization of the mississippi").toDF("text")
    val viaDf = texts
      .select(graft.functions.TextFunctions.bpeTokens($"text").as("t"),
        graft.functions.TextFunctions.bpeTokenCount($"text").as("n"))
      .collect()
    viaDf.zip(Seq("The reading station closed.", "", "a b c", "12 cats",
      "internationalization of the mississippi")).foreach { case (r, s) =>
      assert(r.getSeq[String](0) == kernelTokens(s))
      assert(r.getInt(1) == kernelTokens(s).length)
    }
    graft.plans.GraftExtensions.register(spark)
    texts.createOrReplaceTempView("bpe_texts")
    val viaSql = spark.sql(
      "SELECT graft_bpe_count(text) AS n, graft_bpe_tokens(text) AS t FROM bpe_texts")
      .collect()
    viaSql.zip(viaDf).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(1) && a.getSeq[String](1) == b.getSeq[String](0))
    }
  }

  test("a published merges file loads and drives the same kernels") {
    import graft.plans.BpeVocab
    // the standard merges.txt shape: version header, one pair per
    // line, rank = line order
    val mergesFile = java.nio.file.Files.createTempFile("graft_merges", ".txt")
    java.nio.file.Files.writeString(mergesFile,
      """#version: 0.2
        |t h
        |th e
        |i n
        |in g
        |a t
        |""".stripMargin)
    val vocab = BpeVocab.fromFile(mergesFile.toString)
    assert(vocab.merges == Vector("t" -> "h", "th" -> "e", "i" -> "n",
      "in" -> "g", "a" -> "t"))
    // greedy loop under the LOADED table: "thing" = th+ing, "that" =
    // th+at, "the" = the (rank-1 merge wins over nothing later)
    assert(vocab.encodeWord("thing").toSeq == Seq("th", "ing"))
    assert(vocab.encodeWord("that").toSeq == Seq("th", "at"))
    assert(vocab.encodeWord("the").toSeq == Seq("the"))
    // …and differs from the seed-trained default where the tables
    // differ (the default learned "the" too, but not only these five)
    assert(vocab.merges != BpeOps.merges)

    // expression path: the vocabulary rides the expression node
    import spark.implicits._
    val rows = Seq("the thing at that", "nothing").toDF("text")
      .select(graft.functions.TextFunctions.bpeTokens($"text", vocab).as("t"),
        graft.functions.TextFunctions.bpeTokenCount($"text", vocab).as("n"))
      .collect()
    assert(rows(0).getSeq[String](0) ==
      Seq("the", "th", "ing", "at", "th", "at"))
    assert(rows(0).getInt(1) == 6)
    assert(rows(1).getSeq[String](0) == Seq("n", "o", "th", "ing"))
    assert(rows(1).getInt(1) == 4)

    // a merges file for a different pre-tokenizer (cased/byte-level
    // symbols) must fail loudly, not silently never fire
    intercept[IllegalArgumentException] {
      BpeVocab.fromLines(Seq("Ġthe n"))
    }
    intercept[IllegalArgumentException] { BpeVocab.fromLines(Seq("#only")) }
    java.nio.file.Files.deleteIfExists(mergesFile): Unit
  }

  test("every document's subword count nests between words and chars") {
    import spark.implicits._
    val bad = SparkEntry.queries("txt_bpe_tokens")(spark, sf)
      .join(Tables.documents(spark, sf)
          .select($"doc_id", length($"text").as("n_chars")), Seq("doc_id"))
      .filter(!($"n_bpe" >= $"n_words" && $"n_bpe" <= $"n_chars"))
      .count()
    assert(bad == 0)
  }
}
