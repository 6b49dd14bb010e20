package graft

import graft.plans.HashExpressions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The signature expressions claim real `doGenCode` implementations
  * (no CodegenFallback). Pin that: with codegen.fallback disabled and
  * CODEGEN_ONLY factory mode, any expression whose generated code
  * fails to compile aborts the query instead of silently running
  * interpreted — and the codegen'd results must equal the interpreted
  * ones bit for bit.
  */
class CodegenSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def texts: DataFrame =
    Seq((1L, "The quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs!"),
        (3L, ""), (4L, "a"), (5L, "one two one two one"))
      .toDF("id", "text")

  private def vecs: DataFrame =
    Seq((1L, Array(0.1f, 0.2f, 0.3f, 0.4f), Array(0.1, 0.2, 0.3, 0.4)),
        (2L, Array(-1.0f, 0.5f, 0.0f, 2.0f), Array(2.0, -0.5, 1.0, 0.0)))
      .toDF("id", "vf", "vd")

  private def signatures(mode: String): Seq[Row] = {
    val prev = (spark.conf.getOption("spark.sql.codegen.factoryMode"),
      spark.conf.getOption("spark.sql.codegen.fallback"))
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val t = texts.select($"id",
        HashExpressions.tokens($"text").as("toks"),
        HashExpressions.charBigrams($"text").as("bg"),
        HashExpressions.wordNgrams($"text", 2).as("ng"),
        HashExpressions.wordShingles($"text", 3).as("sh"))
        .select($"id", $"toks", $"bg", $"ng", $"sh",
          HashExpressions.minhashSig($"sh", 16).as("mh"),
          HashExpressions.simhash64($"toks").as("sim"))
        .orderBy($"id").collect().toSeq
      // PQ expressions carry their codebook as a codegen reference
      // object — the generated code must compile and agree too
      val cb = Array[Float](0f, 0f, 1f, 1f, 2f, 2f, -1f, 0f)
      import graft.plans.PqExpressions
      val v = vecs.select($"id",
        PqExpressions.pqCodes($"vf", cb, 2, 2, 2).as("pqcf"),
        PqExpressions.pqCodes($"vd", cb, 2, 2, 2).as("pqcd"),
        PqExpressions.pqLut($"vd", cb, 2, 2, 2).as("pql"),
        PqExpressions.pqLutL2($"vd", cb, 2, 2, 2).as("pql2"),
        PqExpressions.pqAdc(PqExpressions.pqCodes($"vf", cb, 2, 2, 2),
          PqExpressions.pqLut($"vd", cb, 2, 2, 2), 2).as("adc"),
        HashExpressions.lshBucket($"vf", 8).as("bf"),
        HashExpressions.lshBucket($"vd", 8).as("bd"),
        HashExpressions.dotInt(
          transform($"vf", x => round(x * 10).cast("int")),
          transform($"vd", x => round(x * 10).cast("int"))).as("di"),
        HashExpressions.quantizeI8($"vf").as("q8f"),
        HashExpressions.quantizeI8($"vd").as("q8d"),
        round(HashExpressions.cosineSim($"vf", $"vd"), 9).as("cosFD"),
        round(HashExpressions.cosineSim($"vd", $"vd"), 9).as("cosDD"))
        .orderBy($"id").collect().toSeq
      t ++ v
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prev._1.getOrElse("FALLBACK"))
      spark.conf.set("spark.sql.codegen.fallback", prev._2.getOrElse("true"))
    }
  }

  test("signature expressions compile under CODEGEN_ONLY and match interpreted results") {
    val gen = signatures("CODEGEN_ONLY")
    val interp = signatures("NO_CODEGEN")
    assert(gen == interp)
    assert(gen.nonEmpty)
  }

  private def bitmapBytes(ids: Long*): Array[Byte] = {
    val c = new graft.index.Bitmap.Chunks()
    ids.foreach(graft.index.Bitmap.set(c, _))
    graft.index.Bitmap.serialize(c)
  }

  private def bitmapResults(mode: String): Seq[Row] = {
    import graft.plans.BitmapExpressions
    val prev = (spark.conf.getOption("spark.sql.codegen.factoryMode"),
      spark.conf.getOption("spark.sql.codegen.fallback"))
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // spans chunk boundaries (65536 ids/chunk) and the sparse/dense
      // split; row 2 exercises disjoint chunk sets (AND → empty)
      Seq((1L, bitmapBytes(1L, 2L, 100000L), bitmapBytes(2L, 3L, 70000L)),
          (2L, bitmapBytes(0L), bitmapBytes(1L << 30)))
        .toDF("id", "ba", "bb")
        .select($"id",
          BitmapExpressions.cardinality($"ba").as("ca"),
          BitmapExpressions.cardinality($"bb").as("cb"),
          array_sort(BitmapExpressions.ids(
            BitmapExpressions.and($"ba", $"bb"))).as("andIds"),
          array_sort(BitmapExpressions.ids(
            BitmapExpressions.or($"ba", $"bb"))).as("orIds"),
          array_sort(BitmapExpressions.ids(
            BitmapExpressions.andNot($"ba", $"bb"))).as("andNotIds"),
          // version fold (compact_index path): tombstone {2} at v2
          // masks both parts (v0, v1), survivors OR together
          array_sort(BitmapExpressions.ids(BitmapExpressions.fold(
            array(struct(lit(0).as("v"), $"ba".as("bm")),
              struct(lit(1).as("v"), $"bb".as("bm"))),
            array(struct(lit(2).as("v"),
              lit(bitmapBytes(2L)).as("bm")))))).as("foldIds"),
          array_sort(BitmapExpressions.ids(BitmapExpressions.fold(
            array(struct(lit(0).as("v"), $"ba".as("bm"))),
            array().cast("array<struct<v:int,bm:binary>>")))).as("foldBare"))
        .orderBy($"id").collect().toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prev._1.getOrElse("FALLBACK"))
      spark.conf.set("spark.sql.codegen.fallback", prev._2.getOrElse("true"))
    }
  }

  test("bitmap expressions compile under CODEGEN_ONLY, match interpreted results and ground truth") {
    val gen = bitmapResults("CODEGEN_ONLY")
    val interp = bitmapResults("NO_CODEGEN")
    assert(gen == interp)
    // hand-computed ground truth, not just mode agreement
    assert(gen.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[Long](4), r.getSeq[Long](5),
        r.getSeq[Long](6), r.getSeq[Long](7))) == Seq(
      (1L, 3L, 3L, Seq(2L), Seq(1L, 2L, 3L, 70000L, 100000L),
        Seq(1L, 100000L), Seq(1L, 3L, 70000L, 100000L),
        Seq(1L, 2L, 100000L)),
      (2L, 1L, 1L, Seq.empty[Long], Seq(0L, 1L << 30), Seq(0L),
        Seq(0L, 1L << 30), Seq(0L))))
  }

  test("a full signature pipeline plans inside WholeStageCodegen") {
    // parquet-backed scan (a local Seq folds to LocalTableScan): the
    // scan → project(shingles → minhash) chain must be one codegen span
    val df = Tables.documents(spark, sf).select(
      HashExpressions.minhashSig(HashExpressions.wordShingles($"text", 3), 16).as("mh"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("minhashsigexpr")),
      s"signature project not inside a codegen span:\n$plan")
  }

  private def bloomResults(mode: String): Seq[Row] = {
    val prev = (spark.conf.getOption("spark.sql.codegen.factoryMode"),
      spark.conf.getOption("spark.sql.codegen.fallback"))
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (0L until 50L).foreach(bloom.putLong)
      Seq(1L, 7L, 49L, 50L, 51L, 1000000L, -3L).toDF("h")
        .select($"h", HashExpressions.bloomContains($"h", bloom).as("hit"))
        .orderBy($"h").collect().toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prev._1.getOrElse("FALLBACK"))
      spark.conf.set("spark.sql.codegen.fallback", prev._2.getOrElse("true"))
    }
  }

  test("bloom probe compiles under CODEGEN_ONLY (sketch as reference object), no false negatives") {
    val gen = bloomResults("CODEGEN_ONLY")
    val interp = bloomResults("NO_CODEGEN")
    assert(gen == interp)
    // a bloom NEVER misses an inserted key; out-of-set hits are
    // allowed (fpp) but at 1% over 7 probes should not all fire
    val byKey = gen.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(Seq(1L, 7L, 49L).forall(byKey(_)), "false negative on an inserted key")
  }
}
