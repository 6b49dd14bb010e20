package graft

import graft.streaming.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL-family quantile sketch laws: deterministic level selection,
  * bounded sketch size, the streaming-merge == batch-sketch law the
  * nested hash-sampling construction buys, and an empirical
  * rank-error envelope (the bound classic KLL proves for coin-flip
  * compaction holds here over the affine hash family). */
class KllSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus = {
    import spark.implicits._
    // two groups with different sizes and shapes: a ramp (uniform
    // ranks) and a heavy tail (squared), ids unique across the frame
    val a = (0L until 5000L).map(i => ("ramp", i, i.toDouble))
    val b = (0L until 3000L).map(i => ("tail", 100000L + i, (i * i).toDouble))
    (a ++ b).toDF("g", "id", "v")
  }

  test("level selection is exact at the boundaries and sketch size is bounded") {
    import spark.implicits._
    val lv = Seq(1L, 256L, 257L, 512L, 513L, 1024L, 1025L).toDF("n")
      .select($"n", Sketches.kllLevel($"n", 256).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lv == Map(1L -> 0, 256L -> 0, 257L -> 1, 512L -> 1,
      513L -> 2, 1024L -> 2, 1025L -> 3))
    val sk = Sketches.kllSketch(corpus, "v", "id", Seq("g"), cap = 256)
    val sizes = sk.groupBy($"g").agg(count(lit(1)).as("c"), max($"lvl").as("l"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toList
    sizes.foreach { case (g, c, l) =>
      assert(l > 0, s"$g: compaction never engaged")
      // expected size n/2^l <= cap; the hash draw wobbles around it —
      // allow 2x before calling the budget broken
      assert(c <= 512, s"$g: sketch size $c exceeds the budget")
      assert(c >= 64, s"$g: sketch implausibly small ($c)")
    }
  }

  test("streaming merge of per-batch sketches equals the batch sketch bit-for-bit") {
    import spark.implicits._
    val half1 = corpus.filter($"id" % 2 === 0)
    val half2 = corpus.filter($"id" % 2 =!= 0)
    val merged = Sketches.kllMerge(
      Seq(Sketches.kllSketch(half1, "v", "id", Seq("g"), 256),
        Sketches.kllSketch(half2, "v", "id", Seq("g"), 256)),
      Seq("g"), 256)
    val batch = Sketches.kllSketch(corpus, "v", "id", Seq("g"), 256)
    val m = merged.select($"g", $"value", $"h", $"n", $"lvl", $"w")
      .collect().map(_.toString).sorted.toSeq
    val b = batch.collect().map(_.toString).sorted.toSeq
    assert(m == b, "merge law violated: merged sketch differs from batch sketch")
  }

  test("rank-error envelope: estimated quantiles sit near their target ranks") {
    import spark.implicits._
    val sk = Sketches.kllSketch(corpus, "v", "id", Seq("g"), cap = 256)
    val ps = Seq(10, 25, 50, 75, 90, 99)
    val est = Sketches.kllQuantiles(sk, Seq("g"), ps)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val data = corpus.collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getDouble(2)).sorted }
    for (g <- data.keys; p <- ps) {
      val vs = data(g)
      val n = vs.length
      val q = est((g, p))
      val trueRank = vs.count(_ <= q)
      val target = p * n / 100.0
      // cap=256 ⇒ weight 2^lvl ≈ n/256; the Bernoulli-compaction rank
      // deviation is O(√(rank·w)) ≈ n/16 at the median here — 10% of
      // n is a comfortable yet meaningful envelope (a histogram
      // bucket or a wrong quantile would blow through it)
      assert(math.abs(trueRank - target) <= n * 0.10,
        s"$g p$p: est $q has true rank $trueRank, target $target (n=$n)")
    }
  }
}
