package graft

import graft.plans.{BpeOps, BpeTrain, BpeVocab}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the distributed BPE trainer (txt_bpe_train is
  * rows-only — iterative merge learning isn't SQL-expressible). The
  * anchor: BpeOps.merges is the SAME algorithm run single-JVM over
  * the seed's word histogram, so training distributed over the seed
  * text sharded into documents must reproduce it EXACTLY — any
  * divergence (ordering sensitivity, count drift through the shuffle,
  * tie-break instability) shows as a merges mismatch. */
class BpeTrainSpec extends AnyFunSuite {
  import TestSpark._

  private def seedDocs(partitions: Int) = {
    import spark.implicits._
    // one doc per seed line: word counts are line-local sums, so the
    // corpus histogram equals the single-text histogram exactly
    BpeOps.seedText.split("\n").toSeq.toDF("text").repartition(partitions)
  }

  test("distributed trainer == single-JVM trainer on the seed corpus") {
    val learned = BpeTrain.learnDistributed(
      seedDocs(8), col("text"), BpeOps.NumMerges, maxWords = 1 << 20)
    assert(learned == BpeOps.merges.toVector)
  }

  test("partitioning does not change the learned table") {
    val a = BpeTrain.learnDistributed(seedDocs(2), col("text"), 60,
      maxWords = 1 << 20)
    val b = BpeTrain.learnDistributed(seedDocs(32), col("text"), 60,
      maxWords = 1 << 20)
    assert(a == b)
    assert(a == BpeOps.merges.take(60).toVector)
  }

  test("maxWords truncation is deterministic and keeps training sound") {
    // a tight cap must still learn from the KEPT histogram
    // deterministically; ranks come from the truncated table, so pin
    // reproducibility rather than equality with the full train
    val a = BpeTrain.learnDistributed(seedDocs(4), col("text"), 30,
      maxWords = 25)
    val b = BpeTrain.learnDistributed(seedDocs(16), col("text"), 30,
      maxWords = 25)
    assert(a == b)
    assert(a.nonEmpty)
    // learned pairs always merge symbols from the kept alphabet
    assert(a.forall { case (l, r) => l.nonEmpty && r.nonEmpty })
  }

  test("trained merges load into the application kernel") {
    val learned = BpeTrain.learnDistributed(seedDocs(4), col("text"), 40,
      maxWords = 1 << 20)
    val vocab = new BpeVocab(learned)
    // subwords concatenate back to the word (the BpeSpec invariant)
    for (w <- Seq("the", "streaming", "partitions", "watermark"))
      assert(vocab.encodeWord(w).mkString == w)
    // 40 merges of the seed must fuse the most frequent digraph of
    // the seed's dominant word ("the") into one token
    assert(vocab.encodeWord("the").length < 3)
  }

  test("merge loop stops early when no pair is left") {
    val learned = BpeTrain.learn(Seq(("ab", 3L), ("ba", 2L)), 100)
    // alphabet {a,b}: pairs exhaust after at most a handful of merges
    assert(learned.length < 10)
    val vocab = new BpeVocab(learned)
    assert(vocab.encodeWord("ab").mkString == "ab")
  }
}
