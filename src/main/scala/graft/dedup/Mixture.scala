package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing + sequence packing — the two steps between "deduped
  * corpus" and "training batches" in an LLM data pipeline.
  *
  * Both are deterministic by construction (hash-gated sampling, id-
  * ordered packing): re-running the pipeline over the same corpus
  * yields byte-identical training data, which is what makes 100 TB
  * runs debuggable and resumable.
  */
object Mixture {

  /** Deterministic per-source downsampling: keep a row iff the hash of
    * its id falls under the source's rate — the "data mixing" step
    * that reweights corpus sources for training. Unlike `sample()`,
    * membership is a pure function of (id, rate): stable across runs,
    * partitionings and Spark versions, and adding a source never
    * reshuffles another source's sample. One codegen'd filter, no
    * shuffle. */
  def sampleByHash(docs: DataFrame, idCol: String, sourceCol: String,
                   rates: Map[String, Double],
                   defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val denom = 1000000L
    val rateCol: Column = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    // uniform in [0,1): id hash mod 1e6 (salted so it is independent
    // of any other hash-of-id use in the pipeline; 1e6 grain = rates
    // resolve to one part per million)
    val u = pmod(xxhash64(col(idCol), lit("graft_mixture")), lit(denom))
      .cast("double") / lit(denom.toDouble)
    docs.filter(u < rateCol)
  }

  /** Greedy sequence packing: assign documents to packs so each pack's
    * token total stays ≤ `budget` (a document alone over budget gets
    * its own pack). Documents are range-partitioned and sorted by id,
    * then packed with a per-partition sequential scan — deterministic
    * pack membership, no driver involvement, parallelism = partition
    * count. Pack ids are (partition << 32 | seq) so they're globally
    * unique without coordination. */
  def packGreedy(docs: DataFrame, idCol: String, tokensCol: String,
                 budget: Int, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val slim = docs.select(col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("int").as("n_tokens"))
    val ranged =
      if (partitions > 0) slim.repartitionByRange(partitions, col("doc_id"))
      else slim.repartitionByRange(col("doc_id"))
    ranged.sortWithinPartitions(col("doc_id"))
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var seq = 0L
        var used = 0L
        var started = false
        rows.filter(!_.isNullAt(0)).map { r =>
          // a null id cannot be packed (no identity to emit) — skip the
          // row rather than NPE the job, same one-bad-document stance
          // as the null token-count guard below
          val id = r.getLong(0)
          // null token counts (e.g. null text) pack as 0 instead of
          // killing the job — one bad document must not fail a run
          val n = if (r.isNullAt(1)) 0 else r.getInt(1)
          if (!started) { started = true; used = n.toLong }
          else if (used + n > budget) { seq += 1; used = n.toLong }
          else used += n
          (id, n, (pid << 32) | seq)
        }
      }.toDF("doc_id", "n_tokens", "pack_id")
  }
}
