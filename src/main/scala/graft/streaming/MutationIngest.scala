package graft.streaming

import graft.kv.{Catalog, KvTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming mutation ingest: the Spark-native analog of the
  * reference's write path (HBase Puts arriving continuously,
  * HBaseModifiableTable.kt insert/update).
  *
  * A stream of keyed mutations is merged into a catalog table with
  * `foreachBatch`: each micro-batch reduces to its latest image per
  * key (last-writer-wins by event order), then merges copy-on-write
  * into the table at FILE granularity (Catalog.incrementalMerge):
  * only files whose rowkey range intersects the batch are rewritten;
  * untouched files carry into the next snapshot untouched. At 100 TB
  * a CDC trickle therefore costs I/O proportional to the touched key
  * ranges, not the table size, and the table stays in rowkey-sorted
  * layout for readers throughout.
  */
object MutationIngest {

  /** Latest row per key within a frame, ordering by (orderCol, tie).
    * The working column is reserved: a caller column of the same name
    * would be silently clobbered by withColumn, ranked on, and then
    * dropped — wrong rows kept AND a data column lost — so fail
    * loudly instead (same contract as AsOfJoin's __graft_ prefix). */
  def latestPerKey(df: DataFrame, keyCol: String, orderCol: String,
                   tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("__graft_rn"),
      "__graft_rn is reserved by MutationIngest.latestPerKey")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** Start merging a mutation stream into catalog table `table`.
    * The stream schema must match the table schema plus the ordering
    * columns. */
  def start(spark: SparkSession, mutations: DataFrame, catalog: Catalog,
            table: String, keyCol: String, orderCol: String,
            tieCol: String): StreamingQuery = {
    mutations.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Materialize the batch ONCE before the empty probe: a bare
        // batch.isEmpty executes the batch plan for a limit(1) and the
        // merge then re-executes it from the source — doubling
        // per-batch input I/O. The empty guard itself must stay:
        // incrementalMerge publishes a new table version even for an
        // empty patch, so an empty trailing trigger would burn a
        // version (and a snapshot dir) for nothing. persist (not
        // localCheckpoint): blocks are dropped in the finally rather
        // than lingering until driver GC, and the lineage survives —
        // an executor lost mid-batch recomputes the partition instead
        // of failing the micro-batch back to the source checkpoint.
        val local = batch.persist()
        try {
          if (!local.isEmpty) {
            val latest = latestPerKey(local, keyCol, orderCol, tieCol)
              .select(catalog.table(table).df.columns.map(col): _*)
            catalog.incrementalMerge(table, latest)
          }
        } finally { local.unpersist(); () }
      }
      .start()
  }
}
