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

  /** Latest row per key within a frame, ordering by (orderCol, tie). */
  def latestPerKey(df: DataFrame, keyCol: String, orderCol: String,
                   tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
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
        if (!batch.isEmpty) {
          val latest = latestPerKey(batch, keyCol, orderCol, tieCol)
            .select(catalog.table(table).df.columns.map(col): _*)
          catalog.incrementalMerge(table, latest)
        }
        ()
      }
      .start()
  }
}
