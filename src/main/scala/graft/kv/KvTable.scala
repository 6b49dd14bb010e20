package graft.kv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rowkey-addressed table semantics, Spark-native.
  *
  * The reference models every table as an HBase rowkey space and
  * pushes Get/Scan/Filter to region servers (reference:
  * HBaseTable.kt:24-52, HBaseFilterableTable.kt:31,
  * HBaseModifiableTable.kt:283 `translateMatch2` — `=, <, <=, >, >=`
  * on the rowkey → `RowFilter`, on columns → `SingleColumnValueFilter`,
  * conjunctions via `FilterList(MUST_PASS_ALL)`).
  *
  * Spark-first equivalent: the table is parquet laid out sorted by its
  * primary key; every access below is a declarative filter, so Catalyst
  * pushes it into the scan (`PushedFilters`) and parquet row-group
  * min/max stats prune I/O the way region pruning does in HBase. At
  * 100 TB the layout contract (sorted/bucketed by rowkey) is what makes
  * pointGet/rangeScan touch O(1) of the files instead of all of them —
  * see `KvLayout.writeSorted`.
  *
  * DML follows the bulk copy-on-write model (BASELINE.json
  * `spark_approach`: "Bulk read/write via HBase connector"): each
  * mutation returns the post-image DataFrame; persisting it is a bulk
  * parquet write. There is no row-at-a-time OLTP path, by design.
  */
final case class KvTable(df: DataFrame, keyCols: Seq[String]) {
  private def key: Column = col(keyCols.head)

  /** HBase Get: primary-key point lookup. */
  def pointGet(k: Any): DataFrame = df.filter(key === lit(k))

  /** HBase multi-Get (reference KVIndexTable.kt:75-84 gets a batch). */
  def multiGet(ks: Seq[Any]): DataFrame = df.filter(key.isin(ks: _*))

  /** HBase Scan.setRowPrefixFilter on a string rowkey. */
  def prefixScan(keyCol: String, prefix: String): DataFrame =
    df.filter(col(keyCol).startsWith(prefix))

  /** HBase Scan(startRow, stopRow): [start, stop) like HBase. */
  def rangeScan(start: Any, stopExclusive: Any): DataFrame =
    df.filter(key >= lit(start) && key < lit(stopExclusive))

  /** FilterList(MUST_PASS_ALL): conjunction of pushed predicates. */
  def filterScan(preds: Column*): DataFrame =
    preds.foldLeft(df)((acc, p) => acc.filter(p))

  /** INSERT → post-image (duplicate keys allowed, like raw HBase Put
    * with distinct rowkeys is the caller's contract). */
  def insert(rows: DataFrame): KvTable =
    copy(df = df.unionByName(rows))

  /** UPDATE/UPSERT by key → post-image: new rows overlay old ones
    * (HBase Put on an existing rowkey overwrites the cells). */
  def upsert(rows: DataFrame): KvTable = {
    val overlaid = df.join(rows.select(keyCols.map(col): _*), keyCols, "left_anti")
    copy(df = overlaid.unionByName(rows))
  }

  /** Column-wise UPDATE: set `valueCol` = `value` where `pred`. */
  def updateWhere(pred: Column, valueCol: String, value: Column): KvTable =
    copy(df = df.withColumn(valueCol, when(pred, value).otherwise(col(valueCol))))

  /** Batched DELETE by rowkey (reference HBaseModifiableTable.kt:219
    * `removeAll` builds a Delete list). */
  def delete(ks: Seq[Any]): KvTable =
    copy(df = df.filter(!key.isin(ks: _*)))

  /** Deletes only rows where the predicate is TRUE (SQL DELETE
    * semantics — NULL predicate keeps the row). */
  def deleteWhere(pred: Column): KvTable =
    copy(df = df.filter(!(pred <=> lit(true))))
}

object KvLayout {
  /** Persist a table bucketed+sorted by its key into the session
    * catalog. Two tables bucketed the same way join WITHOUT a
    * shuffle (no Exchange in the plan) — at 100 TB this is how
    * repeated fact⋈fact joins on the rowkey amortize their shuffle
    * to zero (asserted in BucketSpec). */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                    table: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Persist a table in rowkey layout: range-partitioned and sorted by
    * key so parquet min/max stats give HBase-region-like pruning for
    * pointGet/rangeScan at scale. Partition count scales with input
    * (AQE coalesces small ones); at 100 TB this is the bulk-load path.
    */
  def writeSorted(df: DataFrame, keyCols: Seq[String], path: String, partitions: Int = 0): Unit = {
    val cols = keyCols.map(col)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }
}
