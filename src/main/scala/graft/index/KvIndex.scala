package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KV secondary index, Spark-native.
  *
  * The reference maintains an index table whose rowkey is
  * `qualifier | value | rowkey` and whose cell points back at the base
  * rowkey; an equality lookup is a prefix scan on the index followed by
  * a multi-Get on the base table (reference: KVIndexTable.kt:64-84
  * getByIndex, :95-125 put — index rows written alongside every base
  * Put; HBaseSchema.kt:262-287 createIndex backfill scan).
  *
  * Spark-first: the index is a (ik, rk) DataFrame range-partitioned and
  * sorted by ik, persisted as parquet. A lookup filters the index (the
  * filter is pushed to the scan; min/max stats prune to the right
  * partition, the analog of the index-table region seek) and semi-joins
  * the resulting rowkeys back to the base table. The semi-join carries
  * no broadcast hint: when the rowkey set is genuinely small AQE turns
  * it into a broadcast join at runtime; when a hot value matches a large
  * slice of the table the plan stays a shuffled semi-join instead of
  * OOMing the driver.
  */
object KvIndex {

  /** Backfill build, the analog of HBaseSchema.createIndex's scan.
    * Plain projection — the value-sorted layout is applied when the
    * index is PERSISTED (Catalog.createIndex via KvLayout.writeSorted);
    * shuffling here would just duplicate that work for in-flight use. */
  def build(base: DataFrame, keyCol: String, valueCol: String): DataFrame =
    base.select(col(valueCol).as("ik"), col(keyCol).as("rk"))

  /** Multi-column index: the reference's index rowkey is the
    * concatenation of every indexed column (HBaseSchema.kt:306); here
    * the index frame carries one `ik<i>` column per indexed column and
    * is persisted sorted by (ik0, ik1, ...), so equality on a prefix of
    * the indexed columns prunes row groups like an index-prefix seek. */
  def buildComposite(base: DataFrame, keyCol: String, valueCols: Seq[String]): DataFrame =
    base.select(valueCols.zipWithIndex.map { case (c, i) => col(c).as(s"ik$i") } :+
      col(keyCol).as("rk"): _*)

  /** Composite equality lookup on a PREFIX of the indexed columns
    * (values.length <= index arity), then semi-join back to base. */
  def lookupComposite(base: DataFrame, keyCol: String, index: DataFrame,
                      values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "empty lookup tuple")
    val pred = values.zipWithIndex
      .map { case (v, i) => col(s"ik$i") === lit(v) }.reduce(_ && _)
    val rks = index.filter(pred).select(col("rk"))
    base.join(rks, base(keyCol) === rks("rk"), "left_semi")
  }

  /** Equality lookup: index seek + multi-Get back to base. No broadcast
    * hint: the rowkey set for a value is unbounded (a low-selectivity
    * value can match a large fraction of the base table), so the plan is
    * a plain semi-join and AQE broadcasts at runtime only when the hit
    * set is actually small. */
  def lookup(base: DataFrame, keyCol: String, index: DataFrame, value: Any): DataFrame = {
    val rks = index.filter(col("ik") === lit(value)).select(col("rk"))
    base.join(rks, base(keyCol) === rks("rk"), "left_semi")
  }

  /** Atomic base+index upsert, the COW analog of the reference's
    * transactional index maintenance (KVTransactionalIndexTable.kt:
    * every Put writes the base row and its index row inside one Tephra
    * transaction — partial states are never visible). Here both
    * post-images derive from the same patch in one lineage, so a bulk
    * job either publishes both snapshots or neither. */
  def upsertWithIndex(base: DataFrame, keyCol: String, valueCol: String,
                      index: DataFrame, patch: DataFrame): (DataFrame, DataFrame) = {
    // Put semantics are last-writer-wins PER KEY: a patch carrying two
    // rows for one key would otherwise survive as duplicate base rows
    // AND duplicate index entries. Deterministic winner = max over the
    // non-key columns (same rule as the catalog's staged upsert).
    val others = patch.columns.filter(_ != keyCol)
    val dedup = patch.groupBy(col(keyCol))
      .agg(max(struct(others.map(col): _*)).as("__w"))
      .select(col(keyCol) +: others.map(c => col(s"__w.$c").as(c)): _*)
    val newBase = base.join(dedup.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(dedup)
    val patchKeys = dedup.select(col(keyCol).as("rk"))
    val newIndex = index.join(patchKeys, Seq("rk"), "left_anti")
      .unionByName(dedup.select(col(valueCol).as("ik"), col(keyCol).as("rk")))
    (newBase, newIndex)
  }

  /** Range lookup [lo, hi) over the sorted index. Same no-hint policy as
    * [[lookup]]: a wide range is unbounded, AQE decides at runtime. */
  def rangeLookup(base: DataFrame, keyCol: String, index: DataFrame,
                  lo: Any, hi: Any): DataFrame = {
    val rks = index.filter(col("ik") >= lit(lo) && col("ik") < lit(hi)).select(col("rk"))
    base.join(rks, base(keyCol) === rks("rk"), "left_semi")
  }
}
