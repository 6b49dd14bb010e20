package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each module contributes (queries, oracles); this object merges them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.Relational.queries ++ kv.KvQueries.queries ++
      index.IndexQueries.queries ++ functions.TextQueries.queries ++
      dedup.DedupQueries.queries ++ streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    relational.Relational.oracles ++ kv.KvQueries.oracles ++
      index.IndexQueries.oracles ++ functions.TextQueries.oracles ++
      dedup.DedupQueries.oracles ++ streaming.StreamQueries.oracles
}
