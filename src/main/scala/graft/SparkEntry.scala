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

  /** Parse a comma-separated query filter (Verify's 3rd arg, Bench's
    * SPARK_GRAFT_BENCH_ONLY) into the selected query map. Fails LOUDLY
    * on an unknown name AND on an empty/whitespace-only filter — both
    * would otherwise select nothing and let a targeted re-check or
    * bench "pass" vacuously (or overwrite the official bench artifact
    * with a zero-query total). One guard, shared by both entrypoints. */
  def select(filter: Option[String]): Map[String, (SparkSession, String) => DataFrame] =
    filter match {
      case None => queries
      case Some(spec) =>
        val names = spec.split(",").map(_.trim).filter(_.nonEmpty).toSet
        require(names.nonEmpty,
          "query filter is empty — omit it entirely to run everything")
        val unknown = names.diff(queries.keySet)
        require(unknown.isEmpty,
          s"unknown query name(s) in filter: ${unknown.toSeq.sorted.mkString(", ")}")
        queries.filter { case (n, _) => names.contains(n) }
    }
}
