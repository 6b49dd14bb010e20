package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door: the reference is consumed through Calcite SQL over
  * JDBC (README.md; HBaseSchemaFactory wires tables into the planner).
  * The Spark-native equivalent: register the tables as temp views and
  * the graft functions on the session, then everything in this library
  * is reachable from `spark.sql(...)` text.
  */
object Sql {
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every test table as a temp view + the graft SQL
    * functions. Idempotent — and MEMOIZED per (session, dir): a
    * re-register against the same dir re-reads ten parquet footers
    * and re-binds every function for views that cannot have changed
    * (~0.6 s of driver work per call, paid by every sql_* query rep).
    * A session that switches data dirs re-registers (the views must
    * follow the latest dir), which also keeps the old behavior for
    * multi-dir callers. */
  private val registeredDir =
    // WEAK keys (round-20 advice): a strong-keyed CHM would pin every
    // short-lived session a test suite opens for the JVM's lifetime.
    // WeakHashMap is not thread-safe → synchronized wrapper; the memo
    // is a fast-path hint, so the tiny lock is off any hot loop.
    // Contract rider: the memo assumes the DIR'S CONTENTS are
    // immutable for the session's lifetime (the COW testdata layout) —
    // a caller that regenerates files under the same dir mid-session
    // must open a new session or re-register by hand, because the temp
    // views keep the first registration's file index.
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def register(spark: SparkSession, dir: String): Unit = {
    if (dir == registeredDir.get(spark)) return
    TableNames.foreach(t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    plans.GraftExtensions.register(spark)
    registeredDir.put(spark, dir): Unit
  }

  /** Reference uuid primary-key generator (HBaseUtils.kt:22
    * generatePrimaryId: uuid, dashes stripped, lowercase). */
  def generatePrimaryId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").toLowerCase
}
