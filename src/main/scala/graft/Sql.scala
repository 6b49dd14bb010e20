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
    * functions. Idempotent. */
  def register(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach(t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    plans.GraftExtensions.register(spark)
  }

  /** Reference uuid primary-key generator (HBaseUtils.kt:22
    * generatePrimaryId: uuid, dashes stripped, lowercase). */
  def generatePrimaryId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").toLowerCase
}
