package graft.scratch

import org.apache.spark.sql.SparkSession

/** Scratch: where does a driver-bound query spend — Catalyst phases
  * (analysis/optimization/planning) vs execution? */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("MINPART", "1m"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // optimization + physical planning
      val t15 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"PLANCOST $name build=${(t1 - t0) / 1e9}%.3f plan=${(t15 - t1) / 1e9}%.3f exec=${(t2 - t15) / 1e9}%.3f")
    }
    spark.stop()
  }
}
