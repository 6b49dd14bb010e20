package graft.scratch

import org.apache.spark.sql.SparkSession

/** Scratch: how many label-propagation rounds do the CC gates run? */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the dd_cc_labels pair set
    val fn = graft.SparkEntry.queries("dd_minhash_lsh")
    val pairs = fn(spark, sfDir)
    import org.apache.spark.sql.functions._
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")).cache()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
    var i = 0
    var converged = false
    while (!converged && i < 50) {
      val nm = edges.join(labels.withColumnRenamed("doc_id", "src")
          .withColumnRenamed("cluster", "src_cluster"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("src_cluster")).as("nbr_cluster"))
      val next = labels.join(nm, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster"))).as("cluster"))
        .cache()
      val changed = next.filter(col("cluster") =!= col("old")).count()
      println(s"ROUND ${i + 1}: changed=$changed")
      labels = next.select("doc_id", "cluster")
      converged = changed == 0
      i += 1
    }
    spark.stop()
  }
}
