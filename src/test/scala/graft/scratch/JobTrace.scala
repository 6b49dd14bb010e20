package graft.scratch

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not shipped in src/main): prints one line
  * per Spark job a query schedules — callsite + description — so the
  * per-action cost structure of a multi-job operator is readable.
  * runMain graft.scratch.JobTrace <sfDir> <query> */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warm rep
    fn(spark, sfDir).count()
    val t = new java.util.concurrent.atomic.AtomicLong()
    val base = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobTime = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()): Unit
        val site = Option(j.properties.getProperty("callSite.short")).getOrElse("?")
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        val stages = j.stageInfos.map(_.name).mkString(" | ")
        val at = (System.nanoTime() - base.get()) / 1e6
        println(f"JOB ${t.incrementAndGet()}%3d @${at}%7.0fms stages=${j.stageInfos.size}%2d  $site  $desc  [$stages]")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { s =>
          val d = System.nanoTime() - s
          jobTime.addAndGet(d)
          println(f"END ${j.jobId}%3d dur=${d / 1e6}%6.1fms")
        }
      }
    })
    val t0 = System.nanoTime()
    base.set(t0)
    fn(spark, sfDir).count()
    println(f"TIMED ${(System.nanoTime() - t0) / 1e9}%.3f s  in-job=${jobTime.get() / 1e9}%.3f s")
    Thread.sleep(200)
    spark.stop()
  }
}
