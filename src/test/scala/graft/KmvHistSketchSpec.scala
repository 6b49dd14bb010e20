package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the KMV bottom-k distinct sketch and the equi-width
  * histogram quantile sketch, beyond what their oracles replay
  * (the oracle proves the computation matches; this pins the
  * estimator guarantees the 100 TB story rests on — merge algebra
  * and error bounds). */
class KmvHistSketchSpec extends AnyFunSuite {
  import TestSpark._

  private val M = 2147483647L

  private def hashes(ev: DataFrame): DataFrame = {
    import spark.implicits._
    ev.select(((($"user_id" % M) * 2654435761L + 97L) % M).as("h")).distinct()
  }

  private def bottomK(h: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    graft.plans.TopK.perGroup(h.withColumn("g", lit(0)), Seq("g"),
      Seq(("h", false)), k).select($"h")
  }

  test("KMV merge law: bottom-k of pooled slice bottom-k's == whole-corpus bottom-k") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select($"user_id", $"event_id")
    val k = 64
    val slices = Seq(0, 1, 2).map(i =>
      bottomK(hashes(ev.filter($"event_id" % 3 === i)), k))
    // pooled slice sketches can carry the same hash twice (a user
    // active in two slices) — the union dedups, exactly as a sketch
    // merge must
    val merged = bottomK(slices.reduce(_ unionByName _).distinct(), k)
    val whole = bottomK(hashes(ev), k)
    assert(merged.except(whole).count() == 0 &&
      whole.except(merged).count() == 0,
      "merged slice sketches differ from the whole-corpus sketch")
  }

  test("KMV estimate lands within the k=64 error envelope") {
    import spark.implicits._
    val row = SparkEntry.queries("evt_kmv_distinct")(spark, sf).head()
    val est = row.getAs[Long]("n_est").toDouble
    val exact = row.getAs[Long]("n_exact").toDouble
    // std error ~ 1/sqrt(k-2) ~ 13% at k=64; 2.5 sigma envelope
    assert(math.abs(est - exact) / exact < 0.33,
      s"KMV estimate $est strayed >33% from exact $exact")
  }

  test("theta intersection is EXACT while both sketches are underfull") {
    import spark.implicits._
    // two event types over 40 and 60 users overlapping in 20: both
    // distinct sets fit under k=64, so θ = M for both and the
    // intersection estimate must equal the exact count — the
    // underfull-exactness law the saturation rule encodes
    val rows = ((1L to 40L).map(u => ("view", u)) ++
      (21L to 80L).map(u => ("purchase", u)))
      .zipWithIndex.map { case ((t, u), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          u, t, 1.0, "{}")
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_theta").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("evt_kmv_intersect")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_exact") == 20L)
    assert(r.getAs[Long]("n_est") == 20L,
      s"underfull theta intersection must be exact, got ${r.getAs[Long]("n_est")}")
    assert(r.getAs[Long]("n_match") == 20L)
  }

  test("theta intersection estimates land in a loose k=64 envelope on real pairs") {
    import spark.implicits._
    val out = SparkEntry.queries("evt_kmv_intersect")(spark, sf).collect()
    assert(out.nonEmpty)
    // intersection error grows as overlap shrinks (effective sample =
    // matches below θ); only gate pairs with real support
    out.filter(r => r.getAs[Long]("n_exact") >= 50 &&
        r.getAs[Long]("n_match") >= 10).foreach { r =>
      val est = r.getAs[Long]("n_est").toDouble
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - exact) / exact < 0.6,
        s"${r.getAs[String]("type_a")}∩${r.getAs[String]("type_b")}: " +
          s"est $est vs exact $exact strayed >60%")
    }
  }

  test("theta A-NOT-B is EXACT while both sketches are underfull, directed both ways") {
    import spark.implicits._
    // same planted overlap as the intersection law: view = 1..40,
    // purchase = 21..80, overlap 20 — underfull sketches (θ = M) make
    // the difference estimate exact, and the operation is DIRECTED:
    // |view∖purchase| = 20, |purchase∖view| = 40
    val rows = ((1L to 40L).map(u => ("view", u)) ++
      (21L to 80L).map(u => ("purchase", u)))
      .zipWithIndex.map { case ((t, u), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          u, t, 1.0, "{}")
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_thetadiff").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("evt_kmv_diff")(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_est"), r.getAs[Long]("n_exact"))).toMap
    assert(out.size == 2, s"expected both directed pairs, got $out")
    assert(out(("view", "purchase")) == ((20L, 20L)), out.toString)
    assert(out(("purchase", "view")) == ((40L, 40L)), out.toString)
  }

  test("theta A-NOT-B estimates land in a loose k=64 envelope on real pairs") {
    import spark.implicits._
    val out = SparkEntry.queries("evt_kmv_diff")(spark, sf).collect()
    assert(out.nonEmpty)
    // difference error grows as the kept sample shrinks; gate pairs
    // with real support, like the intersection envelope
    out.filter(r => r.getAs[Long]("n_exact") >= 50 &&
        r.getAs[Long]("n_kept") >= 10).foreach { r =>
      val est = r.getAs[Long]("n_est").toDouble
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - exact) / exact < 0.6,
        s"${r.getAs[String]("type_a")}∖${r.getAs[String]("type_b")}: " +
          s"est $est vs exact $exact strayed >60%")
    }
  }

  test("theta union is EXACT while both sketches are underfull") {
    import spark.implicits._
    // planted overlap: view = 1..40, purchase = 21..80, union 80 —
    // underfull sketches (θ = M) retain their whole sets, so the
    // pooled-distinct union estimate is exact
    val rows = ((1L to 40L).map(u => ("view", u)) ++
      (21L to 80L).map(u => ("purchase", u)))
      .zipWithIndex.map { case ((t, u), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          u, t, 1.0, "{}")
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_thetaunion").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("evt_kmv_union")(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_est"), r.getAs[Long]("n_exact"))).toMap
    assert(out.size == 1, s"expected one undirected pair, got $out")
    assert(out(("purchase", "view")) == ((80L, 80L)), out.toString)
  }

  test("theta union estimates land in a loose k=64 envelope on real pairs") {
    import spark.implicits._
    val out = SparkEntry.queries("evt_kmv_union")(spark, sf).collect()
    assert(out.nonEmpty)
    out.filter(r => r.getAs[Long]("n_exact") >= 50 &&
        r.getAs[Long]("n_union") >= 10).foreach { r =>
      val est = r.getAs[Long]("n_est").toDouble
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - exact) / exact < 0.6,
        s"${r.getAs[String]("type_a")}∪${r.getAs[String]("type_b")}: " +
          s"est $est vs exact $exact strayed >60%")
    }
  }

  test("histogram quantile error is bounded by one bucket width") {
    import spark.implicits._
    val got = SparkEntry.queries("evt_quantile_hist")(spark, sf).collect()
    val byType = Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).map { case (t, rows) =>
        t -> rows.map(_.getDouble(1)).sorted
      }
    got.foreach { r =>
      val vals = byType(r.getAs[String]("event_type"))
      val p = r.getAs[Int]("p")
      val t = (vals.length * p + 99) / 100 // ceil(p·n/100), integer
      val exact = vals(t - 1)
      val est = r.getAs[Double]("q_est")
      // the estimate is the upper edge of the target value's bucket
      assert(est - exact > 0 && est - exact <= 0.25,
        s"${r.getAs[String]("event_type")} p$p: est $est vs exact $exact")
    }
  }
}
