package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch guarantees beyond what evt_cms_topk's oracle
  * gates (the oracle replays the sketch for the top-15 probes; this
  * pins the estimator's LAWS): the one-sided est >= true bound must
  * hold for EVERY key, and the counter relation must merge across
  * disjoint slices by plain addition. */
class CmsSpec extends AnyFunSuite {
  import TestSpark._

  private val params = Seq((2654435761L, 97L), (2246822519L, 1031L),
    (3266489917L, 193L), (668265263L, 769L))

  private def buckets(u: org.apache.spark.sql.Column) = explode(array(
    params.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("r"),
        ((((u % 2147483647L) * a + b) % 2147483647L) % 2048L).as("bkt"))
    }: _*))

  private def sketchOf(ev: DataFrame): DataFrame = {
    import spark.implicits._
    ev.select(buckets($"user_id").as("p")).select($"p.r", $"p.bkt")
      .groupBy($"r", $"bkt").agg(count(lit(1)).as("c"))
  }

  test("estimate >= true count for EVERY user, not just heavy hitters") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select($"user_id")
    val sketch = sketchOf(ev)
    val truth = ev.groupBy($"user_id").agg(count(lit(1)).as("n_true"))
    val under = truth
      .select($"user_id", $"n_true", buckets($"user_id").as("p"))
      .select($"user_id", $"n_true", $"p.r", $"p.bkt")
      .join(sketch, Seq("r", "bkt"))
      .groupBy($"user_id", $"n_true").agg(min($"c").as("n_est"))
      .filter($"n_est" < $"n_true")
    assert(under.count() == 0,
      "Count-Min underestimated a key — the one-sided bound is broken")
  }

  test("probing an unseen key reports n_est = 0, not a missing row") {
    import spark.implicits._
    // the counter relation is sparse (absent cell = 0): a key the
    // sketch never ingested must still come back — with estimate 0 —
    // or a caller iterating probe results reads "no answer" where
    // the sketch's answer is "count 0"
    val ev = Tables.events(spark, sf).select($"user_id")
    val counters = graft.streaming.Sketches.cmsBuild(ev, "user_id")
      .localCheckpoint(true)
    val unseen = Seq(-987654321L, -5L).toDF("user_id")
    val probed = graft.streaming.Sketches.cmsProbe(counters, unseen, "user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probed.keySet == Set(-987654321L, -5L),
      s"unseen keys vanished from the probe: $probed")
    // negative affine hashes can still collide with live buckets, so
    // the bound is est >= 0 with at least the row PRESENT; for these
    // two keys at this corpus the cells are empty in practice, but
    // the contract under test is presence + the one-sided floor
    assert(probed.values.forall(_ >= 0L))
  }

  test("sketches of disjoint slices merge by counter addition") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select($"user_id", $"event_id")
    val a = sketchOf(ev.filter($"event_id" % 2 === 0))
    val b = sketchOf(ev.filter($"event_id" % 2 =!= 0))
    val merged = a.unionByName(b)
      .groupBy($"r", $"bkt").agg(sum($"c").as("c"))
    val whole = sketchOf(ev)
    val diff = merged.join(whole.withColumnRenamed("c", "cw"),
        Seq("r", "bkt"), "full")
      .filter($"c".isNull || $"cw".isNull || $"c" =!= $"cw")
    assert(diff.count() == 0,
      "summed slice sketches differ from the whole-corpus sketch")
  }
}
