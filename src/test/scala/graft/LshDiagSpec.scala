package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape guard for embedding near-dup bucketing. On clustered
  * embeddings, sign-LSH candidate volume is quadratic — cluster
  * members lie on the same side of nearly every hyperplane, so buckets
  * grow with the corpus (measured on the real tables in r8: 2000
  * vectors → 85k candidate pairs, 20000 → 8.56M, and dd_embedding ran
  * 46× slower on 10× data). Dedup.embeddingDups therefore buckets by
  * k-means centroid with list count ∝ corpus (Ann.clusterAssign);
  * this spec pins the two properties that design owes:
  * near-linear candidate growth and exact-copy recall. */
class LshDiagSpec extends AnyFunSuite {
  import TestSpark._

  /** `n` vectors in 20 tight gaussian clusters, dim 32, seeded. */
  private def clustered(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(20, 32)(rnd.nextGaussian())
    (0 until n).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def candPairs(df: org.apache.spark.sql.DataFrame,
                        targetListSize: Int = 64,
                        maxLists: Int = 4096): Long =
    graft.similarity.Ann.clusterAssign(df, "vec_id", "embedding",
        targetListSize, nprobe = 2, maxLists = maxLists)
      .filter(col("arank") === 1)
      .groupBy("cluster").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)

  test("cluster-bucketed candidate volume grows ~linearly, not quadratically") {
    val small = candPairs(clustered(1000, 7))
    val big = candPairs(clustered(5000, 7))
    info(s"cand_pairs: n=1000 -> $small, n=5000 -> $big")
    // linear growth = 5×; sign-LSH on this corpus would give 25× (its
    // 20 occupied buckets just grow with n). Allow 2× headroom for
    // k-means imbalance.
    assert(big < 10L * small,
      s"candidate volume grew ${big.toDouble / small}× on 5× data — quadratic")
  }

  test("two-level quantizer lifts the flat maxLists cap: lists keep growing ∝ corpus") {
    // neededK = 4000/8 = 500 ≫ maxLists=16 → the two-level branch; a
    // flat fit capped at 16 lists would hold ~250 rows per list
    val assign = graft.similarity.Ann.clusterAssign(
      clustered(4000, 13), "vec_id", "embedding",
      targetListSize = 8, nprobe = 2, maxLists = 16)
    val sizes = assign.filter(col("arank") === 1)
      .groupBy("cluster").count().select("count")
      .collect().map(_.getLong(0))
    info(s"two-level: ${sizes.length} lists, max occupancy ${sizes.max}")
    assert(sizes.length > 16L,
      s"only ${sizes.length} lists — the cap was not lifted")
    assert(assign.filter(col("arank") === 1).count() == 4000L,
      "every row must get exactly one primary assignment")
    // occupancy stays list-sized, not cap-bound-sized (headroom for
    // k-means imbalance on 20 natural clusters vs 500 target lists)
    assert(sizes.max < 250L,
      s"max list ${sizes.max} ≈ n/maxLists — rows still pile into capped lists")
  }

  test("two-level candidate volume grows ~linearly, like the flat path") {
    val small = candPairs(clustered(1000, 7), targetListSize = 8, maxLists = 16)
    val big = candPairs(clustered(5000, 7), targetListSize = 8, maxLists = 16)
    info(s"two-level cand_pairs: n=1000 -> $small, n=5000 -> $big")
    assert(big < 10L * small,
      s"candidate volume grew ${big.toDouble / small}× on 5× data — quadratic")
  }

  test("two-level: exact copies share their primary list (recall 1 by construction)") {
    import spark.implicits._
    val base = clustered(2000, 11)
    val copies = base.filter($"vec_id" < 8)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val assign = graft.similarity.Ann.clusterAssign(
        base.unionByName(copies), "vec_id", "embedding",
        targetListSize = 8, nprobe = 2, maxLists = 16)
      .filter(col("arank") === 1)
      .select($"vid", $"cluster")
    val byId = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 8L).foreach { i =>
      assert(byId(i) == byId(i + 1000000L),
        s"copy of $i landed in list ${byId(i + 1000000L)} != ${byId(i)}")
    }
  }

  test("exact copies always land in one list: recall 1 by construction") {
    import spark.implicits._
    val base = clustered(2000, 11)
    val copies = base.filter($"vec_id" < 8)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val dups = graft.dedup.Dedup.embeddingDups(
        base.unionByName(copies), "vec_id", "embedding", threshold = 0.999)
      .filter($"id_b" >= 1000000L && $"id_a" === $"id_b" - 1000000L)
    assert(dups.count() == 8, "a planted exact copy was not recovered")
  }
}
