package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch algebra — the PRODUCTION entry points behind the
  * sketch gates (evt_cms_topk, evt_kmv_distinct/intersect,
  * st_stream_cms/kmv). The gates compose these with EXACT witnesses
  * (corpus-wide counts/self-joins) so the DuckDB oracle can pin the
  * sketch math; production callers use the sketch-only paths here,
  * whose plans never touch the corpus once a sketch exists — the whole
  * point of a sketch at 100 TB is that everything downstream of the
  * one build scan runs on ≤ d·w or ≤ k·L rows. PlanSpec pins that
  * property (no file scan, no corpus self-join, in any sketch-only
  * plan).
  *
  * Hashes are integer affine maps mod 2^31 so the oracle replays the
  * sketches bit-for-bit (the evt_cms_topk contract); a production key
  * wider than ~31 bits swaps in xxhash64 — same plans, rows-only gate.
  */
object Sketches {

  /** Modulus of the affine hash family (2^31 − 1, prime). */
  val M = 2147483647L

  // ---- Count-Min (Cormode & Muthukrishnan 2005) ----------------------

  /** CMS row-hash parameters: d=4 affine maps, w=2048 buckets. */
  private[streaming] val CmsParams = Seq((2654435761L, 97L), (2246822519L, 1031L),
    (3266489917L, 193L), (668265263L, 769L))

  /** The d (row, bucket) cells a key hashes to, as an exploded column. */
  def cmsRowBuckets(u: Column): Column = explode(array(
    CmsParams.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("r"),
        ((((u % M) * a + b) % M) % 2048L).as("bkt"))
    }: _*))

  /** Build the d×w counter relation in ONE scan of `keys` (map-side
    * combine; the sketch IS a (r, bkt) → count relation, so merging
    * across partitions/streams/days is counter ADDITION — see
    * [[cmsMerge]]). */
  def cmsBuild(keys: DataFrame, keyCol: String): DataFrame =
    keys.select(cmsRowBuckets(col(keyCol)).as("p"))
      .select(col("p.r"), col("p.bkt"))
      .groupBy(col("r"), col("bkt")).agg(count(lit(1)).as("c"))

  /** CMS merge law: counter addition over any number of sketches. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("c"))

  /** SKETCH-ONLY frequency probe: estimate counts for CALLER-SUPPLIED
    * keys (est = min over the d probed counters; one-sided, est ≥
    * true). Extra columns on `keys` ride through. The plan touches
    * only the ≤ d·w counter rows and the key frame — never the corpus
    * the sketch was built from. The counter relation is SPARSE
    * (absent cell = count 0), so the probe LEFT-joins and coalesces:
    * a key the sketch never saw reports n_est = 0 — an inner join
    * would silently DROP it, breaking the est ≥ true contract for
    * unseen keys (the gate witnesses only ever probe guaranteed-heavy
    * keys, so only a spec can see this). */
  def cmsProbe(counters: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val kcols = keys.columns.toSeq
    keys.select(kcols.map(col) :+ cmsRowBuckets(col(keyCol)).as("p"): _*)
      .select(kcols.map(col) :+ col("p.r") :+ col("p.bkt"): _*)
      .join(counters, Seq("r", "bkt"), "left_outer")
      .groupBy(kcols.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("n_est"))
  }

  // ---- KMV / bottom-k distincts (Bar-Yossef et al. 2002; theta set
  //      operations per Dasgupta et al. 2016) -------------------------

  /** The affine KMV hash (uniform on [0, M) for keys < M). */
  def kmvHash(key: Column): Column = ((key % M) * 2654435761L + 97L) % M

  /** Per-group bottom-k sketch over the DISTINCT hashed key set — the
    * one corpus pass. Bounded-heap top-k per group (ascending), so
    * driver/executor state is ≤ k rows per group at any corpus size;
    * merge = bottom-k of pooled bottom-k's (KmvHistSketchSpec pins the
    * law). */
  def kmvSketch(rows: DataFrame, keyCol: String, groupCols: Seq[String],
                k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hashed = rows
      .select(groupCols.map(col) :+ kmvHash(col(keyCol)).as("h"): _*)
      .distinct()
    graft.plans.TopK.perGroup(hashed, groupCols, Seq(("h", false)), k)
  }

  /** SKETCH-ONLY distinct estimate per group: (k−1)·M / h_k once the
    * heap saturates; an underfull sketch has seen its whole set, so
    * its estimate IS the seen count. */
  def kmvEstimate(bottom: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    bottom.groupBy(groupCols.map(col): _*)
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_eff"))
      .select(groupCols.map(col) ++ Seq(col("k_eff"), col("h_k"),
        expr(s"case when k_eff < $k then k_eff " +
          s"else (${k - 1} * ${M}L) div greatest(h_k, 1L) end").as("n_est")): _*)

  /** SKETCH-ONLY pairwise intersections across the sketch's groups —
    * the theta-sketch set operation: |A∩B| ≈ |{h ∈ A∩B : h < θ}|·M/θ,
    * θ = min(θ_A, θ_B). Every relation here is ≤ k·L rows (L = group
    * count): the theta frame, the all-pairs cross (L² tiny rows — so
    * zero-overlap pairs still report 0, not absence), and the match
    * join. Output: (g_a, g_b, n_match, n_est) for g_a < g_b. */
  def kmvIntersect(bottom: DataFrame, groupCol: String, k: Int): DataFrame = {
    val theta = bottom.groupBy(col(groupCol))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_eff"))
      .select(col(groupCol),
        expr(s"case when k_eff < $k then ${M}L else h_k end").as("theta"))
    val pairs = theta.select(col(groupCol).as("g_a"), col("theta").as("th_a"))
      .crossJoin(theta.select(col(groupCol).as("g_b"), col("theta").as("th_b")))
      .filter(col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), least(col("th_a"), col("th_b")).as("theta"))
    val matches = bottom.select(col(groupCol).as("g_a"), col("h"))
      .join(bottom.select(col(groupCol).as("g_b"), col("h")), Seq("h"))
      .filter(col("g_a") < col("g_b"))
      .join(pairs, Seq("g_a", "g_b"))
      .filter(col("h") < col("theta"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_match"))
    pairs.join(matches, Seq("g_a", "g_b"), "left_outer")
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        expr(s"(coalesce(n_match, 0L) * ${M}L) div theta").as("n_est"))
  }

  /** [[kmvIntersect]] for sketches keyed by 32-char lowercase MD5 hex
    * strings (`h` column) — the variant for set elements WIDER than
    * ~31 bits that still has to replay in an oracle: fixed-width hex
    * sorts lexicographically exactly as it compares numerically, so
    * the bottom-k heap, θ = min(θ_A, θ_B), and the h < θ match cut
    * all run on the strings; only the final M/θ scaling needs a
    * number, parsed from θ's first 12 hex digits (M = 2^48 — the
    * estimate's precision, not the sketch's). An underfull sketch
    * takes θ = "g" (greater than every hex string) and θ_num = M, so
    * its estimates stay exact. */
  def kmvIntersectHex(bottom: DataFrame, groupCol: String, k: Int): DataFrame = {
    val M = 1L << 48
    def hexVal(c: String): Column =
      (1 to 12).map { i =>
        (expr(s"position(substring($c, $i, 1), '0123456789abcdef')") - 1)
          .cast("long") * lit(1L << (4 * (12 - i)))
      }.reduce(_ + _)
    val theta = bottom.groupBy(col(groupCol))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_eff"))
      .select(col(groupCol),
        when(col("k_eff") < k, lit("g")).otherwise(col("h_k")).as("theta"),
        when(col("k_eff") < k, lit(M)).otherwise(hexVal("h_k")).as("theta_num"))
    val pairs = theta.select(col(groupCol).as("g_a"),
        col("theta").as("th_a"), col("theta_num").as("tn_a"))
      .crossJoin(theta.select(col(groupCol).as("g_b"),
        col("theta").as("th_b"), col("theta_num").as("tn_b")))
      .filter(col("g_a") < col("g_b"))
      // least() picks consistently across the string/numeric forms:
      // lexicographic order on fixed-width hex IS numeric order, and
      // a tie in the first 12 digits leaves theta_num equal either way
      .select(col("g_a"), col("g_b"),
        least(col("th_a"), col("th_b")).as("theta"),
        least(col("tn_a"), col("tn_b")).as("theta_num"))
    val matches = bottom.select(col(groupCol).as("g_a"), col("h"))
      .join(bottom.select(col(groupCol).as("g_b"), col("h")), Seq("h"))
      .filter(col("g_a") < col("g_b"))
      .join(pairs, Seq("g_a", "g_b"))
      .filter(col("h") < col("theta"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_match"))
    pairs.join(matches, Seq("g_a", "g_b"), "left_outer")
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        expr(s"(coalesce(n_match, 0L) * ${M}L) div theta_num").as("n_est"))
  }
}
