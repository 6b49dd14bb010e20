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

  /** SKETCH-ONLY pairwise DIFFERENCE across the sketch's groups — the
    * theta-sketch A-NOT-B operation (the DataSketches AnotB), closing
    * the set algebra beside [[kmvEstimate]] (cardinality) and
    * [[kmvIntersect]] (∩): |A∖B| ≈ |{h ∈ A : h < θ ∧ h ∉ B}| · M/θ,
    * θ = min(θ_A, θ_B). Below θ each sketch retains EVERY hash of its
    * distinct set, so sketch membership IS set membership on the
    * surviving region and the anti-join is exact there — the same
    * argument that makes the intersection unbiased. DIRECTED pairs
    * (g_a ≠ g_b — A∖B and B∖A differ); every relation ≤ k·L rows, so
    * the pairwise matrix never rescans the corpus. */
  def kmvDifference(bottom: DataFrame, groupCol: String, k: Int): DataFrame = {
    val theta = bottom.groupBy(col(groupCol))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_eff"))
      .select(col(groupCol),
        expr(s"case when k_eff < $k then ${M}L else h_k end").as("theta"))
    val pairs = theta.select(col(groupCol).as("g_a"), col("theta").as("th_a"))
      .crossJoin(theta.select(col(groupCol).as("g_b"), col("theta").as("th_b")))
      .filter(col("g_a") =!= col("g_b"))
      .select(col("g_a"), col("g_b"),
        least(col("th_a"), col("th_b")).as("theta"))
    val kept = bottom.select(col(groupCol).as("g_a"), col("h"))
      .join(pairs, Seq("g_a"))
      .filter(col("h") < col("theta"))
      .join(bottom.select(col(groupCol).as("g_b"), col("h")),
        Seq("g_b", "h"), "left_anti")
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_kept"))
    pairs.join(kept, Seq("g_a", "g_b"), "left_outer")
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        expr(s"(coalesce(n_kept, 0L) * ${M}L) div theta").as("n_est"))
  }

  /** SKETCH-ONLY pairwise UNION across the sketch's groups — the
    * theta-sketch Union (the op DataSketches builds the whole theta
    * framework around), completing the visible set algebra beside
    * [[kmvEstimate]] (cardinality), [[kmvIntersect]] (∩) and
    * [[kmvDifference]] (∖): |A∪B| ≈ |{distinct h ∈ A∪B : h < θ}|·M/θ,
    * θ = min(θ_A, θ_B). Below the COMMON θ each sketch retains every
    * hash of its distinct set, so the pooled-distinct count on the
    * surviving region is the exact union cardinality of the sampled
    * region — the same membership argument as the other two ops.
    * Underfull pairs (both θ = M) are EXACT. Every relation is
    * sketch-bounded (≤ k·L pooled rows per pair side); the corpus is
    * never rescanned per pair. Output (g_a, g_b, n_union, n_est) for
    * g_a < g_b. */
  def kmvUnion(bottom: DataFrame, groupCol: String, k: Int): DataFrame = {
    val theta = bottom.groupBy(col(groupCol))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_eff"))
      .select(col(groupCol),
        expr(s"case when k_eff < $k then ${M}L else h_k end").as("theta"))
    val pairs = theta.select(col(groupCol).as("g_a"), col("theta").as("th_a"))
      .crossJoin(theta.select(col(groupCol).as("g_b"), col("theta").as("th_b")))
      .filter(col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), least(col("th_a"), col("th_b")).as("theta"))
    val left = bottom.select(col(groupCol).as("g_a"), col("h"))
      .join(pairs, Seq("g_a"))
      .filter(col("h") < col("theta"))
      .select(col("g_a"), col("g_b"), col("h"))
    val right = bottom.select(col(groupCol).as("g_b"), col("h"))
      .join(pairs, Seq("g_b"))
      .filter(col("h") < col("theta"))
      .select(col("g_a"), col("g_b"), col("h"))
    val pooled = left.unionByName(right).distinct()
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_union"))
    pairs.join(pooled, Seq("g_a", "g_b"), "left_outer")
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_union"), lit(0L)).as("n_union"),
        expr(s"(coalesce(n_union, 0L) * ${M}L) div theta").as("n_est"))
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

  // ---- KLL-family quantile sketch (Karnin, Lang & Liberty 2016) ------
  //
  // The mergeable BOUNDED-RANK quantile family beside the equi-width
  // histogram (evt_quantile_hist): compactor levels where level ℓ
  // halves its input and doubles the survivors' weight, sketch size
  // O(cap) per group at ANY n, rank error bounded in units of n/cap.
  // Spark-first + oracle-replayable adaptation: classic KLL flips a
  // COIN per compaction (not replayable across engines, and the
  // result depends on arrival order); here the compaction decision is
  // the item's own affine ROW-HASH — an item survives compactor ℓ iff
  // bit ℓ of h(id) is 0, so survival to level L ⇔ h(id) mod 2^L == 0.
  // That makes the levels NESTED (the level-L+1 sample ⊆ the level-L
  // sample), the construction ORDER-INDEPENDENT (merge = union + a
  // pure re-filter to the merged level — the compactor-merge law with
  // no state to carry), and the whole sketch a two-expression SQL
  // replay (the evt_kmv recipe). Trade, stated honestly: the rank
  // error becomes probabilistic over the hash family (±O(√(n/2^L))
  // per level, the standard Bernoulli-compaction envelope KllSpec
  // pins empirically) instead of KLL's coin-flip-unbiased guarantee;
  // a production id wider than ~31 bits swaps xxhash64 in (same
  // plans, rows-only gate).

  /** Compaction depth for a group of `n` items under a `cap`-item
    * budget: the smallest L with ceil(n / 2^L) <= cap, computed with
    * INTEGER arithmetic only — L = bitlength((n−1) div cap) — so
    * every engine derives the identical level (a log2 double could
    * round differently at the boundaries). bin() exists in both
    * Spark and DuckDB. */
  def kllLevel(n: Column, cap: Int): Column =
    // (n−1) div cap via explicit floor(): Spark's `/` on longs is
    // DOUBLE division, and a bare double→int CAST diverges across
    // engines (Spark truncates, DuckDB rounds) — floor() is the one
    // form both define identically
    when(n <= cap, lit(0))
      .otherwise(length(bin(floor((n - 1) / cap).cast("long"))).cast("int"))

  /** One-pass sketch build: (group..., value, h, n, lvl, w) with ≤ cap
    * sampled rows per group — the single corpus scan (count + filter;
    * the survivor filter needs the group's exact n for its level, the
    * same n KLL itself tracks for rank arithmetic). */
  def kllSketch(rows: DataFrame, valueCol: String, idCol: String,
                groupCols: Seq[String], cap: Int = 256): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val counts = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("lvl", kllLevel(col("n"), cap))
    val hashed = rows.select(groupCols.map(col) ++ Seq(
      col(valueCol).as("value"), kmvHash(col(idCol)).as("h")): _*)
    hashed.join(broadcast(counts), groupCols)
      .withColumn("w", expr("cast(pow(2, lvl) as bigint)"))
      .filter(col("h") % col("w") === 0L)
  }

  /** Compactor-merge law: union the sketch frames, re-derive the
    * merged group sizes and level, and RE-FILTER — the nested-sample
    * property makes the finer filter a pure subset selection, so a
    * streaming fold of per-batch sketches equals the batch sketch
    * bit-for-bit (KllSpec pins the law). */
  def kllMerge(sketches: Seq[DataFrame], groupCols: Seq[String],
               cap: Int = 256): DataFrame = {
    // per-SKETCH group sizes first (n is constant over one sketch's
    // group rows, so the within-sketch distinct is exact) — a distinct
    // over the UNION would collapse two sketches that happen to carry
    // identical (group, n) pairs and undercount the merged n
    val merged = sketches.map(s =>
        s.select(groupCols.map(col) :+ col("n"): _*).distinct())
      .reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*).agg(sum(col("n")).as("n"))
      .withColumn("lvl", kllLevel(col("n"), cap))
    sketches.reduce(_ unionByName _)
      .drop("n", "lvl", "w")
      .join(broadcast(merged), groupCols)
      .withColumn("w", expr("cast(pow(2, lvl) as bigint)"))
      .filter(col("h") % col("w") === 0L)
  }

  /** SKETCH-ONLY quantile estimates: for each requested integer
    * percentile p, the smallest sampled value whose cumulative weight
    * reaches p% of the group's n — integer rank arithmetic
    * (100·cumw ≥ p·n, the evt_quantile_hist rule) and RAW data values
    * (no interpolation), so the estimates replay bit-for-bit. Windows
    * run over the ≤ cap sampled rows per group, never the corpus. */
  def kllQuantiles(sketch: DataFrame, groupCols: Seq[String],
                   ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 100),
      s"percentiles must be in (0, 100], got $ps")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("value"), col("h"))
    val cum = sketch.withColumn("cumw", sum(col("w")).over(w))
      // the sample's total weight tracks n but need not reach it (the
      // last compactor's survivors are a hash draw) — clamp the rank
      // target to it so a tail percentile still resolves to the
      // largest sampled value instead of vanishing
      .withColumn("totw", sum(col("w")).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val pFrame = sketch.sparkSession.range(1)
      .select(explode(array(ps.map(lit): _*)).as("p"))
    cum.crossJoin(broadcast(pFrame))
      .filter(col("cumw") * 100 >= least(col("p") * col("n"),
        col("totw") * 100))
      .groupBy(groupCols.map(col) :+ col("p"): _*)
      .agg(min(col("value")).as("q_est"))
  }
}
