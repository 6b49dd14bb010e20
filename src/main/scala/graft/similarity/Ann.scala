package graft.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2
  * "similarity search").
  *
  * Two paths, same contract:
  *  - `bruteTopK`: exact cosine top-k, O(|Q|·N). The query set is
  *    broadcast; the corpus streams through codegen'd vector math —
  *    the right baseline when |Q| is small, at any corpus size.
  *  - `lshTopK`: hyperplane-LSH bucketed ANN — the 100 TB path.
  *    Corpus is hash-partitioned by bucket; a query only scans its
  *    own bucket (candidate set ~ N/2^bits), trading recall for a
  *    2^bits scan reduction. Recall for near-identical vectors is ~1
  *    (they share all sign bits).
  *
  * Scores are rounded to 3 dp before ranking so rankings reproduce
  * bit-for-bit across engines (float32 vs float64 ~1e-8 noise);
  * ties break on neighbor id.
  */
object Ann {

  def bruteTopK(embs: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = embs.select(col(idCol).as("nn"), col(vecCol).as("v"))
      .crossJoin(broadcast(q))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }

  /** Radius (range) search: ALL neighbors with cosine ≥ tau per
    * query — the retrieval mode top-k cannot express ("everything
    * this similar", near-dup audits, recall-complete candidate
    * pulls), with an UNBOUNDED per-query result the caller thresholds
    * rather than truncates. Same broadcast-query scan as
    * [[bruteTopK]]; no rank stage — the τ-filter IS the result
    * bound, so the plan needs no per-group heap at all. */
  def bruteRadius(embs: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, tau: Double): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    embs.select(col(idCol).as("nn"), col(vecCol).as("v"))
      .crossJoin(broadcast(q))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
      .filter(col("score") >= tau)
      .select(col("qid"), col("nn"), col("score"))
  }

  /** EXACT radius search served from the persisted IVF index — the
    * FAISS range-search recipe: a fixed nprobe cannot bound a τ-ball
    * (RADIUS recall depends on how many lists the ball spans, not on
    * k), so the probe set comes from the triangle inequality instead.
    * On the unit sphere cos(a,b) ≥ t ⟺ ‖â−b̂‖ ≤ √(2−2t), and for any
    * member v of list c, ‖q̂−ĉ‖ ≤ ‖q̂−v̂‖ + ‖v̂−ĉ‖ — so probing every
    * list with ‖q̂−ĉ‖ ≤ r + R_c (R_c = the list's max member-to-
    * centroid distance, an index-maintenance-time statistic) provably
    * covers every qualifying neighbor: recall 1.0 BY CONSTRUCTION,
    * precision exact from the post-probe cosine re-verification —
    * which is what lets this index-served plan share the brute scan's
    * FULL SQL oracle. All distances derive from the shared cosine
    * kernel (√(2−2cos) — no separate normalization pass), with the
    * τ-margin widened by the 3-dp score rounding so a round-up at the
    * boundary can't escape the bound. Pruning power is the corpus's
    * clustering structure: tight lists (R_c small) prune hard,
    * unstructured corpora degrade toward a verified full scan — the
    * honest range-search contract (RecallGateSpec pins both: brute
    * equality on the gate corpus, genuine pruning on a clustered
    * one). */
  def ivfRadius(idx: IvfIndex, queries: DataFrame, idCol: String,
                vecCol: String, tau: Double): DataFrame = {
    val probes = radiusProbes(idx,
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv")), tau)
    idx.assigned
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
      .filter(col("score") >= tau)
      // an entry listed twice (secondary assignments) must not emit
      // its pair twice when both lists are probed
      .dropDuplicates("qid", "nn")
      .select(col("qid"), col("nn"), col("score"))
  }

  /** The triangle-bound probe set for [[ivfRadius]] — (qid, qv,
    * cluster) rows for every list a τ-ball can intersect. Exposed so
    * RadiusSpec can pin the PRUNING claim (a clustered corpus probes
    * a fraction of its lists) separately from the correctness claim
    * (the gate's full oracle). */
  private[graft] def radiusProbes(idx: IvfIndex, q: DataFrame,
                                  tau: Double): DataFrame = {
    // round(cos,3) ≥ τ admits exact cos ≥ τ − 5e-4; 1e-9 absorbs
    // float noise in the distance arithmetic
    val r = math.sqrt(math.max(0.0, 2.0 - 2.0 * (tau - 0.0005))) + 1e-9
    // the snapshot statistic comes WITH the index when the caller
    // memoized/persisted it; the inline fallback recomputes (one
    // map-side-combining pass over the entries) for ad-hoc indexes
    val listStats = idx.listRadii
      .getOrElse(listRadiiOf(idx.assigned, idx.centroids))
    q.crossJoin(broadcast(idx.centroids.join(listStats, Seq("cluster"))))
      .filter(sphereDist(col("qv"), col("centroid")) <= lit(r) + col("rc"))
      .select(col("qid"), col("qv"), col("cluster"))
  }

  /** Filtered vector search: each query's neighbors are restricted to
    * corpus rows whose `attrCol` equals the query's own — the
    * "search within my tenant / language / shard" shape every
    * production vector store serves. The constraint composes BEFORE
    * scoring as the JOIN KEY (corpus ⋈ broadcast queries on the
    * attribute): only matching rows ever reach the cosine kernel, so
    * the filter prunes the scan instead of post-filtering a shortlist
    * (post-filtering an ANN result loses recall when the constraint is
    * selective — the top-k among label=x is NOT the label=x subset of
    * the global top-k). At 100 TB the same plan rides attribute
    * partitioning/bucketing: the hash join's probe side prunes to the
    * queried labels' partitions, and a selective attribute makes this
    * EXACT search cheaper than an unfiltered ANN probe. */
  def filteredTopK(embs: DataFrame, idCol: String, vecCol: String,
                   attrCol: String, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      col(attrCol).as("qattr"))
    val scored = embs.select(col(idCol).as("nn"), col(vecCol).as("v"),
        col(attrCol).as("attr"))
      .join(broadcast(q), col("attr") === col("qattr"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }

  /** MMR-diversified retrieval (Carbonell & Goldstein 1998, SIGIR —
    * maximal marginal relevance): greedily re-rank a relevance
    * shortlist so each pick balances relevance against redundancy
    * with what's already picked — mmr(c) = λ·rel(c) −
    * (1−λ)·max_{s∈picked} sim(c, s). The standard diversification
    * pass over any retrieval shortlist (search results, RAG context
    * selection, eval-set sampling).
    *
    * Scale shape: the EXPENSIVE part is the relevance shortlist —
    * the same broadcast-query scan + bounded-heap reduction as
    * bruteTopK (swap in an index-served shortlist at 100 TB; MMR
    * composes with any of them). The greedy selection then touches
    * only `shortlist` rows per query: a typed fold over bounded
    * groups (the packing-fold contract — never a driver loop), with
    * all pairwise similarity confined to the ≤shortlist² in-group
    * pairs. Determinism across engines: relevance and pairwise sims
    * round to 3 dp (Spark Round = BigDecimal HALF_UP — replicated
    * exactly in the fold), the λ-combination rounds to 4 dp BEFORE
    * each argmax (3-dp inputs × 1-dp λ make every mmr an exact 4-dp
    * decimal, so exact ties are common and must not be left to
    * sub-ulp noise — engines fold 1−λ differently), ties break on
    * neighbor id.
    */
  def mmrTopK(embs: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, shortlist: Int, k: Int,
              lambda: Double): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = embs.select(col(idCol).as("nn"), col(vecCol).as("v"))
      .crossJoin(broadcast(q))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    val short = graft.plans.TopK.perGroup(
      scored.select(col("qid"), col("nn"), col("score"), col("v")),
      Seq("qid"), Seq(("score", true), ("nn", false)), shortlist)
    mmrRerank(short, k, lambda)
  }

  /** MMR over an INDEX-served shortlist — the 100 TB composition:
    * the relevance candidates come from the persisted IVF index's
    * coarse-quantizer probe (sublinear, like ivfSearch) instead of
    * the exact corpus scan, and the same bounded greedy fold
    * diversifies them. k-means lists aren't SQL-replicable, so the
    * gate is rows-only; MmrSpec pins rank-1 agreement with ivfSearch
    * and shortlist containment. */
  def mmrAnnTopK(idx: IvfIndex, queries: DataFrame, idCol: String,
                 vecCol: String, shortlist: Int, k: Int, lambda: Double,
                 nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probes = coarseProbes(idx.centroids, q, nprobe, keep = Seq("qv"))
    val scored = idx.assigned
      .join(broadcast(probes.select(col("qid"), col("qv"), col("cluster"))),
        Seq("cluster"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    val short = graft.plans.TopK.perGroup(
      scored.select(col("qid"), col("nn"), col("score"), col("v")),
      Seq("qid"), Seq(("score", true), ("nn", false)), shortlist)
    mmrRerank(short, k, lambda)
  }

  /** The shared greedy selection over a bounded (qid, nn, score, v)
    * shortlist — see [[mmrTopK]] for the determinism contract. */
  private[similarity] def mmrRerank(short: DataFrame, k: Int,
                                    lambda: Double): DataFrame = {
    val spark = short.sparkSession
    import spark.implicits._
    // the typed fold below carries ids as Long — guard here, where
    // EVERY mmr entry point (exact-scan and index-served alike)
    // flows through, so a string/UUID id fails at plan-construction
    // time with this message instead of an opaque
    // non-nullable-encoder error deep inside the fold
    Seq("qid", "nn").foreach { c =>
      import org.apache.spark.sql.types._
      val dt = short.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"MMR reranking needs an integral id column, $c is $dt")
    }
    def round3(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    short.select(col("qid").cast("long"), col("nn").cast("long"),
        col("score"), col("v").cast("array<double>"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cand = it.map { case (_, nn, s, v) => (nn, s, v.toArray) }
          .toArray.sortBy { case (nn, s, _) => (-s, nn) }
        // pairwise cosine exactly as the scan computes it: sequential
        // double accumulation, zero-norm → 0, 3-dp HALF_UP
        def sim(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < a.length) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
            i += 1
          }
          val denom = math.sqrt(na) * math.sqrt(nb)
          if (denom == 0.0) 0.0 else round3(dot / denom)
        }
        // running max-sim-to-picked per candidate, refreshed with ONLY
        // the newest pick each round — each (candidate, pick) pair is
        // measured once, O(k·n·d) instead of recomputing the whole
        // picked set per candidate per round
        val maxSim = Array.fill(cand.length)(Double.NegativeInfinity)
        val used = new Array[Boolean](cand.length)
        val out = Vector.newBuilder[(Long, Int, Long, Double, Double)]
        var picks = 0
        var exhausted = false
        while (picks < k && !exhausted) {
          var bestI = -1
          var bestMmr = Double.NegativeInfinity
          var i = 0
          while (i < cand.length) {
            if (!used(i)) {
              // redundancy term: max over the PICKED set (can be
              // negative — then it rewards anti-correlation, the
              // textbook formula); 0 only for the empty first pick
              val ms = if (picks == 0) 0.0 else maxSim(i)
              // round to 4 dp BEFORE the argmax: with 3-dp scores and
              // a 1-dp λ every mmr is an EXACT 4-dp decimal, so exact
              // ties are common and sub-ulp noise (engines fold 1−λ
              // differently: decimal vs binary) must not decide them —
              // the 4-dp round lands both engines on the same value
              // and the nn tie-break resolves deterministically
              val mmr = round4(lambda * cand(i)._2 - (1.0 - lambda) * ms)
              // the explicit nn clause IS the oracle's (mmr DESC, nn)
              // row_number tie-break — arrival order alone would pick
              // the higher-RELEVANCE side of an mmr tie instead
              if (mmr > bestMmr ||
                  (mmr == bestMmr && bestI >= 0 && cand(i)._1 < cand(bestI)._1)) {
                bestMmr = mmr; bestI = i
              }
            }
            i += 1
          }
          if (bestI < 0) { exhausted = true }
          else {
          val (nn, rel, v) = cand(bestI)
          used(bestI) = true
          picks += 1
          out += ((qid, picks, nn, rel, bestMmr))
          var j = 0
          while (j < cand.length) {
            if (!used(j)) {
              // an un-deduplicated corpus can carry the picked id
              // twice — retire every candidate with this id, or the
              // same nn could be emitted at two ranks
              if (cand(j)._1 == nn) used(j) = true
              else {
                val sv = sim(cand(j)._3, v)
                if (sv > maxSim(j)) maxSim(j) = sv
              }
            }
            j += 1
          }
          }
        }
        out.result().iterator
      }
      .toDF("qid", "rn", "nn", "score", "mmr")
  }

  /** Bounded-heap reduction (graft.plans.TopKPerGroup) first — never
    * window-sorts the full scored set — then a row_number over the
    * ≤k survivors per query for the rank column. */
  private[similarity] def rank(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val reduced = graft.plans.TopK.perGroup(
      scored.select(col("qid"), col("nn"), col("score")),
      Seq("qid"), Seq(("score", true), ("nn", false)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nn"))
    reduced.withColumn("rn", row_number().over(w))
      .select(col("qid"), col("rn"), col("nn"), col("score"))
  }

  /** An IVF index: the corpus with its coarse-quantizer list
    * assignment (`assigned`: nn, v, cluster) plus the centroid table
    * (`centroids`: cluster, centroid — √N rows, broadcastable). Like
    * the reference's Lucene/bitmap index tables this is a PERSISTED
    * artifact: built once by DDL, consulted by every search. */
  case class IvfIndex(assigned: DataFrame, centroids: DataFrame,
                      listRadii: Option[DataFrame] = None)

  /** Per-list max member-to-centroid distance — the range-search
    * pruning statistic. An index-snapshot property, not a query-time
    * one: callers memoize it per snapshot (QueryCaches) and the
    * production path persists it WITH the index, where CDC
    * maintenance is a max-merge (a new member can only widen its
    * list, so segment radii fold by max). */
  def listRadiiOf(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), Seq("cluster"))
      .groupBy(col("cluster"))
      .agg(max(sphereDist(col("v"), col("centroid"))).as("rc"))

  /** Unit-sphere chord distance from the shared cosine kernel. */
  private def sphereDist(a: Column, b: Column): Column =
    sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) * cosine(a, b)))

  /** IVF index build (the DDL step): k-means coarse quantizer
    * (√N lists), corpus bucketed by nearest centroid. Training reads a
    * bounded SEEDED sample of the corpus — uniform across partitions,
    * so clustered/sorted layouts can't bias the quantizer the way a
    * head-`limit` sample would (limit takes whole leading partitions).
    * Sizing the sample fraction needs the EXACT corpus row count, so
    * this runs one `count()` — metadata-cheap for a bare parquet scan
    * (empty read schema → row-group counts only), a genuine extra
    * pass for filtered/joined inputs. Catalyst plan statistics are NOT
    * a substitute: `stats.rowCount` can be an upper bound (GlobalLimit
    * reports its limit even when the child has far fewer rows) or a
    * stale ANALYZE estimate, and an inflated count silently collapses
    * the training sample. The count pass happens once at index BUILD
    * (the DDL step), never per search; callers feeding a derived plan
    * that is expensive to recompute should stage it first. The
    * fraction targets ~1.2·maxTrain rows and a final limit caps the
    * exact training size. Deterministic under the fixed seed. */
  def buildIvf(embs: DataFrame, idCol: String, vecCol: String,
               maxIter: Int = 2, maxTrain: Int = 50000): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embs.sparkSession
    val corpus0 = embs.select(col(idCol).as("nn"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val n: Long = embs.count()
    val fraction = if (n == 0) 1.0
      else math.min(1.0, maxTrain * 1.2 / n.toDouble)
    val train = corpus0.select("features")
      .sample(withReplacement = false, fraction, seed = 42L)
      .limit(maxTrain).cache()
    val nTrain = train.count()
    // same explicit guard as buildPq: KMeans.fit on a 0-row frame
    // throws an opaque internal MLlib error that never names the cause
    require(nTrain > 0, "buildIvf: no vectors to train on — empty corpus")
    val nlist = math.max(2, math.sqrt(nTrain.toDouble).toInt)
    // random init, not k-means||: the parallel init is itself O(iter)
    // full passes, and an IVF coarse quantizer only needs roughly
    // balanced lists, not converged centroids
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(maxIter)
      .setInitMode("random")
      .fit(train)
    train.unpersist()
    val corpus = model.transform(corpus0)
      .select(col("nn"), col("v"), col("prediction").as("cluster"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq.toDF("cluster", "centroid")
    IvfIndex(corpus, centroids)
  }

  /** Negated squared L2 — the coarse-probe metric. Shared by every
    * IVF-family search so probe behavior can never diverge between
    * them. Native codegen'd kernel (plans.NegL2Expr): corpus-to-
    * centroid assignment in clusterAssign evaluates it n·k times, and
    * the zip_with+aggregate HOF form it replaces ran interpreted
    * per-element lambdas — measured as the dominant cost of the sf1
    * embedding-dedup build. */
  private[similarity] def negL2(a: Column, b: Column): Column =
    graft.plans.HashExpressions.negL2(a, b)

  /** The `nprobe` nearest lists per query row (qid, <keep...>,
    * cluster, cdist). Probes by the SAME metric k-means assigns with
    * (L2), so a query equal to a corpus point always probes that
    * point's list first. `keep` names extra query-side columns to
    * carry through (e.g. qv, centroid). */
  private[similarity] def coarseProbes(centroids: DataFrame, q: DataFrame,
                                       nprobe: Int, keep: Seq[String]): DataFrame =
    graft.plans.TopK.perGroup(
      q.crossJoin(broadcast(centroids))
        .withColumn("cdist", negL2(col("qv"), col("centroid")))
        .select((Seq("qid") ++ keep ++ Seq("cluster", "cdist")).map(col): _*),
      Seq("qid"), Seq(("cdist", true), ("cluster", false)), nprobe)

  /** IVF search: each query scans only its `nprobe` nearest lists —
    * candidate set ~ nprobe·N/√N. The 100 TB path when recall must be
    * tunable (raise nprobe) rather than fixed by hash bits. One
    * broadcast-join pass over the probed lists. */
  def ivfSearch(idx: IvfIndex, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probes = coarseProbes(idx.centroids, q, nprobe, keep = Seq("qv"))
    val scored = idx.assigned
      .join(broadcast(probes.select(col("qid"), col("qv"), col("cluster"))), Seq("cluster"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }

  /** Metadata-filtered IVF search — [[filteredTopK]]'s constraint
    * served from the PERSISTED index instead of the exact scan. The
    * label joins onto the probed candidates and drops cross-label
    * rows BEFORE the cosine kernel and BEFORE ranking (pre-rank
    * semantics: the top-k among label matches within the probed
    * lists — never a post-filter of an unfiltered shortlist).
    *
    * Join ORDER is the scale contract (the reference's index rule,
    * KVIndexTable.kt:64-84: seek the index FIRST, then fetch): the
    * coarse-quantizer probe join restricts the entry set to the
    * probed lists (~nprobe·√N rows) BEFORE the label table joins on.
    * Catalyst keeps inner equi-join chains in declared order without
    * CBO, so joining attrs first would run a corpus-wide entries⋈
    * labels join per query batch and spend the index's sublinearity
    * before the filter applies — FilteredAnnSpec pins the order
    * (cluster join strictly below the attrs join). `attrs` is the
    * metadata frame (idCol, attrCol) — in the catalog, the base table
    * the index was declared on; the probe output is candidate-sized,
    * so AQE broadcasts it into the attrs join at any corpus size. A
    * deployment that filters on one attribute routinely would
    * denormalize it into the index entries; the join form keeps the
    * persisted layout attribute-agnostic.
    *
    * Recall caveat vs [[filteredTopK]]: the filter thins every probed
    * list, so the same nprobe holds LESS same-label candidate mass.
    * Scaling rule: an attribute value covering fraction f of the
    * corpus keeps ~f of each list — probe 1/f× the unfiltered budget
    * to hold the candidate mass. With a constant `nprobe` the caller
    * applies the rule for the WORST label; [[filteredIvfSearchAdaptive]]
    * derives it per label from measured frequencies so a skewed
    * attribute neither over-probes the common value nor under-recalls
    * the rare one. The probed fraction still shrinks as nprobe/√N
    * with corpus growth. */
  def filteredIvfSearch(idx: IvfIndex, queries: DataFrame, idCol: String,
                        vecCol: String, attrCol: String, attrs: DataFrame,
                        k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      col(attrCol).as("qattr"))
    val probes = coarseProbes(idx.centroids, q, nprobe, keep = Seq("qv", "qattr"))
    probeThenLabel(idx,
      probes.select(col("qid"), col("qv"), col("qattr"), col("cluster")),
      attrs, idCol, attrCol, k)
  }

  /** [[filteredIvfSearch]] with the probe budget derived PER LABEL
    * from measured frequencies: one small agg over the label column
    * (L rows — broadcastable by construction) yields each label's
    * corpus fraction f, and a query probes ceil(baseNprobe/f) lists.
    * A uniform L-valued label reproduces the constant rule
    * (baseNprobe·L everywhere); a skewed label probes few lists for
    * the dominant value and many for the rare one — holding the
    * same-label candidate mass, hence recall, per label instead of
    * per corpus (FilteredAnnSpec's skewed-corpus sweep pins the 0.9
    * floor for BOTH labels). A budget exceeding the list count just
    * probes every list — no clamp needed, so the frequency agg stays
    * the only extra pass and nothing is collected to the driver. */
  def filteredIvfSearchAdaptive(idx: IvfIndex, queries: DataFrame,
                                idCol: String, vecCol: String, attrCol: String,
                                attrs: DataFrame, k: Int,
                                baseNprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      col(attrCol).as("qattr"))
    val cnts = attrs.select(col(attrCol).as("qattr"))
      .groupBy("qattr").agg(count(lit(1)).as("cnt"))
    // want stays LONG: ceil(base·tot/cnt) for a 1-row label on a 1e9
    // corpus is ~4e9 — an int cast would wrap negative and silently
    // probe zero lists; a budget past the list count just probes all
    val freqs = cnts.crossJoin(broadcast(cnts.agg(sum(col("cnt")).as("tot"))))
      .select(col("qattr"),
        ceil(lit(baseNprobe) * col("tot") / col("cnt")).as("want"))
    // rank ALL lists per query by probe distance, keep the first
    // `want`: the query×centroid frame is |Q|·√N rows — probe-sized,
    // never corpus-sized — so the per-query window sort is bounded
    val ranked = q.join(broadcast(freqs), Seq("qattr"), "left")
      .withColumn("want", coalesce(col("want"), lit(baseNprobe)))
      .crossJoin(broadcast(idx.centroids))
      .withColumn("cdist", negL2(col("qv"), col("centroid")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cdist").desc, col("cluster"))
    val probes = ranked.withColumn("prn", row_number().over(w))
      .filter(col("prn") <= col("want"))
      .select(col("qid"), col("qv"), col("qattr"), col("cluster"))
    probeThenLabel(idx, probes, attrs, idCol, attrCol, k)
  }

  /** The shared filtered-search tail: index-first join order (probe
    * join restricts entries to ~|probes| candidates, THEN the label
    * joins on the rowkey), label equality and self-exclusion before
    * the cosine kernel, bounded-heap rank. NO broadcast hint on the
    * probe frame: the constant path bounds it at |Q|·nprobe rows, but
    * the adaptive path can probe every list for a rare label
    * (|Q|·√N rows each carrying the query vector) — a hardcoded hint
    * would force that through the driver; AQE broadcasts it whenever
    * it is actually small, and plans a shuffled hash join when not. */
  private def probeThenLabel(idx: IvfIndex, probes: DataFrame, attrs: DataFrame,
                             idCol: String, attrCol: String, k: Int): DataFrame = {
    val scored = idx.assigned
      .join(probes, Seq("cluster"))
      .join(attrs.select(col(idCol).as("nn"), col(attrCol).as("attr")), Seq("nn"))
      .filter(col("attr") === col("qattr"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }

  /** Build + search in one call (tests / one-shot use). */
  def ivfTopK(embs: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int, nprobe: Int = 4,
              maxIter: Int = 2, maxTrain: Int = 50000): DataFrame =
    ivfSearch(buildIvf(embs, idCol, vecCol, maxIter, maxTrain),
      queries, idCol, vecCol, k, nprobe)

  /** Corpus bucketing for NEAR-DUP work (the SemDeDup shape): k-means
    * lists sized ~`targetListSize`, with k GROWING with the corpus —
    * unlike `buildIvf`'s √N-list quantizer (tuned for search probes),
    * this keeps within-list pair enumeration O(n·listSize) at any n.
    * Sign-LSH cannot do this job on real embedding corpora: cluster
    * members lie on the same side of nearly every hyperplane through
    * the origin, so tight clusters are UNSPLITTABLE by sign bits and
    * bucket occupancy — hence pair count — grows linearly with the
    * cluster (measured: 10× corpus → 100× candidate pairs, 46×
    * runtime). Centroid buckets split exactly where sign bits can't.
    *
    * Returns `nprobe` rows per vector: (vid, v, cluster, arank) with
    * arank=1 the primary (nearest) list. Multi-assignment is the
    * boundary-recall device: a pair split across two lists still
    * collides through one side's secondary assignment. Identical
    * vectors always share a primary list (deterministic seeded fit +
    * same-metric assignment), so exact-copy recall is 1 by
    * construction. Past `maxLists` needed lists (≈ cap·targetListSize
    * vectors for one flat fit) the quantizer goes TWO-LEVEL
    * (IVF-of-centroids, the standard IVF scale-out): ~√k coarse cells,
    * each subdivided into ~√k sublists, trained on the same bounded
    * sample — so list count keeps growing ∝ corpus while training
    * cost stays bounded and per-row assignment drops from O(k) to
    * O(√k + nprobe·√k) centroid distances. */
  def clusterAssign(embs: DataFrame, idCol: String, vecCol: String,
                    targetListSize: Int = 128, nprobe: Int = 2,
                    maxIter: Int = 2, maxTrain: Int = 50000,
                    maxLists: Int = 4096): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embs.sparkSession
    val corpus = embs.select(col(idCol).as("vid"), col(vecCol).as("v"))
    val n: Long = corpus.count()
    val neededK = math.max(1L, (n + targetListSize - 1) / targetListSize)
    val fraction = if (n == 0) 1.0 else math.min(1.0, maxTrain * 1.2 / n.toDouble)
    if (neededK > maxLists)
      return twoLevelAssign(corpus, neededK, fraction, nprobe, maxIter, maxTrain)
    val train = corpus
      .select(array_to_vector(col("v").cast("array<double>")).as("features"))
      .sample(withReplacement = false, fraction, seed = 42L)
      .limit(maxTrain).cache()
    // explicit zero-input guard (see buildIvf): the max(_, 2) below
    // sizes k but cannot make an empty training frame fit
    val nTrainRaw = train.count()
    require(nTrainRaw > 0,
      "clusterAssign: no vectors to train on — empty corpus")
    val nTrain = math.max(nTrainRaw, 2L)
    val k = math.max(2, math.min(math.min(maxLists.toLong, nTrain), neededK).toInt)
    val model = new KMeans().setK(k).setSeed(42).setMaxIter(maxIter)
      .setInitMode("random").fit(train)
    train.unpersist()
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq.toDF("cluster", "centroid")
    val probes = coarseProbes(centroids,
      corpus.select(col("vid").as("qid"), col("v").as("qv")),
      nprobe, keep = Seq("qv"))
    rankAssign(probes)
  }

  private def rankAssign(probes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cdist").desc, col("cluster"))
    probes.withColumn("arank", row_number().over(w))
      .select(col("qid").as("vid"), col("qv").as("v"), col("cluster"), col("arank"))
  }

  /** Two-level coarse quantizer (IVF-of-centroids). Training runs on
    * the DRIVER over the same bounded seeded sample the flat path
    * uses (≤ maxTrain·d doubles — megabytes): a seeded Lloyd fit of
    * k1 ≈ √k coarse cells, then one k2-sublist fit per cell over that
    * cell's sample members. Assignment stays fully DISTRIBUTED and
    * two-stage: each row finds its `nprobe` nearest coarse cells
    * (O(k1) distances), then its `nprobe` nearest sublists among
    * those cells' k2·nprobe candidates — never the full k. Same
    * output contract as the flat path (vid, v, cluster, arank);
    * identical vectors see identical probe sequences, so exact-copy
    * recall stays 1 by construction. */
  private def twoLevelAssign(corpus: DataFrame, neededK: Long,
                             fraction: Double, nprobe: Int,
                             maxIter: Int, maxTrain: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] = corpus
      .select(col("v").cast("array<double>"))
      .sample(withReplacement = false, fraction, seed = 42L)
      .limit(maxTrain).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty,
      "clusterAssign: no vectors to train on — empty corpus")
    val kTotal = math.min(neededK, sample.length.toLong).toInt
    val k1 = math.max(2, math.ceil(math.sqrt(kTotal.toDouble)).toInt)
    val k2 = math.max(1, (kTotal + k1 - 1) / k1)
    val cent1 = lloydFit(sample, k1, maxIter, seed = 42L)
    val cells = Array.fill(cent1.length)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    sample.foreach(p => cells(nearestIdx(cent1, p)) += p)
    // sequential global list ids across cells; an empty cell keeps its
    // coarse centroid as a single sublist so every coarse probe has a
    // landing list
    val cent2 = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Seq[Double])]
    var gid = 0
    cent1.indices.foreach { c1 =>
      val pts = cells(c1).toArray
      val subs = if (pts.isEmpty) Array(cent1(c1))
        else lloydFit(pts, math.min(k2, pts.length), maxIter, seed = 42L + c1)
      subs.foreach { c => cent2 += ((c1, gid, c.toSeq)); gid += 1 }
    }
    val c1df = cent1.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("c1", "centroid")
    val c2df = cent2.toSeq.toDF("c1", "cluster", "centroid")
    val q = corpus.select(col("vid").as("qid"), col("v").as("qv"))
    // stage 1: nprobe nearest coarse cells per row — O(n·k1)
    val p1 = graft.plans.TopK.perGroup(
      q.crossJoin(broadcast(c1df))
        .withColumn("cdist", negL2(col("qv"), col("centroid")))
        .select(col("qid"), col("qv"), col("c1"), col("cdist")),
      Seq("qid"), Seq(("cdist", true), ("c1", false)),
      math.min(nprobe, cent1.length))
    // stage 2: nprobe nearest sublists among the probed cells — the
    // probed cells' sublists only (≤ nprobe·k2 candidates per row)
    val cand = p1.select(col("qid"), col("qv"), col("c1"))
      .join(broadcast(c2df), Seq("c1"))
      .withColumn("cdist", negL2(col("qv"), col("centroid")))
    rankAssign(graft.plans.TopK.perGroup(
      cand.select(col("qid"), col("qv"), col("cluster"), col("cdist")),
      Seq("qid"), Seq(("cdist", true), ("cluster", false)), nprobe))
  }

  /** Seeded deterministic Lloyd's k-means over a driver-side sample:
    * shuffled-index init, `iters` assign/recenter rounds, empty
    * clusters keep their previous centroid, ties break on the lowest
    * centroid index. Bounded by the sample cap, never corpus-sized. */
  private def lloydFit(pts: Array[Array[Double]], k: Int,
                       iters: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val kEff = math.max(1, math.min(k, pts.length))
    val dim = pts(0).length
    var cents = rnd.shuffle(pts.indices.toVector).take(kEff)
      .map(pts(_).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val cnt = new Array[Long](kEff)
      pts.foreach { p =>
        val c = nearestIdx(cents, p)
        val s = sums(c)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        cnt(c) += 1
      }
      cents = Array.tabulate(kEff)(c =>
        if (cnt(c) == 0L) cents(c)
        else sums(c).map(_ / cnt(c)))
      it += 1
    }
    cents
  }

  private def nearestIdx(cents: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0.0; var j = 0
      while (j < p.length) { val x = p(j) - cc(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Int8 quantization: q_i = round(x_i · 127 / max|x|), the standard
    * symmetric per-vector scheme. 4× smaller than float32 — at 100 TB
    * the quantized corpus is what streams through the scoring scan,
    * with the float vectors consulted only for re-ranking if needed.
    * Every arithmetic step (abs, max, scale, round) is an IEEE
    * correctly-rounded double op, so quantized codes are bit-identical
    * across engines — and the integer dot scores below are exact.
    * Native expression: the composed-HOF form inlined the max into
    * the per-element lambda (O(d²) interpreted per row). */
  def quantizeInt8(vec: Column): Column =
    graft.plans.HashExpressions.quantizeI8(vec)

  /** Quantized brute-force top-k: integer-dot scores over int8 codes
    * (native DotIntExpr — exact BIGINT, no float rounding anywhere in
    * the ranking). Same contract as bruteTopK with `score` = raw
    * integer dot. */
  def quantizedTopK(embs: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, k: Int): DataFrame = {
    val corpus = embs.select(col(idCol).as("nn"), quantizeInt8(col(vecCol)).as("qv8"))
    val q = queries.select(col(idCol).as("qid"), quantizeInt8(col(vecCol)).as("qq8"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", graft.plans.HashExpressions.dotInt(col("qq8"), col("qv8")))
    rank(scored, k)
  }

  def lshTopK(embs: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int, bits: Int = 12): DataFrame = {
    val corpus = embs.select(col(idCol).as("nn"), col(vecCol).as("v"),
      graft.plans.HashExpressions.lshBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      graft.plans.HashExpressions.lshBucket(col(vecCol), bits).as("bucket"))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }
}
