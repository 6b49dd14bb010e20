package graft.dedup

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface
  * (SURVEY.md §2 "dedup"). Five flavors: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale stance (the whole point at 100 TB): candidate generation is
  * ALWAYS a hash shuffle on a signature key (content hash, shingle,
  * LSH band, SimHash band, hyperplane bucket) — never an O(n²)
  * cross join. Signatures are computed with codegen'd expressions
  * (xxhash64 + higher-order array functions), one pass, map-side.
  */
object Dedup {

  /** Whitespace-normalized lowercase content hash. */
  def contentKey(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup: group by content hash; keeper = min doc_id.
    * One shuffle keyed by the hash; at 100 TB this is the standard
    * first pass of a corpus dedup. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // null-content docs are not duplicates of each other: GROUP BY
    // treats NULL keys as equal, which would emit one bogus h=NULL
    // duplicate group whose members a drop-list pass would delete
    docs.filter(col(textCol).isNotNull)
      .groupBy(contentKey(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Distinct word-n-gram shingle sets per doc (native expression;
    * semantics of TextFunctions.wordShingles). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.plans.HashExpressions.wordShingles(col(textCol), n).as("sh"))

  /** n-gram Jaccard near-dup pairs (a<b, J ≥ threshold).
    * Inverted shingle index → pairs sharing ≥1 shingle → shared
    * counts → J = shared/(|A|+|B|−shared). The self-join shuffles on
    * the shingle key; frequent shingles are the skew risk, so
    * high-df shingles are dropped (standard df-cut — an ubiquitous
    * shingle carries no dedup signal anyway).
    *
    * `maxDf` ≤ 0 (the default) makes the cut CORPUS-RELATIVE:
    * max(100, ⌈2% of |docs|⌉). An absolute cut silently changes the
    * operator's selectivity envelope as the corpus grows — at 100×
    * the data, df=1000 flips from "boilerplate" to "2 in 100k docs",
    * discarding genuine near-dup signal; a fraction keeps "appears in
    * a fixed share of the corpus" meaning the same thing at every
    * scale. Trade: a LOWER cut is cheaper (the df-capped self-join
    * blowup is bounded by maxDf per shingle) but can miss pairs whose
    * only shared shingles are common ones — those pairs have low
    * Jaccard against any near-dup threshold, so the recall loss is
    * confined to the uninteresting region. Pass `maxDf` > 0 to pin an
    * absolute cut. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double, maxDf: Long = 0): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("sz"))
    // posting key is the 64-bit hash of the shingle: same join/group
    // semantics (collisions ~ |shingles|^2/2^64 ~ 0), 2-3x less shuffle
    val posting = sh.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    val byDf = posting.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val rare =
      if (maxDf > 0) byDf.filter(col("df") <= maxDf)
      else {
        // the corpus count rides a broadcast 1-row frame so the cut
        // stays inside the one declarative plan (no separate count()
        // action, no driver round-trip)
        val cut = docs.agg(
          greatest(lit(100L), ceil(count(lit(1)) * 0.02).cast("long"))
            .as("maxdf_eff"))
        byDf.crossJoin(broadcast(cut)).filter(col("df") <= col("maxdf_eff"))
      }
    val p = posting.join(rare.select("s"), Seq("s"))
    val shared = p.as("a").join(p.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sza") + col("szb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature: sigLen independent permutations approximated
    * by seeded XXH64; sig_i = min over shingles of hash(s, seed=i).
    * Native Catalyst expression (graft.plans.MinHashSigExpr) — the
    * composed-HOF form was ~60x slower at sf0.1. */
  def minhashSig(sh: Column, sigLen: Int): Column =
    graft.plans.HashExpressions.minhashSig(sh, sigLen)

  /** MinHash + LSH banding: candidates collide on ≥1 of
    * (bands = sigLen/rowsPerBand) band hashes; estimated Jaccard =
    * fraction of agreeing signature positions; keep est ≥ threshold.
    * Shuffle key is (band, bandHash) — duplicate candidate pairs from
    * multiple colliding bands are deduped before estimation. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, sigLen: Int = 64, rowsPerBand: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    // sigLen < rowsPerBand would make bands=0 and sequence(0,-1)
    // DESCEND, hashing a garbage band identically for every doc (an
    // O(n²) candidate cross-product); a non-divisible sigLen would
    // silently ignore trailing signature rows while est_jaccard still
    // divides by the full sigLen
    // rowsPerBand must be validated FIRST: 0 would turn the modulo
    // below into a division by zero and a negative value would slip
    // past the divisibility intent
    require(rowsPerBand > 0, s"rowsPerBand must be positive, got $rowsPerBand")
    require(sigLen >= rowsPerBand && sigLen % rowsPerBand == 0,
      s"sigLen ($sigLen) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val bands = sigLen / rowsPerBand
    val sig = shingles(docs, idCol, textCol, n)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSig(col("sh"), sigLen).as("sig"))
    // Banding rows carry only (doc_id, band, bandHash) — the 8·sigLen-
    // byte signature would otherwise dominate the candidate-join
    // shuffle. Signatures rejoin only for the (small) candidate set.
    val banded = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), b => b))
          .cast("double") / lit(sigLen.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** [[minhashLsh]] on the ORACLE-REPLAYABLE md5-hex hash family:
    * signature row i = min over shingles of md5("i:" ++ shingle) — a
    * 32-char lowercase hex string whose lexicographic min both engines
    * agree on byte-for-byte — and each band hash = md5 of the band's
    * rows joined by '|'. The banding composition, candidate dedup and
    * estimate cut are IDENTICAL to the production entry point; only
    * the hash family changes (sigLen md5 evaluations per shingle
    * instead of one seeded XXH64 native pass), so production callers
    * keep [[minhashLsh]] and this variant serves the DuckDB gate —
    * proving the LSH pipeline itself, pair for pair, est for est. */
  def minhashLshHex(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, sigLen: Int = 16, rowsPerBand: Int = 4,
                    threshold: Double = 0.5): DataFrame = {
    require(rowsPerBand > 0, s"rowsPerBand must be positive, got $rowsPerBand")
    require(sigLen >= rowsPerBand && sigLen % rowsPerBand == 0,
      s"sigLen ($sigLen) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val bands = sigLen / rowsPerBand
    val sig = shingles(docs, idCol, textCol, n)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(sigLen - 1)),
          i => array_min(transform(col("sh"),
            sgl => md5(concat(i.cast("string"), lit(":"), sgl))))).as("sig"))
    val banded = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("|",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), b => b))
          .cast("double") / lit(sigLen.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash: bit b is the sign of Σ_tokens (±1 by bit b of
    * XXH64(token)). Native Catalyst expression
    * (graft.plans.SimHash64Expr) over the token array. */
  object SimhashExpr {
    def simhash64(text: Column): Column =
      graft.plans.HashExpressions.simhash64(TextFunctions.tokens(text))
  }

  /** Banded SimHash near-dup pairs: 4 × 16-bit bands; pairs agreeing
    * on ≥1 band, kept if hamming(simhash) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), SimhashExpr.simhash64(col(textCol)).as("sh64"))
    val banded = sh.select(col("doc_id"), col("sh64"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("sh64"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh64").as("ha"), col("b.sh64").as("hb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components over near-dup pairs (doc_a < doc_b) by
    * iterative min-label propagation: each node adopts the smallest
    * label among itself and its neighbors until fixpoint — O(diameter)
    * rounds, each one join+groupBy; dup clusters are tiny so this
    * converges in 1-3 rounds in practice. Output: (doc_id, cluster)
    * with cluster = min doc_id of the component. */
  def clusters(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    // both edge directions from ONE pass over `pairs` (explode, not a
    // self-union): the pair set usually has an expensive lineage (LSH
    // banding), and a union would execute it twice to materialize this
    // cache
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    // Each round TRUNCATES its logical plan by rebuilding the frame
    // from the round's materialized RDD: a plain cache() materializes
    // data but the planner still re-optimizes the full nested lineage
    // every round (plan size and Catalyst time grow per iteration —
    // measured 8.6 s at sf0.1 from planning alone), while chained
    // localCheckpoints leak their blocks until GC because no handle to
    // the checkpointed RDD remains to unpersist. Rebuilding via
    // createDataFrame(rdd, schema) gives a leaf plan AND a cache
    // handle freed deterministically each round.
    val spark = pairs.sparkSession
    def materialize(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).cache()
    var labels = materialize(edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")))
    var cached = labels
    try {
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        val neighborMin = edges
          .join(labels.withColumnRenamed("doc_id", "src")
            .withColumnRenamed("cluster", "src_cluster"), "src")
          .groupBy(col("dst").as("doc_id"))
          .agg(min(col("src_cluster")).as("nbr_cluster"))
        // The convergence signal piggybacks on the label-update join:
        // the previous label rides along as `old` in the same
        // materialized pass, so each round is exactly one join + one
        // count action — no second join+count against the previous
        // labels.
        val next = materialize(labels.join(neighborMin, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("cluster").as("old"),
            least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster"))).as("cluster")))
        val changed = next.filter(col("cluster") =!= col("old")).count()
        cached.unpersist()
        cached = next
        labels = next.select("doc_id", "cluster")
        converged = changed == 0
        i += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"clusters() did not converge in $maxIters rounds — component " +
            "diameter exceeds maxIters; raise it")
      // hand back a lineage-truncated, uncached result: the loop's
      // cache must not leak into the caller's session storage
      labels.localCheckpoint(true)
    } finally {
      cached.unpersist()
      edges.unpersist()
    }
  }

  /** Keeper selection: for every doc in a dup cluster, keep the
    * smallest id; emit the drop list (doc_id, keeper). */
  def dropList(pairs: DataFrame, maxIters: Int = 50): DataFrame =
    clusters(pairs, maxIters).filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"), col("cluster").as("keeper"))

  /** PageRank (Brin & Page 1998) over the undirected near-dup pair
    * graph — the CENTRALITY answer to keeper selection: where
    * [[dropList]] keeps the smallest id, the rank orders each dup
    * cluster by how representative a member is (the medoid-ish doc a
    * trainer keeps). Fixed-iteration power method, damping 0.85; each
    * round is one join + one agg shuffled on the node key — the same
    * Pregel-on-DataFrames shape as [[clusters]], and at 100 TB it
    * scales the same way (edges partition by src; no driver state but
    * the node count).
    *
    * Cross-engine determinism (the [[dd_cc_labels]] contract, extended
    * to weighted iteration): contributions round to 9 dp and SUM as
    * DECIMAL (order-independent — raw double sums differ per reduction
    * order), the damping mix runs in plain IEEE doubles (single mul +
    * add, engine-identical), and each round re-quantizes the rank to
    * 9 dp so the next round's inputs match bit-for-bit. */
  def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame =
    pagerankImpl(pairs, iters, None)

  /** Test seam: `planProbe` receives the optimized-plan node count of
    * the final pre-checkpoint ranks frame, so a spec can pin that deep
    * loops really run on truncated lineage (a leaf + one projection,
    * not an `iters`-deep join chain). */
  private[graft] def pagerankImpl(pairs: DataFrame, iters: Int,
                                  planProbe: Option[Int => Unit]): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = pairs.sparkSession
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    val deg = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("degree")).cache()
    try {
      // the node count is the one driver-side scalar the method needs
      // (it seeds 1/N and the teleport term); O(1) result, one action
      val n = deg.count().toDouble
      // empty graph: return the empty (doc_id, degree, rank) frame
      // explicitly rather than letting the 1/0 seed literal propagate
      // Infinity through a future non-empty-deg/zero-n refactor
      if (n == 0)
        return deg.withColumn("rank", lit(0.0)).localCheckpoint(true)
      // A handful of rounds keeps the direct lineage chain (power
      // iteration converges geometrically, so callers rarely need
      // more). PAST that, Catalyst re-optimizes the whole nested
      // lineage every round — the clusters() loop measured 8.6 s of
      // pure planning at sf0.1 from exactly this shape — so deep
      // loops truncate the LOGICAL plan per round via
      // createDataFrame(df.rdd, schema): .rdd forces physical
      // planning of the round eagerly and the next round plans
      // against an RDD leaf. Unlike clusters() there is no per-round
      // ACTION here (no convergence count to take), so nothing is
      // cached per round — execution chains through the round RDDs
      // in the one job the final checkpoint runs.
      val truncateEachRound = iters > 5
      var ranks = deg.withColumn("rank", round(lit(1.0) / lit(n), 9))
      for (_ <- 1 to iters) {
        val sums = edges
          .join(ranks.select(col("doc_id").as("src"),
            round(col("rank") / col("degree"), 9)
              .cast("decimal(24,9)").as("c")), "src")
          .groupBy(col("dst").as("doc_id"))
          .agg(sum(col("c")).as("s"))
        // undirected graph: every node has in-edges, but keep the
        // left join + coalesce so a future directed caller is safe
        ranks = deg.join(sums, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("degree"),
            round(lit(0.15) / lit(n) + lit(0.85) *
              coalesce(col("s").cast("double"), lit(0.0)), 9).as("rank"))
        if (truncateEachRound)
          ranks = spark.createDataFrame(ranks.rdd, ranks.schema)
      }
      planProbe.foreach(_(ranks.queryExecution.optimizedPlan
        .collect { case p => p }.size))
      ranks.localCheckpoint(true)
    } finally {
      deg.unpersist()
      edges.unpersist(): Unit
    }
  }

  /** Embedding-cosine near-dup pairs via k-means cluster buckets (the
    * SemDeDup shape): pairs sharing a coarse list, kept if
    * round(cos, 3) ≥ threshold. List count grows with the corpus
    * (lists stay ~targetListSize), so candidate enumeration is
    * O(n·listSize) — the earlier sign-LSH bucketing was O(n²/buckets)
    * on clustered embeddings because tight clusters share every sign
    * bit (measured 46× runtime on 10× data; see Ann.clusterAssign).
    * Exact copies always share a primary list; boundary pairs are
    * caught through the 2-probe secondary assignment. Exact cosine
    * runs only on candidates. */
  def embeddingDups(embs: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.95,
                    targetListSize: Int = 64): DataFrame =
    // the assignment feeds BOTH sides of the pair join — checkpoint it
    // so the k-means transform and probe TopK run once, not twice
    embeddingDupsFromAssign(
      graft.similarity.Ann.clusterAssign(embs, idCol, vecCol,
        targetListSize, nprobe = 2).localCheckpoint(true),
      threshold)

  /** Pair enumeration over a prebuilt [[graft.similarity.Ann.clusterAssign]]
    * frame — the assignment is an INDEX artifact (built once, like the
    * IVF/PQ indexes), the pair join is the per-query work. */
  def embeddingDupsFromAssign(assign: DataFrame, threshold: Double): DataFrame = {
    val primary = assign.filter(col("arank") === 1)
    // probe side × primary side, normalized to (min,max) id order so a
    // boundary pair is found regardless of WHICH side's secondary
    // assignment bridges the lists; dropDuplicates collapses the
    // both-primary double-hit
    val aLess = col("a.vid") < col("b.vid")
    assign.as("a").join(primary.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vid") =!= col("b.vid"))
      .select(
        when(aLess, col("a.vid")).otherwise(col("b.vid")).as("id_a"),
        when(aLess, col("b.vid")).otherwise(col("a.vid")).as("id_b"),
        when(aLess, col("a.v")).otherwise(col("b.v")).as("va"),
        when(aLess, col("b.v")).otherwise(col("a.v")).as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", round(VectorFunctions.cosine(col("va"), col("vb")), 3))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Bloom sketch of a key column, built with a DISTRIBUTED
    * aggregation (Spark's sketch lib; partial sketches are OR-merged
    * on the driver — the only driver-side object is the final bit
    * array, never the keys). Exact count first: `expectedNumItems`
    * under the true cardinality blows past `fpp`, and the count runs
    * on the same (small, already-pruned) side being sketched. */
  /** Exact-substring dedup spans (the "Deduplicating Training Data
    * Makes Language Models Better" ExactSubstr operator, Lee et al.
    * 2021, arXiv:2107.06499): find runs of >= `w` consecutive word
    * tokens that appear verbatim in at least `minDocs` DISTINCT
    * documents, merge overlapping/adjacent duplicated windows into
    * maximal spans per doc, and report per-doc span statistics —
    * the signal a training pipeline uses to cut or down-weight
    * documents dominated by cross-document boilerplate.
    *
    * Spark-first shape (the scalable stand-in for the paper's
    * suffix array, which is a single-machine structure): one pass
    * emits every w-token window with its start position (codegen'd
    * higher-order array expressions, no UDF); the duplicated-window
    * set is a (gram, doc) distinct + count — two hash shuffles on
    * the gram key; the join back is 1:1 per (doc, pos) since the
    * dup set is distinct on gram — NO fan-out, so a hot boilerplate
    * gram cannot blow up the join the way the Jaccard self-join
    * can. Span merging is a per-document gaps-and-islands window —
    * bounded by doc length, never corpus-wide. Intra-document
    * repetition is deliberately out of scope (txt_repetition covers
    * it): duplication means >= minDocs distinct docs.
    *
    * Window starts are 1-based. Spans merge when the next
    * duplicated window starts within `w` tokens of the previous
    * (overlap or exact adjacency), matching the paper's
    * overlapping-match merge. Docs with no duplicated span are
    * absent from the output. */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String,
                     w: Int = 16, minDocs: Int = 2): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // the shuffle/join key is the 64-bit hash of the window, not its
    // text (same trick as ngramJaccard/txt_novelty): identical
    // group/join semantics at ~0 collision odds, ~10× less shuffle
    // bytes than a 16-token string key
    val grams = toks
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")) - (w - 1)),
          i => array_join(slice(col("toks"), i, lit(w)), " "))))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).as("pos"), xxhash64(col("col")).as("g"))
    // duplicated = the gram occurs in >= minDocs distinct docs.
    // Derive that IN the gram exchange: dense_rank over doc_id within
    // each gram numbers the distinct docs, its per-gram max is the
    // distinct-doc count. One shuffle on g and — critically — ONE
    // evaluation of the explode above: the earlier
    // distinct→count→join-back shape re-computed the scan + tokenize
    // + posexplode (the dominant cost) as a second subtree, which
    // exchange reuse cannot merge. A hot boilerplate gram co-locates
    // in one partition either way (the join shuffled by g too), so
    // the skew exposure is unchanged while the heavy stage halves.
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val hits = grams
      .withColumn("dr",
        dense_rank().over(byGram.orderBy("doc_id")))
      .withColumn("n_docs", max(col("dr")).over(byGram))
      .filter(col("n_docs") >= minDocs)
      .select("doc_id", "n_tokens", "pos")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val spans = hits
      .withColumn("lp", lag(col("pos"), 1).over(byDoc))
      .withColumn("isl",
        sum(when(col("lp").isNull || col("pos") - col("lp") <= w, 0)
          .otherwise(1)).over(byDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        min(col("pos")).as("s"), (max(col("pos")) + (w - 1)).as("e"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"),
        max(col("n_tokens")).as("n_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 4))
  }

  def bloomOf(keys: DataFrame, keyCol: String,
              fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val n = math.max(keys.count(), 1L)
    keys.stat.bloomFilter(keyCol, n, fpp)
  }
}
