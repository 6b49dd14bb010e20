package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits: the 100-TB design claims, checked against the
  * actual physical plans, plus SQL-surface registration. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("sketch-only CMS/KMV entry points never touch the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // build the sketches FROM the corpus once (the one legitimate
    // scan), then pin that every production sketch-only plan —
    // cmsProbe with caller keys, kmvEstimate, kmvIntersect — contains
    // no file scan and no corpus self-join: at 100 TB everything
    // downstream of a sketch must run on ≤ d·w / ≤ k·L rows. The
    // exact witnesses (corpus distinct-pair joins) are gate-only.
    import graft.streaming.Sketches
    val events = Tables.events(spark, sf)
    val counters = Sketches.cmsBuild(events, "user_id").localCheckpoint(true)
    val keys = Seq(1L, 2L, 3L).toDF("user_id")
    val probePlan = Sketches.cmsProbe(counters, keys, "user_id")
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("FileScan") && !probePlan.contains("parquet"),
      s"sketch-only CMS probe scans the corpus:\n$probePlan")
    val bottom = Sketches.kmvSketch(
        events.select(col("event_type"), col("user_id")),
        "user_id", Seq("event_type"), 64)
      .localCheckpoint(true)
    val estPlan = Sketches.kmvEstimate(bottom, Seq("event_type"), 64)
      .queryExecution.executedPlan.toString
    assert(!estPlan.contains("FileScan") && !estPlan.contains("parquet"),
      s"sketch-only KMV estimate scans the corpus:\n$estPlan")
    val xPlan = Sketches.kmvIntersect(bottom, "event_type", 64)
      .queryExecution.executedPlan.toString
    assert(!xPlan.contains("FileScan") && !xPlan.contains("parquet"),
      s"sketch-only KMV intersect scans the corpus:\n$xPlan")
    // and the sketch-only results agree with the gated composition
    val gated = SparkEntry.queries("evt_kmv_intersect")(spark, sf)
      .select("type_a", "type_b", "n_match", "n_est")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val skOnly = Sketches.kmvIntersect(bottom, "event_type", 64)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(gated == skOnly,
      "sketch-only intersect diverged from the gated composition")
  }

  test("txt_quality_clf scores in one pass: no join, no aggregate, no wide shuffle") {
    val p = planOf("txt_quality_clf")
    assert(!p.contains("Join"), s"classifier pass grew a join:\n$p")
    assert(!p.contains("HashAggregate"),
      s"classifier pass grew an aggregate (the HOF fold should stay in-row):\n$p")
  }

  test("sim_label_centroids broadcasts the centroid frame, never shuffle-joins the corpus") {
    val p = planOf("sim_label_centroids")
    assert(p.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-sized shuffle join in the centroid rejoin:\n$p")
  }

  test("st_asof_nearest plans two union-scan windows, no inequality join") {
    val p = planOf("st_asof_nearest")
    assert(p.contains("Window"), s"as-of carry lost its window form:\n$p")
    assert(!p.contains("BroadcastNestedLoop"),
      s"nearest as-of regressed to an inequality join:\n$p")
  }

  test("kv_scan_reverse compiles to a bounded-heap take, never a corpus sort") {
    val p = planOf("kv_scan_reverse")
    assert(p.contains("TakeOrderedAndProject"),
      s"reverse bounded scan lost its heap form:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"reverse scan planned a corpus range-sort:\n$p")
  }

  test("ft_bm25_wand broadcasts the surviving-block set and never cross-joins") {
    val p = planOf("ft_bm25_wand")
    assert(p.contains("BroadcastHashJoin"),
      s"surviving-block prune join not broadcast (blocks are a tiny summary):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"WAND plan grew an unbounded join:\n$p")
  }

  test("txt_link_graph is one extraction pass + one edge-key aggregate, no join") {
    val p = planOf("txt_link_graph")
    assert(!p.contains("Join"),
      s"link extraction grew a join (the dressing and host rules are pure exprs):\n$p")
    assert(p.contains("HashAggregate"), s"edge aggregation lost its hash form:\n$p")
  }

  test("mm_pair_dedup keeps the banded candidate join shuffled (no inflated broadcast)") {
    val p = planOf("mm_pair_dedup")
    assert(p.contains("ShuffledHashJoin"),
      s"band join lost its shuffle-hash form (both sides are corpus-sized):\n$p")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"cross-modal dedup planned an unbounded join:\n$p")
  }

  test("sim_hnsw_ann broadcasts the probe frame into the graph join") {
    val p = planOf("sim_hnsw_ann")
    assert(p.contains("BroadcastHashJoin"),
      s"probed-list join not broadcast (probes are nprobe-bounded):\n$p")
    // the fresh-delta arm IS a broadcast nested loop by design
    // (patch-sized buffer × broadcast query batch) — the forbidden
    // shape is a SHUFFLED cartesian, covered by the global audit
    assert(!p.contains("CartesianProduct"),
      s"graph search planned a shuffled cartesian:\n$p")
  }

  test("map fan-out repartitions derive from session conf, never a literal") {
    // The one-knob claim (SURVEY §4): the heavy-narrow-chain fan-outs
    // (st_stream_urldedup's regex chain, mm_audio_fp's byte-sample
    // grid) must follow spark.sql.shuffle.partitions — a constant
    // right for this box would cap a 1000-executor cluster at that
    // many tasks. Pin the derivation at two conf values (including
    // the defaultParallelism cap)...
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val par = spark.sparkContext.defaultParallelism
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      assert(graft.streaming.StreamQueries.mapFanout(spark) ==
        math.max(1, math.min(2, par)))
      spark.conf.set("spark.sql.shuffle.partitions", "4096")
      assert(graft.streaming.StreamQueries.mapFanout(spark) ==
        math.min(4096, par),
        "fan-out must follow the conf up to the cluster's parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // ...and that no literal-count repartition survives in the
    // streaming module's source (the shape the round-17 audit flagged:
    // repartition(8) / repartition(32))
    val src = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/StreamQueries.scala"))
    val literal = "repartition\\(\\s*\\d".r.findFirstIn(src)
    assert(literal.isEmpty,
      s"hard-coded repartition literal in StreamQueries: $literal")
  }

  test("fanned() repartitions only below the fanout, never above it") {
    // The scale guard (round-20 verdict): a scan already wider than
    // the fanout must pass through UNTOUCHED — an unconditional
    // repartition would shuffle the whole corpus and could REDUCE map
    // parallelism at real scale. Below the fanout, the exchange
    // appears (the local one-split case the fanout exists for).
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val narrow = spark.range(100).toDF("id").coalesce(1)
      val fannedNarrow =
        graft.streaming.StreamQueries.fanned(spark, narrow, scanParts = 1)
      assert(fannedNarrow.rdd.getNumPartitions ==
        graft.streaming.StreamQueries.mapFanout(spark),
        "a one-split frame must fan out to the conf-derived width")
      val wide = spark.range(100).toDF("id").repartition(8)
      val fannedWide =
        graft.streaming.StreamQueries.fanned(spark, wide, scanParts = 8)
      assert(fannedWide.rdd.getNumPartitions == 8,
        "a frame already wider than the fanout must not be reshuffled")
      assert(fannedWide.queryExecution.logical eq wide.queryExecution.logical,
        "guard must return the input frame unchanged above the fanout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q4 star join broadcasts the dimension tables") {
    val p = planOf("q4_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q2 filter+projection reach the parquet scan") {
    val p = planOf("q2_filter_project")
    assert(p.contains("PushedFilters") && p.contains("p_size"),
      s"filter not pushed:\n$p")
    assert(!p.contains("p_brand"), "scan reads columns the query never uses")
  }

  test("q1 scan schema is pruned to used columns") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("l_partkey") && !scan.contains("l_suppkey"),
      "q1 reads join keys it never uses")
  }

  test("txt_pipeline evaluates the quality score once per row") {
    val df = SparkEntry.queries("txt_pipeline")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // "/ 120.0" is the length term unique to qualityScore; the
    // nondeterministic sentinel in the projection must keep Catalyst
    // from re-inlining the regex-heavy score into a pushed-down filter
    // (which would evaluate it twice per surviving row)
    val n = "/ 120.0".r.findAllIn(plan).size
    assert(n == 1, s"qualityScore appears $n times in the plan:\n$plan")
  }

  test("txt_novelty scans only doc_id and text") {
    val df = SparkEntry.queries("txt_novelty")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lang") && !plan.contains("source") &&
      !plan.contains("n_chars"),
      "novelty reads document columns it never uses")
  }

  test("dd_substring and txt_boilerplate scan only doc_id and text") {
    Seq("dd_substring", "txt_boilerplate").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      // judge the SCANS, not the whole plan: output aliases like
      // clean_chars would substring-match n_chars
      val scans = plan.linesIterator
        .filter(_.contains("ReadSchema")).mkString("\n")
      assert(scans.nonEmpty &&
        !scans.contains("lang") && !scans.contains("n_chars") &&
        !scans.contains("source"),
        s"$q reads document columns it never uses:\n$scans")
    }
  }

  test("dd_substring explodes the gram windows exactly once") {
    // the gram posexplode (scan + tokenize + 16-token windows) is the
    // operator's dominant cost; duplication status must be derived in
    // the SAME exchange, not via a second distinct→count→join-back
    // subtree that re-runs the explode
    val plan = SparkEntry.queries("dd_substring")(spark, sf)
      .queryExecution.executedPlan.toString
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates == 1,
      s"expected one Generate (posexplode), found $generates:\n$plan")
    // on a plain (non-union) corpus the single explode implies a
    // single scan of the documents table
    val raw = graft.dedup.Dedup.substringSpans(
      Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val docScans = raw.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans == 1,
      s"expected one documents scan, found $docScans:\n$raw")
  }

  test("ft_hybrid_rrf's exact vector arm is a bounded-heap top-k") {
    // the exact arm's contract is a full scan (no index can serve an
    // exact cosine top-k on this corpus — see the query's comment),
    // so the plan must be the one exact top-k wants at scale: a
    // TakeOrderedAndProject (per-partition heap + driver merge of
    // 50-row partials), never a global Sort of the corpus feeding the
    // limit
    val p = planOf("ft_hybrid_rrf")
    assert(p.contains("TakeOrderedAndProject"),
      s"exact top-k not heap-reduced:\n$p")
  }

  test("kv point get prunes via pushed rowkey filter") {
    val p = planOf("kv_point_get")
    assert(p.contains("PushedFilters") && p.contains("c_custkey"), p)
  }

  test("composite rowkey ops push every key predicate to the scan") {
    val get = planOf("kv_composite_get")
    assert(get.contains("PushedFilters") && get.contains("l_orderkey") &&
      get.contains("l_linenumber"), get)
    // the lexicographic range decomposes into pushable Or/And — the
    // leading-column bounds must reach the scan for min/max pruning
    val range = planOf("kv_composite_range")
    assert(range.contains("PushedFilters") && range.contains("Or("), range)
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    assert(planOf("q5_semijoin").contains("LeftSemi"))
    assert(planOf("q6_antijoin").contains("LeftAnti"))
  }

  /** With the broadcast threshold disabled (standing in for "the hit
    * set turned out huge at 100 TB"), the index/full-text lookups and
    * the groupwise-max join must plan shuffled joins. A hardcoded
    * broadcast() hint would override the threshold and OOM the driver
    * on a low-selectivity lookup — this pins the hints' removal. */
  test("unbounded-side joins carry no broadcast hint (AQE decides)") {
    val thresholds = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = thresholds.map(k => k -> spark.conf.getOption(k))
    thresholds.foreach(k => spark.conf.set(k, "-1"))
    try {
      Seq("idx_kv_lookup", "idx_kv_range", "ft_search_and", "ft_search_or",
          "ft_phrase", "ft_prefix", "ft_fuzzy", "q25_groupwise_max",
          "q3_join_agg", "q13_in_subquery", "q23_complex_pred").foreach { name =>
        val p = planOf(name)
        assert(!p.contains("BroadcastExchange"),
          s"$name still broadcasts with the threshold off — a hardcoded hint:\n$p")
      }
      assert(planOf("idx_kv_lookup").contains("LeftSemi"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Global scale audit: no query may plan a CartesianProduct. Cross
    * joins that exist are deliberate tiny-side broadcasts (scalar
    * subquery, 5×25 dims, query-set × centroids) and must plan as
    * BroadcastNestedLoopJoin, never a shuffled cartesian. */
  test("filtered vector search plans an attr-keyed broadcast hash join") {
    // the label constraint must be the JOIN KEY — a cross join with a
    // post-hoc label filter would score every (query, corpus) pair
    val p = planOf("sim_filtered_topk")
    assert(p.contains("BroadcastHashJoin") && p.contains("attr"),
      s"label constraint not a hash-join key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"filtered search degenerated to an unkeyed join:\n$p")
  }

  test("dd_temperature_sample never shuffles the corpus") {
    // the gate must stay a map-side filter: the documents scan joins
    // the (one-row-per-language) rate frame by BROADCAST — a sort-
    // merge or shuffled-hash join here would exchange the whole
    // corpus to sample it
    val p = planOf("dd_temperature_sample")
    assert(p.contains("BroadcastHashJoin"), s"rate join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus shuffled on the way to the sampling gate:\n$p")
  }

  test("txt_lm_ppl counts bigrams in one exchange and prunes the scan") {
    // the bigram stream must be shuffled ONCE (window count over the
    // hashed bigram key), not aggregated AND joined back — the
    // txt_novelty contract; and the LM only ever needs doc_id + text
    val df = SparkEntry.queries("txt_lm_ppl")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"bigram count lost the window form:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in LM scoring:\n$p")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(scans.nonEmpty && !scans.contains("lang") &&
      !scans.contains("source") && !scans.contains("n_chars"),
      s"LM scoring reads document columns it never uses:\n$scans")
  }

  test("dd_curriculum's only unpartitioned window runs over the histogram") {
    // the scale claim: the corpus ranking distributes on the length
    // key; only the bounded length-histogram cumsum may use a global
    // (single-partition) window
    val p = planOf("dd_curriculum")
    val windows = p.linesIterator.filter(_.contains("Window ["))
      .map(l => l.substring(l.indexOf("Window ["))).toSeq
    assert(windows.nonEmpty, s"no Window operators found:\n$p")
    // a partitioned Window prints THREE bracket groups
    // ([funcs], [partition], [order]); a global one prints TWO
    def groups(l: String) = {
      var depth = 0; var n = 0
      l.foreach { c =>
        if (c == '[') { if (depth == 0) n += 1; depth += 1 }
        else if (c == ']') depth -= 1
      }
      n
    }
    val global = windows.filter(groups(_) == 2)
    assert(global.size == 1,
      s"expected exactly one global window (the histogram cumsum):\n${windows.mkString("\n")}")
    assert(global.head.contains("cnt"),
      s"the global window is not the histogram cumsum:\n${global.head}")
    val partitioned = windows.filter(groups(_) == 3)
    assert(partitioned.forall(_.contains("n_words")),
      s"corpus window not partitioned on the length key:\n${partitioned.mkString("\n")}")
  }

  test("txt_collocations aggregates without windowing or sorting the corpus") {
    // PMI mining must stay two map-side-combining aggs + word-key
    // joins: no Window over the bigram stream, and the top-25 must
    // be a bounded TakeOrdered, never a global sort
    val df = SparkEntry.queries("txt_collocations")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"corpus windowed in PMI mining:\n$p")
    assert(p.contains("TakeOrdered"), s"top-K is not a bounded heap:\n$p")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(scans.nonEmpty && !scans.contains("lang") &&
      !scans.contains("source") && !scans.contains("n_chars"),
      s"PMI mining reads document columns it never uses:\n$scans")
  }

  test("sql_lateral decorrelates to a ranked join, not per-row re-execution") {
    // Spark must rewrite the correlated LATERAL-with-LIMIT into a
    // partitioned rank + equi-join (DecorrelateInnerQuery); a
    // nested-loop per outer row would re-execute the subquery per
    // nation — the O(outer × inner) shape that cannot scale
    val p = planOf("sql_lateral")
    assert(p.contains("Window"), s"lateral not decorrelated to a rank:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian lateral:\n$p")
  }

  test("no query plans a shuffled cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("graft SQL functions are registered on the session") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT size(graft_word_shingles('a b c d', 3)) AS nsh,
        |  graft_simhash64(array('x', 'y', 'z')) AS sh,
        |  graft_minhash_sig(graft_word_shingles('a b c d', 3), 8) AS sig,
        |  size(graft_char_bigrams('abc')) AS nbg""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getSeq[Long](2).length == 8)
    assert(r.getInt(3) == 2)
    val v = spark.sql(
      """SELECT graft_dot_int(graft_quantize_i8(array(0.5D, -1.0D)),
        |                     graft_quantize_i8(array(0.5D, -1.0D))) AS selfdot,
        |  round(graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)), 6) AS cos,
        |  size(graft_word_ngrams('a b c', 2)) AS nng,
        |  size(graft_tokens('A b-C')) AS ntok""".stripMargin).head()
    // codes for (0.5, -1.0) are (64, -127): self-dot = 64^2 + 127^2
    assert(v.getLong(0) == 64L * 64 + 127L * 127)
    assert(v.getDouble(1) == 1.0)
    assert(v.getInt(2) == 2 && v.getInt(3) == 3)
    // misuse fails at analysis with a usage message, not mid-query
    val badN = intercept[Exception](
      spark.sql("SELECT graft_word_shingles('a b', 0)").head())
    assert(badN.getMessage.contains("positive"))
    val badArity = intercept[Exception](
      spark.sql("SELECT graft_simhash64(array('x'), 2)").head())
    assert(badArity.getMessage.contains("arguments"))
    // salt guard on the skew primitives
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("k", "v")
    val badSalt = intercept[IllegalArgumentException](
      graft.operators.Skew.saltedSumCount(df, Seq("k"), "v", salt = 0))
    assert(badSalt.getMessage.contains("salt"))
  }

  test("catalog index DDL round-trip (kv + bitmap)") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files.createTempDirectory("graft_idx_wh").toString
    val cat = new graft.kv.Catalog(spark, wh)
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.StringType, true)))
    cat.createTable("t2", schema, primaryKey = Seq("k"))
    cat.bulkLoad("t2", Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "grp"))
    cat.createIndex("t2", "by_grp", "kv", Seq("grp"))
    assert(cat.listIndexes("t2") == Seq("t2.kv.by_grp"))
    val hits = graft.index.KvIndex.lookup(
      cat.table("t2").df, "k", cat.indexData("t2", "by_grp", "kv"), "a")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(hits.sameElements(Array(1L, 3L)))
    intercept[IllegalArgumentException](cat.createIndex("t2", "by_grp", "kv", Seq("grp")))
    cat.dropIndex("t2", "by_grp", "kv")
    assert(cat.listIndexes("t2").isEmpty)
    cat.createIndex("t2", "bm_grp", "bitmap", Seq("grp"))
    val ids = graft.index.BitmapIndex.lookupIds(
      cat.indexData("t2", "bm_grp", "bitmap"), "a")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 3L)))
    assert(cat.lockStatusOf("t2") == "UNLOCK")
    // multiple named indexes coexist on one table (reference tracks
    // index tables by name, HBaseSchema.kt:262-319), and a kv index
    // can span several columns with prefix lookup
    cat.createIndex("t2", "by_grp", "kv", Seq("grp"))
    cat.createIndex("t2", "grp_k", "kv", Seq("grp", "k"))
    assert(cat.listIndexes("t2") ==
      Seq("t2.bitmap.bm_grp", "t2.kv.by_grp", "t2.kv.grp_k"))
    assert(cat.indexesOf("t2").map(i => (i._1, i._2)).toSet ==
      Set(("bm_grp", "BITMAP"), ("by_grp", "KV"), ("grp_k", "KV")))
    val full = graft.index.KvIndex.lookupComposite(
      cat.table("t2").df, "k", cat.indexData("t2", "grp_k", "kv"), Seq("a", 3L))
      .select("k").collect().map(_.getLong(0))
    assert(full.sameElements(Array(3L)))
    val prefix = graft.index.KvIndex.lookupComposite(
      cat.table("t2").df, "k", cat.indexData("t2", "grp_k", "kv"), Seq("a"))
      .select("k").collect().map(_.getLong(0)).sorted
    assert(prefix.sameElements(Array(1L, 3L)))
    cat.dropTable("t2")
  }

  test("catalog fulltext index flavor persists postings + dictionary") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ft_wh").toString
    val cat = new graft.kv.Catalog(spark, wh)
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("body", org.apache.spark.sql.types.StringType, true)))
    cat.createTable("t3", schema, primaryKey = Seq("k"))
    cat.bulkLoad("t3", Seq(
      (1L, "spark joins data"), (2L, "spark windows"), (3L, "hbase scans data"))
      .toDF("k", "body"))
    cat.createIndex("t3", "ft_body", "fulltext", Seq("body"))
    val postings = cat.indexData("t3", "ft_body", "fulltext")
    val hits = graft.index.FullText.searchAll(
        cat.table("t3").df, "k", postings, Seq("spark"))
      .select("k").collect().map(_.getLong(0)).sorted
    assert(hits.sameElements(Array(1L, 2L)))
    val df = cat.indexDictionary("t3", "ft_body", "fulltext")
      .filter(org.apache.spark.sql.functions.col("term") === "data")
      .select("df").head().getLong(0)
    assert(df == 2L)
    cat.dropTable("t3")
  }

  test("fuzzy search pushes the length band to the dictionary scan") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val postings = QueryCaches.postings(spark, sf)
    // persist the dictionary the way a real deployment serves it — the
    // stored tlen column is what makes the band a parquet-prunable
    // range predicate instead of a per-term levenshtein scan
    val dictPath = java.nio.file.Files.createTempDirectory("graft_dict").toString
    index.FullText.buildDictionary(postings).write
      .mode("overwrite").parquet(dictPath)
    val dict = spark.read.parquet(dictPath)
    val res = index.FullText.searchFuzzy(docs, "doc_id", postings, dict,
      "part", maxEdits = 2)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(tlen") &&
      plan.contains("LessThanOrEqual(tlen"),
      s"length band not pushed to the dictionary scan:\n$plan")
    // and the band is lossless: same hits as the unbanded in-memory path
    val baseline = index.FullText.searchFuzzy(docs, "doc_id", postings,
      QueryCaches.dictionary(spark, sf).drop("tlen"), "part", maxEdits = 2)
    assert(res.select(col("doc_id")).collect().map(_.getLong(0)).sorted
      .sameElements(baseline.select(col("doc_id")).collect().map(_.getLong(0)).sorted))
  }
}
