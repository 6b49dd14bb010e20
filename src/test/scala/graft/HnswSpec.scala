package graft

import graft.similarity.{Ann, Hnsw}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sharded navigable-graph ANN (graft.similarity.Hnsw): exactness
  * of what it scores, sublinearity of the kernel budget on a clustered
  * corpus, delta-buffer freshness, and build determinism. */
class HnswSpec extends AnyFunSuite {
  import TestSpark._

  /** Clustered unit-sphere corpus (the RecallGateSpec construction,
    * bigger lists so the beam bound has room to matter). */
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    // ±0.25 noise: blobs stay separated (cross-blob cosine ≪ in-blob)
    // while in-blob scores stay DISTINCT at the search's 3-dp rounding
    // — a tighter blob would tie every score at 1.000 and turn top-k
    // into a pure id tie-break, which measures nothing about the beam
    val rows = for {
      c <- centers.indices
      i <- 0 until 200
    } yield ((c * 200 + i).toLong,
      centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f).toSeq)
    rows.toDF("vec_id", "embedding").cache()
  }

  private lazy val built = {
    val ivf = Ann.buildIvf(corpus, "vec_id", "embedding")
    val graph = Hnsw.buildGraph(
      ivf.assigned.select(col("nn").as("rk"), col("cluster"), col("v")))
      .cache()
    (graph, ivf.centroids.cache())
  }

  private def emptyDelta = corpus.sparkSession
    .createDataFrame(corpus.sparkSession.sparkContext
        .emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "rk long, v array<float>"))

  test("beam search finds the brute top-k neighbors on a clustered corpus") {
    import spark.implicits._
    val (graph, cents) = built
    val q = corpus.filter($"vec_id" % 200 === 3)
    val got = Hnsw.search(graph, cents, emptyDelta, q,
      "vec_id", "embedding", k = 10, nprobe = 2, ef = 24, maxVisits = 96)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"qid", $"nn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotSet = pairSet(got)
    // vs ivfSearch at the SAME probes: the full probed-list kernel
    // scan — this isolates the BEAM's candidate coverage from the
    // IVF probe coverage both flavors share
    val ivfSet = pairSet(Ann.ivfSearch(
      graft.similarity.Ann.IvfIndex(
        graph.select($"rk".as("nn"), $"v", $"cluster"), cents),
      q, "vec_id", "embedding", k = 10, nprobe = 2))
    val beamRecall = (ivfSet & gotSet).size.toDouble / ivfSet.size
    assert(beamRecall >= 0.9,
      s"beam recall@10 $beamRecall vs the full probed-list scan")
    // vs brute with a generous probe budget: end-to-end recall
    val wide = pairSet(Hnsw.search(graph, cents, emptyDelta, q,
      "vec_id", "embedding", k = 10, nprobe = 8, ef = 32, maxVisits = 160))
    val bruteSet = pairSet(Ann.bruteTopK(corpus, "vec_id", "embedding", q, k = 10))
    val recall = (bruteSet & wide).size.toDouble / bruteSet.size
    assert(recall >= 0.9, s"end-to-end recall@10 $recall vs brute")
    val brute = Ann.bruteTopK(corpus, "vec_id", "embedding", q, k = 10)
    // scores are EXACT cosines: every returned pair matches brute's
    // score for that pair (the re-rank is exact, approximation only
    // picks candidates)
    val bruteScores = brute.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    got.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bruteScores.get(key).foreach(b =>
        assert(math.abs(b - r.getDouble(3)) < 1e-9,
          s"score mismatch at $key: ${r.getDouble(3)} vs $b"))
    }
  }

  test("kernel budget is sublinear: visited nodes a small fraction of probed lists") {
    import spark.implicits._
    val (graph, cents) = built
    val q = corpus.filter($"vec_id" % 200 === 0)
    val ef = 12; val maxVisits = 40
    val stats = Hnsw.searchStats(graph, cents, emptyDelta, q,
        "vec_id", "embedding", nprobe = 2, ef = ef, maxVisits = maxVisits)
      .filter($"visited" > 0)
      // key the dedup on the DESCENT (qid, cluster) — two probed
      // lists that happen to visit the same number of nodes must both
      // count toward the per-query kernel budget
      .select($"qid", $"cluster", $"visited").distinct()
      .groupBy($"qid").agg(sum($"visited").as("v"))
      .collect().map(r => r.getLong(1))
    assert(stats.nonEmpty)
    // per query: 2 probed lists of ~200 nodes = ~400 candidate rows;
    // the beam must touch at most 2·maxVisits of them — and the cap
    // is itself ≪ the probed mass (the sublinearity claim: kernel
    // evaluations bounded by the beam, not the list)
    stats.foreach { v =>
      assert(v <= 2L * maxVisits, s"visited $v exceeds the beam cap")
      assert(v * 4 < 2L * 200, s"visited $v is not sublinear in the probed mass")
    }
  }

  test("CDC delta-buffer rows are found without a graph rebuild") {
    import spark.implicits._
    val (graph, cents) = built
    // a fresh row EQUAL to the query vector, absent from the graph —
    // the segment row a CDC merge appends between graph rebuilds;
    // cosine 1.0 beats every corpus score, so missing it can only
    // mean the delta buffer was skipped
    val q = corpus.filter($"vec_id" === 3L)
    val fresh = q.select(lit(900001L).as("rk"), $"embedding".as("v"))
    val got = Hnsw.search(graph, cents, fresh, q,
        "vec_id", "embedding", k = 10, nprobe = 2, ef = 24, maxVisits = 96)
      .select($"nn").collect().map(_.getLong(0)).toSet
    assert(got.contains(900001L),
      "delta-buffer row missing from the shortlist union")
  }

  test("filtered beam: every hit matches the label; recall holds vs the exact filtered scan") {
    import spark.implicits._
    val (graph, cents) = built
    // labels orthogonal to the geometry (vec_id % 3), so the filter
    // genuinely thins every probed list instead of aligning with it
    val attrs = corpus.select($"vec_id", ($"vec_id" % 3).as("label"))
    val labeled = corpus.join(attrs, Seq("vec_id"))
    val q = labeled.filter($"vec_id" % 200 === 3)
    // budget scaled by 1/f like filteredIvfSearch documents: labels
    // cover f = 1/3 of every list, so probe and visit ~3× the
    // unfiltered budget to hold the same MATCHING candidate mass
    val got = Hnsw.filteredSearch(graph, cents, emptyDelta, attrs, q,
      "vec_id", "embedding", "label", k = 10, nprobe = 6,
      ef = 32, maxVisits = 280)
    // hard invariant: no cross-label row, ever
    val lblOf = attrs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.collect().foreach { r =>
      assert(lblOf(r.getLong(2)) == lblOf(r.getLong(0)),
        s"cross-label hit: ${r.getLong(2)} for query ${r.getLong(0)}")
    }
    // recall vs the exact filtered scan
    val exact = Ann.filteredTopK(labeled, "vec_id", "embedding", "label",
      q, k = 10)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"qid", $"nn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (e, g) = (pairSet(exact), pairSet(got))
    val recall = (e & g).size.toDouble / e.size
    assert(recall >= 0.85, s"filtered beam recall@10 $recall vs exact")
    // the delta-buffer path honors the label too: a fresh row with
    // the query's vector but the WRONG label must not surface
    val freshWrong = q.limit(1).select(lit(900002L).as("rk"),
      $"embedding".as("v"))
    val attrsPlus = attrs.unionByName(
      q.limit(1).select(lit(900002L).as("vec_id"),
        (($"label" + 1) % 3).as("label")))
    val got2 = Hnsw.filteredSearch(graph, cents, freshWrong, attrsPlus, q,
      "vec_id", "embedding", "label", k = 10, nprobe = 6,
      ef = 32, maxVisits = 280)
    assert(!got2.select($"nn").collect().map(_.getLong(0)).contains(900002L),
      "a wrong-label delta row surfaced through the filtered search")
  }

  test("compact_index folds the fresh delta into only the touched lists") {
    // The graph-maintenance law (Catalog.foldIndexStack's graph-era
    // branch): after a CDC merge the appended rows surface through
    // the structural fresh-delta buffer; CALL system.compact_index
    // folds them into the per-list graphs — after it the delta is
    // EMPTY, searches return the same neighbors, and only the lists
    // the patch touched were rebuilt (untouched lists carry over
    // row-identical, coarse structure unchanged).
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_hnswfold_wh").toString
    val cat = new graft.kv.Catalog(spark, wh)
    // the catalog's vector flavor trains PQ codebooks over m=8
    // subspaces — pad the 4-dim spec corpus to 8 dims (zeros change
    // no cosine)
    val corpus8 = corpus.withColumn("embedding",
      concat($"embedding", array(lit(0f), lit(0f), lit(0f), lit(0f))))
    val base = corpus8.filter($"vec_id" < 590)
    cat.createTable("emb", base.schema, Seq("vec_id"))
    cat.bulkLoad("emb", base, partitions = 2)
    cat.createIndex("emb", "ann", "vector", Seq("embedding"))
    cat.buildVectorGraph("emb", "ann")
    // CDC-merge a patch near ONE blob center (cluster-local rows)
    val patch = corpus8.filter($"vec_id" >= 590)
      .withColumn("vec_id", $"vec_id" + 1000L)
    cat.incrementalMerge("emb", patch)
    val (g0, d0) = cat.vectorGraphView("emb", "ann")
    val graphBefore = g0.collect()
      .map(r => (r.getLong(1), r.getInt(0), r.getSeq[Long](3))).toSeq
    val deltaBefore = d0.select($"rk").collect().map(_.getLong(0)).toSet
    assert(deltaBefore.nonEmpty, "merge produced no fresh delta")
    val (_, cent, _) = cat.vectorIndexView("emb", "ann")
    val q = corpus8.filter($"vec_id" === 3L)
    def run(graph: org.apache.spark.sql.DataFrame,
            delta: org.apache.spark.sql.DataFrame) =
      Hnsw.search(graph, cent, delta.select($"rk", $"v"), q,
        "vec_id", "embedding", k = 10, nprobe = 3, ef = 24, maxVisits = 96)
        .select($"qid", $"nn", $"score").collect().map(_.toString).sorted.toSeq
    val before = run(g0, d0)
    cat.compactIndex("emb", "ann", "vector")
    val (g1, d1) = cat.vectorGraphView("emb", "ann")
    // 1. the delta buffer is EMPTY after the fold
    assert(d1.count() == 0, "fresh delta survived compact_index")
    // 2. every delta row is now a graph node
    val nodes1 = g1.select($"rk").collect().map(_.getLong(0)).toSet
    assert(deltaBefore.subsetOf(nodes1), "folded rows missing from the graph")
    // 3. searches identical (the delta rows moved from the exhaustive
    // buffer into the beam's reach; exact re-rank keeps scores equal)
    assert(run(g1, d1) == before,
      "search results changed across the graph fold")
    // 4. only TOUCHED lists rebuilt: untouched clusters' rows carry
    // over with identical neighbor lists
    val touched = g1.collect()
      .map(r => (r.getLong(1), r.getInt(0), r.getSeq[Long](3)))
      .filter { case (rk, _, _) => deltaBefore.contains(rk) }
      .map(_._2).toSet
    assert(touched.nonEmpty)
    val afterByRk = g1.collect()
      .map(r => (r.getLong(1), (r.getInt(0), r.getSeq[Long](3)))).toMap
    val untouchedBefore = graphBefore.filter {
      case (_, cl, _) => !touched.contains(cl)
    }
    assert(untouchedBefore.nonEmpty,
      "patch touched every list — the locality claim is untestable here")
    untouchedBefore.foreach { case (rk, cl, nbrs) =>
      val (cl2, nbrs2) = afterByRk(rk)
      assert(cl2 == cl && nbrs2 == nbrs,
        s"untouched node $rk changed across the fold")
    }
  }

  test("an upsert that re-encodes an existing key serves fresh and folds through compact_index") {
    // The content-keyed delta law: an incrementalMerge that changes an
    // EXISTING rk's embedding (same key, new vector) must (1) surface
    // in the fresh-delta buffer even though the rk is already a graph
    // node, (2) mask the STALE graph row out of the shortlist while
    // the fold is pending, and (3) fold away — after compact_index the
    // graph holds exactly the fresh encoding and the delta is empty.
    // Also pins create_index(graph=>true): the index serves graph-ANN
    // with an EMPTY delta from version 1, at the persisted degree m.
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_hnswup_wh").toString
    val cat = new graft.kv.Catalog(spark, wh)
    val corpus8 = corpus.withColumn("embedding",
      concat($"embedding", array(lit(0f), lit(0f), lit(0f), lit(0f))))
    cat.createTable("emb", corpus8.schema, Seq("vec_id"))
    cat.bulkLoad("emb", corpus8, partitions = 2)
    cat.createIndex("emb", "ann", "vector", Seq("embedding"),
      graph = true, graphM = 6)
    // graph built IN the backfill: serves from version 1, empty delta
    val (gInit, dInit) = cat.vectorGraphView("emb", "ann")
    assert(dInit.count() == 0, "create_index(graph) left a fresh delta")
    assert(gInit.count() == corpus8.count())
    // re-encode vec_id 3 to a direction orthogonal to every blob
    val freshVec = Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)
    cat.incrementalMerge("emb",
      Seq((3L, freshVec)).toDF("vec_id", "embedding"))
    val (g0, d0) = cat.vectorGraphView("emb", "ann")
    assert(d0.select($"rk").collect().map(_.getLong(0)).toSet == Set(3L),
      "the re-encoded key did not surface in the content-keyed delta")
    val (_, cent, _) = cat.vectorIndexView("emb", "ann")
    def run(graph: org.apache.spark.sql.DataFrame,
            delta: org.apache.spark.sql.DataFrame,
            qv: Seq[Float]) =
      Hnsw.search(graph, cent, delta.select($"rk", $"v"),
        Seq((999000L, qv)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 5, nprobe = 4, ef = 24, maxVisits = 96)
        .select($"nn", $"score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
    // a query AT the fresh vector finds rk 3 at cosine 1.0 via the
    // delta buffer, pre-fold
    assert(run(g0, d0, freshVec).exists { case (nn, s) => nn == 3L && s > 0.999 },
      "fresh encoding not served from the delta buffer")
    // a query AT the OLD vector must NOT see the stale graph row
    // (cosine 1.0 to itself) — the supersede mask
    val oldVec = corpus8.filter($"vec_id" === 3L)
      .select($"embedding").head().getSeq[Float](0)
    assert(!run(g0, d0, oldVec).exists { case (nn, s) => nn == 3L && s > 0.999 },
      "the stale pre-update encoding still reached the shortlist")
    cat.compactIndex("emb", "ann", "vector")
    val (g1, d1) = cat.vectorGraphView("emb", "ann")
    assert(d1.count() == 0, "delta survived the upsert fold")
    assert(g1.filter($"rk" === 3L).count() == 1,
      "the upserted key is not exactly-once in the folded graph")
    assert(run(g1, d1, freshVec).exists { case (nn, s) => nn == 3L && s > 0.999 },
      "fresh encoding not served from the folded graph")
    // degree law at the persisted m=6 (fold must NOT re-degree at the
    // default 8): every node, including rebuilt lists, stays <= 2m=12
    val maxDeg = g1.select(size($"neighbors").as("d"))
      .agg(max($"d")).head().getInt(0)
    assert(maxDeg <= 12, s"fold re-degreed the graph: max degree $maxDeg > 12")
  }

  test("insert-only folds greedy-link (edge lists append); tombstones force a full rebuild") {
    import spark.implicits._
    val (graph, _) = built
    // the cluster holding rk 3, and three NEW rows near its geometry
    val c3 = graph.filter($"rk" === 3L).select($"cluster").head().getInt(0)
    val member = graph.filter($"rk" === 3L).select($"v").head().getSeq[Float](0)
    val newRows = Seq(
      (9001L, member.updated(1, member(1) + 0.01f)),
      (9002L, member.updated(2, member(2) + 0.02f)),
      (9003L, member.updated(3, member(3) + 0.01f)))
      .toDF("rk", "v").withColumn("cluster", lit(c3))
    val entries = graph.select($"cluster", $"rk", $"v").unionByName(
      newRows.select($"cluster", $"rk", $"v"))
    val folded = Hnsw.foldDelta(graph, entries).cache()
    val before = graph.filter($"cluster" === c3).collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](3)).toMap
    val after = folded.filter($"cluster" === c3).collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](3)).toMap
    // patch-proportional law: every pre-existing node's edge list is a
    // PREFIX of its folded list (back-edges only append) — a full
    // rebuild would re-select edges against the new members
    before.foreach { case (rk, nbrs) =>
      assert(after(rk).startsWith(nbrs),
        s"insert-only fold rebuilt node $rk (old edges not a prefix)")
    }
    Seq(9001L, 9002L, 9003L).foreach { rk =>
      assert(after.contains(rk), s"inserted $rk missing from the fold")
      assert(after(rk).size <= 16, s"inserted $rk over 2m edges")
      assert(after(rk).nonEmpty, s"inserted $rk linked to nothing")
    }
    // the inserted rows are REACHABLE: a beam query at an inserted
    // vector finds it from the folded graph alone (no delta)
    val (_, cents) = built
    val got = Hnsw.search(folded, cents, emptyDelta,
        newRows.limit(1).select(lit(999001L).as("vec_id"),
          $"v".as("embedding")),
        "vec_id", "embedding", k = 5, nprobe = 3, ef = 24, maxVisits = 96)
      .select($"nn").collect().map(_.getLong(0)).toSet
    assert(got.contains(9001L), "greedy-linked insert unreachable by the beam")
    // tombstone on a DELETE-ONLY list: the fold CONSOLIDATES instead
    // of rebuilding (the DiskANN delete-consolidation recipe) — see
    // the dedicated consolidation test below for the full laws; here
    // just the dangling-edge invariant and node removal
    val entries2 = graph.select($"cluster", $"rk", $"v").filter($"rk" =!= 3L)
    val folded2 = Hnsw.foldDelta(graph, entries2).cache()
    assert(folded2.filter($"rk" === 3L).count() == 0)
    assert(!folded2.collect().exists(_.getSeq[Long](3).contains(3L)),
      "a folded edge dangles at the tombstoned node")
    // a list that BOTH lost and gained content stays on the
    // conservative full-rebuild arm: bit-identical to buildGraph
    // over the current members
    val mixedEntries = graph.select($"cluster", $"rk", $"v")
      .filter($"rk" =!= 3L)
      .unionByName(newRows.select($"cluster", $"rk", $"v"))
    val foldedMixed = Hnsw.foldDelta(graph, mixedEntries).cache()
    val rebuiltMixed = Hnsw.buildGraph(
        mixedEntries.filter($"cluster" === c3))
      .collect().map(r => r.getLong(1) -> r.getSeq[Long](3)).toMap
    val foldedMixedList = foldedMixed.filter($"cluster" === c3).collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](3)).toMap
    assert(foldedMixedList == rebuiltMixed,
      "mixed add+delete fold did not fully rebuild the touched list")
  }

  test("tombstone folds consolidate: only ex-neighbors re-link, searches match a rebuild") {
    import spark.implicits._
    val (graph, cents) = built
    // delete three nodes from ONE list
    val c3 = graph.filter($"rk" === 3L).select($"cluster").head().getInt(0)
    val members = graph.filter($"cluster" === c3).select($"rk")
      .collect().map(_.getLong(0)).sorted
    val dead = members.take(3).toSet
    val entries = graph.select($"cluster", $"rk", $"v")
      .filter(!$"rk".isin(dead.toSeq: _*))
    val folded = Hnsw.foldDelta(graph, entries).cache()
    // (1) only the deleted nodes' list is touched: every OTHER list
    // carries over row-identical
    val beforeOther = graph.filter($"cluster" =!= c3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](3))).toSet
    val afterOther = folded.filter($"cluster" =!= c3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](3))).toSet
    assert(afterOther == beforeOther,
      "a list without deletions was touched by the tombstone fold")
    // (2) within the touched list: survivors that never pointed at a
    // deleted node keep their edge lists IDENTICAL (no rebuild ran),
    // and affected survivors keep their surviving edges as a PREFIX
    // with ranked replacements appended
    val before = graph.filter($"cluster" === c3).collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](3)).toMap
    val after = folded.filter($"cluster" === c3).collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](3)).toMap
    assert(dead.forall(d => !after.contains(d)))
    var unaffected = 0
    before.foreach { case (rk, nbrs) =>
      if (!dead.contains(rk)) {
        if (!nbrs.exists(dead.contains)) {
          assert(after(rk) == nbrs,
            s"unaffected survivor $rk was re-linked (rebuild ran)")
          unaffected += 1
        } else {
          val kept = nbrs.filterNot(dead.contains)
          assert(after(rk).startsWith(kept),
            s"affected survivor $rk lost its surviving-edge prefix")
          assert(after(rk).size <= 16, s"survivor $rk over 2m edges")
          assert(!after(rk).exists(dead.contains),
            s"survivor $rk still points at a deleted node")
        }
      }
    }
    assert(unaffected > 0,
      "fixture too dense: every survivor pointed at a deleted node")
    // (3) searches over the consolidated graph match a from-scratch
    // rebuild exactly on this corpus
    val rebuilt = Hnsw.buildGraph(entries).cache()
    val queries = corpus.filter($"vec_id" % 37 === 0)
      .select($"vec_id", $"embedding")
    val viaFold = Hnsw.search(folded, cents, emptyDelta, queries,
        "vec_id", "embedding", k = 5, nprobe = 3, ef = 24, maxVisits = 96)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaRebuild = Hnsw.search(rebuilt, cents, emptyDelta, queries,
        "vec_id", "embedding", k = 5, nprobe = 3, ef = 24, maxVisits = 96)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaFold == viaRebuild,
      "consolidated-graph searches diverge from a from-scratch rebuild")
  }

  test("graph build is deterministic and edges stay within 2m") {
    val (graph, _) = built
    val a = graph.orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getSeq[Long](3)))
    val b = Hnsw.buildGraph(graph.select(col("rk"), col("cluster"), col("v")))
      .orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getSeq[Long](3)))
    assert(a.toSeq == b.toSeq, "two builds of the same snapshot differ")
    a.foreach { case (rk, nbrs) =>
      assert(nbrs.size <= 16, s"node $rk has ${nbrs.size} edges (> 2m)")
      assert(!nbrs.contains(rk), s"node $rk links to itself")
      assert(nbrs.distinct.size == nbrs.size, s"node $rk has dup edges")
    }
  }
}
