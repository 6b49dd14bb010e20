package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-based ANN — the navigable-small-world / DiskANN family, the
  * last major ANN axis beside the LSH / IVF / PQ flavors already in
  * graft.similarity. (Malkov & Yashunin 2016, HNSW; Subramanya et al.
  * 2019, DiskANN. The reference engine has no vector surface — this
  * extends the pipeline the brief's similarity-search mandate adds.)
  *
  * Spark-first adaptation — a SEQUENTIAL global graph build/traverse
  * does not distribute, so the graph is SHARDED BY COARSE CLUSTER
  * (the persisted vector flavor's IVF assignment, list size ~√N by
  * construction):
  *
  *   - BUILD (DDL): per cluster, an m-NN graph over the list —
  *     symmetrized out-edges (in-edges appended, capped at 2m) so
  *     greedy descent cannot get stuck on a sink. One
  *     `flatMapGroups` per cluster; O(|list|²) kernel evaluations
  *     inside one task, the same within-list cost class as SemDeDup
  *     — a bounded DDL pass, amortized across every later search.
  *     Persisted shape: (cluster, rk, v, neighbors) — rides the
  *     `vector` flavor's dirs like cent/vmeta.
  *   - SEARCH: coarse-probe nprobe lists per query (the IVF probe),
  *     then per (query, probed list) a BOUNDED BEAM descent over the
  *     persisted adjacency: best-first from deterministic entry
  *     seeds, beam width `ef`, hard visit cap `maxVisits`. Kernel
  *     evaluations per query ≤ nprobe·maxVisits — SUBLINEAR in the
  *     list size (HnswSpec pins the visited fraction on a clustered
  *     corpus), where ivfSearch pays the full probed-list kernel
  *     cost. Data MOVEMENT is one shuffle of the probed lists per
  *     query batch (the same envelope as ivfSearch — the win is the
  *     distance-kernel budget, exactly the DiskANN serving trade).
  *   - FRESHNESS: view rows NOT yet in the graph artifact (CDC
  *     segments appended since the last graph build) form the DELTA
  *     BUFFER, scanned exhaustively per query batch — patch-sized
  *     between index rebuilds, the DiskANN fresh-buffer recipe — and
  *     unioned into the shortlist before the exact re-rank.
  *
  * Scores are EXACT cosines throughout (vectors ride with the graph
  * rows), rounded like ivfSearch — the graph only decides WHICH
  * candidates are scored, so the shortlist-union re-rank is exact.
  */
object Hnsw {

  /** Persisted per-cluster navigable graph: (cluster, rk, v,
    * neighbors). Deterministic — edges are top-m by (cosine desc, rk
    * asc), in-edges appended in rk order, so two builds of the same
    * snapshot are identical. */
  def buildGraph(entries: DataFrame, m: Int = 8): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val spark = entries.sparkSession
    import spark.implicits._
    val slim = entries.select(col("cluster").cast("int"),
      col("rk").cast("long"), col("v"))
    slim.as[(Int, Long, Seq[Float])].groupByKey(_._1)
      .flatMapGroups { (cluster: Int, it: Iterator[(Int, Long, Seq[Float])]) =>
        val rows = it.map { case (_, rk, v) => (rk, v.toArray) }.toArray
          .sortBy(_._1)
        val n = rows.length
        val out = Array.fill(n)(scala.collection.mutable.ArrayBuffer[Long]())
        val idxOf = rows.iterator.map(_._1).zipWithIndex.toMap
        var i = 0
        while (i < n) {
          // top-m out-edges by (cosine desc, rk asc)
          val cands = new Array[(Double, Long)](n - 1)
          var j = 0; var w = 0
          while (j < n) {
            if (j != i) {
              cands(w) = (cos(rows(i)._2, rows(j)._2), rows(j)._1); w += 1
            }
            j += 1
          }
          val edgeOrd: Ordering[(Double, Long)] =
            Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
          java.util.Arrays.sort(cands, edgeOrd)
          out(i) ++= cands.iterator.take(m).map(_._2)
          i += 1
        }
        // symmetrize: append in-edges (rk order), cap at 2m
        val in = Array.fill(n)(scala.collection.mutable.ArrayBuffer[Long]())
        i = 0
        while (i < n) {
          out(i).foreach(t => in(idxOf(t)) += rows(i)._1)
          i += 1
        }
        rows.iterator.zipWithIndex.map { case ((rk, v), ix) =>
          val nbrs = (out(ix) ++ in(ix).sorted).distinct.take(2 * m)
          (cluster, rk, v.toSeq, nbrs.toSeq)
        }
      }
      .toDF("cluster", "rk", "v", "neighbors")
  }

  /** Beam search over the sharded graph + exhaustive delta scan →
    * exact-rescored top-k per query: (qid, rn, nn, score). `delta` is
    * the fresh buffer (rk, v) — pass an empty frame when the graph
    * covers the whole view. */
  def search(nodes: DataFrame, centroids: DataFrame, delta: DataFrame,
             queries: DataFrame, idCol: String, vecCol: String, k: Int,
             nprobe: Int = 4, ef: Int = 16, maxVisits: Int = 64): DataFrame =
    Ann.rank(searchStats(nodes, centroids, delta, queries, idCol, vecCol,
      nprobe, ef, maxVisits).drop("visited", "cluster"), k)

  /** The shortlist WITH per-(query,list) visit counts — the
    * sublinearity diagnostic HnswSpec pins ((qid, cluster, nn, score,
    * visited); `visited` repeats per emitted candidate of one
    * (query, list) descent, `cluster` identifies THAT descent so two
    * probed lists with equal visit counts never collapse under a
    * distinct, and delta-buffer rows carry (cluster = -1,
    * visited = 0)). */
  private[graft] def searchStats(nodes: DataFrame, centroids: DataFrame,
                                 delta: DataFrame, queries: DataFrame,
                                 idCol: String, vecCol: String,
                                 nprobe: Int, ef: Int,
                                 maxVisits: Int): DataFrame = {
    require(ef > 0 && maxVisits >= ef,
      s"need maxVisits ($maxVisits) >= ef ($ef) > 0")
    val spark = nodes.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probes = Ann.coarseProbes(centroids, q, nprobe, keep = Seq("qv"))
      .select(col("qid"), col("qv"), col("cluster"))
    // one shuffle of the probed lists per query batch (the ivfSearch
    // envelope); the beam then bounds the KERNEL work per group
    val grouped = nodes
      .join(broadcast(probes), Seq("cluster"))
      .select(col("qid").cast("long"), col("cluster").cast("int"),
        col("qv"), col("rk").cast("long"), col("v"), col("neighbors"))
      .as[(Long, Int, Seq[Float], Long, Seq[Float], Seq[Long])]
    val beamHits = grouped.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, Int), it: Iterator[(Long, Int, Seq[Float], Long, Seq[Float], Seq[Long])]) =>
        val rows = it.toArray
        val qid = rows(0)._1
        val cluster = key._2
        val qv = rows(0)._3.toArray
        val byRk = rows.iterator.map(r => r._4 -> r).toMap
        // deterministic multi-seed entry: evenly spaced in rk order —
        // the flat-graph stand-in for HNSW's upper layers; bounded,
        // and it bridges a disconnected component the m-NN graph may
        // leave
        val sortedRks = rows.map(_._4).sorted
        val nSeeds = math.max(1, ef / 4)
        val seeds = (0 until nSeeds)
          .map(s => sortedRks(((s.toLong * sortedRks.length) / nSeeds).toInt))
          .distinct
        val visited = scala.collection.mutable.Set[Long]()
        // frontier: best-first by similarity; shortlist: top-ef found
        implicit val ord: Ordering[(Double, Long)] =
          Ordering.Tuple2(Ordering[Double], Ordering[Long].reverse)
        val frontier = scala.collection.mutable.PriorityQueue[(Double, Long)]()
        val short = scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord.reverse)
        def visit(rk: Long): Unit = if (visited.add(rk)) {
          val s = cos(qv, byRk(rk)._5.toArray)
          frontier.enqueue((s, rk))
          short.enqueue((s, rk))
          if (short.size > ef) { short.dequeue(); () }
        }
        seeds.foreach(visit)
        var expanded = 0
        while (frontier.nonEmpty && visited.size < maxVisits &&
            expanded < maxVisits) {
          val (s, rk) = frontier.dequeue()
          // beam bound: stop descending from nodes worse than the
          // current ef-th best once the shortlist is full
          if (short.size < ef || s >= short.head._1) {
            expanded += 1
            byRk(rk)._6.foreach { nb =>
              if (visited.size < maxVisits && byRk.contains(nb)) visit(nb)
            }
          }
        }
        val nVisited = visited.size
        short.dequeueAll.iterator.map { sr: (Double, Long) =>
          (qid, cluster, sr._2, sr._1, nVisited)
        }
      }
      .toDF("qid", "cluster", "nn", "score", "visited")
    // fresh-delta buffer: exhaustive exact scan (patch-sized between
    // graph rebuilds), broadcast against the query batch
    val deltaHits = delta.select(col("rk").as("nn"), col("v"))
      .crossJoin(broadcast(q))
      .select(col("qid"), lit(-1).as("cluster"), col("nn"),
        cosineCol(col("qv"), col("v")).as("score"), lit(0).as("visited"))
    // a delta row can SUPERSEDE a graph node (a content-keyed delta
    // carries an upsert that re-encoded an existing rk): the stale
    // graph row still serves the TRAVERSAL above, but only the fresh
    // encoding may reach the shortlist — anti-join the beam hits
    // against the (patch-sized, broadcast) delta rk set
    val beamLive = beamHits.join(
      broadcast(delta.select(col("rk").as("nn")).distinct()),
      Seq("nn"), "left_anti")
    beamLive.select(col("qid"), col("cluster"), col("nn"),
        round(col("score"), 3).as("score"), col("visited"))
      .unionByName(deltaHits
        .select(col("qid"), col("cluster"), col("nn"),
          round(col("score"), 3).as("score"), col("visited")))
      .filter(col("nn") =!= col("qid"))
  }

  /** Fold the CURRENT entry set into a persisted per-list graph — the
    * index-maintenance kernel `CALL system.compact_index` runs so the
    * exhaustive-scan fresh-delta buffer stays patch-sized under
    * continuous CDC (the DiskANN merge step, list-sharded): a list is
    * TOUCHED iff it gained a row (a CDC append outside the graph),
    * lost one (a tombstoned node still in the graph), or holds a row
    * whose CONTENT changed; touched lists rebuild from the current
    * entries — O(|list|²) kernels per touched list, the same cost
    * class as the original build but paid only where the data moved —
    * and untouched lists carry over UNCHANGED (HnswSpec pins
    * row-identity).
    *
    * Change detection keys on CONTENT, not just rk: an
    * incrementalMerge upsert that re-encodes an EXISTING key (same
    * rk, new v, possibly a new cluster) is in neither rk-only
    * anti-join — content keys classify it as removed from the list
    * holding the stale encoding AND added to the list the fresh one
    * lands in, so both rebuild and the stale (cluster, v, neighbors)
    * row cannot be carried forward forever (HnswSpec pins the upsert
    * round-trip). `entries` is the folded view (cluster, rk, v);
    * determinism follows from buildGraph's. */
  def foldDelta(graph: DataFrame, entries: DataFrame, m: Int = 8): DataFrame = {
    val cur = entries.select(col("cluster").cast("int"),
      col("rk").cast("long"), col("v"))
    val gKeys = graph.select(col("cluster").cast("int"),
      col("rk").cast("long"), col("v"))
    val added = cur.join(gKeys, Seq("rk", "cluster", "v"), "left_anti")
    val addedLists = added.select(col("cluster")).distinct()
    val removedLists = gKeys
      .join(cur, Seq("rk", "cluster", "v"), "left_anti")
      .select(col("cluster")).distinct()
    // Three grades of touched list, the DiskANN merge split:
    //   - a MIXED list (lost AND gained content — e.g. a re-encode
    //     whose stale row and fresh row land in the same list)
    //     REBUILDS in full — the conservative arm;
    //   - a DELETE-ONLY list consolidates in place
    //     ([[deleteConsolidate]] — the DiskANN delete-consolidation
    //     recipe): tombstoned nodes are masked out of the adjacency
    //     and ONLY their ex-neighbors re-link, each patching its
    //     dangling edges with ranked candidates drawn from the
    //     deleted node's own edge list — O(|deleted|·deg²) kernels
    //     instead of O(|list|²), and nodes that never pointed at a
    //     deleted node keep their edge lists IDENTICAL (the
    //     no-rebuild observable HnswSpec pins, alongside
    //     search-equality with a from-scratch rebuild);
    //   - an INSERT-ONLY list greedy-links just the new nodes
    //     (exact top-m out-edges over the current members, back-edges
    //     appended capped at 2m — existing nodes keep their edge list
    //     as a PREFIX), so a pure-add fold costs O(|delta|·|list|)
    //     kernels instead of O(|list|²) (HnswSpec pins both the
    //     prefix law and the consolidation laws).
    val rebuildLists = removedLists.join(addedLists, Seq("cluster"), "left_semi")
    val deleteLists = removedLists.join(addedLists, Seq("cluster"), "left_anti")
    val insertLists = addedLists.join(removedLists, Seq("cluster"), "left_anti")
    val touched = addedLists.unionByName(removedLists).distinct()
    val untouched = graph
      .join(touched, Seq("cluster"), "left_anti")
      .select(col("cluster"), col("rk"), col("v"), col("neighbors"))
    val rebuilt = buildGraph(
      cur.join(rebuildLists, Seq("cluster"), "left_semi"), m)
      .select(col("cluster"), col("rk"), col("v"), col("neighbors"))
    val consolidated = deleteConsolidate(
      graph.join(deleteLists, Seq("cluster"), "left_semi")
        .select(col("cluster"), col("rk"), col("v"), col("neighbors")),
      gKeys.join(cur, Seq("rk", "cluster", "v"), "left_anti")
        .join(deleteLists, Seq("cluster"), "left_semi")
        .select(col("cluster"), col("rk")), m)
    val inserted = insertGreedy(
      graph.join(insertLists, Seq("cluster"), "left_semi")
        .select(col("cluster"), col("rk"), col("v"), col("neighbors")),
      added.join(insertLists, Seq("cluster"), "left_semi"), m)
    untouched.unionByName(rebuilt).unionByName(consolidated)
      .unionByName(inserted)
  }

  /** DiskANN delete-consolidation for DELETE-ONLY lists (Subramanya
    * et al. 2019 §4; the FreshDiskANN merge's delete phase): deleted
    * nodes leave the graph, and each SURVIVOR that pointed at one
    * patches its dangling edges by ranking the deleted node's own
    * neighbors (the standard candidate set — the deleted node's edges
    * are exactly the short-cuts its removal severs) and appending the
    * best `dropped` of them (cosine desc, rk asc; capped at 2m, never
    * a duplicate/self/deleted target). Survivors with NO deleted
    * neighbor keep their edge lists IDENTICAL — the observable that
    * proves no rebuild ran. Kernel cost: O(|deleted|·deg²) — each
    * (affected survivor × candidate) pair measured once — vs the full
    * rebuild's O(|list|²). Deterministic: candidate ranking has a
    * total order and survivors fold independently. */
  private[graft] def deleteConsolidate(existing: DataFrame,
                                       removedKeys: DataFrame,
                                       m: Int): DataFrame = {
    val spark = existing.sparkSession
    import spark.implicits._
    val ex = existing.select(col("cluster").cast("int"),
        col("rk").cast("long"), col("v"), col("neighbors"))
      .as[(Int, Long, Seq[Float], Seq[Long])]
      .map(r => (r._1, r._2, r._3, r._4, false))
    val rm = removedKeys.select(col("cluster").cast("int"),
        col("rk").cast("long"))
      .as[(Int, Long)]
      .map(r => (r._1, r._2, Seq.empty[Float], Seq.empty[Long], true))
    ex.union(rm).groupByKey(_._1)
      .flatMapGroups { (cluster: Int, it: Iterator[(Int, Long, Seq[Float], Seq[Long], Boolean)]) =>
        val rows = it.toArray
        val deleted = rows.iterator.filter(_._5).map(_._2).toSet
        val nodes = rows.filter(!_._5)
        val byRk = nodes.iterator.map(r => r._2 -> r).toMap
        val edgeOrd: Ordering[(Double, Long)] =
          Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
        nodes.iterator.filter(r => !deleted.contains(r._2)).map { r =>
          val rk = r._2
          val nbrs = r._4
          if (!nbrs.exists(deleted.contains)) (cluster, rk, r._3, nbrs)
          else {
            val kept = nbrs.filterNot(deleted.contains)
            val dropped = nbrs.size - kept.size
            val keptSet = kept.toSet
            val va = r._3.toArray
            val cands = nbrs.iterator.filter(deleted.contains)
              .flatMap(d => byRk.get(d).iterator.flatMap(_._4.iterator))
              .filter(c => !deleted.contains(c) && c != rk &&
                !keptSet.contains(c) && byRk.contains(c))
              .toSeq.distinct
              .map(c => (cos(va, byRk(c)._3.toArray), c))
              .sorted(edgeOrd)
            val add = cands.iterator.map(_._2)
              .take(math.min(dropped, math.max(0, 2 * m - kept.size)))
              .toSeq
            (cluster, rk, r._3, kept ++ add)
          }
        }
      }
      .toDF("cluster", "rk", "v", "neighbors")
  }

  /** Patch-proportional insert fold for PURE-ADD lists (the DiskANN
    * single-node insert): new nodes enter in rk order, each taking
    * exact top-m out-edges by (cosine desc, rk asc) over the list's
    * CURRENT members (existing + previously inserted — so a batch of
    * mutually-near inserts still links together), and appending a
    * back-edge on each target while its degree is under 2m. Existing
    * nodes' edge lists only ever APPEND (their old list is a prefix —
    * the observable that proves no rebuild ran), and determinism
    * follows from the rk ordering. A list with NO existing graph rows
    * (an empty coarse cell receiving its first entries) degenerates
    * to the same greedy chain — bounded, searchable through the
    * evenly-spaced entry seeds. */
  private[graft] def insertGreedy(existing: DataFrame, added: DataFrame,
                                  m: Int): DataFrame = {
    val spark = existing.sparkSession
    import spark.implicits._
    val ex = existing.select(col("cluster").cast("int"),
        col("rk").cast("long"), col("v"), col("neighbors"))
      .as[(Int, Long, Seq[Float], Seq[Long])]
      .map(r => (r._1, r._2, r._3, r._4, false))
    val ad = added.select(col("cluster").cast("int"),
        col("rk").cast("long"), col("v"))
      .as[(Int, Long, Seq[Float])]
      .map(r => (r._1, r._2, r._3, Seq.empty[Long], true))
    ex.union(ad).groupByKey(_._1)
      .flatMapGroups { (cluster: Int, it: Iterator[(Int, Long, Seq[Float], Seq[Long], Boolean)]) =>
        val rows = it.toArray
        val (news, olds) = rows.partition(_._5)
        val adj = scala.collection.mutable.LinkedHashMap[Long,
          (Array[Float], scala.collection.mutable.ArrayBuffer[Long])]()
        olds.sortBy(_._2).foreach { r =>
          adj(r._2) = (r._3.toArray,
            scala.collection.mutable.ArrayBuffer(r._4: _*))
        }
        val edgeOrd: Ordering[(Double, Long)] =
          Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
        news.sortBy(_._2).foreach { r =>
          val rk = r._2
          val v = r._3.toArray
          val cands = adj.iterator
            .map { case (orK, (ov, _)) => (cos(v, ov), orK) }.toArray
          java.util.Arrays.sort(cands, edgeOrd)
          val out = cands.iterator.take(m).map(_._2).toSeq
          adj(rk) = (v, scala.collection.mutable.ArrayBuffer(out: _*))
          out.foreach { t =>
            val tbuf = adj(t)._2
            if (tbuf.length < 2 * m && !tbuf.contains(rk)) tbuf += rk
          }
        }
        adj.iterator.map { case (rk, (v, nb)) =>
          (cluster, rk, v.toSeq, nb.distinct.take(2 * m).toSeq)
        }
      }
      .toDF("cluster", "rk", "v", "neighbors")
  }

  /** Label-FILTERED beam search — the filtered-HNSW recipe (and
    * filteredIvfSearch's contract, re-expressed on the graph): only
    * label-matching nodes enter the SHORTLIST, but the beam TRAVERSES
    * through non-matching nodes — filtering the graph itself would
    * disconnect it exactly for the rare labels that need the index
    * most. Labels join rk-keyed AFTER the probe join (probe-bounded,
    * the filteredIvfSearch join-order contract); the delta buffer
    * filters on the label directly (patch-sized). Returns (qid, rn,
    * nn, score) with EVERY row label-matching by construction. */
  def filteredSearch(nodes: DataFrame, centroids: DataFrame,
                     delta: DataFrame, attrs: DataFrame,
                     queries: DataFrame, idCol: String, vecCol: String,
                     attrCol: String, k: Int, nprobe: Int = 4,
                     ef: Int = 16, maxVisits: Int = 64): DataFrame = {
    require(ef > 0 && maxVisits >= ef,
      s"need maxVisits ($maxVisits) >= ef ($ef) > 0")
    val spark = nodes.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      col(attrCol).cast("long").as("qattr"))
    val probes = Ann.coarseProbes(centroids, q, nprobe,
        keep = Seq("qv", "qattr"))
      .select(col("qid"), col("qv"), col("qattr"), col("cluster"))
    val lbl = attrs.select(col(idCol).as("rk"),
      col(attrCol).cast("long").as("label"))
    // LEFT join: a graph node absent from attrs still enters the
    // TRAVERSAL (dropping it would re-introduce the disconnection the
    // beam design avoids for partial labelings) — its null label maps
    // to a sentinel no qattr can equal, so it never reaches the
    // shortlist.
    val grouped = nodes
      .join(broadcast(probes), Seq("cluster"))
      .join(lbl, Seq("rk"), "left")
      .select(col("qid").cast("long"), col("cluster").cast("int"),
        col("qv"), col("qattr"), col("rk").cast("long"), col("v"),
        col("neighbors"),
        coalesce(col("label"), lit(Long.MinValue)).as("label"))
      .as[(Long, Int, Seq[Float], Long, Long, Seq[Float], Seq[Long], Long)]
    val beamHits = grouped.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_: (Long, Int), it: Iterator[(Long, Int, Seq[Float], Long, Long, Seq[Float], Seq[Long], Long)]) =>
        val rows = it.toArray
        val qid = rows(0)._1
        val qv = rows(0)._3.toArray
        val qattr = rows(0)._4
        val byRk = rows.iterator.map(r => r._5 -> r).toMap
        val sortedRks = rows.map(_._5).sorted
        val nSeeds = math.max(1, ef / 4)
        val seeds = (0 until nSeeds)
          .map(s => sortedRks(((s.toLong * sortedRks.length) / nSeeds).toInt))
          .distinct
        val visited = scala.collection.mutable.Set[Long]()
        implicit val ord: Ordering[(Double, Long)] =
          Ordering.Tuple2(Ordering[Double], Ordering[Long].reverse)
        val frontier = scala.collection.mutable.PriorityQueue[(Double, Long)]()
        val short = scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord.reverse)
        def visit(rk: Long): Unit = if (visited.add(rk)) {
          val s = cos(qv, byRk(rk)._6.toArray)
          frontier.enqueue((s, rk))
          // the traversal crosses every label; only matches SCORE
          if (byRk(rk)._8 == qattr) {
            short.enqueue((s, rk))
            if (short.size > ef) { short.dequeue(); () }
          }
        }
        seeds.foreach(visit)
        var expanded = 0
        while (frontier.nonEmpty && visited.size < maxVisits &&
            expanded < maxVisits) {
          val (s, rk) = frontier.dequeue()
          if (short.size < ef || s >= short.head._1) {
            expanded += 1
            byRk(rk)._7.foreach { nb =>
              if (visited.size < maxVisits && byRk.contains(nb)) visit(nb)
            }
          }
        }
        short.dequeueAll.iterator.map { sr: (Double, Long) =>
          (qid, sr._2, sr._1)
        }
      }
      .toDF("qid", "nn", "score")
    val deltaHits = delta.select(col("rk").as("nn"), col("v"))
      .join(lbl.select(col("rk").as("nn"), col("label")), Seq("nn"))
      .crossJoin(broadcast(q))
      .filter(col("label") === col("qattr"))
      .select(col("qid"), col("nn"), cosineCol(col("qv"), col("v")).as("score"))
    // same supersede rule as searchStats: a graph row whose rk has a
    // fresh delta encoding traverses but never scores
    val beamLive = beamHits.join(
      broadcast(delta.select(col("rk").as("nn")).distinct()),
      Seq("nn"), "left_anti")
    Ann.rank(
      beamLive.select(col("qid"), col("nn"), round(col("score"), 3).as("score"))
        .unionByName(deltaHits
          .select(col("qid"), col("nn"), round(col("score"), 3).as("score")))
        .filter(col("nn") =!= col("qid")), k)
  }

  private def cosineCol(a: Column, b: Column): Column =
    graft.plans.HashExpressions.cosineSim(a, b)

  /** Scala-side cosine, matching the codegen kernel's arithmetic
    * (double accumulation over float inputs). */
  private[similarity] def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
