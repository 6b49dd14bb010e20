package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text inverted index + search.
  *
  * The reference's full-text flavor is Lucene persisted on HBase
  * (reference: index/lucene/HBaseDirectory.kt — a Lucene Directory
  * whose blocks are HBase cells; LuceneIndexTable.kt declares the
  * index table; README.md lists `lucene` as an index flavor).
  *
  * Spark-first re-expression: the inverted index IS a DataFrame —
  * postings (term, doc_id, tf) plus a dictionary (term, df), built in
  * one explode+groupBy pass (map-side combine; shuffle keyed by term,
  * which is exactly how a distributed index shard layout looks at
  * 100 TB: term-range partitions = index segments). Search never
  * re-scans documents: it filters the postings by term (pushed to
  * parquet when persisted), intersects/unions doc lists, and ranks
  * with tf-idf computed from the same two frames.
  */
object FullText {

  /** ONE tokenizer pattern for index build AND query-side splits — a
    * divergence between them makes phrase/term queries silently miss. */
  private val TokenPattern = "[^a-z0-9]+"

  /** Doc-id block width (2^BlockBits docs per block) for the block-max
    * family — ONE constant shared by the summary builders below and
    * the driver-side ranked read path (Catalog.driverFtTopK), which
    * reconstructs doc ranges from persisted block ids: a divergence
    * between build and read would silently mis-prune whole blocks. */
  val BlockBits: Int = 6

  /** Lowercase alnum tokenizer — deliberately simple and replicable in
    * the DuckDB oracle (string_split_regex with the same pattern).
    * Runs as the native single-pass kernel (plans.TokensExpr, output
    * identical to filter(split(lower(c), TokenPattern), len > 0) for
    * ASCII text): buildPostings/buildPositional evaluate this on every
    * document — the hottest full-scan pass in the module — and the
    * composed form paid a Java-regex split plus an interpreted HOF
    * lambda per row. Sharing ONE kernel with TextFunctions.tokens also
    * eliminates the index/query tokenizer-divergence risk the
    * TokenPattern comment above warns about. */
  def tokenize(c: Column): Column = graft.plans.HashExpressions.tokens(c)

  /** Index terms are lowercased by the tokenizer; every query-side
    * term must normalize the same way or it can never match. */
  private def norm(t: String): String = t.toLowerCase(java.util.Locale.ROOT)

  /** Lowercased non-empty query tokens — the phrase-analysis front
    * step, shared with the driver-side phrase serving path
    * (Catalog.driverFtPhrase) so the two cannot tokenize apart. */
  def normTokens(phrase: String): Seq[String] =
    norm(phrase).split(TokenPattern).filter(_.nonEmpty).toSeq

  // ---- Analyzers -----------------------------------------------------
  // The reference's Lucene stack puts an analyzer pipeline (tokenize →
  // stopwords → stem) behind every index (index/lucene/
  // HBaseDirectory.kt:1-164 is storage plumbing for Lucene, whose
  // Standard/EnglishAnalyzer is the default search contract). Two
  // analyzers here: "standard" (the plain alnum tokenizer above) and
  // "english" (stopword removal + the bounded suffix stemmer), applied
  // IDENTICALLY at index build and query time — the one invariant an
  // analyzer must keep, or morphological queries silently miss.

  /** Lucene's classic English stopword set (StandardAnalyzer /
    * StopAnalyzer default — public contract, 33 words). */
  val StopWordsEn: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  val Analyzers: Set[String] = Set("standard", "english")

  /** Minimal English suffix stemmer (native StemExpr kernel;
    * HashOps.stemWord holds the ordered rule set — bounded enough to
    * replicate term-for-term in the DuckDB oracle's SQL CASE). */
  def stem(c: Column): Column = graft.plans.HashExpressions.stem(c)

  /** The `english` analysis of an already-tokenized term column:
    * drop stopwords, stem the survivors. Shared by the build-side
    * frames and nothing else — query terms go through
    * [[analyzeTerms]], which applies the same two steps in Scala. */
  private def analyzeTermCol(df: DataFrame): DataFrame =
    df.filter(!col("term").isin(StopWordsEn.toSeq: _*))
      .withColumn("term", stem(col("term")))

  /** Query-side analysis: normalize, drop stopwords, stem — the exact
    * build-time pipeline, applied to the user's terms. */
  def analyzeTerms(terms: Seq[String], analyzer: String): Seq[String] = {
    require(Analyzers.contains(analyzer), s"unknown analyzer $analyzer")
    if (analyzer == "standard") terms.map(norm)
    else terms.map(norm).filterNot(StopWordsEn.contains)
      .map(graft.plans.HashOps.stemWord)
  }

  /** The common search epilogue: semi-join the hit doc-ids back to the
    * base table. One implementation so the join-back contract can't
    * diverge between search flavors. */
  private def semiJoinDocs(docs: DataFrame, idCol: String, hits: DataFrame): DataFrame =
    docs.join(hits, docs(idCol) === hits("doc_id"), "left_semi")

  /** Postings list: one row per (term, doc) with term frequency.
    * `analyzer` picks the analysis chain — "standard" (tokenize only)
    * or "english" (tokenize → stopwords → stem). */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
                    analyzer: String = "standard"): DataFrame = {
    require(Analyzers.contains(analyzer), s"unknown analyzer $analyzer")
    val exploded = docs.select(col(idCol).as("doc_id"),
      explode(tokenize(col(textCol))).as("term"))
    val analyzed =
      if (analyzer == "english") analyzeTermCol(exploded) else exploded
    analyzed.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
  }

  /** Dictionary: document frequency per term, plus the STORED term
    * length `tlen`. Storing the length (instead of computing it at
    * query time) is what lets fuzzy search's length band reach the
    * scan as a plain column-range predicate — pushed to parquet
    * row-group stats when the dictionary is persisted, the analog of
    * Lucene bounding fuzzy expansion with a term automaton. */
  def buildDictionary(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("tlen", length(col("term")))

  /** Positional postings: one row per (term, doc, position) — the
    * index shape phrase queries need (Lucene stores positions the
    * same way). Under the `english` analyzer, stopword positions are
    * dropped but the surviving terms KEEP their original offsets
    * (Lucene's StopFilter position-increment behavior), so phrase
    * adjacency never falsely collapses across a removed stopword. */
  def buildPositional(docs: DataFrame, idCol: String, textCol: String,
                      analyzer: String = "standard"): DataFrame = {
    require(Analyzers.contains(analyzer), s"unknown analyzer $analyzer")
    val base = docs.select(col(idCol).as("doc_id"),
        posexplode(tokenize(col(textCol))))
      .select(col("doc_id"), col("col").as("term"), col("pos"))
    if (analyzer == "english") analyzeTermCol(base) else base
  }

  /** Snippet (hit-highlighting) generation — the Lucene-highlighter
    * counterpart of the search queries (reference surface:
    * KtSqlFullTextTable's Lucene delegation includes result
    * presentation): for every document containing `term`, a window of
    * `before` tokens left and `after` tokens right of the FIRST
    * occurrence, plus the occurrence count. The first position and
    * count come from the PERSISTED positional index (an index seek on
    * the term — never a corpus scan for the positions); only the
    * matched documents' text is then tokenized for the window slice,
    * so the text pass is bounded by the hit set, not the corpus.
    * Positions are returned 1-based (the positional frame is 0-based
    * posexplode output). */
  def snippets(docs: DataFrame, idCol: String, textCol: String,
               positional: DataFrame, term: String,
               before: Int = 3, after: Int = 4): DataFrame = {
    // match the extracted TOKEN, not the raw normalized string — a
    // decorated single-token input ("stream.") would otherwise pass
    // the arity check yet silently miss the alnum-tokenized index
    val toks = norm(term).split(TokenPattern).filter(_.nonEmpty)
    require(toks.length == 1, s"snippets takes ONE term, got '$term'")
    val t = toks.head
    val hits = positional.filter(col("term") === t)
      .groupBy(col("doc_id"))
      .agg((min(col("pos")) + 1).as("first_pos"),
        count(lit(1)).as("n_hits"))
    // join FIRST, tokenize the joined frame: Catalyst never pulls a
    // projection up through a join, so tokenizing before the join
    // would pay a full-corpus tokenize pass for a rare term
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__snip_text"))
      .join(hits, Seq("doc_id"))
      .withColumn("toks", tokenize(col("__snip_text")))
      .withColumn("s", greatest(col("first_pos") - before, lit(1)))
      .withColumn("e", least(col("first_pos") + after, size(col("toks"))))
      .select(col("doc_id"), col("first_pos"), col("n_hits"),
        array_join(slice(col("toks"), col("s"), col("e") - col("s") + 1),
          " ").as("snippet"))
  }

  /** Postings derived from the positional frame (tf = position count
    * per (term, doc) — identical to [[buildPostings]] by definition).
    * Index builds that persist BOTH families tokenize the corpus once
    * through [[buildPositional]] and derive the postings here, instead
    * of paying the explode-the-corpus pass twice. */
  def postingsFromPositional(positional: DataFrame): DataFrame =
    positional.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** [[buildPositional]] carrying the per-doc ANALYZED token count on
    * every exploded row: (doc_id, term, pos, dl). Positions keep their
    * ORIGINAL offsets (the StopFilter position-increment contract
    * [[buildPositional]] documents — the filter runs AFTER posexplode);
    * dl is the surviving-token count, computed on the token ARRAY
    * before the explode (for `english`, the stopword-filtered size —
    * stemming never changes the count), so dl == Σ tf over the doc's
    * analyzed postings by construction. Carrying dl on the rows is
    * what lets the ranked-serving artifacts (norms + block stats)
    * derive with NO postings⋈doclens join and no corpus-wide window —
    * the dominant cost of the round-18 index backfill. */
  def buildPositionalWithDl(docs: DataFrame, idCol: String, textCol: String,
                            analyzer: String = "standard"): DataFrame = {
    require(Analyzers.contains(analyzer), s"unknown analyzer $analyzer")
    val toks = tokenize(col(textCol))
    val dl =
      if (analyzer == "english")
        size(filter(toks, t => !t.isin(StopWordsEn.toSeq: _*)))
      else size(toks)
    val base = docs.select(col(idCol).as("doc_id"), dl.cast("long").as("dl"),
        posexplode(toks))
      .select(col("doc_id"), col("col").as("term"), col("pos"), col("dl"))
    if (analyzer == "english") analyzeTermCol(base) else base
  }

  /** Postings carrying dl: (term, doc_id, tf, dl) from the dl-carrying
    * positional frame — the per-doc token count rides the SAME
    * (term, doc) aggregation (dl is constant per doc), so downstream
    * artifact builds never join back to a norms frame. */
  def postingsWithDl(positionalDl: DataFrame): DataFrame =
    positionalDl.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  /** Norms frame (doc_id, dl) from dl-carrying postings: one
    * first-value aggregation, no sum and no join — byte-identical to
    * [[buildDocLens]] of the same postings because dl == Σ tf per doc
    * by [[buildPositionalWithDl]] construction. */
  def doclensFromPostings(postingsDl: DataFrame): DataFrame =
    postingsDl.groupBy("doc_id").agg(first(col("dl")).as("dl"))

  /** [[buildBlockStats]] when the postings already carry dl: the
    * scalar-free (max_tf, min_dl) block summary is ONE aggregation
    * over the postings — the join the two-frame form pays (and the
    * round-18 backfill regression) disappears. */
  def buildBlockStatsWithDl(postingsDl: DataFrame,
                            blockBits: Int = BlockBits): DataFrame =
    postingsDl
      .withColumn("block",
        shiftrightunsigned(col("doc_id").cast("long"), blockBits))
      .groupBy("term", "block")
      .agg(max(col("tf")).cast("long").as("max_tf"),
        min(col("dl")).cast("long").as("min_dl"))

  /** Unit-cost Levenshtein distance — the driver-side replica of
    * Spark's `levenshtein` function (and DuckDB's), shared with the
    * fuzzy serving path (Catalog.driverFtFuzzy) so driver-side
    * expansion and the Spark path's [[searchFuzzy]] can never
    * disagree on which dictionary terms a query matches. Two-row DP,
    * O(|a|·|b|) — bounded by dictionary term lengths. */
  def editDistance(a: String, b: String): Int = {
    if (a == b) return 0
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** Phrase search: docs containing the tokens of `phrase` adjacently
    * in order. Postings for term i are self-joined requiring
    * pos_i = pos_0 + i — each join is keyed (doc, pos), so the work
    * scales with the phrase terms' frequency, not the corpus. */
  def searchPhrase(docs: DataFrame, idCol: String, positional: DataFrame,
                   phrase: String): DataFrame = {
    val terms = norm(phrase).split(TokenPattern).filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "empty phrase")
    val first = positional.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = terms.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      val next = positional.filter(col("term") === t)
        .select(col("doc_id"), col("pos").as(s"p$i"))
      acc.join(next, Seq("doc_id"))
        .filter(col(s"p$i") === col("p0") + i)
        .select(col("doc_id"), col("p0"))
    }
    semiJoinDocs(docs, idCol, matched.select("doc_id").distinct())
  }

  /** Phrase search through an analyzer — the positional counterpart
    * of [[searchAllAnalyzed]]. Without this, a phrase query against
    * an `english` index silently returns nothing: the index terms are
    * stemmed/stopword-filtered while [[searchPhrase]]'s query terms
    * are only lowercased, so they can never match.
    *
    * Lucene's analyzed-phrase contract, replicated exactly: query
    * stopwords are dropped but KEEP their position increment (the
    * StopFilter behavior [[buildPositional]] applies on the index
    * side), so surviving term with original offset o must sit at
    * pos_first + (o − o_first) — "jumped over the dog" matches a doc
    * indexed as jump@i … dog@i+3 with a hole at i+2. */
  def searchPhraseAnalyzed(docs: DataFrame, idCol: String, positional: DataFrame,
                           phrase: String, analyzer: String): DataFrame = {
    require(Analyzers.contains(analyzer), s"unknown analyzer $analyzer")
    if (analyzer == "standard")
      return searchPhrase(docs, idCol, positional, phrase)
    val raw = norm(phrase).split(TokenPattern).filter(_.nonEmpty).toSeq
    require(raw.nonEmpty, "empty phrase")
    val terms = raw.zipWithIndex
      .filterNot { case (t, _) => StopWordsEn.contains(t) }
      .map { case (t, off) => (graft.plans.HashOps.stemWord(t), off) }
    require(terms.nonEmpty,
      "every phrase term is a stopword under this analyzer")
    val (t0, o0) = terms.head
    val first = positional.filter(col("term") === t0)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = terms.drop(1).zipWithIndex.foldLeft(first) {
      case (acc, ((t, off), i)) =>
        val next = positional.filter(col("term") === t)
          .select(col("doc_id"), col("pos").as(s"p${i + 1}"))
        acc.join(next, Seq("doc_id"))
          .filter(col(s"p${i + 1}") === col("p0") + (off - o0))
          .select(col("doc_id"), col("p0"))
    }
    semiJoinDocs(docs, idCol, matched.select("doc_id").distinct())
  }

  /** AND search: docs containing every query term. */
  def searchAll(docs: DataFrame, idCol: String, postings: DataFrame,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val distinctTerms = terms.map(norm).distinct
    val hits = postings.filter(col("term").isin(distinctTerms: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("nterms"))
      .filter(col("nterms") === distinctTerms.length)
      .select("doc_id")
    semiJoinDocs(docs, idCol, hits)
  }

  /** AND search through an analyzer: the query terms go through the
    * SAME stopword+stem chain the index was built with, so
    * morphological variants match ("sparks" finds docs indexed from
    * "spark"/"sparking"/"sparked") and stopword query terms impose no
    * constraint — exactly Lucene's analyzed-query contract. */
  def searchAllAnalyzed(docs: DataFrame, idCol: String, postings: DataFrame,
                        terms: Seq[String], analyzer: String): DataFrame = {
    val analyzed = analyzeTerms(terms, analyzer).distinct
    require(analyzed.nonEmpty,
      "every query term is a stopword under this analyzer")
    searchAll(docs, idCol, postings, analyzed)
  }

  /** OR search: docs containing any query term. */
  def searchAny(docs: DataFrame, idCol: String, postings: DataFrame,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val hits = postings.filter(col("term").isin(terms.map(norm): _*))
      .select("doc_id").distinct()
    semiJoinDocs(docs, idCol, hits)
  }

  /** Prefix search (Lucene PrefixQuery): docs containing any term with
    * the given prefix. The postings are term-sorted on disk, so the
    * prefix filter prunes row groups like an FST prefix seek. */
  def searchPrefix(docs: DataFrame, idCol: String, postings: DataFrame,
                   prefix: String): DataFrame = {
    // every sibling entry point requires non-empty input; here an
    // empty prefix would startsWith-match EVERY term — a full-index
    // scan plus a full-corpus semi-join instead of a seek
    require(norm(prefix).nonEmpty, "prefix search needs a non-empty prefix")
    val hits = postings.filter(col("term").startsWith(norm(prefix)))
      .select("doc_id").distinct()
    semiJoinDocs(docs, idCol, hits)
  }

  /** Fuzzy search (Lucene FuzzyQuery): docs containing a term within
    * `maxEdits` Levenshtein distance of the query term. Expansion runs
    * against the DICTIONARY (|vocab| rows, tiny vs the corpus), then
    * the matched terms join the postings — the corpus is never
    * re-scanned. */
  def searchFuzzy(docs: DataFrame, idCol: String, postings: DataFrame,
                  dictionary: DataFrame, term: String,
                  maxEdits: Int = 1): DataFrame = {
    val q = norm(term)
    // Length-band prefilter: levenshtein(a,b) ≥ |len(a)−len(b)|, so
    // restricting to tlen ∈ [|q|−maxEdits, |q|+maxEdits] is LOSSLESS —
    // and, on a dictionary that stores tlen (buildDictionary), it is a
    // plain column-range predicate the parquet scan prunes row groups
    // with, instead of running the O(|q|·|t|) edit-distance DP against
    // every vocabulary term. Dictionaries from older builds (or the
    // CDC dict fold) without the column fall back to computing the
    // length inline — same semantics, no pushdown.
    val lenCol =
      if (dictionary.columns.contains("tlen")) col("tlen")
      else length(col("term"))
    val matched = dictionary
      .filter(lenCol.between(q.length - maxEdits, q.length + maxEdits))
      .filter(levenshtein(col("term"), lit(q)) <= maxEdits)
      .select("term")
    val hits = postings.join(matched, "term").select("doc_id").distinct()
    semiJoinDocs(docs, idCol, hits)
  }

  /** tf-idf ranked top-k: score(d) = Σ_t tf(t,d) · ln(N/df(t)).
    * Rounded to 4 dp so the ranking column is reproducible bit-for-bit
    * against other engines' libm. */
  def tfidfTopK(postings: DataFrame, dictionary: DataFrame, nDocs: Long,
                terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val q = terms.map(norm)
    val scored = postings.filter(col("term").isin(q: _*))
      .join(broadcast(dictionary.filter(col("term").isin(q: _*))), "term")
      .withColumn("w", col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .groupBy("doc_id").agg(round(sum(col("w")), 4).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Per-document token count — the "norms" frame a BM25 index stores
    * alongside the postings (Lucene persists a length norm per doc per
    * field for exactly this). Derived from the postings alone, so the
    * corpus is never re-scanned. */
  def buildDocLens(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(sum(col("tf")).as("dl"))

  /** BM25 ranked top-k (the reference's full-text flavor is Lucene —
    * index/lucene/LuceneIndexTable.kt — and Lucene's default
    * similarity is BM25):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))
    *
    * All inputs come from the persisted index frames: tf from postings,
    * df from the dictionary, dl from the doclens/norms frame, N and
    * avgdl are index-time scalars. The per-term frames are filtered to
    * the query terms BEFORE any join (postings pruned by the term
    * predicate at the scan; dictionary side broadcast), so query cost
    * scales with the query terms' posting lists, not the corpus. avgdl
    * is passed as totalTokens/N computed from exact integer counts so
    * every engine derives the identical double. Scores rounded to 4 dp
    * for cross-engine reproducibility; ties broken by doc_id. */
  def bm25TopK(postings: DataFrame, dictionary: DataFrame, doclens: DataFrame,
               nDocs: Long, avgdl: Double, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    require(nDocs > 0 && avgdl > 0, "BM25 needs a non-empty corpus")
    val q = terms.map(norm)
    val scored = bm25Score(postings.filter(col("term").isin(q: _*)),
      dictionary.filter(col("term").isin(q: _*)), doclens, nDocs, avgdl, k1, b)
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** The shared exact BM25 scoring tail: per-doc rounded score over an
    * already-term-filtered postings frame (both the exhaustive scorer
    * and the WAND survivors run through this, so they are
    * score-identical by construction). */
  private def bm25Score(qpost: DataFrame, qdict: DataFrame,
                        doclens: DataFrame, nDocs: Long, avgdl: Double,
                        k1: Double, b: Double): DataFrame = {
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    qpost.join(broadcast(qdict), "term")
      .join(doclens, "doc_id")
      .withColumn("w", w)
      .groupBy("doc_id").agg(round(sum(col("w")), 4).as("score"))
  }

  /** Per-(term, doc-id block) MAX BM25 impact — the block-max index
    * Lucene 8+ persists beside every postings list (the Block-Max
    * WAND structure; Ding & Suel 2011, "Faster top-k document
    * retrieval using block-max indexes"): each posting's full
    * document-dependent impact is computable at INDEX time (tf, dl
    * and df are all index-time values), so the summary stores, per
    * term and per fixed doc-id range of 2^blockBits docs, the largest
    * score any document in that range could contribute for the term.
    * Derived from the persisted postings/norms/dictionary frames
    * alone — the corpus is never re-scanned — and cost ∝ |postings|,
    * once, amortized over every ranked query. */
  def buildBlockMax(postings: DataFrame, doclens: DataFrame,
                    dictionary: DataFrame, nDocs: Long, avgdl: Double,
                    blockBits: Int = BlockBits, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    require(nDocs > 0 && avgdl > 0, "block-max needs a non-empty corpus")
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val impact = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    postings.join(doclens, "doc_id")
      .join(dictionary, "term")
      .withColumn("block",
        shiftrightunsigned(col("doc_id").cast("long"), blockBits))
      .withColumn("impact", impact)
      .groupBy("term", "block").agg(max(col("impact")).as("ub"))
  }

  /** Per-(term, doc-id block) SCALAR-FREE block statistics — the
    * PERSISTED form of the block-max summary ([[buildBlockMax]]) the
    * driver-side ranked serving path seeks (Catalog.driverFtTopK).
    * Stores (max tf, min dl) per (term, block of 2^blockBits doc ids)
    * instead of a precomputed impact: the BM25 impact
    *   idf(df) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * is monotone INCREASING in tf and DECREASING in dl for any
    * positive (k1, b, avgdl), and idf is a per-term factor — so
    *   impact(tf, dl) ≤ idf_now(t) · f(max_tf, min_dl | avgdl_now)
    * holds under the LIVE (N, df, avgdl) scalars, whatever they have
    * drifted to since the summary was built. A stored impact would
    * NOT survive that drift (avgdl growth raises true impacts above
    * a stale bound — unsafe pruning); (max_tf, min_dl) does, which is
    * what lets CDC segments append without invalidating the persisted
    * summary. Derived from the persisted postings/norms frames alone;
    * cost ∝ |postings|, once per backfill/fold/refresh. */
  def buildBlockStats(postings: DataFrame, doclens: DataFrame,
                      blockBits: Int = BlockBits): DataFrame =
    postings.join(doclens, "doc_id")
      .withColumn("block",
        shiftrightunsigned(col("doc_id").cast("long"), blockBits))
      .groupBy("term", "block")
      .agg(max(col("tf")).cast("long").as("max_tf"),
        min(col("dl")).cast("long").as("min_dl"))

  /** BM25 ranked top-k with BLOCK-MAX WAND pruning — result
    * hash-identical to [[bm25TopK]] (same scoring tail, and the
    * pruning bound is proven safe below), but only the postings of
    * SURVIVING blocks are ever scored: the difference between scoring
    * |matching postings| and |candidate postings| at 100 TB, exactly
    * the trade Lucene ships as its default since 8.0.
    *
    * The Spark-set-based adaptation of the cursor algorithm — two
    * bounded phases instead of a sequential document-at-a-time walk
    * (which cannot distribute):
    *   1. SEED: the `seedBlocks` blocks with the highest summed
    *      per-term upper bounds are scored exactly; the k-th best
    *      seed score is the pruning threshold θ. (Driver state:
    *      `seedBlocks` block ids + one double — k-bounded.)
    *   2. PRUNE + SCORE: every block whose summed upper bound is
    *      below θ − 1e-4 is dropped WITHOUT scoring a posting — for
    *      any doc d in block B, score(d) ≤ Σ_t ub(t,B) = ubsum(B),
    *      and round4(score) ≤ score + 5e-5 < θ strictly, so no
    *      pruned doc can reach or TIE the k-th seed (ties would
    *      reorder on doc_id). Surviving blocks (the seed always
    *      survives its own θ) run the shared exact scoring tail.
    * Returns (top-k frame, surviving postings, matching postings) —
    * the counts WandSpec pins; callers use [[bm25WandTopK]]. */
  private[graft] def bm25WandPlan(postings: DataFrame, dictionary: DataFrame,
                                  doclens: DataFrame, blockmax: DataFrame,
                                  nDocs: Long, avgdl: Double,
                                  terms: Seq[String], k: Int,
                                  k1: Double = 1.2, b: Double = 0.75,
                                  blockBits: Int = BlockBits, seedBlocks: Int = 4)
      : (DataFrame, DataFrame, DataFrame) = {
    require(terms.nonEmpty, "empty term list")
    require(nDocs > 0 && avgdl > 0, "BM25 needs a non-empty corpus")
    val q = terms.map(norm)
    val qdict = dictionary.filter(col("term").isin(q: _*))
    val qpost = postings.filter(col("term").isin(q: _*))
      .withColumn("block",
        shiftrightunsigned(col("doc_id").cast("long"), blockBits))
    val blockUb = blockmax.filter(col("term").isin(q: _*))
      .groupBy("block").agg(sum(col("ub")).as("ubsum"))
    val seed = blockUb.orderBy(col("ubsum").desc, col("block"))
      .limit(seedBlocks).collect().map(_.getLong(0)).toSeq
    val seedTop = bm25Score(qpost.filter(col("block").isin(seed: _*)),
        qdict, doclens, nDocs, avgdl, k1, b)
      .orderBy(col("score").desc, col("doc_id")).limit(k).collect()
    val theta =
      if (seedTop.length < k) Double.NegativeInfinity
      else seedTop.last.getAs[Double]("score")
    val surviving = qpost
      .join(broadcast(blockUb.filter(col("ubsum") >= lit(theta - 1e-4))
        .select("block")), "block")
    val topk = bm25Score(surviving, qdict, doclens, nDocs, avgdl, k1, b)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
    (topk, surviving, qpost)
  }

  /** See [[bm25WandPlan]]. */
  def bm25WandTopK(postings: DataFrame, dictionary: DataFrame,
                   doclens: DataFrame, blockmax: DataFrame, nDocs: Long,
                   avgdl: Double, terms: Seq[String], k: Int,
                   k1: Double = 1.2, b: Double = 0.75, blockBits: Int = BlockBits,
                   seedBlocks: Int = 4): DataFrame =
    bm25WandPlan(postings, dictionary, doclens, blockmax, nDocs, avgdl,
      terms, k, k1, b, blockBits, seedBlocks)._1
}
