package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SparkEntry wiring for SURVEY.md §2 "text analysis". */
object TextQueries {
  import TextFunctions._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          wsTokenCount($"text").as("n_ws"),
          size(tokens($"text")).as("n_words"),
          bpeishCount($"text").as("n_bpeish"))
        .orderBy($"doc_id")
    },

    "txt_bpe_tokens" -> { (s, d) =>
      import s.implicits._
      // REAL subword counts (greedy BPE over the in-repo merges
      // table) next to the word counts — the budget column a trainer
      // denominates in, feeding the mixture/packing/chunking
      // operators. One codegen'd pass per doc (BpeCountExpr shares
      // the per-word cache with BpeTokensExpr); greedy merge loops
      // aren't SQL-expressible → rows-only, BpeSpec holds the
      // brute-force-reference ground truth.
      Tables.documents(s, d)
        .select($"doc_id",
          size(tokens($"text")).as("n_words"),
          bpeTokenCount($"text").as("n_bpe"),
          size(array_distinct(bpeTokens($"text"))).as("n_bpe_distinct"))
        .withColumn("subwords_per_word",
          when($"n_words" > 0,
            round($"n_bpe".cast("double") / $"n_words", 4)).otherwise(lit(0.0)))
        .orderBy($"doc_id")
    },

    "txt_quality" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          length($"text").as("n_chars"),
          round(stopwordRatio($"text"), 4).as("stop_ratio"),
          round(alnumRatio($"text"), 4).as("alnum_ratio"),
          qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    },

    "txt_langid" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", langId($"text").as("lang_detected"))
        .groupBy($"lang_detected").agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang_detected")
    },

    "txt_fingerprint" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    },

    "txt_pipeline" -> { (s, d) =>
      import s.implicits._
      // the training-data pipeline composed end-to-end: language gate →
      // quality gate → exact dedup (keep smallest id per content key) →
      // per-source corpus stats, in ONE corpus scan. The regex-heavy
      // quality score is computed ONCE per row: Catalyst re-inlines an
      // aliased deterministic expression into any filter it pushes back
      // through the Project, so the projection carries a
      // nondeterministic sentinel that the quality gate references —
      // that pins the gate above the projection (a Project with a
      // nondeterministic field is not pushed through) at the cost of a
      // free per-row partition id. The dedup keeper is the bounded-heap
      // TopKPerGroup (k=1 per content key, map-side combining): the
      // groupBy+semi-join formulation it replaces scanned and scored
      // the corpus TWICE (once per join branch).
      val gated = Tables.documents(s, d)
        .filter(langId($"text") === "en")
        .select($"doc_id", $"text", $"source",
          qualityScore($"text").as("quality"),
          spark_partition_id().as("__pin"))
        .filter($"quality" >= 0.5 && $"__pin" >= 0)
        .drop("__pin")
      graft.plans.TopK.perGroup(
          gated.withColumn("h", graft.dedup.Dedup.contentKey($"text")),
          Seq("h"), Seq(("doc_id", false)), 1)
        .groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(tokens($"text")).cast("long")).as("n_tokens"),
          round(sum($"quality".cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 4).as("avg_quality"))
        .orderBy($"source")
    },

    "txt_vocab" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // vocabulary build (tokenizer-training step): corpus term
      // frequencies from the shared postings index, top-K by count
      // with deterministic dense token ids. The global window runs
      // over the ALREADY-REDUCED top-K rows (one partition of K),
      // never the full vocabulary.
      val vocab = graft.QueryCaches.postings(s, d)
        .groupBy($"term")
        .agg(sum($"tf").as("n"), count(lit(1)).as("df"))
        .orderBy($"n".desc, $"term").limit(50)
      vocab.withColumn("token_id",
          row_number().over(Window.orderBy($"n".desc, $"term")))
        .select($"token_id", $"term", $"n", $"df")
        .orderBy($"n".desc, $"term") // declared, not incidental, order
    },

    "txt_ngram_profile" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(charBigrams($"text")).as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram")
        .limit(25)
    },

    "txt_pii_scrub" -> { (s, d) =>
      import s.implicits._
      // planted-PII overlay: even-id docs get a deterministic contact
      // sentence (email + phone + IPv4); odd ids pass through so the
      // no-op path is checked too. The scrub itself is a codegen'd
      // regexp_replace chain — scan-side, no shuffle, 100 TB-safe.
      val withPii = Tables.documents(s, d).withColumn("text",
        when($"doc_id" % 2 === 0, concat($"text",
          lit(" Contact user"), $"doc_id".cast("string"),
          lit("@mail.example.com or 555-"),
          ($"doc_id" % 900 + 100).cast("string"), lit("-"),
          ($"doc_id" % 9000 + 1000).cast("string"), lit(" at 10."),
          ($"doc_id" % 200).cast("string"), lit(".0."),
          ($"doc_id" % 250).cast("string"), lit(".")))
        .otherwise($"text"))
      withPii.select($"doc_id",
        piiCount($"text", EmailRe).as("n_emails"),
        piiCount($"text", Ipv4Re).as("n_ips"),
        piiCount($"text", PhoneRe).as("n_phones"),
        md5(piiScrub($"text")).as("scrub_md5"))
        .orderBy($"doc_id")
    },

    "txt_repetition" -> { (s, d) =>
      import s.implicits._
      // Gopher-style repetition signals: fraction of tokens taken by
      // the most common word / word-bigram. Map-side n-gram explode
      // (native expressions) + two hash aggregations — the standard
      // quality-filter shape, no per-doc state on the driver.
      val docs = Tables.documents(s, d)
      val words = docs.select($"doc_id", explode(tokens($"text")).as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("wmx"), sum($"c").as("wn"))
      val bigrams = docs.select($"doc_id",
          explode(graft.plans.HashExpressions.wordNgrams($"text", 2)).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("bmx"), sum($"c").as("bn"))
      words.join(bigrams, Seq("doc_id"))
        .select($"doc_id",
          round($"wmx".cast("double") / $"wn", 4).as("top_word_frac"),
          round($"bmx".cast("double") / $"bn", 4).as("top_bigram_frac"))
        .orderBy($"doc_id")
    },

    "txt_chunks" -> { (s, d) =>
      import s.implicits._
      // RAG-ingestion chunking: 64-token windows, stride 48 (16-token
      // overlap). Pure map-side — one tokenize + one explode per doc,
      // no shuffle until the final order; at 100 TB chunking is a scan.
      val win = 64; val stride = 48
      val t = Tables.documents(s, d)
        .select($"doc_id", tokens($"text").as("toks"))
        .filter(size($"toks") > 0)
      val nChunks = when(size($"toks") <= win, lit(1))
        .otherwise(lit(1) + ceil((size($"toks") - win) / lit(stride.toDouble)).cast("int"))
      t.select($"doc_id", $"toks",
          explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
        .select($"doc_id", $"chunk_idx",
          slice($"toks", $"chunk_idx" * stride + 1, lit(win)).as("chunk"))
        .select($"doc_id", $"chunk_idx",
          size($"chunk").as("n_chunk_tokens"),
          md5(array_join($"chunk", " ")).as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    },

    "txt_novelty" -> { (s, d) =>
      import s.implicits._
      // Novelty scoring (dedup-adjacent quality signal): the fraction
      // of a doc's distinct word 5-grams whose FIRST corpus occurrence
      // (min doc_id) is this doc — near-1 for fresh content, near-0
      // for documents that mostly restate earlier ones. Shape: map-side
      // shingle explode → one groupBy for first-occurrence → join back
      // → per-doc ratio. Two shuffles, no O(n²), 100 TB-safe.
      // posting key is the 64-bit hash of the gram, not the gram text
      // (same trick as Dedup.ngramJaccard): identical group/join
      // semantics at ~0 collision odds, 3-4× less shuffle bytes
      // First-occurrence via a WINDOW MIN over the gram partition, not
      // a groupBy + join-back: the join form re-executed the tokenize +
      // shingle + explode + hash lineage — the heaviest stage here —
      // once per join branch (no exchange reuse: the aggregate's and
      // the probe's exchanges differ), and shuffled the gram stream
      // twice. The window shuffles it ONCE on g and reads the lineage
      // once, same skew profile as the groupBy it replaces.
      import org.apache.spark.sql.expressions.Window
      val grams = graft.dedup.Dedup.shingles(Tables.documents(s, d), "doc_id", "text", 5)
        .select($"doc_id", explode($"sh").as("g0"))
        .select($"doc_id", xxhash64($"g0").as("g"))
      grams.withColumn("first_doc", min($"doc_id").over(Window.partitionBy($"g")))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_first"))
        .select($"doc_id", $"n_grams",
          round($"n_first".cast("double") / $"n_grams", 4).as("novelty"))
        .orderBy($"doc_id")
    },

    "txt_boilerplate" -> { (s, d) =>
      import s.implicits._
      // Corpus-frequent line removal (the CCNet/RefinedWeb boilerplate
      // pass: a line repeated across many documents — nav text, cookie
      // banners, license footers — carries no training signal and is
      // dropped corpus-wide). The source docs are single-line, so the
      // corpus plants SQL-reproducible line structure: every 7th doc
      // gains a newsletter line, every 21st additionally a license
      // line — those recur across >= 5 distinct docs and must be
      // flagged; each doc's own body line recurs at most twice (the
      // generator's planted exact dup) and must NOT be.
      // Shape at 100 TB: explode to lines (map-side), duplicate-line
      // set = distinct (line, doc) + count — two hash shuffles on the
      // line key; join back is 1:1 per line occurrence (the frequent
      // set is distinct), then one per-doc aggregation. Identical to
      // the dd_substring candidate topology; no O(n²) anywhere.
      val lined = Tables.documents(s, d).select($"doc_id",
        concat($"text",
          when($"doc_id" % 7 === 0,
            lit("\nsubscribe to the graft newsletter for updates"))
            .otherwise(lit("")),
          when($"doc_id" % 21 === 0,
            lit("\nall rights reserved by graft industries"))
            .otherwise(lit(""))).as("text"))
      // shuffle/join on the 64-bit line hash, not the line text (the
      // ngramJaccard/txt_novelty trick): same semantics, a fraction of
      // the shuffle bytes
      val lines = lined
        .select($"doc_id", explode(split($"text", "\n")).as("raw"))
        .select($"doc_id", trim($"raw").as("line"))
        .filter(length($"line") > 0)
        .select($"doc_id", xxhash64(lower($"line")).as("nline"),
          length($"line").cast("long").as("len"))
      val frequent = lines.select("nline", "doc_id").distinct()
        .groupBy("nline").count().filter($"count" >= 5)
        .select($"nline", lit(1).as("isb"))
      lines.join(frequent, Seq("nline"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when($"isb".isNotNull, 1L).otherwise(0L)).as("n_boiler"),
          sum(when($"isb".isNull, $"len").otherwise(0L)).as("clean_chars"))
        .withColumn("boiler_frac",
          round($"n_boiler".cast("double") / $"n_lines", 4))
        .orderBy($"doc_id")
    },

    "txt_collocations" -> { (s, d) =>
      import s.implicits._
      // PMI collocation mining (Church & Hanks 1990) — the phrase-
      // vocabulary step a tokenizer/embedding pipeline runs before
      // committing multi-word units: adjacent-bigram pointwise mutual
      // information ln(c_ab·N / (c_a·c_b)), support floor c_ab ≥ 5,
      // top-25. Shape at 100 TB: one vocab-sized unigram agg + one
      // bigram-vocab agg (both map-side-combining), word-key joins,
      // a 1-row broadcast total, TakeOrdered for the top-K — the
      // corpus shuffles twice, windows never. Parity: the PMI ratio
      // is exact-long products under ONE double division (both
      // factors < 2^53 well past sf1), ln rounds to 6 dp (the
      // txt_lm_ppl transcendental contract), ties break on (a, b).
      val t = Tables.documents(s, d)
        .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      val uni = t.select(explode($"toks").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c_w"))
      val bg = t.filter(size($"toks") >= 2)
        .select(explode(zip_with(
          slice($"toks", lit(1), size($"toks") - 1),
          slice($"toks", lit(2), size($"toks") - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
      val bic = bg.groupBy($"a", $"b").agg(count(lit(1)).as("c_ab"))
      val nb = bic.agg(sum($"c_ab").as("n_bg"))
      bic.filter($"c_ab" >= 5)
        .join(uni.select($"w".as("a"), $"c_w".as("c_a")), Seq("a"))
        .join(uni.select($"w".as("b"), $"c_w".as("c_b")), Seq("b"))
        .crossJoin(broadcast(nb))
        .select($"a", $"b", $"c_ab",
          round(log(($"c_ab" * $"n_bg").cast("double") /
            ($"c_a" * $"c_b").cast("double")), 6).as("pmi"))
        .orderBy($"pmi".desc, $"a", $"b").limit(25)
    },

    "txt_dsir" -> { (s, d) =>
      import s.implicits._
      // DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169
      // "Data Selection for Language Models via Importance
      // Resampling"): per-doc log importance weight under add-1
      // smoothed unigram models — target = the English slice, raw =
      // the whole corpus; documents whose token distribution looks
      // like the target score high and get sampled preferentially.
      // Shape at 100 TB: two frequency aggregations on the token
      // hash-key + a join of the token stream to the (corpus-
      // vocabulary-sized) frequency tables + one per-doc sum — the
      // frequency tables are the only state, exactly the n-gram
      // tables the paper materializes.
      // Floating parity with the oracle: each token's log-ratio is
      // rounded to 6 dp and summed as DECIMAL (exact, order-
      // independent) — a raw double sum would depend on reduction
      // order and diverge across engines at the rounding boundary.
      // ONE corpus-wide token aggregation builds the whole vocabulary
      // table (background count + conditional target count per token);
      // the corpus-level totals derive from that vocab-sized frame, so
      // the token stream is shuffled once, not three times
      val toks = Tables.documents(s, d)
        .select($"doc_id", $"lang",
          explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      val vocab = toks.groupBy($"w").agg(
        count(lit(1)).as("cb"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("ct"))
      val totals = vocab.agg(
        sum($"cb").as("nb"), count(lit(1)).as("v"), sum($"ct").as("nt"))
      // parenthesization matches the oracle EXACTLY — a different
      // association order can differ by an ulp right at a 6-dp half
      // boundary and flip the per-token round
      val term = round(
        log((($"ct" + 1.0) / ($"nt" + $"v")) *
          (($"nb" + $"v") / ($"cb" + 1.0))), 6)
        .cast("decimal(18,6)")
      toks.join(vocab, Seq("w"))
        .crossJoin(broadcast(totals))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(term).as("w_dec"))
        .select($"doc_id", $"n_tokens",
          // the final 4-dp round happens in DECIMAL space via ROUND
          // (half away from zero in BOTH engines — verified): rounding
          // the DOUBLE diverges on half boundaries (Spark rounds the
          // shortest decimal string, DuckDB scales the binary double),
          // and DuckDB's decimal DOWNCAST truncates instead of
          // rounding. The double cast afterwards is deterministic and
          // cannot produce IEEE -0.0.
          round($"w_dec", 4).cast("double").as("dsir_weight"))
        .orderBy($"doc_id")
    },

    "txt_lm_ppl" -> { (s, d) =>
      import s.implicits._
      // Bigram-LM perplexity scoring (the CCNet quality signal,
      // Wenzek et al. 2019, arXiv:1911.00359: score every document by
      // a language model's perplexity and filter/bucket on it) with
      // the LM trained ON the corpus: add-1-smoothed bigram model,
      // per-doc cross-entropy and perplexity. Shape at 100 TB: the
      // bigram stream is shuffled ONCE (window count over the exact
      // (a, b) pair — the txt_novelty shape minus its hash-collision
      // caveat: no join-back, no second
      // lineage execution), the unigram table is one vocab-sized
      // aggregation joined back on the word key, and the per-doc
      // reduction is map-side-combining. No all-pairs, no driver
      // state; the only broadcast is the 1-row vocabulary total.
      // Floating parity with the oracle: per-bigram log terms round
      // to 6 dp and sum as DECIMAL (exact, order-independent — the
      // txt_dsir contract); the normalized cross-entropy divides in
      // INTEGER micro-nat space (exact on both engines), and only the
      // display-grade ppl column touches double transcendentals.
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d)
        .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      val uni = t.select(explode($"toks").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c_a"))
      val totals = uni.agg(count(lit(1)).as("v"))
      val bg = t.filter(size($"toks") >= 2)
        .select($"doc_id",
          explode(zip_with(
            slice($"toks", lit(1), size($"toks") - 1),
            slice($"toks", lit(2), size($"toks") - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .select($"doc_id", $"p.a".as("a"), $"p.b".as("b"))
      // partition by the exact (a, b) pair, not a 64-bit hash of it:
      // both columns are already carried, and the oracle groups by
      // the pair — a hash would merge colliding bigrams' counts on
      // this side only (the txt_novelty caveat, avoided here for free)
      val counted = bg
        .withColumn("c_ab", count(lit(1)).over(Window.partitionBy($"a", $"b")))
      // parenthesization matches the oracle exactly (the txt_dsir rule)
      val term = round(
        log(($"c_ab".cast("double") + 1.0) /
          ($"c_a".cast("double") + $"v".cast("double"))), 6)
        .cast("decimal(18,6)")
      counted.join(uni.withColumnRenamed("w", "a"), Seq("a"))
        .crossJoin(broadcast(totals))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(term).as("w_dec"))
        .withColumn("h_micro", (-$"w_dec" * 1000000).cast("long"))
        .withColumn("xent_unats", expr("h_micro div n_bigrams"))
        .select($"doc_id", $"n_bigrams", $"h_micro", $"xent_unats",
          round(exp($"xent_unats".cast("double") / 1000000.0), 3).as("ppl"))
        .orderBy($"doc_id")
    },

    "txt_bpe_train" -> { (s, d) =>
      import s.implicits._
      // Distributed BPE merge LEARNING over the corpus (Sennrich 2015
      // training, the counterpart of txt_bpe_tokens' application
      // kernel): one map-side-combining shuffle builds the word
      // histogram, the deterministic top-maxWords truncation bounds
      // the driver-side merge loop (the trainer-standard candidate
      // cap — the same bounded-driver-set contract as the ANN
      // quantizer's <= maxTrain sample), and the corpus itself is
      // never iterated. Iterative merge learning is not
      // SQL-expressible -> rows-only; BpeTrainSpec pins distributed
      // == single-JVM trainer equality on the same text.
      val merges = graft.plans.BpeTrain.learnDistributed(
        Tables.documents(s, d), $"text", numMerges = 40)
      s.createDataset(merges.zipWithIndex.map {
        case ((a, b), r) => (r, a, b)
      }).toDF("rank", "lhs", "rhs").orderBy($"rank")
    },

    "txt_oov" -> { (s, d) =>
      import s.implicits._
      // Tokenizer-vocabulary COVERAGE QC (the companion of txt_vocab's
      // build): per-doc out-of-vocabulary token rate against the
      // top-50 corpus vocabulary — the gate a pipeline runs before
      // committing a tokenizer (high OOV = the vocab misfits the
      // slice). Everything runs on the shared postings index (one
      // prebuilt (doc, term, tf) relation): the vocab is a top-K agg,
      // the membership test a BROADCAST anti-join, the per-doc rate
      // exact integer micro-units (positive floor division agrees
      // across engines — no rounding ties possible).
      val p = graft.QueryCaches.postings(s, d)
      val vocab = p.groupBy($"term").agg(sum($"tf").as("n"))
        .orderBy($"n".desc, $"term").limit(50).select($"term")
      val oov = p.join(broadcast(vocab), Seq("term"), "left_anti")
        .groupBy($"doc_id").agg(sum($"tf").as("n_oov"))
      p.groupBy($"doc_id").agg(sum($"tf").as("n_tokens"))
        .join(oov, Seq("doc_id"), "left_outer")
        .select($"doc_id", $"n_tokens",
          coalesce($"n_oov", lit(0L)).as("n_oov"))
        .withColumn("oov_rate",
          expr("(n_oov * 1000000L) div n_tokens").cast("double") / 1000000.0)
        .orderBy($"doc_id")
    },

    "txt_quality_clf" -> { (s, d) =>
      import s.implicits._
      // MODEL-BASED quality filtering plumbing (the fasttext-style
      // linear classifier stage of CCNet/LLaMA data pipelines, beside
      // the heuristic txt_quality and the importance-weighting
      // txt_dsir): score = mean over tokens of a hashed-feature
      // weight, keep = score ≥ 0. The model here is a deterministic
      // affine-hash weight function (so the gate is full-oracle,
      // integer-exact in both engines); a TRAINED model swaps in a
      // broadcast (bucket → weight) table at exactly this lookup —
      // same plan: one codegen'd HOF pass per doc (transform +
      // aggregate), zero shuffles, zero joins.
      // score normalization in EXACT integer micro-units: the naive
      // ROUND(w_sum/(10000·n), 6) ties at exactly 5 in the 7th
      // decimal whenever 100·w_sum ≡ n/2 (mod n) — hit 3× at sf1 —
      // and the engines break the tie differently (the q31 lesson).
      // Shift-positive floor division is engine-identical (Spark div
      // truncates, DuckDB // floors; they agree on non-negatives).
      Tables.documents(s, d)
        .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
        .withColumn("n_tokens", size($"toks"))
        .withColumn("w_sum", expr(ClfWsumSql))
        .withColumn("score_micro", when($"n_tokens" === 0, lit(0L))
          .otherwise(expr(
            "(w_sum + 10000L * n_tokens) * 100L div n_tokens - 1000000L")))
        .select($"doc_id", $"n_tokens", $"w_sum",
          ($"score_micro".cast("double") / 1000000.0).as("score"),
          ($"w_sum" >= 0).cast("int").as("keep"))
        .orderBy($"doc_id")
    },

    "txt_url_canon" -> { (s, d) =>
      import s.implicits._
      // URL canonicalization (the CCNet/RefinedWeb crawl pre-step):
      // the corpus has no URL column, so a deterministic dirty-URL
      // plant — scheme/host case noise, www, default and explicit
      // ports, trailing slashes, utm_*/fbclid/gclid tracking params,
      // fragments, keyed off doc_id/source — is constructed by the
      // SAME expression in both engines, and the oracle re-derives
      // the canonical form independently with its own regex chain: a
      // full ground-truth gate for every rule in
      // UrlFunctions.canonicalize. One codegen'd pass per row.
      urlFrame(Tables.documents(s, d))
        .select($"doc_id", $"url_raw", $"url_canon", $"host")
        .orderBy($"doc_id")
    },

    "txt_host_stats" -> { (s, d) =>
      import s.implicits._
      // HOST-level aggregation over canonical URLs — the crawl-triage
      // view (docs/host, distinct pages/host, bytes/host) that decides
      // per-host caps and crawl budgets. One hash shuffle on the host
      // key; case/www/port raw variants of the same host MUST collapse
      // (pinned by the plant's mixed-case construction).
      urlFrame(Tables.documents(s, d))
        .groupBy($"host")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"url_canon").as("n_urls"),
          sum($"n_chars").cast("long").as("total_chars"))
        .orderBy($"host")
    },

    "txt_host_cap" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // URL-level dedup + per-host cap — the two crawl-layer keeps a
      // pipeline applies before content dedup ever runs: (1) collapse
      // raw variants of the SAME canonical URL onto the smallest
      // doc_id (the planted rows at +PlantedIdBase re-dress docs < 30
      // with canon-equivalent raw URLs — every one must lose to its
      // original); (2) cap each host at its 10 highest-quality
      // survivors (n_chars as the quality proxy, doc_id tiebreak).
      // Both windows partition on bounded keys (url_canon groups are
      // variant-sized, hosts are host-sized) — never corpus-wide.
      val docs = Tables.documents(s, d).select($"doc_id", $"source", $"n_chars")
      val planted = docs.filter($"doc_id" < 30)
        .withColumn("doc_id", $"doc_id" + Tables.PlantedIdBase)
      val urls = urlFrame(docs.unionByName(planted))
      val byUrl = Window.partitionBy($"url_canon").orderBy($"doc_id")
      val byHost = Window.partitionBy($"host")
        .orderBy($"n_chars".desc, $"doc_id")
      urls.withColumn("rn", row_number().over(byUrl))
        .filter($"rn" === 1)
        .withColumn("rk", row_number().over(byHost))
        .filter($"rk" <= 10)
        .select($"host", $"rk", $"doc_id", $"n_chars")
        .orderBy($"host", $"rk")
    },

    "txt_html_extract" -> { (s, d) =>
      import s.implicits._
      // HTML main-content extraction (the trafilatura/RefinedWeb
      // step between URL canonicalization and the quality gates):
      // the corpus has no HTML column, so each doc is dressed into a
      // full page by the SAME expression in both engines (head with
      // title/script/style, nav bar, a promo insert on every third
      // doc, the doc text as the main block, an appendix paragraph
      // on every second doc, a link footer); the operator strips
      // non-content spans, segments into blocks, drops boilerplate
      // by integer-exact link density, and reassembles the main
      // text. The oracle re-derives extraction with its own regex
      // chain — a full ground-truth gate for every rule.
      HtmlFunctions.extractMain(
        Tables.documents(s, d).withColumn("html", expr(HtmlRawSql)),
        "doc_id", "html")
        .select($"doc_id", $"main_text", $"n_blocks", $"n_dropped", $"n_chars")
        .orderBy($"doc_id")
    },

    "txt_link_graph" -> { (s, d) =>
      import s.implicits._
      // crawl LINK-GRAPH construction — the HTML layer composed with
      // the URL layer: extract every ABSOLUTE outlink from the
      // dressed page (relative hrefs excluded by the pattern),
      // canonicalize each target's host (case/www/userinfo/port
      // noise planted in the links), and reduce to the host-level
      // edge list with link and distinct-page counts — the frontier/
      // authority input a crawler feeds PageRank. One extraction
      // pass + one (src,dst) hash shuffle at any scale.
      val pages = Tables.documents(s, d)
        .withColumn("html", expr(s"($HtmlRawSql || $HtmlLinksSql)"))
        .withColumn("src_host", UrlFunctions.host(expr(UrlRawSql)))
      pages.select($"doc_id", $"src_host",
          explode(expr(
            """regexp_extract_all(html, 'href="([hH][tT][tT][pP][^"]*)"', 1)"""))
            .as("raw"))
        .withColumn("dst_host", UrlFunctions.host($"raw"))
        .groupBy($"src_host", $"dst_host")
        .agg(count(lit(1)).as("n_links"),
          countDistinct($"doc_id").as("n_pages"))
        .orderBy($"src_host", $"dst_host")
    },

    "txt_host_authority" -> { (s, d) =>
      import s.implicits._
      // host AUTHORITY ranking — the full crawl stack composed end to
      // end: HTML outlink extraction → host canonicalization →
      // canonical undirected host edges (least/greatest + distinct,
      // self-loops dropped) → the cross-engine-deterministic 3-round
      // PageRank (Dedup.pagerank's 9-dp DECIMAL discipline) — the
      // crawl-priority signal a frontier scheduler feeds on. Full
      // oracle: independent extraction + host rules + the unrolled
      // rounds.
      val pages = Tables.documents(s, d)
        .withColumn("html", expr(s"($HtmlRawSql || $HtmlLinksSql)"))
        .withColumn("src_host", UrlFunctions.host(expr(UrlRawSql)))
      val edges = pages.select($"src_host",
          explode(expr(
            """regexp_extract_all(html, 'href="([hH][tT][tT][pP][^"]*)"', 1)"""))
            .as("raw"))
        .withColumn("dst_host", UrlFunctions.host($"raw"))
        .filter($"src_host" =!= $"dst_host")
        .select(least($"src_host", $"dst_host").as("doc_a"),
          greatest($"src_host", $"dst_host").as("doc_b"))
        .distinct()
      graft.dedup.Dedup.pagerank(edges, iters = 3)
        .select($"doc_id".as("host"), $"degree", $"rank")
        .orderBy($"host")
    },
  )

  /** The hashed-linear-classifier token fold, SQL that parses in BOTH
    * engines' HOF dialects via shared integer arithmetic: bucket =
    * affine hash of (ascii, length) mod 4096, weight = second affine
    * map onto [-10000, 10000] — every step exact 64-bit integer math,
    * so the fold replays bit-for-bit. */
  private val ClfWsumSql =
    "aggregate(transform(toks, t -> " +
      "((((((ascii(t) * 131 + length(t)) * 2654435761) % 2147483647) % 4096)" +
      " * 2246822519 + 1031) % 2147483647) % 20001 - 10000), " +
      "0L, (a, w) -> a + w)"

  /** Deterministic dirty-URL plant, written once in SQL that parses
    * in BOTH engines (the mm_phash PerturbSql recipe): scheme/host
    * case noise, www prefixes, default (strippable) and :8080
    * (kept) ports, trailing slashes, tracking params in every
    * position, fragments. Planted rows (doc_id ≥ PlantedIdBase)
    * re-dress their source doc's URL with an extra fragment — a
    * DIFFERENT raw string with the SAME canonical form. */
  private[graft] val UrlRawSql: String = {
    val id = s"(doc_id % ${Tables.PlantedIdBase})"
    s"""(CASE WHEN $id % 3 = 0 THEN 'HTTPS://' ELSE 'Http://' END ||
       | CASE WHEN $id % 2 = 0 THEN 'WWW.' ELSE '' END ||
       | CASE WHEN $id % 2 = 0 THEN upper(source) ELSE source END ||
       | '.Example.COM' ||
       | CASE WHEN $id % 5 = 0 THEN
       |        (CASE WHEN $id % 3 = 0 THEN ':443' ELSE ':80' END)
       |      WHEN $id % 5 = 1 THEN ':8080' ELSE '' END ||
       | '/Docs/' || CAST($id AS STRING) ||
       | CASE WHEN $id % 4 = 0 THEN '/' ELSE '' END ||
       | CASE WHEN $id % 3 = 0 THEN
       |        '?utm_source=feed&id=' || CAST($id % 10 AS STRING)
       |          || '&utm_campaign=x'
       |      WHEN $id % 3 = 1 THEN
       |        '?id=' || CAST($id % 10 AS STRING) || '&fbclid=zzz'
       |      ELSE '?gclid=q' END ||
       | CASE WHEN $id % 7 = 0 THEN '#sec2' ELSE '' END ||
       | CASE WHEN doc_id >= ${Tables.PlantedIdBase} THEN '#v2' ELSE '' END)"""
      .stripMargin.replace('\n', ' ')
  }

  /** Deterministic HTML page dressing, written once in SQL that
    * parses in BOTH engines (the UrlRawSql recipe): head with title +
    * script + style (all to be stripped), a 3-anchor nav bar (link
    * density 1 → dropped), a promo div on every third doc (5 words, 3
    * of them anchor text → dropped), the doc text as the main
    * paragraph (no anchors → kept), a short appendix paragraph on
    * every second doc (kept), and a 2-anchor footer (dropped). */
  private[graft] val HtmlRawSql: String =
    """('<html><head><title>doc ' || CAST(doc_id AS STRING) ||
      |  '</title><script>var a=1;</script><style>p{margin:0}</style></head><body>' ||
      |  '<nav><a href="/">home</a> <a href="/a">a</a> <a href="/b">b</a></nav>' ||
      |  CASE WHEN doc_id % 3 = 0 THEN
      |    '<div>promo <a href="/s">subscribe</a> <a href="/b">buy</a> <a href="/m">more</a> now</div>'
      |  ELSE '' END ||
      |  '<p>' || text || '</p>' ||
      |  CASE WHEN doc_id % 2 = 0 THEN
      |    '<p>appendix note for doc ' || CAST(doc_id AS STRING) || '</p>'
      |  ELSE '' END ||
      |  '<footer><a href="/about">about</a> <a href="/terms">terms</a></footer></body></html>')"""
      .stripMargin.replace('\n', ' ')

  /** Outlink dressing for the link-graph operator, in shared SQL:
    * two absolute links per page onto a 7-host ring keyed off doc_id
    * — one with scheme/host case noise + www + a tracking param, one
    * with an explicit default port + fragment — plus a RELATIVE link
    * on every fourth page that extraction must ignore. */
  private[graft] val HtmlLinksSql: String =
    """('<div>see <a href="HTTP://WWW.h' || CAST((doc_id * 3 + 1) % 7 AS STRING) ||
      |  '.Example.COM/p/' || CAST(doc_id % 50 AS STRING) ||
      |  '?utm_source=feed&ref=' || CAST(doc_id % 5 AS STRING) || '">ref1</a> and ' ||
      |  '<a href="http://h' || CAST((doc_id * 5 + 2) % 7 AS STRING) ||
      |  '.example.com:80/q/' || CAST(doc_id % 30 AS STRING) || '#frag">ref2</a>' ||
      |  CASE WHEN doc_id % 4 = 0 THEN ' and <a href="/local/rel">rel</a>' ELSE '' END ||
      |  '</div>')""".stripMargin.replace('\n', ' ')

  /** (doc_id, …, url_raw, url_canon, host) over a (doc_id, source,
    * n_chars…) corpus. */
  private def urlFrame(docs: DataFrame): DataFrame =
    docs.withColumn("url_raw", expr(UrlRawSql))
      .withColumn("url_canon", UrlFunctions.canonicalize(col("url_raw")))
      .withColumn("host", UrlFunctions.host(col("url_raw")))

  private val Tok = "string_split_regex(lower(text), '[^a-z0-9]+')"
  private def cleanTok = // DuckDB split keeps empty edge tokens; drop them
    s"list_filter($Tok, t -> length(t) > 0)"
  private def hits(langList: String) =
    s"len(list_filter($cleanTok, t -> list_contains($langList, t)))"
  private val EnL = "['the','a','of','and','to','in','is']"
  private val DeL = "['der','die','das','und','ist','ein']"
  private val EsL = "['el','la','de','los','es','y']"

  def oracles: Map[String, String] = Map(
    "txt_tokens" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN trim(text) = '' THEN 0
         |       ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT) AS n_ws,
         |  CAST(len($cleanTok) AS INT) AS n_words,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS INT) AS n_bpeish
         |FROM documents ORDER BY doc_id""".stripMargin,

    // zero-token and zero-length guards mirror TextFunctions exactly:
    // both engines must say ratio 0 (not NULL/nan) for symbol-only docs
    "txt_quality" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS INT) AS n_chars,
         |  ROUND(CASE WHEN len($cleanTok) = 0 THEN 0.0
         |        ELSE CAST(${hits(EnL)} AS DOUBLE) / len($cleanTok) END, 4) AS stop_ratio,
         |  ROUND(CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS alnum_ratio,
         |  ROUND(0.5 * least(1.0, CAST(len($cleanTok) AS DOUBLE) / 120.0)
         |      + 0.3 * (CASE WHEN len($cleanTok) = 0 THEN 0.0
         |               ELSE CAST(${hits(EnL)} AS DOUBLE) / len($cleanTok) END)
         |      + 0.2 * (CASE WHEN length(text) = 0 THEN 0.0
         |               ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text) END), 4) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" ->
      s"""SELECT lang_detected, COUNT(*) AS n_docs FROM (
         |  SELECT CASE
         |    WHEN ${hits(EnL)} >= ${hits(DeL)} AND ${hits(EnL)} >= ${hits(EsL)} THEN 'en'
         |    WHEN ${hits(DeL)} >= ${hits(EsL)} THEN 'de'
         |    ELSE 'es' END AS lang_detected
         |  FROM documents)
         |GROUP BY lang_detected ORDER BY lang_detected""".stripMargin,

    "txt_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(range(1, len(toks) + 1), i ->
         |    ((ascii(toks[CAST(i AS INT)]) * length(toks[CAST(i AS INT)]) % 1000000007)
         |      * ((i * 2654435761) % 1000000007)) % 1000000007)) % 1000000007 AS BIGINT) AS fp
         |FROM t ORDER BY doc_id""".stripMargin,

    "txt_pipeline" -> {
      val qual =
        s"""ROUND(0.5 * least(1.0, CAST(len($cleanTok) AS DOUBLE) / 120.0)
           |  + 0.3 * (CASE WHEN len($cleanTok) = 0 THEN 0.0
           |           ELSE CAST(${hits(EnL)} AS DOUBLE) / len($cleanTok) END)
           |  + 0.2 * (CASE WHEN length(text) = 0 THEN 0.0
           |           ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text) END), 4)""".stripMargin
      val lang =
        s"""CASE WHEN ${hits(EnL)} >= ${hits(DeL)} AND ${hits(EnL)} >= ${hits(EsL)} THEN 'en'
           |  WHEN ${hits(DeL)} >= ${hits(EsL)} THEN 'de' ELSE 'es' END""".stripMargin
      s"""WITH gated AS (
         |  SELECT doc_id, text, source, $qual AS quality FROM documents
         |  WHERE $lang = 'en' AND $qual >= 0.5),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM gated
         |         GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |kept AS (SELECT g.* FROM gated g JOIN keep USING (doc_id))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len($cleanTok)) AS BIGINT) AS n_tokens,
         |  ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_quality
         |FROM kept GROUP BY source ORDER BY source""".stripMargin
    },

    "txt_vocab" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($cleanTok) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |agg AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS n,
         |               COUNT(*) AS df FROM tf GROUP BY term)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS INT) AS token_id,
         |  term, n, df
         |FROM agg ORDER BY n DESC, term LIMIT 50""".stripMargin,

    "txt_ngram_profile" ->
      """SELECT bigram, COUNT(*) AS n FROM (
        |  SELECT unnest(list_transform(range(1, length(text)),
        |    i -> substring(lower(text), CAST(i AS INT), 2))) AS bigram
        |  FROM documents)
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25""".stripMargin,

    "txt_pii_scrub" ->
      s"""WITH pii AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN text
         |      || ' Contact user' || CAST(doc_id AS VARCHAR)
         |      || '@mail.example.com or 555-'
         |      || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
         |      || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' at 10.'
         |      || CAST(doc_id % 200 AS VARCHAR) || '.0.'
         |      || CAST(doc_id % 250 AS VARCHAR) || '.'
         |    ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.EmailRe}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.Ipv4Re}')) AS INT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.PhoneRe}')) AS INT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextFunctions.EmailRe}', '[EMAIL]', 'g'),
         |    '${TextFunctions.Ipv4Re}', '[IP]', 'g'),
         |    '${TextFunctions.PhoneRe}', '[PHONE]', 'g')) AS scrub_md5
         |FROM pii ORDER BY doc_id""".stripMargin,

    "txt_repetition" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents),
         |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM (
         |         SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY doc_id, w),
         |wmax AS (SELECT doc_id, MAX(c) AS wmx, SUM(c) AS wn FROM wc GROUP BY doc_id),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |         i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])) AS g
         |       FROM t),
         |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
         |bmax AS (SELECT doc_id, MAX(c) AS bmx, SUM(c) AS bn FROM bc GROUP BY doc_id)
         |SELECT doc_id,
         |  ROUND(CAST(wmx AS DOUBLE) / wn, 4) AS top_word_frac,
         |  ROUND(CAST(bmx AS DOUBLE) / bn, 4) AS top_bigram_frac
         |FROM wmax JOIN bmax USING (doc_id) ORDER BY doc_id""".stripMargin,

    "txt_chunks" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents),
         |nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
         |idx AS (SELECT doc_id, toks, n,
         |          unnest(range(0, CASE WHEN n <= 64 THEN 1
         |            ELSE 1 + CAST(CEIL((n - 64) / 48.0) AS INT) END)) AS chunk_idx
         |        FROM nz),
         |ch AS (SELECT doc_id, chunk_idx,
         |          toks[CAST(chunk_idx * 48 + 1 AS INT):CAST(chunk_idx * 48 + 64 AS INT)] AS chunk
         |       FROM idx)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |  CAST(len(chunk) AS INT) AS n_chunk_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "txt_novelty" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(toks) = 0 THEN [] ELSE
         |    list_distinct(list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
         |      i -> array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' '))) END AS s
         |  FROM t),
         |p AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |f AS (SELECT g, MIN(doc_id) AS first_doc FROM p GROUP BY g)
         |SELECT p.doc_id, COUNT(*) AS n_grams,
         |  ROUND(CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*), 4) AS novelty
         |FROM p JOIN f USING (g)
         |GROUP BY p.doc_id ORDER BY doc_id""".stripMargin,

    // the same planted line structure and the same >= 5-distinct-docs
    // frequency cut, term for term
    "txt_boilerplate" ->
      """WITH lined AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN chr(10) || 'subscribe to the graft newsletter for updates'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 21 = 0
        |         THEN chr(10) || 'all rights reserved by graft industries'
        |         ELSE '' END AS text
        |  FROM documents),
        |lines AS (SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line
        |          FROM lined),
        |norm AS (SELECT doc_id, lower(line) AS nline,
        |           CAST(length(line) AS BIGINT) AS len
        |         FROM lines WHERE length(line) > 0),
        |freq AS (SELECT nline FROM (SELECT DISTINCT nline, doc_id FROM norm)
        |         GROUP BY nline HAVING COUNT(*) >= 5)
        |SELECT n.doc_id, COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN f.nline IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(SUM(CASE WHEN f.nline IS NULL THEN n.len ELSE 0 END) AS BIGINT)
        |    AS clean_chars,
        |  ROUND(CAST(SUM(CASE WHEN f.nline IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS boiler_frac
        |FROM norm n LEFT JOIN freq f ON n.nline = f.nline
        |GROUP BY n.doc_id ORDER BY doc_id""".stripMargin,

    // the same add-1 smoothed unigram log-ratio, per-token rounded to
    // 6 dp and summed as DECIMAL so the sum is order-independent
    "txt_dsir" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, unnest($cleanTok) AS w FROM documents),
         |vocab AS (SELECT w, COUNT(*) AS cb,
         |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
         |  FROM toks GROUP BY w),
         |totals AS (SELECT SUM(cb) AS nb, COUNT(*) AS v, SUM(ct) AS nt
         |  FROM vocab)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |  CAST(ROUND(SUM(CAST(ROUND(LN(
         |      ((vocab.ct + 1.0) / (totals.nt + totals.v)) *
         |      ((totals.nb + totals.v) / (vocab.cb + 1.0))), 6) AS DECIMAL(18,6))),
         |    4) AS DOUBLE) AS dsir_weight
         |FROM toks t
         |JOIN vocab USING (w)
         |CROSS JOIN totals
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // the same add-1 bigram LM term for term: 6-dp-rounded log terms
    // summed as DECIMAL (exact), integer micro-nat normalization,
    // double transcendentals only in the display ppl column
    "txt_collocations" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents),
         |uni AS (SELECT w, COUNT(*) AS c_w
         |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         |bx AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |  FROM t WHERE len(toks) >= 2),
         |bg AS (SELECT toks[CAST(i AS INT)] AS a,
         |    toks[CAST(i + 1 AS INT)] AS b FROM bx),
         |bic AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b),
         |nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bg FROM bic)
         |SELECT a, b, c_ab,
         |  ROUND(LN(CAST(c_ab * n_bg AS DOUBLE) /
         |    CAST(ua.c_w * ub.c_w AS DOUBLE)), 6) AS pmi
         |FROM bic JOIN uni ua ON bic.a = ua.w
         |JOIN uni ub ON bic.b = ub.w
         |CROSS JOIN nb
         |WHERE c_ab >= 5
         |ORDER BY pmi DESC, a, b LIMIT 25""".stripMargin,

    "txt_lm_ppl" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents),
         |uni AS (SELECT w, COUNT(*) AS c_a
         |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         |vv AS (SELECT COUNT(*) AS v FROM uni),
         |bx AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |  FROM t WHERE len(toks) >= 2),
         |bg AS (SELECT doc_id, toks[CAST(i AS INT)] AS a,
         |    toks[CAST(i + 1 AS INT)] AS b FROM bx),
         |bic AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b),
         |terms AS (SELECT bg.doc_id,
         |    CAST(ROUND(LN((CAST(c_ab AS DOUBLE) + 1.0) /
         |      (CAST(c_a AS DOUBLE) + CAST(v AS DOUBLE))), 6)
         |      AS DECIMAL(18,6)) AS term
         |  FROM bg JOIN bic USING (a, b) JOIN uni ON bg.a = uni.w
         |  CROSS JOIN vv),
         |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |    CAST(-SUM(term) * 1000000 AS BIGINT) AS h_micro
         |  FROM terms GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, h_micro,
         |  h_micro // n_bigrams AS xent_unats,
         |  ROUND(exp(CAST(h_micro // n_bigrams AS DOUBLE) / 1000000.0), 3)
         |    AS ppl
         |FROM agg ORDER BY doc_id""".stripMargin,

    "txt_oov" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($cleanTok) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |vocab AS (SELECT term FROM (
         |    SELECT term, SUM(tf) AS n FROM tf GROUP BY term
         |    ORDER BY n DESC, term LIMIT 50)),
         |agg AS (SELECT tf.doc_id,
         |    CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END)
         |      AS BIGINT) AS n_oov
         |  FROM tf LEFT JOIN vocab v USING (term) GROUP BY tf.doc_id)
         |SELECT doc_id, n_tokens, n_oov,
         |  CAST((n_oov * 1000000) // n_tokens AS DOUBLE) / 1000000.0
         |    AS oov_rate
         |FROM agg ORDER BY doc_id""".stripMargin,

    "txt_quality_clf" ->
      s"""WITH t AS (SELECT doc_id, $cleanTok AS toks FROM documents),
         |w AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
         |    CAST(COALESCE(list_sum(list_transform(toks, t ->
         |      ((((((ascii(t) * 131 + length(t)) * 2654435761) % 2147483647)
         |        % 4096) * 2246822519 + 1031) % 2147483647) % 20001 - 10000)),
         |      0) AS BIGINT) AS w_sum
         |  FROM t),
         |scored AS (SELECT doc_id, n_tokens, w_sum,
         |    CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
         |         ELSE ((w_sum + 10000 * n_tokens) * 100) // n_tokens
         |              - 1000000
         |    END AS score_micro
         |  FROM w)
         |SELECT doc_id, n_tokens, w_sum,
         |  CAST(score_micro AS DOUBLE) / 1000000.0 AS score,
         |  CAST(w_sum >= 0 AS INT) AS keep
         |FROM scored ORDER BY doc_id""".stripMargin,

    "txt_url_canon" ->
      s"""WITH ${urlCanonCtes("SELECT doc_id, source, n_chars FROM documents")}
         |SELECT doc_id, url_raw, url_canon, host
         |FROM urls ORDER BY doc_id""".stripMargin,

    "txt_host_stats" ->
      s"""WITH ${urlCanonCtes("SELECT doc_id, source, n_chars FROM documents")}
         |SELECT host, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT url_canon) AS n_urls,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM urls GROUP BY host ORDER BY host""".stripMargin,

    "txt_host_cap" -> {
      val corpus =
        s"""SELECT doc_id, source, n_chars FROM documents
           |  UNION ALL
           |  SELECT doc_id + ${Tables.PlantedIdBase} AS doc_id, source, n_chars
           |  FROM documents WHERE doc_id < 30""".stripMargin
      s"""WITH ${urlCanonCtes(corpus)},
         |dedup AS (
         |  SELECT host, doc_id, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY url_canon ORDER BY doc_id) AS rn
         |  FROM urls),
         |capped AS (
         |  SELECT host, doc_id, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY host
         |                       ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM dedup WHERE rn = 1)
         |SELECT host, CAST(rk AS INT) AS rk, doc_id, n_chars
         |FROM capped WHERE rk <= 10 ORDER BY host, rk""".stripMargin
    },

    "txt_html_extract" ->
      // independent re-derivation of HtmlFunctions.extractMain: same
      // dressing (HtmlRawSql parses in both engines), DuckDB's own
      // regex engine for the strip/segment/visible-text chain, the
      // identical integer link-density cut (2·link_chars ≤ visible)
      s"""WITH page AS (SELECT doc_id, $HtmlRawSql AS html FROM documents),
         |seg AS (SELECT doc_id,
         |    replace(replace(replace(replace(
         |      regexp_replace(regexp_replace(regexp_replace(html,
         |        '<script.*?</script>', ' ', 'gs'),
         |        '<style.*?</style>', ' ', 'gs'),
         |        '<head.*?</head>', ' ', 'gs'),
         |      '<p>', chr(1) || '<p>'), '<nav>', chr(1) || '<nav>'),
         |      '<div>', chr(1) || '<div>'), '<footer>', chr(1) || '<footer>') AS c
         |  FROM page),
         |blk AS (SELECT doc_id,
         |    unnest(range(1, len(string_split(c, chr(1))) + 1)) AS pos,
         |    unnest(string_split(c, chr(1))) AS b
         |  FROM seg),
         |vis AS (SELECT doc_id, pos,
         |    trim(regexp_replace(regexp_replace(b,
         |      '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS visible,
         |    trim(regexp_replace(regexp_replace(regexp_replace(b,
         |      '<a[^>]*>.*?</a>', '', 'gs'),
         |      '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS non_anchor
         |  FROM blk),
         |scored AS (SELECT doc_id, pos, visible,
         |    length(visible) - length(non_anchor) AS link_chars
         |  FROM vis WHERE length(visible) > 0)
         |SELECT doc_id,
         |  COALESCE(string_agg(
         |    CASE WHEN link_chars * 2 <= length(visible) THEN visible END,
         |    ' ' ORDER BY pos), '') AS main_text,
         |  COUNT(*) AS n_blocks,
         |  CAST(SUM(CASE WHEN link_chars * 2 > length(visible) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dropped,
         |  CAST(length(COALESCE(string_agg(
         |    CASE WHEN link_chars * 2 <= length(visible) THEN visible END,
         |    ' ' ORDER BY pos), '')) AS BIGINT) AS n_chars
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "txt_link_graph" -> {
      // independent host derivation (lowercase prefix → strip
      // userinfo → strip www → host before any port), applied to the
      // page's own URL and to every extracted absolute link
      def hostSql(u: String) =
        s"""regexp_extract(regexp_replace(regexp_replace(
           |  lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)),
           |  '^([a-z0-9+.-]*://)[^/?#@]*@', '\\1'),
           |  '^(https?://)www\\.', '\\1'),
           |  '^[a-z0-9+.-]*://([^:/]*)', 1)""".stripMargin.replace('\n', ' ')
      s"""WITH page AS (
         |  SELECT doc_id, source, ($HtmlRawSql || $HtmlLinksSql) AS html
         |  FROM documents),
         |links AS (SELECT doc_id, source,
         |    unnest(regexp_extract_all(html, 'href="([hH][tT][tT][pP][^"]*)"', 1)) AS raw
         |  FROM page),
         |hosts AS (SELECT doc_id,
         |    ${hostSql(UrlRawSql)} AS src_host,
         |    ${hostSql("raw")} AS dst_host
         |  FROM links)
         |SELECT src_host, dst_host, COUNT(*) AS n_links,
         |  COUNT(DISTINCT doc_id) AS n_pages
         |FROM hosts GROUP BY src_host, dst_host
         |ORDER BY src_host, dst_host""".stripMargin
    },

    "txt_host_authority" -> {
      def hostSql(u: String) =
        s"""regexp_extract(regexp_replace(regexp_replace(
           |  lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)),
           |  '^([a-z0-9+.-]*://)[^/?#@]*@', '\\1'),
           |  '^(https?://)www\\.', '\\1'),
           |  '^[a-z0-9+.-]*://([^:/]*)', 1)""".stripMargin.replace('\n', ' ')
      val step = graft.dedup.DedupQueries.pagerankStepSql _
      s"""WITH page AS (
         |  SELECT doc_id, source, ($HtmlRawSql || $HtmlLinksSql) AS html
         |  FROM documents),
         |links AS (SELECT doc_id, source,
         |    unnest(regexp_extract_all(html, 'href="([hH][tT][tT][pP][^"]*)"', 1)) AS raw
         |  FROM page),
         |hosts AS (SELECT ${hostSql(UrlRawSql)} AS src_host,
         |    ${hostSql("raw")} AS dst_host
         |  FROM links),
         |cpairs AS (SELECT DISTINCT least(src_host, dst_host) AS a,
         |    greatest(src_host, dst_host) AS b
         |  FROM hosts WHERE src_host <> dst_host),
         |edges AS (SELECT a AS src, b AS dst FROM cpairs
         |          UNION ALL SELECT b AS src, a AS dst FROM cpairs),
         |deg AS (SELECT src AS doc_id, COUNT(*) AS degree
         |        FROM edges GROUP BY src),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
         |r0 AS (SELECT doc_id, degree, ROUND(CAST(1 AS DOUBLE) / nn.n, 9) AS rank
         |       FROM deg, nn),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT doc_id AS host, degree, rank FROM r3 ORDER BY host""".stripMargin
    },
  )

  /** The oracle's INDEPENDENT canonicalization: the same dirty-URL
    * plant ([[UrlRawSql]] parses in both engines), but the rule chain
    * re-derived in DuckDB regex syntax — a real cross-check of
    * UrlFunctions, not a replay of its expressions. Yields CTE `urls`
    * with (doc_id, n_chars, url_raw, url_canon, host). Shared with
    * the streaming URL-dedup gate's oracle (StreamQueries). */
  private[graft] def urlCanonCtes(corpusSql: String): String =
    s"""raw AS (SELECT doc_id, n_chars, $UrlRawSql AS url_raw
       |  FROM ($corpusSql)),
       |s1 AS (SELECT *, regexp_replace(url_raw, '#.*$$', '') AS u1 FROM raw),
       |sp AS (SELECT *,
       |    CASE WHEN strpos(u1, '?') = 0 THEN u1
       |         ELSE substr(u1, 1, strpos(u1, '?') - 1) END AS pth,
       |    CASE WHEN strpos(u1, '?') = 0 THEN ''
       |         ELSE substr(u1, strpos(u1, '?')) END AS qry FROM s1),
       |s2 AS (SELECT *, pth || regexp_replace(regexp_replace(
       |    regexp_replace(regexp_replace(qry,
       |    '&(utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g'),
       |    '^\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*&', '?'),
       |    '^\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*$$', ''),
       |    '^\\?$$', '') AS u2 FROM sp),
       |s3 AS (SELECT *, regexp_replace(regexp_replace(u2,
       |    '^([^?#]*?)/+\\?', '\\1?'),
       |    '^([^?#]*?)/+$$', '\\1') AS u3 FROM s2),
       |pf AS (SELECT *,
       |    regexp_extract(u3, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)
       |      AS prefix FROM s3),
       |cp AS (SELECT *, regexp_replace(regexp_replace(regexp_replace(
       |    regexp_replace(lower(prefix),
       |    '^([a-z0-9+.-]*://)[^/?#@]*@', '\\1'),
       |    '^(https?://)www\\.', '\\1'),
       |    '^(http://[^:/]*):80$$', '\\1'),
       |    '^(https://[^:/]*):443$$', '\\1') AS cprefix FROM pf),
       |urls AS (SELECT doc_id, n_chars, url_raw,
       |    cprefix || substr(u3, length(prefix) + 1) AS url_canon,
       |    regexp_extract(cprefix, '^[a-z0-9+.-]*://([^:/]*)', 1) AS host
       |  FROM cp)""".stripMargin
}
