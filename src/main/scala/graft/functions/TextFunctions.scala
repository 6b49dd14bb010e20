package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the LLM-data-pipeline surface
  * (SURVEY.md §2 "text analysis").
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * higher-order array expressions — fully codegen'd, no UDFs, so the
  * whole pipeline stays inside WholeStageCodegen and scales linearly:
  * one pass over the text column, no shuffle, no driver involvement.
  *
  * Formulas are deliberately expressible in portable SQL (the DuckDB
  * oracle replicates them term for term), which also pins down their
  * semantics exactly.
  */
object TextFunctions {

  /** Lowercase alnum word tokens (same tokenizer as FullText).
    * Native expression (graft.plans.TokensExpr); identical to
    * filter(split(lower(text), "[^a-z0-9]+"), len > 0). */
  def tokens(text: Column): Column =
    graft.plans.HashExpressions.tokens(text)

  /** Whitespace token count. Empty/whitespace-only text has ZERO
    * tokens: split("", "\\s+") yields [""] (size 1), so the bare size
    * over-counts every empty doc by one — guard it out, in agreement
    * with tokens()/bpeishCount which report 0 for the same input. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: alpha runs, single digits, single
    * non-alnum-non-space marks — a cheap proxy for BPE token count. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** REAL BPE subword tokens: greedy merge application over the
    * deterministic in-repo merges table (Sennrich et al. 2015,
    * arXiv:1508.07909; graft.plans.BpeOps). The counts trainers
    * actually budget in — mixture sampling, sequence packing and
    * chunking take these as their budget column. */
  def bpeTokens(text: Column): Column =
    graft.plans.HashExpressions.bpeTokens(text)

  /** BPE subword token count (same kernel, no string materialization). */
  def bpeTokenCount(text: Column): Column =
    graft.plans.HashExpressions.bpeCount(text)

  /** The production shape: the same BPE kernels over a PUBLISHED
    * merges table (graft.plans.BpeVocab.fromFile/fromLines — the
    * standard merges.txt format) instead of the seed-trained default.
    * Trainers ship merges files; they don't retrain from prose. */
  def bpeTokens(text: Column, vocab: graft.plans.BpeVocab): Column =
    graft.plans.HashExpressions.bpeTokens(text, vocab)

  def bpeTokenCount(text: Column, vocab: graft.plans.BpeVocab): Column =
    graft.plans.HashExpressions.bpeCount(text, vocab)

  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val StopEs: Seq[String] = Seq("el", "la", "de", "los", "es", "y")

  private def stopHits(toks: Column, stops: Seq[String]): Column = {
    val arr = array(stops.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  /** Stopword hit ratio against the English list. Zero-token text
    * ratio is 0, not NULL: an unguarded 0/0 division returns NULL in
    * Spark (and inf/nan in engines with IEEE division), which would
    * silently drop the doc through every `quality >= θ` gate and
    * diverge from the SQL oracle on the first symbol-only document. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0, stopHits(t, StopEn).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** Ratio of alphanumeric chars to all chars (0 for empty text — see
    * stopwordRatio on why the division must be guarded). */
  def alnumRatio(text: Column): Column =
    when(length(text) > 0,
        length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("double") /
          length(text))
      .otherwise(lit(0.0))

  /** Composite quality score in [0,1]:
    * 0.5·min(1, n_tokens/120) + 0.3·stopword_ratio + 0.2·alnum_ratio,
    * rounded to 4 dp. Left-assoc sum, identical in the oracle. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenTerm = lit(0.5) * least(lit(1.0), size(t).cast("double") / lit(120.0))
    val stopTerm = lit(0.3) *
      when(size(t) > 0, stopHits(t, StopEn).cast("double") / size(t))
        .otherwise(lit(0.0))
    val alnumTerm = lit(0.2) * alnumRatio(text)
    round(lenTerm + stopTerm + alnumTerm, 4)
  }

  /** Stopword-profile language ID over {en, de, es}: argmax of
    * per-language stopword hits, ties resolved en > de > es. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = stopHits(t, StopEn); val de = stopHits(t, StopDe); val es = stopHits(t, StopEs)
    when(en >= de && en >= es, "en").when(de >= es, "de").otherwise("es")
  }

  /** Positional rolling-hash fingerprint (mod p = 1e9+7):
    * Σ_i (ascii(tok_i)·len(tok_i)) · ((i·2654435761) mod p) mod p,
    * i 1-based. Order-sensitive (a permuted doc fingerprints
    * differently) yet exact-integer portable across engines. */
  def fingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    val t = tokens(text)
    val terms = transform(sequence(lit(1), size(t)), i =>
      (ascii(element_at(t, i)).cast("long") * length(element_at(t, i)) %p
        * ((i.cast("long") * lit(2654435761L)) % p)) % p)
    // zero-token docs: sequence(1, 0) DESCENDS to [1, 0] and
    // element_at(t, 0) throws unconditionally — guard to NULL, which
    // is also what the oracle's empty-range list_sum returns
    when(size(t) === 0, lit(null).cast("long"))
      .otherwise(aggregate(terms, lit(0L), (acc, x) => (acc + x) % p))
  }

  /** Character bigrams of the raw lowercased text (spaces included).
    * Native expression (graft.plans.CharBigramsExpr); equivalent to
    * transform(sequence(1, length-1), i -> substr(lower(text), i, 2)). */
  def charBigrams(text: Column): Column =
    graft.plans.HashExpressions.charBigrams(text)

  /** Word n-gram shingles (space-joined, distinct, empty for
    * token-less text). Native expression — single source of truth for
    * shingle semantics (graft.plans.WordShinglesExpr). */
  def wordShingles(text: Column, n: Int): Column =
    graft.plans.HashExpressions.wordShingles(text, n)

  // --- PII scrubbing (training-data redaction pass) -----------------
  // Patterns kept to the regex subset with identical semantics in
  // Java (Spark codegen'd regexp_replace) and RE2 (DuckDB oracle):
  // \b, \d, bounded repetition, character classes.
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, IPv4 addresses and phone numbers with typed tags.
    * Email first (its local part may contain digits), then IP (dotted
    * digits would otherwise half-match the phone pattern), then phone.
    * Pure codegen'd regexp_replace chain — no UDF, no shuffle. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Count of matches of `re` in `text` (scan-side, codegen'd). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))
}
