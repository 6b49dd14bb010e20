package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host extraction — the web-crawl pre-step of
  * a training-data pipeline (the CCNet/RefinedWeb URL-level dedup
  * layer): collapse the raw-URL variants crawlers see (scheme/host
  * case, www prefix, userinfo, default ports, fragments, tracking
  * parameters, trailing slashes) onto one canonical key, so URL-level
  * dedup and host-level aggregation/caps group what is actually the
  * same page.
  *
  * Pure codegen'd string expressions (regexp_replace/extract — no
  * UDF), one pass per row, and every rule replays in ANSI SQL, so the
  * gates run under full DuckDB oracles. Rules (RFC 3986 §6 semantics,
  * the scheme-based normalizations every crawler applies):
  *   1. drop the fragment (never sent to the server)
  *   2. drop tracking parameters (utm_*, fbclid, gclid) wherever they
  *      sit in the query — the rules run on the substring AFTER the
  *      first '?' only, so a literal '&' (or even '&utm_x=') in the
  *      PATH (legal RFC 3986 sub-delims) is never rewritten
  *   3. drop an emptied query's dangling '?'
  *   4. collapse trailing PATH slashes ('/a/b/' = '/a/b'; the
  *      authority with an empty path normalizes to no slash) — both
  *      slash rules anchor at the string start and stop at the first
  *      '?', so slashes inside query VALUES survive untouched
  *   5. lowercase scheme+host (NOT path/query — those are
  *      case-significant), drop userinfo ('user:pass@' — crawl canon
  *      never keys on credentials), strip a leading 'www.', strip the
  *      scheme-default port (http:80 / https:443; explicit
  *      non-default ports survive)
  *
  * Every pattern is either anchored at '^' (fires at most once under
  * ANY engine's replace semantics) or per-parameter with a [?&]
  * prefix, so Spark's always-global regexp_replace and an oracle's
  * first-match default cannot diverge. UrlPropertySpec pins the
  * idempotence and zero-residue laws over random structured URLs —
  * the gated plant alone missed a greedy-re-anchor bug here once.
  */
object UrlFunctions {

  private val Tracking = "(utm_[a-z]+|fbclid|gclid)"

  /** The authority prefix `scheme://[userinfo@]host[:port]` (raw case). */
  private def rawPrefix(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)

  /** Canonical `scheme://host` prefix: lowercase, userinfo dropped,
    * www-stripped, default port removed. */
  private def canonPrefix(u: Column): Column = {
    val lp = lower(rawPrefix(u))
    val noUser = regexp_replace(lp, "^([a-z0-9+.-]*://)[^/?#@]*@", "$1")
    val noWww = regexp_replace(noUser, "^(https?://)www\\.", "$1")
    val noHttp80 = regexp_replace(noWww, "^(http://[^:/]*):80$", "$1")
    regexp_replace(noHttp80, "^(https://[^:/]*):443$", "$1")
  }

  /** Canonical form of a raw URL per the rules above. */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // The tracking rules run on the QUERY substring only (everything
    // from the first '?', split exactly like canonPrefix splits on
    // the authority) — a path segment containing '&utm_x=...' (legal
    // RFC 3986 sub-delims) is structurally out of reach, not merely
    // unmatched. Within the query, three positions:
    //   (a) non-leading ('&track=v' anywhere) — global;
    //   (b) leading with a successor ('?track=v&' → '?') — after (a)
    //       at most one remains, promoted onto the next param;
    //   (c) a sole tracking-only query ('?track=v$') — dropped whole;
    //   (d) a query emptied to a bare '?' — dropped.
    val qpos = instr(noFrag, "?")
    val pathPart = when(qpos === 0, noFrag)
      .otherwise(noFrag.substr(lit(1), qpos - 1))
    val queryPart = when(qpos === 0, lit(""))
      .otherwise(noFrag.substr(qpos, lit(Int.MaxValue)))
    val noMid = regexp_replace(queryPart, s"&$Tracking=[^&#]*", "")
    val noLead = regexp_replace(noMid, s"^\\?$Tracking=[^&#]*&", "?")
    val noTrack = regexp_replace(noLead, s"^\\?$Tracking=[^&#]*$$", "")
    val noEmptyQ = concat(pathPart, regexp_replace(noTrack, "^\\?$", ""))
    // path-slash collapse: anchored, lazy prefix that cannot cross a
    // '?' — fires at most once, only on the path/query boundary or a
    // query-less tail (query-value slashes are content)
    val noSlashQ = regexp_replace(noEmptyQ, "^([^?#]*?)/+\\?", "$1?")
    val noTrailSlash = regexp_replace(noSlashQ, "^([^?#]*?)/+$", "$1")
    concat(canonPrefix(noTrailSlash),
      noTrailSlash.substr(length(rawPrefix(noTrailSlash)) + 1, lit(Int.MaxValue)))
  }

  /** Canonical host (lowercase, userinfo/www/port-stripped). */
  def host(u: Column): Column =
    regexp_extract(canonPrefix(u), "^[a-z0-9+.-]*://([^:/]*)", 1)
}
