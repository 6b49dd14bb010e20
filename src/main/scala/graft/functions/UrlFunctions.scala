package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host extraction — the web-crawl pre-step of
  * a training-data pipeline (the CCNet/RefinedWeb URL-level dedup
  * layer): collapse the raw-URL variants crawlers see (scheme/host
  * case, www prefix, default ports, fragments, tracking parameters,
  * trailing slashes) onto one canonical key, so URL-level dedup and
  * host-level aggregation/caps group what is actually the same page.
  *
  * Pure codegen'd string expressions (regexp_replace/extract — no
  * UDF), one pass per row, and every rule replays in ANSI SQL, so the
  * gates run under full DuckDB oracles. Rules (RFC 3986 §6 semantics,
  * the scheme-based normalizations every crawler applies):
  *   1. drop the fragment (never sent to the server)
  *   2. drop tracking parameters (utm_*, fbclid, gclid) wherever they
  *      sit in the query, re-anchoring the first survivor on '?'
  *   3. drop an emptied query's dangling '?'
  *   4. collapse trailing path slashes ('/a/b/' = '/a/b'; the scheme
  *      authority with an empty path normalizes to no slash)
  *   5. lowercase scheme+host (NOT path/query — those are
  *      case-significant), strip a leading 'www.', strip the
  *      scheme-default port (http:80 / https:443; explicit non-default
  *      ports survive)
  */
object UrlFunctions {

  private val Tracking = "(utm_[a-z]+|fbclid|gclid)"

  /** The authority prefix `scheme://host[:port]` of a URL (raw case). */
  private def rawPrefix(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)

  /** Canonical `scheme://host` prefix: lowercase, www-stripped,
    * default port removed. */
  private def canonPrefix(u: Column): Column = {
    val lp = lower(rawPrefix(u))
    val noWww = regexp_replace(lp, "^(https?://)www\\.", "$1")
    val noHttp80 = regexp_replace(noWww, "^(http://[^:/]*):80$", "$1")
    regexp_replace(noHttp80, "^(https://[^:/]*):443$", "$1")
  }

  /** Canonical form of a raw URL per the rules above. */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // each tracking param goes with its PRECEDING separator; if the
    // first surviving param is left dangling on '&', re-anchor it on
    // '?' (the anchored pattern fires at most once). The class must
    // exclude '&' as well as '?': a greedy [^?]* would re-anchor the
    // LAST dangling separator instead of the first when several
    // non-tracking params survive a stripped leading '?utm_…' —
    // caught by UrlPropertySpec's idempotence law (the gated plant
    // never leaves two dangling '&'s, so the gates alone missed it).
    val noTrack = regexp_replace(noFrag, s"[?&]$Tracking=[^&#]*", "")
    val fixedSep = regexp_replace(noTrack, "^([^?&]*)&", "$1?")
    val noEmptyQ = regexp_replace(fixedSep, "\\?$", "")
    val noSlashQ = regexp_replace(noEmptyQ, "/+\\?", "?")
    val noTrailSlash = regexp_replace(noSlashQ, "/+$", "")
    concat(canonPrefix(noTrailSlash),
      noTrailSlash.substr(length(rawPrefix(noTrailSlash)) + 1, lit(Int.MaxValue)))
  }

  /** Canonical host (lowercase, www- and port-stripped) of a raw URL. */
  def host(u: Column): Column =
    regexp_extract(canonPrefix(u), "^[a-z0-9+.-]*://([^:/]*)", 1)
}
