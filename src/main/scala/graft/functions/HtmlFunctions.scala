package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the crawl stage between URL
  * canonicalization (UrlFunctions) and the text-quality gates: strip
  * non-content markup (script/style/head), segment the page into
  * block-level chunks, drop boilerplate blocks by LINK DENSITY (nav
  * bars, promo inserts, footers — blocks whose visible text is mostly
  * anchor text, the jusText/trafilatura heuristic), and emit the
  * surviving text plus per-document kept/dropped stats.
  *
  * Reference analog: the reference engine has no crawl layer — this
  * extends the pipeline the way RefinedWeb/CCNet document (their
  * trafilatura step). Everything is composed from codegen'd string
  * expressions (regexp_replace/split/length), one pass per document,
  * zero shuffles until the caller aggregates: the shape that runs
  * unchanged over 100 TB of WARC-extracted pages.
  *
  * Cross-engine exactness (the hash-gate contract): every rule is
  * either a FIXED-STRING replace or a regex both Java and RE2 read
  * identically ((?s) dotall + non-greedy spans, `<[^>]*>` tag strip,
  * `\s+` squeeze), and the link-density cut is integer arithmetic
  * (2·link_chars ≤ visible_chars) — no floating point anywhere.
  */
object HtmlFunctions {

  /** Block separator sentinel — U+0001 never occurs in corpus text
    * (verified) and survives both engines' string functions. */
  val Sentinel = "\u0001"

  /** Tags that OPEN a content block in the dressing grammar. Fixed
    * lowercase strings so both engines segment with plain replace —
    * no regex dialect in the splitting step. */
  val BlockTags: Seq[String] = Seq("<p>", "<nav>", "<div>", "<footer>")

  /** Remove non-content spans (head incl. title/script/style, plus
    * any body-level script/style), then mark block boundaries with
    * the sentinel. */
  def segmented(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style.*?</style>", " ")
    val noHead = regexp_replace(noStyle, "(?s)<head.*?</head>", " ")
    split(BlockTags.foldLeft(noHead)((c, t) =>
      regexp_replace(c, java.util.regex.Pattern.quote(t), Sentinel + t)),
      Sentinel)
  }

  /** Visible text of one block: tags → spaces, whitespace squeezed,
    * trimmed. */
  def visibleText(block: Column): Column =
    trim(regexp_replace(regexp_replace(block, "<[^>]*>", " "), "\\s+", " "))

  /** Visible text EXCLUDING anchor text (anchors removed whole). */
  def nonAnchorText(block: Column): Column =
    visibleText(regexp_replace(block, "(?s)<a[^>]*>.*?</a>", ""))

  /** (doc_id, main_text, n_blocks, n_dropped, n_chars) for a
    * (idCol, htmlCol) frame: segment → per-block link density →
    * keep low-density blocks → reassemble in document order. */
  def extractMain(df: org.apache.spark.sql.DataFrame, idCol: String,
                  htmlCol: String): org.apache.spark.sql.DataFrame = {
    val blocks = df
      .select(col(idCol), posexplode(segmented(col(htmlCol))))
      .withColumn("visible", visibleText(col("col")))
      .withColumn("link_chars",
        length(col("visible")) - length(nonAnchorText(col("col"))))
      .filter(length(col("visible")) > 0)
      .withColumn("keep", col("link_chars") * 2 <= length(col("visible")))
    blocks.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("visible"))))),
            x => x.getField("visible")),
          " ").as("main_text"),
        count(lit(1)).as("n_blocks"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"))
      .withColumn("n_chars", length(col("main_text")).cast("long"))
  }
}
