package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap
import java.util.function.Function

/** Per-directory memoization of derived index frames shared by several
  * queries (full-text postings, dedup pair sets). An index is built
  * once and consulted many times — rebuilding it per query would
  * misrepresent both the design and the benchmark. Entries are
  * Spark-cached; the cache is per-JVM and keyed by (kind, dir).
  */
object QueryCaches {
  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** Memoize an arbitrary derived frame (public: query modules share
    * pair sets / index frames through this). */
  def frame(key: String)(build: => DataFrame): DataFrame = memo(key)(build)

  private def memo(key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(key, new Function[String, DataFrame] {
      override def apply(k: String): DataFrame = build.cache()
    })

  def postings(s: SparkSession, d: String): DataFrame =
    memo(s"postings:$d")(
      index.FullText.buildPostings(Tables.documents(s, d), "doc_id", "text"))

  def positional(s: SparkSession, d: String): DataFrame =
    memo(s"positional:$d")(
      index.FullText.buildPositional(Tables.documents(s, d), "doc_id", "text"))

  def dictionary(s: SparkSession, d: String): DataFrame =
    memo(s"dictionary:$d")(index.FullText.buildDictionary(postings(s, d)))

  /** Per-document token counts (BM25 norms), derived from the postings. */
  def doclens(s: SparkSession, d: String): DataFrame =
    memo(s"doclens:$d")(index.FullText.buildDocLens(postings(s, d)))

  /** Average document length for BM25, computed as exact-integer
    * totalTokens / N so every engine derives the identical double
    * (a floating AVG would be summation-order-dependent). */
  def avgDocLen(s: SparkSession, d: String): Double = {
    val total = counts.computeIfAbsent(s"toktotal:$d",
      new Function[String, java.lang.Long] {
        override def apply(k: String): java.lang.Long = {
          val r = doclens(s, d).agg(org.apache.spark.sql.functions.sum("dl")).head
          // sum over zero rows is NULL — fail with the real cause, not
          // an opaque NPE inside the cache builder
          require(!r.isNullAt(0),
            s"avgDocLen: no tokenized documents under $d — BM25 needs a non-empty corpus")
          r.getLong(0)
        }
      })
    total.toDouble / corpusSize(s, d)
  }

  /** Bitmap index over an orders column — built once per (column, dir)
    * like a persisted index table, consulted by every bitmap query. */
  def ordersBitmap(s: SparkSession, d: String, valueCol: String): DataFrame =
    memo(s"bitmap:$valueCol:$d")(
      index.BitmapIndex.build(Tables.orders(s, d), "o_orderkey", valueCol))

  private val objs = new ConcurrentHashMap[String, AnyRef]()

  /** Memoize an arbitrary derived index artifact that isn't a single
    * DataFrame (e.g. an IVF index = assigned lists + centroids). The
    * builder is responsible for caching its member frames. */
  def obj[T <: AnyRef](key: String)(build: => T): T =
    objs.computeIfAbsent(key, new Function[String, AnyRef] {
      override def apply(k: String): AnyRef = build
    }).asInstanceOf[T]

  private val counts = new ConcurrentHashMap[String, java.lang.Long]()

  /** Corpus document count, computed once per directory and stored with
    * the index frames — tf-idf needs N on every query, and a real
    * deployment persists N alongside the dictionary rather than
    * re-scanning the corpus per search. */
  def corpusSize(s: SparkSession, d: String): Long =
    counts.computeIfAbsent(s"ndocs:$d", new Function[String, java.lang.Long] {
      override def apply(k: String): java.lang.Long = Tables.documents(s, d).count()
    })
}
