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
}
