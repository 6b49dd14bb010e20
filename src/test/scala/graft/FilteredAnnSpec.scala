package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for metadata-constrained vector search
  * (Ann.filteredTopK): the constraint must compose BEFORE ranking —
  * the top-k among label=x is NOT the label=x subset of the global
  * top-k, and a post-filtered implementation fails the planted test
  * below. */
class FilteredAnnSpec extends AnyFunSuite {
  import TestSpark._

  test("the filter composes before ranking, not over the global shortlist") {
    import spark.implicits._
    // query q (label 1): the globally nearest vector is b (label 2 —
    // must be excluded); the best same-label neighbor is c, nearly
    // orthogonal. A post-filter of the global top-1 would return
    // nothing; pre-filtering returns c.
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1), // q
      (2L, Array(0.99f, 0.14f, 0.0f, 0.0f), 2), // b: global nn, wrong label
      (3L, Array(0.2f, 0.98f, 0.0f, 0.0f), 1), // c: best with label 1
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Ann.filteredTopK(rows, "vec_id", "embedding", "label",
        rows.filter($"vec_id" === 1L), k = 1)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("nn") == 3L,
      s"expected same-label neighbor 3, got ${got.head}")
  }

  test("filteredTopK == per-label brute force on the real embeddings") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 20)
    val got = Ann.filteredTopK(e, "vec_id", "embedding", "label", queries, k = 3)
      .select("qid", "rn", "nn", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val labels = queries.select("label").distinct()
      .collect().map(_.getInt(0))
    val expected = labels.flatMap { l =>
      Ann.bruteTopK(e.filter(col("label") === l), "vec_id", "embedding",
          queries.filter(col("label") === l), k = 3)
        .select("qid", "rn", "nn", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    }.toSet
    assert(got == expected,
      s"filtered ranking diverges from per-label brute force: " +
        s"only-got=${(got diff expected).take(5)} " +
        s"only-exp=${(expected diff got).take(5)}")
  }

  test("every returned neighbor carries the query's label") {
    val e = Tables.embeddings(spark, sf)
    val res = Ann.filteredTopK(e, "vec_id", "embedding", "label",
      e.filter(col("vec_id") < 20), k = 3)
    val leaked = res
      .join(e.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
      .join(e.select(col("vec_id").as("nn"), col("label").as("nl")), "nn")
      .filter(col("ql") =!= col("nl")).count()
    assert(leaked == 0L, s"$leaked cross-label neighbors leaked")
  }
}
