package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, composed from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so similarity scans stay inside WholeStageCodegen (SURVEY.md §2
  * "similarity search").
  *
  * All arithmetic is widened to double; scores that feed cross-engine
  * comparisons are rounded (float32 engines differ ~1e-8).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native expression (graft.plans.CosineSimExpr); numerically
    * identical to dot(a,b)/(norm(a)·norm(b)) with sequential
    * accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.HashExpressions.cosineSim(a, b)

  /** The composed form (reference implementation of the semantics,
    * incl. the zero-norm guard: similarity to the zero vector is 0). */
  def cosineComposed(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

}
