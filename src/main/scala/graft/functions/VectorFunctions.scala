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

  /** The composed form (reference implementation of the semantics). */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature: `bits` sign-bits packed into a
    * long. Hyperplane j, dim d has (deterministic, engine-portable)
    * component sin(j·131 + d·7). Near-identical directions collide on
    * all bits, so near-dup candidates share a bucket — candidate
    * generation is a hash shuffle, never O(n²) (the 100 TB path). */
  def lshBucket(v: Column, bits: Int = 16): Column = {
    val planeDot = (j: Column) => aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, d) => x.cast("double") * sin(j.cast("double") * lit(131.0) + d.cast("double") * lit(7.0))),
      lit(0.0), (acc, x) => acc + x)
    array_join(
      transform(sequence(lit(0), lit(bits - 1)),
        j => when(planeDot(j) >= 0.0, lit("1")).otherwise(lit("0"))),
      "")
  }
}
