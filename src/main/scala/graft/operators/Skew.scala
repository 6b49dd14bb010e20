package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §4: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join split handles most shuffle-join skew at runtime;
  * these are for the cases it can't: a single hot GROUP BY key whose
  * partial aggregate still bottlenecks one task, and a hot join key
  * against a side too big to broadcast.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: scatter
    * each key across `salt` sub-keys (POSITION-based salt — see the
    * inline comment: content hashing would send identical duplicate
    * rows, the common shape of a hot key, to one sub-key), partially
    * aggregate (key, salt), then finish per key. The hot key's work
    * spreads over `salt` tasks.
    *
    * CONTRACT: the input's per-partition row order must be
    * deterministic under task retry (a parquet/file scan — both call
    * sites here — is; the output of an unsorted shuffle is NOT). A
    * position-based salt over retry-nondeterministic input is the
    * SPARK-23207 hazard: a recomputed map task can salt a row
    * differently than the partially-consumed original, double-counting
    * it in one partial and dropping it from another. For such inputs,
    * sortWithinPartitions on a total ordering first, or salt by a hash
    * of the full row and accept duplicate-row clumping. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!df.columns.contains("__salt"),
      "input may not carry the reserved __salt column")
    // position-based salt: identical duplicate rows (the common shape
    // of a hot key) must spread too, so never hash row CONTENT
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, salt); the right side is replicated
    * `salt` times. The shuffle key becomes (key, salt) so one hot key
    * spreads over `salt` partitions at the cost of `salt`× the right
    * side (use when right is modest but above broadcast size). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    // salt = 0 would make pmod(id, 0) NULL on every left row — an
    // inner join that silently returns ZERO rows, not an error
    require(salt > 0, s"salt must be positive, got $salt")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs may not carry the reserved __salt column")
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
