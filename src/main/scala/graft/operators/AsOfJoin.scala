package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the latest right
  * row with the same key and right.time <= left.time — the operator
  * behind "state as of event time" queries, which plain Spark lacks.
  *
  * Implementation is the union-scan form, not a range join: tag both
  * sides, sort per key by (time, side) with the right side first at
  * equal times (inclusive semantics), and carry the right payload
  * forward with last_value(ignoreNulls). One shuffle on the key,
  * O(n log n) within partitions — at 100 TB this beats any
  * inequality-join plan (which Spark would execute as a broadcast
  * nested loop) by orders of magnitude.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     state side
    * @param keyCols   equi-key columns (same names both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   columns of `right` to carry (renamed as given)
    * @param tieCols   deterministic right-side tiebreak within a key+time
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[(String, String)],
           tieCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.exists(_.startsWith("__graft_")),
      "left columns may not use the reserved __graft_ prefix")
    // right-side payload/tie columns travel under reserved internal
    // names, so a payload column whose name also exists on the left (or
    // a left __t/__side) can never collide in the union
    val extras = (payload.map(_._1) ++ tieCols).distinct
    val extraName = extras.zipWithIndex
      .map { case (c, i) => c -> s"__graft_x$i" }.toMap
    val l = left.withColumn("__graft_t", col(leftTime))
      .withColumn("__graft_side", lit(1))
    // equi-join NULL semantics: a right row with a NULL key or a NULL
    // event time can never satisfy "same key AND time <= left.time",
    // so it is dropped here. Without this, NULLs sort FIRST in the
    // ascending window — a NULL-time right row would act as state at
    // -infinity and a NULL-key right row would match NULL-key left
    // rows (SQL equi-joins match neither). NULL-key/time LEFT rows
    // stay in the output with a NULL payload: after this filter no
    // right row precedes them in their window.
    val rLive = right.filter(
      keyCols.foldLeft(col(rightTime).isNotNull)((p, k) => p && col(k).isNotNull))
    val r = rLive.select(keyCols.map(col) ++
        extras.map(c => col(c).as(extraName(c))) :+
        col(rightTime).as("__graft_t"): _*)
      .withColumn("__graft_side", lit(0))
    // align schemas: left gets null payload/tie cols, right gets null left cols
    val lAligned = extras.foldLeft(l)((df, c) =>
      df.withColumn(extraName(c), lit(null)))
    val rAligned = leftCols.foldLeft(r)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val allCols = leftCols.toSeq ++ extras.map(extraName) ++
      Seq("__graft_t", "__graft_side")
    val combined = lAligned.select(allCols.map(col): _*)
      .unionByName(rAligned.select(allCols.map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(col("__graft_t").asc, col("__graft_side").asc) ++
        tieCols.map(c => col(extraName(c)).asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the payload as ONE struct: it is non-null for every right
    // row even when its fields are null, so a matched right row with a
    // NULL payload value yields NULL (as-of semantics), not a stale
    // older value that last(ignoreNulls) on the bare column would give
    val srcStruct = struct(payload.map { case (src, _) =>
      col(extraName(src)).as(extraName(src)) }: _*)
    val carried = combined.withColumn("__graft_carried",
      last(when(col("__graft_side") === 0, srcStruct), ignoreNulls = true).over(w))
    carried.filter(col("__graft_side") === 1)
      .select(leftCols.map(col) ++
        payload.map { case (src, dst) =>
          col("__graft_carried").getField(extraName(src)).as(dst) }: _*)
  }

  /** NEAREST as-of join with tolerance (the pandas merge_asof
    * `direction='nearest'` / kdb wj sibling of [[asOf]]'s backward
    * rule): for each left row, the right row with the same key whose
    * time is CLOSEST to the left time — in either direction — within
    * `tolerance`; a tie in |Δt| prefers the earlier (backward) match.
    * Time columns must be integral (epoch micros/seconds): the
    * forward pass is the backward pass over NEGATED times, so the
    * whole operator is two union-scan as-of passes — two key
    * shuffles, O(n log n) per key, no inequality join at any scale.
    * Rows with no match within tolerance keep NULL payload (left
    * semantics; callers filter for inner).
    *
    * Emits `payload` plus `deltaCol` = chosen (right − left) time
    * delta (negative = backward match, NULL = no match). */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTime: String, rightTime: String,
                  payload: Seq[(String, String)],
                  tieCols: Seq[String], tolerance: Long,
                  deltaCol: String): DataFrame = {
    require(tolerance >= 0, s"tolerance must be non-negative, got $tolerance")
    val leftCols = left.columns
    // internal carry columns are __b_<dst>/__f_<dst>/__b_t/__f_t and
    // __neg_lt — guard the whole namespace like asOf guards __graft_:
    // a payload destination named 't' would alias the time tag, and a
    // left column already named __b_*/__f_*/__neg_lt would silently
    // collide in the union (r15 ADVICE)
    require(!payload.exists(_._2 == "t"),
      "payload destination 't' collides with the internal __b_t/__f_t time tags")
    require(payload.map(_._2).distinct.size == payload.size,
      "payload destinations must be distinct")
    val reserved = (c: String) =>
      c.startsWith("__b_") || c.startsWith("__f_") || c.startsWith("__neg_")
    require(!leftCols.exists(reserved),
      "left columns may not use the reserved __b_/__f_/__neg_ prefixes")
    require(!payload.exists(p => reserved(p._2)),
      "payload destinations may not use the reserved __b_/__f_/__neg_ prefixes")
    require(!leftCols.contains(deltaCol) && !payload.exists(_._2 == deltaCol),
      s"deltaCol '$deltaCol' collides with a left/payload column")
    def tagged(dir: String) =
      payload.map { case (s, d) => (s, s"__${dir}_$d") } :+
        (rightTime, s"__${dir}_t")
    // backward: latest right <= t
    val back = asOf(left, right, keyCols, leftTime, rightTime,
      tagged("b"), tieCols)
    // forward: earliest right >= t == backward over negated times.
    // The negated column lives on BOTH sides under a private name
    // (never leaks: dropped before returning).
    val ln = back.withColumn("__neg_lt", -col(leftTime))
    val rn = right.withColumn("__neg_rt", -col(rightTime))
    val both = asOf(ln, rn, keyCols, "__neg_lt", "__neg_rt",
      tagged("f").map { case (s, d) =>
        (if (s == rightTime) "__neg_rt" else s, d) }, tieCols)
      .drop("__neg_lt")
    val db = col(leftTime) - col("__b_t")          // >= 0 when matched
    val df = -col("__f_t") - col(leftTime)         // >= 0 (stored negated)
    val bOk = col("__b_t").isNotNull && db <= tolerance
    val fOk = col("__f_t").isNotNull && df <= tolerance
    val takeBack = bOk && (!fOk || db <= df)       // tie -> backward
    val takeFwd = fOk && !takeBack
    val out = both
      .withColumn(deltaCol,
        when(takeBack, -db).when(takeFwd, df).otherwise(lit(null)))
    payload.foldLeft(out) { case (acc, (_, d)) =>
        acc.withColumn(d,
          when(takeBack, col(s"__b_$d"))
            .when(takeFwd, col(s"__f_$d")).otherwise(lit(null)))
      }
      .select(leftCols.map(col) ++ payload.map(p => col(p._2)) :+
        col(deltaCol): _*)
  }
}
