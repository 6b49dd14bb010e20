package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Top-k rows per group as a first-class operator.
  *
  * The window-function form (`row_number().over(partitionBy(g).orderBy(o))
  * <= k`) must fully sort every group; this operator keeps a bounded
  * k-element heap per group instead — O(n log k) with O(groups·k)
  * memory, no per-group sort, no spill pressure from ranks beyond k.
  * At 100 TB ("top-k neighbors per query vector", "top-k docs per
  * term") ranks beyond k dominate the window sort's cost; a bounded
  * heap never materializes them.
  *
  * Built the (c)-tier way (SURVEY.md §3): logical node → planner
  * strategy → physical exec with a ClusteredDistribution requirement,
  * so Catalyst inserts the group-key exchange and AQE still manages
  * partition sizing. Registered via GraftExtensions or
  * `spark.experimental.extraStrategies`.
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  // rows stay in the child's (group-key hash) layout, so a Window or
  // aggregation on the same keys above needs no second exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderB = order
    val childOutput = child.output
    val kk = k
    // Memory bound: O(groups-per-task × k) rows held on heap, no
    // spill. With ClusteredDistribution that is |distinct groups| /
    // shuffle-partitions per task — fine for the operator's intended
    // shapes (top-k per query / per user / per term, where k·groups ≪
    // input). A runaway group cardinality fails FAST with a clear
    // message instead of an executor OOM; callers with legitimately
    // huge group counts raise the limit or add shuffle partitions.
    val maxGroups = conf.getConfString(
      "spark.graft.topk.maxGroupsPerTask", "4000000").toInt
    child.execute().mapPartitions { iter0 =>
      // defensive: the heap stores UnsafeRow copies, but a child that
      // already satisfies the distribution (no exchange inserted) may
      // emit generic InternalRows — project rather than cast-crash
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val iter = iter0.map {
        case u: UnsafeRow => u
        case r => toUnsafe(r)
      }
      val groupProj = UnsafeProjection.create(groupExprsB, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderB.map(so => SortOrder(
            org.apache.spark.sql.catalyst.expressions.BindReferences
              .bindReference(so.child, childOutput),
            so.direction, so.nullOrdering, Seq.empty)), Seq.empty)
      // per group: heap head must be the WORST kept row (first to
      // evict). Scala's PriorityQueue dequeues the MAX under its
      // Ordering, and under `ordering` "better" compares smaller, so
      // the queue uses `ordering` itself: head = max = worst.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            if (heaps.size >= maxGroups)
              throw new IllegalStateException(
                s"TopKPerGroup: more than $maxGroups distinct groups in one " +
                "task (bound: groups×k rows per task, no spill) — raise " +
                "spark.graft.topk.maxGroupsPerTask or increase " +
                "spark.sql.shuffle.partitions")
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.update(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Turn on the RankFilterToTopK optimizer rewrite + the planner
    * strategy on a live session (idempotent). */
  def enableAutoRewrite(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    if (!spark.experimental.extraOptimizations.contains(RankFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RankFilterToTopK
  }

  /** df reduced to the k best rows per group, ordered by `orderSpecs`
    * (name, descending?); rows keep their schema. Columns are resolved
    * against df's own output so the plan needs no further analysis.
    * Registers the planner strategy on first use. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderSpecs: Seq[(String, Boolean)], k: Int): DataFrame = {
    // fail at plan time with the cause, not mid-task: k = 0 creates an
    // empty heap whose `heap.head` comparison throws an opaque
    // NoSuchElementException on the first executor row
    require(k > 0, s"perGroup needs k > 0, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    val plan = GraftColumnBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val order = orderSpecs.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftColumnBridge.dataFrame(spark,
      TopKPerGroupPlan(groupCols.map(attr), order, k, plan))
  }
}
