package graft.plans

import graft.index.Bitmap
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd bitmap combinators (AND / OR / ids / cardinality) over
  * the serialized roaring-style bytes of [[graft.index.Bitmap]].
  *
  * These ran as scalar UDFs. They execute at index-row granularity
  * (one call per value × shard, never per base row), so boxing was
  * not a hot-path defect — but the UDF wrapper still boxed the byte
  * arrays, broke the codegen span of any surrounding projection, and
  * was the one remaining non-Expression compute in the index layer.
  * Same static-kernel shape as [[HashOps]]: `nullSafeEval` and the
  * generated code call the SAME kernel, so CODEGEN_ONLY ==
  * interpreted by construction (pinned in CodegenSpec).
  */
object BitmapKernel {
  def and(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bitmap.and(a, b)
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bitmap.or(a, b)
  def andNot(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bitmap.andNot(a, b)
  // expression-space ids: the primitive long array wrapped as ArrayData
  // (UnsafeArrayData — no per-element boxing on the way out)
  def ids(a: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Bitmap.ids(a))
  def cardinality(a: Array[Byte]): Long = Bitmap.cardinality(a)
  // version-aware fold: unpacks the array<struct<ver:int, bm:binary>>
  // operands in expression space (getStruct — no Row boxing, unlike
  // the udf this replaced) and delegates to the property-tested
  // Bitmap.foldVersions replay
  def fold(parts: ArrayData, tombs: ArrayData): Array[Byte] = {
    def unpack(a: ArrayData): Seq[(Int, Array[Byte])] =
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getInt(0), r.getBinary(1))
      }
    Bitmap.foldVersions(unpack(parts), unpack(tombs))
  }
}

/** Word-wise AND of two serialized bitmaps (chunks present on one
  * side only drop out). */
case class BitmapAndExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.binary(left.dataType, "graft_bitmap_and"),
      KernelChecks.binary(right.dataType, "graft_bitmap_and"))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any =
    BitmapKernel.and(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.BitmapKernel.and($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndExpr =
    copy(left = l, right = r)
}

/** Word-wise OR of two serialized bitmaps (union of chunks). */
case class BitmapOrExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.binary(left.dataType, "graft_bitmap_or"),
      KernelChecks.binary(right.dataType, "graft_bitmap_or"))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any =
    BitmapKernel.or(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.BitmapKernel.or($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapOrExpr =
    copy(left = l, right = r)
}

/** Word-wise AND-NOT (a ∖ b) of two serialized bitmaps — the kernel
  * negation retrieval uses to subtract a value's bitmap from its
  * shard's existence bitmap. */
case class BitmapAndNotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.binary(left.dataType, "graft_bitmap_andnot"),
      KernelChecks.binary(right.dataType, "graft_bitmap_andnot"))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any =
    BitmapKernel.andNot(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.BitmapKernel.andNot($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndNotExpr =
    copy(left = l, right = r)
}

/** Set rowids of a serialized bitmap, as array<long> (chunk-map
  * iteration order — callers explode and never rely on order). */
case class BitmapIdsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.binary(child.dataType, "graft_bitmap_ids")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BitmapKernel.ids(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BitmapKernel.ids($c)")
  override protected def withNewChildInternal(c: Expression): BitmapIdsExpr = copy(child = c)
}

/** Popcount of a serialized bitmap. */
case class BitmapCardExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.binary(child.dataType, "graft_bitmap_card")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(BitmapKernel.cardinality(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BitmapKernel.cardinality($c)")
  override protected def withNewChildInternal(c: Expression): BitmapCardExpr = copy(child = c)
}

/** Version-aware fold of part bitmaps minus later tombstones
  * (compact_index / segmented-read path): parts and tombs are
  * array<struct<ver:int, bm:binary>>; each part drops ids tombstoned
  * at a LATER version, survivors OR together. Runs at (value × shard)
  * granularity like the other bitmap kernels. */
case class BitmapFoldExpr(left: Expression, right: Expression) extends BinaryExpression {
  private def versionedBitmaps(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == IntegerType &&
          s(1).dataType == BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<struct<int,binary>>, got ${other.sql}")
  }
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(versionedBitmaps(left.dataType, "graft_bitmap_fold"),
      versionedBitmaps(right.dataType, "graft_bitmap_fold"))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any =
    BitmapKernel.fold(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.BitmapKernel.fold($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapFoldExpr =
    copy(left = l, right = r)
}

object BitmapExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def and(a: Column, b: Column): Column =
    column(BitmapAndExpr(expression(a), expression(b)))
  def or(a: Column, b: Column): Column =
    column(BitmapOrExpr(expression(a), expression(b)))
  def andNot(a: Column, b: Column): Column =
    column(BitmapAndNotExpr(expression(a), expression(b)))
  def ids(c: Column): Column = column(BitmapIdsExpr(expression(c)))
  def cardinality(c: Column): Column = column(BitmapCardExpr(expression(c)))
  def fold(parts: Column, tombs: Column): Column =
    column(BitmapFoldExpr(expression(parts), expression(tombs)))
}
