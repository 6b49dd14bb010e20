package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (see [[graft.similarity.Pq]]).
  *
  * A PQ codebook is m sub-quantizers × k centroids × dsub dims,
  * flattened row-major: `cb[((s*k)+c)*dsub + j]`. The three kernels —
  * encode (argmin-L2 per subspace), query LUT (per-subspace dots
  * against every centroid), and ADC scoring (m table lookups) — run as
  * tight loops over the decoded arrays, with the codebook attached to
  * the expression node and shipped to codegen as a reference object.
  * Same static-forwarder pattern as [[HashOps]]: one kernel serves both
  * `nullSafeEval` and the generated code.
  */
object PqOps {

  private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** A short vector read past numElements() on unsafe array storage is
    * SILENT GARBAGE, not an exception — and an over-long vector would
    * silently encode on a prefix. A ragged corpus (any row whose
    * dimension differs from the codebook's) must fail loudly, never
    * encode to junk. */
  private def checkDims(v: ArrayData, m: Int, dsub: Int): Unit =
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"PQ vector has ${v.numElements()} dims, codebook needs exactly ${m * dsub}")

  /** PQ codes: for each of the m subspaces, the index of the L2-nearest
    * centroid (ties → lowest index). Output array<int> of length m. */
  def codes(v: ArrayData, cb: Array[Float], m: Int, k: Int, dsub: Int,
            isFloat: Boolean): ArrayData = {
    checkDims(v, m, dsub)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = ((s * k) + c) * dsub
        var dist = 0.0; var j = 0
        while (j < dsub) {
          val diff = elem(v, s * dsub + j, isFloat) - cb(base + j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Query lookup table: dot(q_sub, centroid) for every (subspace,
    * centroid) pair — array<double> of length m·k, laid out to match
    * the codebook (`lut[s*k + c]`). Computed ONCE per query row; ADC
    * scoring then costs m lookups per corpus row instead of a d-dim
    * dot product. */
  def lut(v: ArrayData, cb: Array[Float], m: Int, k: Int, dsub: Int,
          isFloat: Boolean): ArrayData = {
    checkDims(v, m, dsub)
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = ((s * k) + c) * dsub
        var dot = 0.0; var j = 0
        while (j < dsub) {
          dot += elem(v, s * dsub + j, isFloat) * cb(base + j)
          j += 1
        }
        out(s * k + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Squared-L2 query table: lut[s·k + c] = ‖q_sub − centroid‖² —
    * the ADC table for L2 ranking (residual IVF-PQ): since
    * q − x = (q − c_list) − (x − c_list) exactly, scoring residual
    * codes against the residual query (q − c_list) reconstructs
    * ‖q − x‖² up to within-cell quantization error. Layout matches
    * [[lut]]. */
  def lutL2(v: ArrayData, cb: Array[Float], m: Int, k: Int, dsub: Int,
            isFloat: Boolean): ArrayData = {
    checkDims(v, m, dsub)
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = ((s * k) + c) * dsub
        var acc = 0.0; var j = 0
        while (j < dsub) {
          val diff = elem(v, s * dsub + j, isFloat) - cb(base + j)
          acc += diff * diff
          j += 1
        }
        out(s * k + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_s lut[s·k + codes[s]] ≈ dot(q, x). */
  def adc(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * k)
      throw new IllegalArgumentException(
        s"PQ lut has ${lut.numElements()} entries, codes need exactly ${m * k}")
    var acc = 0.0; var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      // a code outside [0, k) would read ANOTHER subspace's LUT slot —
      // silent garbage from a codebook/codes mismatch, so fail loudly
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"PQ code $c at subspace $s outside [0, $k)")
      acc += lut.getDouble(s * k + c)
      s += 1
    }
    acc
  }
}

/** Encode a float vector into its m PQ codes. */
case class PqCodesExpr(child: Expression, cb: Array[Float],
                       m: Int, k: Int, dsub: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.floatVec(child.dataType, "graft_pq_codes")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    PqOps.codes(input.asInstanceOf[ArrayData], cb, m, k, dsub, elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqOps.codes($c, $ref, $m, $k, $dsub, $elemIsFloat)")
  }
  override protected def withNewChildInternal(c: Expression): PqCodesExpr = copy(child = c)
}

/** Per-query ADC lookup table over the codebook: dot products
  * (`l2 = false`) or squared L2 distances (`l2 = true`). */
case class PqLutExpr(child: Expression, cb: Array[Float],
                     m: Int, k: Int, dsub: Int,
                     l2: Boolean = false) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.floatVec(child.dataType, "graft_pq_lut")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    if (l2) PqOps.lutL2(input.asInstanceOf[ArrayData], cb, m, k, dsub, elemIsFloat)
    else PqOps.lut(input.asInstanceOf[ArrayData], cb, m, k, dsub, elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    val fn = if (l2) "lutL2" else "lut"
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqOps.$fn($c, $ref, $m, $k, $dsub, $elemIsFloat)")
  }
  override protected def withNewChildInternal(c: Expression): PqLutExpr = copy(child = c)
}

/** ADC score of a codes row against a query LUT. */
case class PqAdcExpr(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.intVec(left.dataType, "graft_pq_adc"),
      right.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc expects array<double> lut, got ${other.sql}")
      })
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(PqOps.adc(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.PqOps.adc($l, $r, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
}

object PqExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def pqCodes(c: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    column(PqCodesExpr(expression(c), cb, m, k, dsub))
  def pqLut(c: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    column(PqLutExpr(expression(c), cb, m, k, dsub))
  def pqLutL2(c: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    column(PqLutExpr(expression(c), cb, m, k, dsub, l2 = true))
  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    column(PqAdcExpr(expression(codes), expression(lut), k))
}
