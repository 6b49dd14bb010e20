package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the signature hot paths.
  *
  * The composed higher-order-function forms (transform/aggregate
  * lambdas) are evaluated interpreted per element — at sf0.1 the
  * MinHash signature alone (~5M shingles × 64 seeded hashes) made
  * dd_minhash_lsh take ~9 minutes. These expressions do the same
  * work in a tight JVM loop over the already-decoded array, the
  * (b) tier of the preference order: compose built-ins < custom
  * Expression < custom operator (SURVEY.md §3).
  *
  * CodegenFallback is fine here: the expensive part is the inner
  * hash loop (native code either way), not expression dispatch.
  */

/** MinHash signature over array<string>, output array<long> of length
  * sigLen. Empty input → all Long.MaxValue (no shingles ⇒ never
  * collides).
  *
  * The sigLen "permutations" are affine universal hashes of ONE base
  * XXH64 of the shingle bytes: π_j(s) = a_j·XXH64(s) + b_j (a_j odd,
  * mod 2^64) — the standard multiply-shift minhash family. Hashing the
  * string bytes once and deriving the family with two ALU ops per slot
  * is ~sigLen× less byte-scanning than re-seeding XXH64 per slot, which
  * dominated this expression's profile. */
case class MinHashSigExpr(child: Expression, sigLen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val (affA, affB) = {
    // fixed-seed SplittableRandom: the family is deterministic across
    // executors/runs, like the seeded-XXH64 family it replaces
    val ra = new java.util.SplittableRandom(0x9E3779B97F4A7C15L)
    val rb = new java.util.SplittableRandom(0x2545F4914F6CDD1DL)
    (Array.fill(sigLen)(ra.nextLong() | 1L), Array.fill(sigLen)(rb.nextLong()))
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val a = affA; val b = affB
    val sig = Array.fill(sigLen)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
      var j = 0
      while (j < sigLen) {
        val v = a(j) * h + b(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

/** 64-bit SimHash over an array<string> of tokens: bit b of the result
  * is set iff Σ_tokens (±1 by bit b of XXH64(token, 0)) ≥ 0. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
}

/** Hyperplane-LSH bucket over array<float|double>: `bits` sign bits of
  * dot(v, plane_j) with plane_j[d] = sin(j·131 + d·7), packed into a
  * "0"/"1" string (matches VectorFunctions.lshBucket). Plane values
  * are memoized per (bits, dims). */
case class LshBucketExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def planes(dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dims, d =>
      Array.tabulate(bits, d)((j, dd) => math.sin(j * 131.0 + dd * 7.0)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val ps = planes(n)
    val sb = new java.lang.StringBuilder(bits)
    var j = 0
    while (j < bits) {
      val p = ps(j)
      var acc = 0.0
      d = 0
      while (d < n) { acc += v(d) * p(d); d += 1 }
      sb.append(if (acc >= 0.0) '1' else '0')
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): LshBucketExpr = copy(child = c)
}

/** Character bigrams of the lowercased input in one tight loop — the
  * HOF form (transform + substr per index) evaluated ~25M interpreted
  * lambdas at sf0.1. Matches TextFunctions.charBigrams semantics:
  * bigrams of code-unit positions 1..len-1, lowercased. */
case class CharBigramsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val n = s.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.fromString(s.substring(i, i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CharBigramsExpr = copy(child = c)
}

/** Lowercase [a-z0-9]-run tokens in one pass — identical output to
  * filter(split(lower(text), "[^a-z0-9]+"), len>0) for ASCII text,
  * which the DuckDB oracle replicates. Feeds every text-analysis
  * query, so it runs native instead of split+filter+lambda. */
case class TokensExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += UTF8String.fromString(s.substring(start, i))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): TokensExpr = copy(child = c)
}

/** Distinct word n-gram shingles in one pass: lowercase, tokenize on
  * non-[a-z0-9] runs, emit space-joined n-token windows (or one
  * shingle of all tokens if fewer than n), first-occurrence order.
  * Matches TextFunctions.wordShingles / the DuckDB oracle exactly for
  * ASCII text. The HOF form ran ~5M interpreted slice+join lambdas at
  * sf0.1. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        toks += s.substring(start, i)
      } else i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length <= n) {
      if (toks.nonEmpty) out.add(toks.mkString(" "))
    } else {
      var w = 0
      while (w <= toks.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(w + j)); j += 1
        }
        out.add(sb.toString); w += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
}

/** Cosine similarity over two array<float|double> vectors, one tight
  * loop in doubles (sequential accumulation — bit-identical to the
  * zip_with/aggregate form it replaces, which evaluated interpreted
  * lambdas per element: ~64M per 1M pairs at sf0.1). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val fa = isFloat(left); val fb = isFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

object HashExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def minhashSig(c: Column, sigLen: Int = 64): Column =
    column(MinHashSigExpr(expression(c), sigLen))
  def simhash64(c: Column): Column = column(SimHash64Expr(expression(c)))
  def lshBucket(c: Column, bits: Int = 16): Column =
    column(LshBucketExpr(expression(c), bits))
  def charBigrams(c: Column): Column = column(CharBigramsExpr(expression(c)))
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
  def wordShingles(c: Column, n: Int): Column = column(WordShinglesExpr(expression(c), n))
  def tokens(c: Column): Column = column(TokensExpr(expression(c)))
}
