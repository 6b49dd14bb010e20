package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
  * Every expression implements `doGenCode` as a static call into
  * [[HashOps]] (the same kernel `nullSafeEval` uses), so plans using
  * them stay inside WholeStageCodegen — no interpreted-dispatch
  * fallback rows, no codegen-span break in the hot path.
  */

/** Analysis-time input checks: these expressions are registered as
  * SQL functions, so a mistyped argument must fail analysis with a
  * clear message — the kernels read ArrayData storage directly, and a
  * silently reinterpreted element type would produce garbage. */
private[plans] object KernelChecks {
  import TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
  def stringArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn expects array<string>, got ${other.sql}")
  }
  def floatVec(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn expects array<float|double>, got ${other.sql}")
  }
  def intVec(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(IntegerType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn expects array<int>, got ${other.sql}")
  }
  def text(dt: DataType, fn: String): TypeCheckResult = dt match {
    case StringType => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn expects string, got ${other.sql}")
  }
  def binary(dt: DataType, fn: String): TypeCheckResult = dt match {
    case BinaryType => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn expects binary, got ${other.sql}")
  }
  def both(a: TypeCheckResult, b: => TypeCheckResult): TypeCheckResult =
    if (a == TypeCheckSuccess) b else a
}

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
case class MinHashSigExpr(child: Expression, sigLen: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.stringArray(child.dataType, "graft_minhash_sig")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.minhashSig(input.asInstanceOf[ArrayData], sigLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.minhashSig($c, $sigLen)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

/** 64-bit SimHash over an array<string> of tokens: bit b of the result
  * is set iff Σ_tokens (±1 by bit b of XXH64(token, 0)) ≥ 0. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.stringArray(child.dataType, "graft_simhash64")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.simhash64(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
}

/** Hyperplane-LSH bucket over array<float|double>: `bits` sign bits of
  * dot(v, plane_j) with plane_j[d] = sin(j·131 + d·7), emitted as a
  * "0"/"1" string (a null element reads as 0.0; the empty vector has
  * dot 0 on every plane → all-'1'). Near-identical directions collide
  * on all bits, so near-dup candidate generation is a hash shuffle,
  * never O(n²). Plane values are memoized per (bits, dims) inside
  * HashOps. The sole implementation of these semantics — the composed
  * HOF form it replaced diverged on null/empty vectors and is gone. */
case class LshBucketExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.floatVec(child.dataType, "graft_lsh_bucket")
  override def dataType: DataType = StringType
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    HashOps.lshBucket(input.asInstanceOf[ArrayData], bits, elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.lshBucket($c, $bits, $elemIsFloat)")
  override protected def withNewChildInternal(c: Expression): LshBucketExpr = copy(child = c)
}

/** Character bigrams of the lowercased input in one tight loop — the
  * HOF form (transform + substr per index) evaluated ~25M interpreted
  * lambdas at sf0.1. Matches TextFunctions.charBigrams semantics:
  * bigrams of code-unit positions 1..len-1, lowercased. */
case class CharBigramsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_char_bigrams")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.charBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.charBigrams($c)")
  override protected def withNewChildInternal(c: Expression): CharBigramsExpr = copy(child = c)
}

/** Lowercase [a-z0-9]-run tokens in one pass — identical output to
  * filter(split(lower(text), "[^a-z0-9]+"), len>0) for ASCII text,
  * which the DuckDB oracle replicates. Feeds every text-analysis
  * query, so it runs native instead of split+filter+lambda. */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_tokens")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.tokens($c)")
  override protected def withNewChildInternal(c: Expression): TokensExpr = copy(child = c)
}

/** Minimal English suffix-stemmer for one term (HashOps.stemWord) —
  * the `english` analyzer applies it to every index term at build
  * time and to every query term at search time. Native so the
  * build-time full-corpus pass stays in codegen. */
case class StemExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_stem")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashOps.stem(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.stem($c)")
  override protected def withNewChildInternal(c: Expression): StemExpr = copy(child = c)
}

/** BPE subword tokens of the text — lowercase-alnum word tokens each
  * run through the greedy merge loop over a BPE merges table
  * (BpeOps/BpeVocab; Sennrich et al. 2015). Native kernel: the
  * per-word merge loop would be thousands of interpreted lambda
  * evaluations per row as a HOF pipeline.
  *
  * `vocab=None` (the common case) encodes with the deterministic
  * seed-trained default via a STATIC call — every JVM derives the
  * same table, so codegen carries nothing. An explicit vocabulary (a
  * loaded published merges file) rides the expression node as a
  * Catalyst reference object instead — the PQ-codebook pattern:
  * serialized once with the plan, never shuffled. */
case class BpeTokensExpr(child: Expression,
                         vocab: Option[BpeVocab] = None) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_bpe_tokens")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    vocab.getOrElse(BpeOps.default).bpeTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    vocab match {
      case None =>
        defineCodeGen(ctx, ev, c => s"graft.plans.BpeOps.bpeTokens($c)")
      case Some(v) =>
        val ref = ctx.addReferenceObj("bpeVocab", v, classOf[BpeVocab].getName)
        defineCodeGen(ctx, ev, c => s"$ref.bpeTokens($c)")
    }
  override protected def withNewChildInternal(c: Expression): BpeTokensExpr = copy(child = c)
}

/** BPE subword token COUNT — the budget column trainers denominate
  * in. Shares encodeWord (and its word cache) with BpeTokensExpr but
  * never materializes the subword strings. Vocabulary handling as in
  * [[BpeTokensExpr]]. */
case class BpeCountExpr(child: Expression,
                        vocab: Option[BpeVocab] = None) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_bpe_count")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    vocab.getOrElse(BpeOps.default).bpeCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    vocab match {
      case None =>
        defineCodeGen(ctx, ev, c => s"graft.plans.BpeOps.bpeCount($c)")
      case Some(v) =>
        val ref = ctx.addReferenceObj("bpeVocab", v, classOf[BpeVocab].getName)
        defineCodeGen(ctx, ev, c => s"$ref.bpeCount($c)")
    }
  override protected def withNewChildInternal(c: Expression): BpeCountExpr = copy(child = c)
}

/** Distinct word n-gram shingles in one pass: lowercase, tokenize on
  * non-[a-z0-9] runs, emit space-joined n-token windows (or one
  * shingle of all tokens if fewer than n), first-occurrence order.
  * Matches TextFunctions.wordShingles / the DuckDB oracle exactly for
  * ASCII text. The HOF form ran ~5M interpreted slice+join lambdas at
  * sf0.1. */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_word_shingles")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
}

/** Word n-gram multiset (ordered, NON-distinct; empty when the text
  * has fewer than n tokens) — repetition/quality statistics need
  * counts per n-gram, which the distinct shingle set can't supply. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.text(child.dataType, "graft_word_ngrams")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.wordNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.wordNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr = copy(child = c)
}

/** Cosine similarity over two array<float|double> vectors, one tight
  * loop in doubles (sequential accumulation — bit-identical to the
  * zip_with/aggregate form it replaces for vectors WITHOUT null
  * elements, the expected data contract; a null element is read as
  * 0.0 here where the HOF form would propagate NULL). The composed
  * form evaluated interpreted lambdas per element: ~64M per 1M pairs
  * at sf0.1. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.floatVec(left.dataType, "graft_cosine"),
      KernelChecks.floatVec(right.dataType, "graft_cosine"))
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(HashOps.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], isFloat(left), isFloat(right)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.plans.HashOps.cosine($l, $r, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** Negated squared L2 over array<float|double> vectors — the IVF
  * coarse-probe metric, native for the same reason as CosineSimExpr:
  * corpus-to-centroid assignment evaluates it n·k times and the HOF
  * form ran interpreted lambdas per element (null elements read as
  * 0.0 here where the HOF form would propagate NULL). */
case class NegL2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.floatVec(left.dataType, "graft_neg_l2"),
      KernelChecks.floatVec(right.dataType, "graft_neg_l2"))
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(HashOps.negL2(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], isFloat(left), isFloat(right)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.plans.HashOps.negL2($l, $r, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NegL2Expr =
    copy(left = l, right = r)
}

/** Membership probe against a pre-built Bloom sketch — the runtime-
  * filter device for "is this key in the (broadcast-too-big) set?"
  * at 100 TB: the sketch is built once with a distributed aggregation
  * (`DataFrameStatFunctions.bloomFilter`, Spark's own
  * org.apache.spark.util.sketch), then rides this expression node as a
  * codegen reference object — shipped once per executor with the
  * serialized plan, never shuffled, never collected per row. A probe
  * is k bit-tests with NO hash-map build on the scan side, so the
  * filter prunes the corpus BEFORE any exchange. False positives
  * (rate = the sketch's fpp) mean a caller needing exactness must
  * re-verify survivors against the exact set — which is now tiny
  * relative to the corpus — and false negatives never occur. */
case class BloomContainsExpr(child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects bigint, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomContainsExpr =
    copy(child = c)
}

/** Symmetric int8 quantization of an array<float|double> vector:
  * q_i = round_half_away(x_i · 127 / max|x|) — codes array<int>.
  * Bit-identical across engines (IEEE correctly-rounded double steps,
  * rounding mode matches Spark round() and DuckDB ROUND()). */
case class QuantizeI8Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.floatVec(child.dataType, "graft_quantize_i8")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    HashOps.quantizeI8(input.asInstanceOf[ArrayData], elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashOps.quantizeI8($c, $elemIsFloat)")
  override protected def withNewChildInternal(c: Expression): QuantizeI8Expr = copy(child = c)
}

/** Exact BIGINT dot product of two array<int> vectors — the scoring
  * kernel for int8-quantized similarity search (integer math, so
  * scores are bit-identical across engines with no float rounding). */
case class DotIntExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelChecks.both(KernelChecks.intVec(left.dataType, "graft_dot_int"),
      KernelChecks.intVec(right.dataType, "graft_dot_int"))
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(HashOps.dotInt(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.HashOps.dotInt($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotIntExpr =
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
  def negL2(a: Column, b: Column): Column =
    column(NegL2Expr(expression(a), expression(b)))
  def dotInt(a: Column, b: Column): Column =
    column(DotIntExpr(expression(a), expression(b)))
  def quantizeI8(c: Column): Column = column(QuantizeI8Expr(expression(c)))
  def bloomContains(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    column(BloomContainsExpr(expression(c), bloom))
  def wordShingles(c: Column, n: Int): Column = column(WordShinglesExpr(expression(c), n))
  def wordNgrams(c: Column, n: Int): Column = column(WordNgramsExpr(expression(c), n))
  def tokens(c: Column): Column = column(TokensExpr(expression(c)))
  def stem(c: Column): Column = column(StemExpr(expression(c)))
  def bpeTokens(c: Column): Column = column(BpeTokensExpr(expression(c)))
  def bpeCount(c: Column): Column = column(BpeCountExpr(expression(c)))
  /** Same kernels over an explicitly loaded vocabulary (a published
    * merges file) instead of the seed-trained default. */
  def bpeTokens(c: Column, vocab: BpeVocab): Column =
    column(BpeTokensExpr(expression(c), Some(vocab)))
  def bpeCount(c: Column, vocab: BpeVocab): Column =
    column(BpeCountExpr(expression(c), Some(vocab)))
}
