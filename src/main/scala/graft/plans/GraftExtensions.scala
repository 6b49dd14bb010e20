package graft.plans

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration: the graft surface as SQL
  * functions, so the engine is usable from pure SQL the way the
  * reference is usable from Calcite SQL (reference exposes its whole
  * surface through the JDBC/SQL front; HBaseSchemaFactory.kt wires the
  * adapter into the planner the way this class wires into Catalyst).
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
    ext.injectPlannerStrategy(_ => GraftStrategies)
    ext.injectOptimizerRule(_ => RankFilterToTopK)
  }
}

object GraftExtensions {

  /** Register the same functions on an already-running session (the
    * withExtensions path only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      GraftColumnBridge.registerFunction(spark, name, builder)
    }

  private def intArg(e: Expression, what: String): Int = e match {
    // positive: a negative/zero size parameter would surface mid-query
    // as NegativeArraySizeException (sigLen), a per-row StringBuilder
    // crash (bits) or a silent [""] shingle set (n) — fail at analysis
    case Literal(v: Int, _) if v > 0 => v
    case Literal(v: Int, _) =>
      throw new IllegalArgumentException(s"$what must be positive, got $v")
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val builders: Seq[(String, String, Seq[Expression] => Expression)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Seq[Expression] => Expression)]
    // wrong arity must read as a usage error, not a raw MatchError
    def inject(name: String, usage: String)(
        builder: PartialFunction[Seq[Expression], Expression]): Unit =
      out += ((name, usage, (args: Seq[Expression]) =>
        builder.applyOrElse(args, (a: Seq[Expression]) =>
          throw new IllegalArgumentException(
            s"$name: wrong number of arguments (${a.size}); usage: $usage"))))

    inject("graft_minhash_sig", "graft_minhash_sig(shingles[, sigLen]) - MinHash signature") {
      case Seq(c) => MinHashSigExpr(c, 64)
      case Seq(c, n) => MinHashSigExpr(c, intArg(n, "sigLen"))
    }
    inject("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a token array") {
      case Seq(c) => SimHash64Expr(c)
    }
    inject("graft_lsh_bucket", "graft_lsh_bucket(vec[, bits]) - hyperplane LSH bucket") {
      case Seq(c) => LshBucketExpr(c, 16)
      case Seq(c, b) => LshBucketExpr(c, intArg(b, "bits"))
    }
    inject("graft_char_bigrams", "graft_char_bigrams(str) - lowercased char bigrams") {
      case Seq(c) => CharBigramsExpr(c)
    }
    inject("graft_word_shingles", "graft_word_shingles(str, n) - distinct word n-gram shingles") {
      case Seq(c, n) => WordShinglesExpr(c, intArg(n, "n"))
    }
    inject("graft_word_ngrams", "graft_word_ngrams(str, n) - word n-gram multiset (non-distinct)") {
      case Seq(c, n) => WordNgramsExpr(c, intArg(n, "n"))
    }
    inject("graft_tokens", "graft_tokens(str) - lowercase alnum-run tokens") {
      case Seq(c) => TokensExpr(c)
    }
    inject("graft_stem", "graft_stem(term) - minimal English suffix stemmer") {
      case Seq(c) => StemExpr(c)
    }
    inject("graft_bpe_tokens", "graft_bpe_tokens(str) - BPE subword tokens (in-repo merges table)") {
      case Seq(c) => BpeTokensExpr(c)
    }
    inject("graft_bpe_count", "graft_bpe_count(str) - BPE subword token count") {
      case Seq(c) => BpeCountExpr(c)
    }
    inject("graft_cosine", "graft_cosine(vecA, vecB) - cosine similarity") {
      case Seq(a, b) => CosineSimExpr(a, b)
    }
    inject("graft_quantize_i8", "graft_quantize_i8(vec) - symmetric int8 quantization codes") {
      case Seq(c) => QuantizeI8Expr(c)
    }
    inject("graft_dot_int", "graft_dot_int(codesA, codesB) - exact BIGINT integer dot product") {
      case Seq(a, b) => DotIntExpr(a, b)
    }

    // Column-composed functions (quality/langId/fingerprint) stay
    // Column-API only: a function builder must return a
    // self-contained catalyst tree, and expressions lifted from
    // public functions._ Columns carry unresolved ColumnNode wrappers.
    // (The native expressions above ARE self-contained, so they
    // register directly.)
    out.toSeq
  }
}
