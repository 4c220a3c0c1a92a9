package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotLong, LangId, Md5Pair, QualityScore, RollingHash, SimHash64, SimHashMd5, TextProfile, WordShingles}

/** Registers the engine's native SQL functions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard extension-jar path), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * After either, `SELECT rolling_hash(text), simhash_md5(text),
  * md5_pair(s), dot_long(a, b), word_shingles(text, 3) ...` works
  * from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def fn(name: String, arity: Int)(f: Seq[Expression] => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity,
          s"$name takes exactly $arity argument(s), got ${exprs.length}")
        f(exprs)
      })

  private val injected = Seq(
    fn("rolling_hash", 1)(e => RollingHash(e.head)),
    fn("simhash64", 1)(e => SimHash64(e.head)),
    fn("simhash_md5", 1)(e => SimHashMd5(e.head)),
    fn("md5_pair", 1)(e => Md5Pair(e.head)),
    fn("dot_long", 2)(e => DotLong(e(0), e(1))),
    fn("text_profile", 1)(e => TextProfile(e.head)),
    // the Gopher-gate kernel: one byte walk -> the 8 repetition/
    // length counters Curation.gopherGate thresholds
    fn("repetition_profile", 1)(e =>
      graft.functions.RepetitionProfile(e.head)),
    fn("lang_id", 1)(e => LangId(e.head)),
    fn("quality_score", 1)(e => QualityScore(e.head)),
    // native whitespace tokenizers (byte-walk twins of
    // split(btrim(c), '\\s+') and its filtered/counted forms)
    fn("ws_tokens", 1)(e => graft.functions.WsTokens(e.head)),
    fn("ws_tokens_nonempty", 1)(e => graft.functions.WsTokensNonEmpty(e.head)),
    fn("ws_token_count", 1)(e => graft.functions.WsTokenCount(e.head)),
    // n must be an integer literal: the shingle width is a plan-time
    // constant baked into the generated code
    fn("word_shingles", 2)(e =>
      WordShingles(e.head, intLit("word_shingles", "n", e(1)))),
    // winnowing fingerprints: k (shingle width) and w (window) are
    // plan-time integer literals, like word_shingles' n
    fn("winnow_fps", 3)(e =>
      graft.functions.WinnowFps(e.head,
        intLit("winnow_fps", "k", e(1)),
        intLit("winnow_fps", "w", e(2)))),
    // bounded per-group top-k aggregates (k: INT literal — the heap
    // size is a plan-time constant); the analyzer wraps the returned
    // AggregateFunction when used in SQL aggregation position. The
    // input casts mirror the Scala wrappers — the aggregates' eval
    // assumes DOUBLE/LONG/STRING, and an uncast INT score would be a
    // mid-job executor ClassCastException instead of an analysis-time
    // cast
    fn("top_k", 3) { e =>
      graft.functions.TopKByScore(
        org.apache.spark.sql.catalyst.expressions.Cast(e(0),
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(e(1),
          org.apache.spark.sql.types.LongType),
        intLit("top_k", "k", e(2)))
    },
    fn("top_k_tag", 3) { e =>
      graft.functions.TopKByScoreTag(
        org.apache.spark.sql.catalyst.expressions.Cast(e(0),
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(e(1),
          org.apache.spark.sql.types.StringType),
        intLit("top_k_tag", "k", e(2)))
    })

  private def intLit(fname: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fname: $arg must be an INT literal, got $other")
  }

  /** Registers the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
