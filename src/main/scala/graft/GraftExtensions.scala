package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{RollingHash, SimHash64}

/** Registers the engine's native SQL functions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard extension-jar path), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * After either, `SELECT rolling_hash(text), simhash64(text) ...`
  * works from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def unary(name: String, f: Expression => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$name takes exactly one argument")
        f(exprs.head)
      })

  private val injected = Seq(
    unary("rolling_hash", RollingHash(_)),
    unary("simhash64", SimHash64(_)))

  /** Registers the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
