package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.features.EwmAgg

/** Catalyst extension registration (SURVEY §4.2 / guide pattern):
  * surfaces the engine's custom expressions to SQL.
  *
  * Two entry points for the same builder:
  *  - config-time: `spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`);
  *  - runtime: `GraftExtensions.register(spark)` on a live session.
  *
  * After either, `SELECT ewm(x, 12) OVER (PARTITION BY k ORDER BY t
  * ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)` runs the native
  * EwmAgg aggregate.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.ewmFunction)
}

object GraftExtensions {

  private def buildEwm(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "ewm(value, span) takes exactly 2 arguments")
    val span = exprs(1) match {
      case Literal(v, _) => v.toString.toDouble
      case other => throw new IllegalArgumentException(
        s"ewm span must be a literal, got $other")
    }
    EwmAgg(exprs.head, 2.0 / (span + 1.0))
  }

  val ewmFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ewm"),
      new ExpressionInfo(classOf[EwmAgg].getName, "ewm"),
      buildEwm _)

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ewm", buildEwm, "built-in")
}
