package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row of
  * the same key with `rightOrd <= leftOrd` (SURVEY §2.3 notes the
  * reference lacks it; it is the canonical time-series join an engine in
  * this domain must offer).
  *
  * Implementation is the union + ordered-window rewrite, NOT a per-row
  * subquery or range cross-join: tag both sides, union, and
  * forward-fill the right-side payload over one window
  * `partitionBy(key).orderBy(ord, side)` (right rows sort before left
  * rows at equal ord → inclusive match). Cost at any scale = one
  * shuffle on the key + one per-partition sort — identical to every
  * other W-operator — versus the quadratic blowup of a naive
  * range-join formulation.
  */
object AsOfJoin {

  /** @param rightVals right columns to carry to matched left rows
    *                   (each surfaced as `asof_<name>`, plus
    *                   `asof_ord` = the matched right ordinal). */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftOrd: String, rightOrd: String,
               rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__ord", col(leftOrd)).withColumn("__side", lit(1))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightOrd).as("__ord"), lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ord"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightVals.foldLeft(
      unioned.withColumn("asof_ord",
        last(when(col("__side") === 0, col("__ord")), ignoreNulls = true).over(w))
    )((d, c) => d.withColumn(s"asof_$c",
        last(col(s"__rv_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1)
      .drop("__ord" +: "__side" +: rightVals.map(c => s"__rv_$c"): _*)
  }
}
