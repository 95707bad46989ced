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
    *                   `asof_ord` = the matched right ordinal).
    *
    * The whole right payload is forward-filled as ONE struct
    * (ord + every value column) with a single `last(ignoreNulls)`:
    * `asof_ord` and every `asof_<c>` are guaranteed to come from the
    * SAME right row even when some value columns are null in the
    * matched row (per-column fills would silently mix rows). The
    * window additionally orders by the struct itself, so among right
    * rows tied on (key, ord) the winner is deterministic (max payload)
    * instead of partition-layout-dependent. */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftOrd: String, rightOrd: String,
               rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__ord", col(leftOrd)).withColumn("__side", lit(1))
    val payload = struct(
      col(rightOrd).as("__o") +: rightVals.map(c => col(c).as(c)): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightOrd).as("__ord"), lit(0).as("__side"),
        payload.as("__rrow")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ord"), col("__side"), col("__rrow"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(w))
    rightVals.foldLeft(
      filled.filter(col("__side") === 1)
        .withColumn("asof_ord", col("__m.__o"))
    )((d, c) => d.withColumn(s"asof_$c", col(s"__m.$c")))
      .drop("__ord", "__side", "__rrow", "__m")
  }

  /** Forward as-of join — for each left row, the EARLIEST right row of
    * the same key with `rightOrd >= leftOrd`. Implemented as [[backward]]
    * on negated ordinals (the mirror image), so it inherits the same
    * one-shuffle cost and same-row payload guarantees. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftOrd: String, rightOrd: String,
              rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__fwd", negate(col(leftOrd)))
    val r = right.withColumn("__fwd", negate(col(rightOrd)))
    backward(l, r, keyCols, "__fwd", "__fwd", rightVals)
      .withColumn("asof_ord", negate(col("asof_ord")))
      .drop("__fwd")
  }

  /** [[backward]] with a match-window `tolerance` (the pandas
    * `merge_asof(tolerance=...)` semantics, round 11): a left row whose
    * most recent right match is MORE than `tolerance` ordinal units
    * behind keeps its row but gets NULL `asof_*` columns — "a quote
    * older than an hour is no quote". A pure post-projection on
    * [[backward]]'s output: same one-shuffle cost, and the null-out is
    * all-or-nothing per row (the same-row payload guarantee extends to
    * the tolerance gate — never a row with a live value but a nulled
    * ordinal). */
  def backwardWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftOrd: String, rightOrd: String,
                     rightVals: Seq[String], tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance $tolerance must be >= 0")
    val joined = backward(left, right, keyCols, leftOrd, rightOrd, rightVals)
    val ok = col(leftOrd) - col("asof_ord") <= tolerance
    rightVals.foldLeft(
      joined.withColumn("__asof_ok", ok)
    )((d, c) => d.withColumn(s"asof_$c",
        when(col("__asof_ok"), col(s"asof_$c"))))
      .withColumn("asof_ord", when(col("__asof_ok"), col("asof_ord")))
      .drop("__asof_ok")
  }
}
