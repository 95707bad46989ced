package graft.regimes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization + transition statistics
  * (SURVEY §2.5 W12-W13, §2.4 G5).
  *
  * Reference semantics (`src/clustering/regime_detection/short_term.py:82-111`):
  * a Python row-at-a-time scan over ordered labels that emits one row per
  * label change, with `from` = the closing island's label, `to` = the new
  * label, `start_time` = the closing island's first row, `end_time` = the
  * change row, duration in hours — and the final open island is never
  * emitted. Re-expressed as the classic two-window rewrite so it is one
  * shuffle on the partition key followed by per-partition sorts —
  * shuffle-free between the change-flag, island-number, and lead stages
  * (Catalyst collapses the identically-specced windows into one sort).
  * Scales linearly: no driver loop, no state beyond the window frame.
  */
object Transitions {

  /** Collapse consecutive equal labels into islands.
    *
    * Output: partition cols + `island` (1-based ordinal), `label`,
    * `start_ord` / `end_ord` (min/max of `ord` within the island), `n_rows`.
    */
  def islands(df: DataFrame, partCols: Seq[String], ordCol: String,
              tiebreakCol: String, labelCol: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(ordCol), col(tiebreakCol))
    val lagLabel = lag(col(labelCol), 1).over(w)
    val changed = when(lagLabel.isNull || col(labelCol) =!= lagLabel, 1).otherwise(0)
    df.withColumn("__chg", changed)
      .withColumn("island", sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((partCols :+ "island").map(col) :+ col(labelCol).as("label"): _*)
      .agg(min(col(ordCol)).as("start_ord"), max(col(ordCol)).as("end_ord"),
           count(lit(1)).as("n_rows"))
  }

  /** One row per label change: from/to labels, island start ords, duration.
    *
    * `durationExpr(start, nextStart)` maps the ordinal delta to the caller's
    * duration unit (e.g. µs → hours). Matches the reference's open-final-
    * island semantics: the last island of each partition emits nothing.
    */
  def transitions(df: DataFrame, partCols: Seq[String], ordCol: String,
                  tiebreakCol: String, labelCol: String,
                  durationExpr: (Column, Column) => Column): DataFrame = {
    val isl = islands(df, partCols, ordCol, tiebreakCol, labelCol)
    val wi = Window.partitionBy(partCols.map(col): _*).orderBy(col("island"))
    isl
      .withColumn("to_label", lead(col("label"), 1).over(wi))
      .withColumn("end_time", lead(col("start_ord"), 1).over(wi))
      .filter(col("to_label").isNotNull)
      .select((partCols.map(col) ++ Seq(
        col("label").as("from_label"), col("to_label"),
        col("start_ord").as("start_time"), col("end_time"),
        durationExpr(col("start_ord"), col("end_time")).as("duration"))): _*)
  }

  /** W13: transition flags (`short_term.py:107-111`):
    * volatility-increase = target regime contains "volatile";
    * trend-change = bull↔bear cross in either direction. */
  def withFlags(trans: DataFrame): DataFrame =
    trans
      .withColumn("is_volatility_increase", col("to_label").contains("volatile"))
      .withColumn("is_trend_change",
        (col("from_label").contains("bull") && col("to_label").contains("bear")) ||
        (col("from_label").contains("bear") && col("to_label").contains("bull")))

  /** G5: empirical transition matrix P(to | from) =
    * count(from,to) / count(from) (`short_term.py:114-120`).
    * Window-sum over the tiny (from,to) aggregate — no extra shuffle of
    * the big table. */
  def transitionProbabilities(trans: DataFrame, fromCol: String, toCol: String): DataFrame = {
    val counts = trans.groupBy(col(fromCol), col(toCol)).agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col(fromCol))
    counts.withColumn("n_from", sum(col("n")).over(wFrom))
      .withColumn("prob", col("n").cast("double") / col("n_from"))
  }
}
