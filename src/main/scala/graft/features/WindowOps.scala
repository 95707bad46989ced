package graft.features

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-level time-series window operators (SURVEY §2.5 W1-W8, W17, P6).
  *
  * Each is a pure `Column` builder over a caller-supplied `WindowSpec`
  * (canonically `Window.partitionBy(key).orderBy(ts, tiebreak)`): keeping
  * one window spec per plan lets Catalyst collapse all of them into a
  * single sort+window physical stage (one shuffle on the partition key,
  * one sort within partitions — SURVEY §4.2).
  *
  * Reference semantics ported from /root/reference:
  * `pct_change` `src/utils.py:20-22`, rolling mean/std
  * `src/clustering/regime_detection/short_term.py:37-46`, ffill/bfill
  * `src/models/lstm_forecasting.py:108`, clip `lstm_forecasting.py:70-104`.
  */
object WindowOps {

  /** W1/W2: pandas `pct_change(k)` — k-row return; null for first k rows.
    * Zero-denominator → null (nullif): matches DuckDB's `/` and avoids the
    * ANSI DIVIDE_BY_ZERO abort (pandas would give ±inf; inf has no parquet/
    * oracle-stable representation, and a zero price is sentinel data). */
  def pctChange(c: Column, k: Int, w: WindowSpec): Column =
    c / nullif(lag(c, k).over(w), lit(0.0)) - lit(1.0)

  /** W3: pandas `diff(1)`. */
  def diff(c: Column, w: WindowSpec): Column = c - lag(c, 1).over(w)

  /** W4: trailing k-row mean, pandas `rolling(k, min_periods=1).mean()`.
    * Spark window frames are natively min_periods=1. */
  def rollMean(c: Column, k: Int, w: WindowSpec): Column =
    avg(c).over(w.rowsBetween(-(k - 1), 0))

  /** W4 strict: pandas `rolling(k).mean()` (min_periods=k): null unless the
    * frame holds k non-null observations — positional row_number is NOT
    * equivalent when the input itself has leading nulls (e.g. a rolling
    * std of returns whose first row is null). */
  def rollMeanStrict(c: Column, k: Int, w: WindowSpec): Column =
    when(count(c).over(w.rowsBetween(-(k - 1), 0)) >= k, rollMean(c, k, w))

  /** W5: trailing k-row sample stddev (ddof=1 — matches pandas default). */
  def rollStd(c: Column, k: Int, w: WindowSpec): Column =
    stddev_samp(c).over(w.rowsBetween(-(k - 1), 0))

  def rollStdStrict(c: Column, k: Int, w: WindowSpec): Column =
    when(count(c).over(w.rowsBetween(-(k - 1), 0)) >= k, rollStd(c, k, w))

  /** Trailing k-row sum. */
  def rollSum(c: Column, k: Int, w: WindowSpec): Column =
    sum(c).over(w.rowsBetween(-(k - 1), 0))

  def rollMin(c: Column, k: Int, w: WindowSpec): Column =
    min(c).over(w.rowsBetween(-(k - 1), 0))

  def rollMax(c: Column, k: Int, w: WindowSpec): Column =
    max(c).over(w.rowsBetween(-(k - 1), 0))

  /** W7: ratio of current value to its trailing-k mean (volume_ratio,
    * `short_term.py:42-43`); null-safe on a zero moving average. */
  def ratioToRollMean(c: Column, k: Int, w: WindowSpec): Column =
    c / nullif(rollMean(c, k, w), lit(0.0))

  /** W8: trend strength = |trailing-k mean of sign(return)|. */
  def trendStrength(ret: Column, k: Int, w: WindowSpec): Column =
    abs(rollMean(signum(ret), k, w))

  /** W17: forward fill (pandas `ffill`). */
  def ffill(c: Column, w: WindowSpec): Column =
    last(c, ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, 0))

  /** W17: backward fill (pandas `bfill`). */
  def bfill(c: Column, w: WindowSpec): Column =
    first(c, ignoreNulls = true).over(w.rowsBetween(0, Window.unboundedFollowing))

  /** P6: pandas/numpy `clip(lo, hi)`. */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** Running (unbounded-preceding) sum — island numbering, cumulative totals. */
  def runningSum(c: Column, w: WindowSpec): Column =
    sum(c).over(w.rowsBetween(Window.unboundedPreceding, 0))
}
