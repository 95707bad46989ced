package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import WindowOps._

/** Technical indicators (SURVEY §2.5 W10-W11 + the MACD composition of W9),
  * built purely from codegen'd `functions._` — no UDFs in the hot path.
  *
  * Reference semantics: RSI `src/models/lstm_forecasting.py:130-148`,
  * Bollinger `lstm_forecasting.py:166-184`, MACD `lstm_forecasting.py:151-164`.
  */
object Indicators {

  /** W10: RSI(n). delta = diff(1); gains/losses split with NaN→0 (pandas
    * `.where` on a NaN condition yields the fill value); trailing-n mean
    * with min_periods=1; zero-loss → null RS → RSI filled to 50. */
  def rsi(c: Column, n: Int, w: WindowSpec): Column = {
    val delta = diff(c, w)
    val gain = when(delta > 0, delta).otherwise(lit(0.0))
    val loss = when(delta < 0, -delta).otherwise(lit(0.0))
    val avgGain = rollMean(gain, n, w)
    val avgLoss = rollMean(loss, n, w)
    val rs = avgGain / nullif(avgLoss, lit(0.0))
    coalesce(lit(100.0) - lit(100.0) / (lit(1.0) + rs), lit(50.0))
  }

  /** W11: Bollinger %B position; reference parity (lstm_forecasting.py:
    * 168-184): rolling(n, min_periods=1) ma/std, then fillna(0.5) — row 1
    * (1-obs std = null) and zero-width bands both land on 0.5, and rows
    * 2..n-1 carry real partial-window values (not nulls). */
  def bollingerPosition(c: Column, n: Int, nStd: Double, w: WindowSpec): Column = {
    val ma = rollMean(c, n, w)
    val sd = rollStd(c, n, w)
    val lower = ma - lit(nStd) * sd
    val width = lit(2.0 * nStd) * sd
    coalesce((c - lower) / nullif(width, lit(0.0)), lit(0.5))
  }

  /** W11: Bollinger band width σ/μ with the reference's fillna(0):
    * min_periods=1 rolling stats, null (row 1 / zero mean) → 0. */
  def bollingerWidth(c: Column, n: Int, w: WindowSpec): Column = {
    val ma = rollMean(c, n, w)
    val sd = rollStd(c, n, w)
    coalesce(sd / nullif(ma, lit(0.0)), lit(0.0))
  }

  /** MACD line + signal + histogram via the Ewm operator: appends
    * `macd`, `macd_signal`, `macd_hist` columns.
    * fast/slow/signal default to the reference's 12/26/9 spans. */
  def withMacd(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
               valueCol: String, fast: Double = 12, slow: Double = 26,
               signal: Double = 9): DataFrame = {
    val withEma = Ewm.ewmMean(df, partCols, ordCols,
      Seq((valueCol, fast, "__ema_fast"), (valueCol, slow, "__ema_slow")))
    val withLine = withEma.withColumn("macd", col("__ema_fast") - col("__ema_slow"))
    Ewm.ewmMean(withLine, partCols, ordCols, Seq(("macd", signal, "macd_signal")))
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
      .drop("__ema_fast", "__ema_slow")
  }
}
