package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import WindowOps._

/** EP3 feature engineering: the reference's 16-feature LSTM input frame
  * (`lstm_forecasting.py:55-115` `prepare_features`) as ONE composed
  * lazy plan — returns/log-returns, rolling volatility+trend at 5 and
  * 24 rows (min_periods=1), price range, the three volume features
  * (with the reference's zero-MA → per-key-global-mean substitution),
  * RSI, per-key max-normalized MACD triple, Bollinger position/width,
  * each with the reference's clip bounds, then ffill → bfill →
  * fillna(0).
  *
  * All of it is window algebra over the canonical per-key spec plus the
  * MACD EWM recursion — one shuffle on the key for the windows, one for
  * the EWM repartition. Clips are NULL-SAFE: both Spark's and SQL
  * engines' least/greatest skip nulls (clip(null) would yield the
  * bound), while pandas clip keeps NaN — nulls must survive to the
  * ffill/bfill/fillna(0) scrub exactly as the reference's NaNs do.
  */
object FeatureEngineering {

  /** pandas `clip(lo, hi)` with NaN passthrough. */
  def nullSafeClip(c: Column, lo: Double, hi: Double): Column =
    when(c.isNull, lit(null)).otherwise(least(greatest(c, lit(lo)), lit(hi)))

  val featureNames: Seq[String] = Seq(
    "returns", "log_returns", "volatility_5h", "volatility_24h",
    "trend_5h", "trend_24h", "price_range",
    "volume_intensity", "volume_change", "volume_volatility",
    "rsi", "macd", "macd_signal", "macd_hist", "bb_position", "bb_width")

  def prepare(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
              closeCol: String, highCol: String, lowCol: String,
              volumeCol: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    val wAll = Window.partitionBy(partCols.map(col): _*)
    val close = col(closeCol)
    val volume = col(volumeCol)

    // fused single-pass MACD + per-key normalization (one exchange;
    // withMacd + normalization windows would cost three)
    val withMacdRaw = Ewm.ewmMacdNormalized(df, partCols, ordCols, closeCol)

    val base = withMacdRaw
      .withColumn("returns", pctChange(close, 1, w))
      .withColumn("log_returns",
        log(close) - lag(log(close), 1).over(w))
      .withColumn("volatility_5h", rollStd(col("returns"), 5, w))
      .withColumn("volatility_24h", rollStd(col("returns"), 24, w))
      .withColumn("trend_5h", rollMean(col("returns"), 5, w))
      .withColumn("trend_24h", rollMean(col("returns"), 24, w))
      .withColumn("price_range", nullSafeClip(
        (col(highCol) - col(lowCol)) / nullif(close, lit(0.0)), -10, 10))
      .withColumn("__vma0", rollMean(volume, 24, w))
      .withColumn("__vma",
        when(col("__vma0") === 0, avg(volume).over(wAll)).otherwise(col("__vma0")))
      .withColumn("volume_intensity",
        nullSafeClip(volume / nullif(col("__vma"), lit(0.0)), 0, 10))
      .withColumn("volume_change", nullSafeClip(pctChange(volume, 1, w), -10, 10))
      .withColumn("volume_volatility",
        nullSafeClip(rollStd(volume, 24, w) / nullif(col("__vma"), lit(0.0)), 0, 10))
      .withColumn("rsi", nullSafeClip(Indicators.rsi(close, 14, w), 0, 100))
      .withColumn("bb_position",
        nullSafeClip(Indicators.bollingerPosition(close, 20, 2.0, w), 0, 1))
      .withColumn("bb_width",
        nullSafeClip(Indicators.bollingerWidth(close, 20, w), 0, 5))

    // the MACD triple arrives pre-normalized from the fused pass; only
    // the reference's clip remains
    val normed = Seq("macd", "macd_signal", "macd_hist").foldLeft(base) { (d, c) =>
      d.withColumn(c, nullSafeClip(col(c), -1, 1))
    }

    // ffill().bfill().fillna(0) per feature column. ffill-then-bfill
    // equals coalesce(ffill, bfill): ffill leaves only LEADING nulls,
    // and bfill of the original fills exactly those with the first
    // following non-null — one window pass per column instead of two.
    featureNames.foldLeft(normed) { (d, c) =>
      d.withColumn(c, coalesce(ffill(col(c), w), bfill(col(c), w), lit(0.0)))
    }.drop("__vma0", "__vma")
  }
}
