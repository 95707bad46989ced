package graft.regimes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.features.WindowOps._

/** Market-regime classifiers (SURVEY §2 P5, G7, G13, J4).
  *
  * Two tiers, both ported semantics-exactly:
  *  - coarse (3-class) from `/root/reference/src/utils.py:4-33`:
  *    per-asset percentile thresholds → bull/bear/consolidation codes;
  *  - short-term (5-class) from
  *    `src/clustering/regime_detection/short_term.py:32-80`:
  *    fixed thresholds over windowed features.
  *
  * Null semantics mirror pandas: a NaN feature fails every comparison, so
  * rows in warm-up windows fall through to the default class — Spark
  * `when` treats a null condition as false, which matches exactly.
  */
object Regimes {

  final case class ShortTermThresholds(
      volatility: Double = 0.02,
      ret: Double = 0.01,
      volume: Double = 1.5,
      trend: Double = 0.6)

  /** Short-term feature frame (`short_term.py:32-48`): appends
    * hourly_returns, daily_returns, volatility, volume_ma, volume_ratio,
    * trend_direction, trend_strength, momentum. Window = 24 rows,
    * pandas-strict min_periods. */
  def shortTermFeatures(df: DataFrame, closeCol: String, volumeCol: String,
                        w: WindowSpec, window: Int = 24): DataFrame = {
    val close = col(closeCol)
    df.withColumn("hourly_returns", pctChange(close, 1, w))
      .withColumn("daily_returns", pctChange(close, window, w))
      .withColumn("volatility",
        rollStdStrict(col("hourly_returns"), window, w) * sqrt(lit(window.toDouble)))
      .withColumn("volume_ma", rollMeanStrict(col(volumeCol), window, w))
      .withColumn("volume_ratio", col(volumeCol) / nullif(col("volume_ma"), lit(0.0)))
      .withColumn("trend_direction", signum(col("daily_returns")))
      .withColumn("trend_strength",
        abs(rollMeanStrict(col("trend_direction"), window, w)))
      .withColumn("momentum", pctChange(close, window, w))
  }

  /** 5-class classifier (`short_term.py:54-71`) over the feature frame.
    * `highVol` is null-coalesced to false: pandas `NaN > x` is False and
    * the classifier NEGATES it (`~high_vol`), where Spark's null would
    * otherwise poison the conjunction. */
  def shortTermRegime(t: ShortTermThresholds = ShortTermThresholds()): Column = {
    val bull = col("daily_returns") > t.ret && col("trend_strength") > t.trend
    val bear = col("daily_returns") < -t.ret && col("trend_strength") > t.trend
    val highVol = coalesce(col("volatility") > t.volatility, lit(false))
    when(bull && !highVol, "stable_bull")
      .when(bull && highVol, "volatile_bull")
      .when(bear && !highVol, "stable_bear")
      .when(bear && highVol, "volatile_bear")
      .otherwise("consolidation")
  }

  /** G13: detector confidence metrics per partition key
    * (`short_term.py:73-78`). */
  def confidence(features: DataFrame, keyCols: Seq[String]): DataFrame =
    features.groupBy(keyCols.map(col): _*).agg(
      avg(col("trend_strength")).as("trend_confidence"),
      (lit(1.0) - stddev_samp(col("volatility"))
          / nullif(avg(col("volatility")), lit(0.0)))
        .as("volatility_stability"),
      avg(when(col("volume_ratio") > 1, 1.0).otherwise(0.0)).as("volume_support"))

  /** Coarse 3-class regime (`utils.py:4-33`): per-key percentile
    * thresholds (volatility 80th, |momentum| 90th) computed with one
    * groupBy-agg and broadcast-joined back (SURVEY J4 — the one real
    * equi-join of the port; threshold side is one row per key, so the
    * fact table never shuffles). Codes: 0 bull, 1 bear, 2 consolidation;
    * bear overwrites bull on overlap (reference applies bear mask last). */
  def coarseRegime(df: DataFrame, keyCols: Seq[String], closeCol: String,
                   w: WindowSpec, volWindow: Int = 24, momWindow: Int = 24,
                   volPct: Double = 0.80, momPct: Double = 0.90): DataFrame = {
    val withFeat = df
      .withColumn("__ret", pctChange(col(closeCol), 1, w))
      .withColumn("__vol", rollStdStrict(col("__ret"), volWindow, w))
      .withColumn("__mom", pctChange(col(closeCol), momWindow, w))
    val thresholds = withFeat.groupBy(keyCols.map(col): _*).agg(
      percentile(col("__vol"), lit(volPct)).as("__vol_thr"),
      percentile(abs(col("__mom")), lit(momPct)).as("__mom_thr"))
    val joined = withFeat.join(broadcast(thresholds), keyCols)
    val isVolatile = col("__vol") >= col("__vol_thr")
    val bull = (col("__mom") > col("__mom_thr")) || (col("__mom") > 0 && isVolatile)
    val bear = (col("__mom") < -col("__mom_thr")) || (col("__mom") < 0 && isVolatile)
    joined.withColumn("regime_code",
      when(bear, 1).when(bull, 0).otherwise(2))
      .drop("__ret", "__vol", "__mom", "__vol_thr", "__mom_thr")
  }
}
