package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.features.WindowOps._

/** Panel analytics (SURVEY §2.4 G1/G8-G12, §2.3 J3/J5, §2.6 O-series).
  *
  * All are single-pass `groupBy.agg` / pivot shapes: partial (map-side)
  * aggregation + one shuffle on the group key; the per-key outputs are
  * tiny relative to the input, so these are the natural 100 TB reducers.
  */
object Analytics {

  /** G1: the reference's per-symbol feature vector
    * (`market_analysis.py:250-273`) re-expressed as ONE groupBy over a
    * windowed-feature frame (the reference loops symbols in Python).
    * Expects columns: ret, mom24, mom168, vratio (pre-computed with the
    * shared window spec) plus `volume`/`close` raw columns. */
  def symbolFeatures(df: DataFrame, keyCols: Seq[String], labelCol: String,
                     closeCol: String, volumeCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      (stddev_samp(col("ret")) * sqrt(lit(252.0))).as("volatility"),
      (avg(col("ret")) * lit(252.0)).as("annual_return"),
      skewness(col("ret")).as("ret_skew"),
      kurtosis(col("ret")).as("ret_kurt"),
      avg(col("vratio")).as("volume_trend"),
      stddev_samp(col("vratio")).as("volume_volatility"),
      countDistinct(col(labelCol)).as("n_labels"),
      avg(col("mom24")).as("momentum_1d"),
      avg(col("mom168")).as("momentum_1w"),
      avg(abs(col("ret"))).as("price_range"),
      corr(col(volumeCol), col(closeCol)).as("volume_price_corr"),
      count(lit(1)).as("n_rows"))

  /** G12: z-score with POPULATION std (ddof=0) — sklearn StandardScaler
    * semantics (`market_analysis.py:287-293`), not Spark ML's sample std. */
  def zscore(c: Column, w: WindowSpec): Column =
    (c - avg(c).over(w)) / stddev_pop(c).over(w)

  /** G11: mean imputation (`features.fillna(features.mean())`,
    * market_analysis.py:285) — one agg + broadcast fill, no window. */
  def imputeMean(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stats = df.agg(avg(col(cols.head)).as(s"__m_${cols.head}"),
      cols.tail.map(c => avg(col(c)).as(s"__m_$c")): _*)
    val joined = df.crossJoin(broadcast(stats))
    cols.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__m_$c"))))
      .drop(cols.map(c => s"__m_$c"): _*)
  }

  /** J5: all unordered key pairs with a pairwise Pearson correlation of
    * `valCol` over rows aligned on `alignCol` (inner alignment = pandas
    * pairwise-complete). Input: long frame (alignCol, keyCol, valCol).
    * A θ-self-join on key order keeps each pair once. */
  def pairwiseCorr(long: DataFrame, alignCol: String, keyCol: String,
                   valCol: String): DataFrame = {
    val a = long.select(col(alignCol).as("__al"), col(keyCol).as("key_a"),
      col(valCol).as("__va"))
    val b = long.select(col(alignCol).as("__al"), col(keyCol).as("key_b"),
      col(valCol).as("__vb"))
    a.join(b, Seq("__al"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(corr(col("__va"), col("__vb")).as("corr"), count(lit(1)).as("n"))
  }
}
