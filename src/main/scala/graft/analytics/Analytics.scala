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
    (c - avg(c).over(w)) / nullif(stddev_pop(c).over(w), lit(0.0))

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
    * A θ-self-join on key order keeps each pair once.
    *
    * Row-level variant: joined volume is |align| × |keys|² — right for
    * few keys (the reference's ~5-100 symbols). For high key counts use
    * [[pairwiseCorrDense]]. */
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

  /** [[pairwiseCorr]] at high key cardinality: first collapse each key's
    * series to ONE map row (align → value), then pair-join the collapsed
    * rows — |keys|²/2 pair rows carrying dense arithmetic instead of
    * |align|·|keys|² shuffled rows. Pairwise-complete semantics kept by
    * intersecting the align-key sets per pair. */
  def pairwiseCorrDense(long: DataFrame, alignCol: String, keyCol: String,
                        valCol: String): DataFrame = {
    val packed = long.groupBy(col(keyCol).as("k"))
      .agg(map_from_entries(collect_list(struct(col(alignCol), col(valCol))))
        .as("m"))
    val a = packed.select(col("k").as("key_a"), col("m").as("__ma"))
    val b = packed.select(col("k").as("key_b"), col("m").as("__mb"))
    val paired = a.join(b).filter(col("key_a") < col("key_b"))
      .withColumn("__common", filter(map_keys(col("__ma")),
        x => map_contains_key(col("__mb"), x)))
      .withColumn("__xs", transform(col("__common"), x => element_at(col("__ma"), x)))
      .withColumn("__ys", transform(col("__common"), x => element_at(col("__mb"), x)))
    def s(c: Column): Column = aggregate(c, lit(0.0), (acc, x) => acc + x)
    paired
      .withColumn("n", size(col("__common")))
      .withColumn("__sx", s(col("__xs")))
      .withColumn("__sy", s(col("__ys")))
      .withColumn("__sxx", s(transform(col("__xs"), x => x * x)))
      .withColumn("__syy", s(transform(col("__ys"), y => y * y)))
      .withColumn("__sxy", s(zip_with(col("__xs"), col("__ys"), (x, y) => x * y)))
      .withColumn("corr",
        (col("n") * col("__sxy") - col("__sx") * col("__sy")) /
          nullif(sqrt(col("n") * col("__sxx") - col("__sx") * col("__sx")), lit(0.0)) /
          nullif(sqrt(col("n") * col("__syy") - col("__sy") * col("__sy")), lit(0.0)))
      .select(col("key_a"), col("key_b"), col("corr"), col("n"))
  }
}
