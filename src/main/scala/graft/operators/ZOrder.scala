package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional data
  * skipping — the lakehouse `OPTIMIZE ZORDER BY (x, y)` shape. A single
  * `sortBy(x)` write gives file/row-group min-max pruning on x only; a
  * y-predicate touches every file. Interleaving the bits of
  * range-bucketed x and y and range-partitioning on the interleaved
  * value gives BOTH columns locality, so footer-stats pruning skips
  * most files for predicates on either dimension (measured in
  * ZOrderSpec: a 5% y-range touches every x-sorted file but ≤ half the
  * z-ordered ones).
  *
  * Everything is Column algebra (codegen'd bit ops) + one tiny stats
  * aggregate, one range repartition, and a per-partition sort — no
  * driver loop, no skew-prone global window. Bucketing is min/max
  * linear; heavily skewed columns should pre-transform (log, rank) —
  * documented trade-off of the linear curve.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns
    * (x in the even positions, y in the odd): the Morton index. */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Map `c` into [0, 2^bits) by linear min-max scaling against the
    * provided bounds (inclusive); constant columns land in bucket 0. */
  def bucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val n = 1L << bits
    val span = hi.cast("double") - lo.cast("double")
    when(span <= 0.0, lit(0L)).otherwise(
      least(floor((c.cast("double") - lo.cast("double")) / span * n)
        .cast("long"), lit(n - 1)))
  }

  /** Z-value column for (xCol, yCol) with bounds taken from one
    * broadcast stats row (the J4 scalar-join idiom — one aggregate over
    * the frame, never a collect). */
  def zValue(df: DataFrame, xCol: String, yCol: String,
             bits: Int = 8): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).as("__xlo"), max(col(xCol)).as("__xhi"),
      min(col(yCol)).as("__ylo"), max(col(yCol)).as("__yhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleave(
        bucket(col(xCol), col("__xlo"), col("__xhi"), bits),
        bucket(col(yCol), col("__ylo"), col("__yhi"), bits), bits))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Write `df` as `numFiles` parquet files laid out along the Z-curve
    * of (xCol, yCol): range-partition on the z-value (sampled range
    * boundaries — balanced files), sort within each partition, drop the
    * helper column. Footer min/max stats of BOTH columns then carry the
    * curve's locality. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int, bits: Int = 8): Unit =
    zValue(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Files a min/max-pruning reader must touch for `pred` — computed
    * from the data per file (equivalent to parquet footer stats at
    * file granularity). Test/diagnostic helper. */
  def filesTouched(df: DataFrame, valueCol: String,
                   lo: Double, hi: Double): Long = {
    df.withColumn("__f", input_file_name())
      .groupBy(col("__f"))
      .agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
      .filter(col("mx") >= lo && col("mn") <= hi)
      .count()
  }
}
