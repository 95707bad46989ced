package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — `row_number() OVER (ORDER BY …)`
  * without the single-partition window that formulation plans (the one
  * shape in Spark that funnels the whole input through one task).
  *
  * Construction: range-partition on the sort key (so partition i holds
  * keys strictly below partition i+1), sort within partitions, count
  * each partition ONCE (tiny driver action on the persisted frame),
  * broadcast the cumulative offsets as a literal map, and add the
  * per-partition-local row_number — a window partitioned by
  * `spark_partition_id()`, which requires NO further shuffle because
  * the data is already partitioned and sorted. Total distributed cost:
  * one range shuffle, same as any global sort — but no single-task
  * bottleneck and no 2nd pass over the data.
  *
  * The rank VALUES are a pure function of the total order (sortCols
  * must be a total order — tie-break explicitly), independent of where
  * the sampled range boundaries land.
  *
  * This is the scale path for global ntile/quantile assignment (f9/f10
  * document the user-dim-sized global window as acceptable at their
  * cardinality; this operator removes the caveat when the dimension
  * itself is huge): `ntile(k) == ceil(k * rank / n)` under the same
  * total order, exactly.
  */
object GlobalRank {

  /** @param sortCols total order (tie-break explicitly!)
    * @param out      name of the appended 1-based rank column
    * @return (frame with `out`, total row count) — the frame is
    *         persisted and tracked in [[graft.io.PersistRegistry]]
    *         (the count action and the downstream consumer would
    *         otherwise both pay the range shuffle). */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
                    numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = graft.io.PersistRegistry.trackPersist(
      df.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = parted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val o = acc; acc += n; pid -> o }.toMap
    }
    val offCol = element_at(
      typedLit(offsets), col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val ranked = parted
      .withColumn(out, (row_number().over(w).cast("long") + offCol).as(out))
      .drop("__pid")
    (ranked, total)
  }

  /** Global ntile(k) by the same construction, with EXACT SQL ntile
    * semantics: the first n mod k buckets take ceil(n/k) rows, the
    * rest floor(n/k) — bit-identical to `ntile(k) OVER (ORDER BY …)`
    * under the same total order (GlobalRankSpec proves equality on
    * unbalanced counts), so callers can swap the single-partition
    * window for this without changing a single output value. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
                out: String): DataFrame = {
    val (ranked, n) = withRowNumber(df, sortCols, "__grank")
    val small = n / k
    val rem = n % k
    val big = small + 1
    val cut = rem * big // rows 1..cut live in the first `rem` big buckets
    val r = col("__grank")
    // floor(x / d) on doubles is exact here: ranks < 2^53
    val bucket =
      if (small == 0) r.cast("int") // n < k: bucket i = row i, 1 row each
      else when(r <= cut, floor((r - 1) / lit(big)).cast("int") + 1)
        .otherwise(lit(rem.toInt) +
          floor((r - cut - 1) / lit(small)).cast("int") + 1)
    ranked.withColumn(out, bucket).drop("__grank")
  }
}
