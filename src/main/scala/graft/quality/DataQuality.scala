package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality profiling: evaluate a batch of named
  * column metrics in ONE Aggregate per table (a single scan computes
  * every completeness / distinctness / bounds check — the metric-
  * batching trick that makes continuous data validation affordable at
  * 100 TB), plus referential-integrity counts as key-shuffled anti
  * joins. Output is long-format `(metric, value)` so a validation
  * suite of any width stays one tiny frame.
  */
object DataQuality {

  /** Evaluate `metrics` (name → aggregate Column) over one scan of
    * `df`; returns long-format (metric string, value double). */
  def profile(df: DataFrame, metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "no metrics")
    val aggs = metrics.zipWithIndex.map { case ((_, c), i) => c.as(s"__m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = metrics.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("metric"), col(s"__m$i").cast("double").as("value"))
    }
    one.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  /** Referential-integrity violation count: child rows whose
    * `childKey` has no match in `parent.parentKey`. A left-anti join
    * keyed on the FK — both sides shuffle on the key at scale (the
    * dimension is broadcast when small enough; Catalyst picks), and
    * only the violation COUNT leaves the executors. */
  def orphanCount(metricName: String, child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit(metricName).as("metric"), col("value"))
}
