package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate quantiles from an equi-width histogram sketch — the
  * one-pass-aggregate answer to "p99 of a column over 100 TB".
  *
  * Exact `percentile` materializes and sorts every value per group;
  * at fact-table scale that sort IS the job. The histogram sketch is
  * two ordinary aggregates: a (min, max, n) scalar pass, then a
  * bucket-count pass whose combine state is ≤ nBins cells per
  * partition (the CMS/HLL bounded-state argument, for quantiles).
  * The quantile is then read off the ≤ nBins cumulative histogram
  * with linear interpolation inside the straddling bucket:
  *
  *   est(q) = vmin + width · (bucket + (q·n − cumBefore) / cnt)
  *
  * Error is bounded by ONE BUCKET WIDTH (= (max−min)/nBins) in value
  * space — a deterministic bound, unlike sampled sketches
  * (HistQuantileSpec pins it against exact percentiles). Determinism:
  * bucket assignment and interpolation are identical IEEE expressions
  * on exact integer counts in both engines, so the estimate itself
  * hash-checks (the Hll/CountMin portability contract; Spark's
  * `approx_percentile` is rows-only checkable for the same reason
  * HLL++ is). Degenerate input (vmax == vmin) is the caller's guard.
  */
object HistQuantile {

  /** The bucket assignment used by every path (and by the oracle):
    * least(floor((v − vmin)/width), nBins − 1). */
  def bucketOf(v: Column, vmin: Column, vmax: Column, nBins: Int): Column =
    least(floor((v - vmin) / ((vmax - vmin) / lit(nBins))),
      lit((nBins - 1).toLong))

  /** The cumulative walk + interpolation over an ALREADY-BUILT
    * histogram `(bucket, cnt)` and 1-row `(vmin, vmax, n)` stats frame
    * — shared by the batch path and the streaming sketch (st18), which
    * builds the same histogram incrementally. Sketch-sized input only.
    */
  def fromHistogram(cnts: DataFrame, stats: DataFrame, nBins: Int,
                    qs: Seq[Double]): DataFrame = {
    // the cumsum window sees ≤ nBins rows; enforce the sketch-size
    // bound explicitly (r18 VERDICT item 6)
    require(nBins <= 65536,
      s"nBins $nBins: histogram cumsum window is single-partition")
    val spark = cnts.sparkSession
    import spark.implicits._
    // the cumulative walk runs over the ≤ nBins-row histogram, never
    // the data — the single-partition window is sketch-sized
    val cum = cnts
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"bucket")))
      .crossJoin(broadcast(stats))
    cum.crossJoin(broadcast(qs.toDF("q")))
      .filter($"cum" >= $"q" * $"n" && ($"cum" - $"cnt") < $"q" * $"n")
      .select($"q",
        round($"vmin" + (($"vmax" - $"vmin") / lit(nBins))
          * ($"bucket" + ($"q" * $"n" - ($"cum" - $"cnt")) / $"cnt")
          + lit(1e-9), 6).as("est"))
  }

  /** (q, est) rows, one per requested quantile, qs ∈ (0, 1). */
  def quantiles(df: DataFrame, valueCol: String, nBins: Int,
                qs: Seq[Double]): DataFrame = {
    require(nBins >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q < 1))
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol)
    val stats = df.agg(min(v).as("vmin"), max(v).as("vmax"),
      count(lit(1)).as("n"))
    val cnts = df.crossJoin(broadcast(stats))
      .select(bucketOf(v, $"vmin", $"vmax", nBins).as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
    fromHistogram(cnts, stats, nBins, qs)
  }

  /** Per-group quantiles: (group, q, est) — the per-key p99 shape
    * (latency by endpoint, price by segment). Group stats are a
    * group-dimension aggregate broadcast back to the scan; bucket
    * counts carry ≤ groups·nBins combine state; the cumulative walk
    * and interpolation run on the sketch-sized histogram frame. */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       nBins: Int, qs: Seq[Double]): DataFrame = {
    require(nBins >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q < 1))
    val spark = df.sparkSession
    import spark.implicits._
    val g = col(groupCol)
    val v = col(valueCol)
    val stats = df.groupBy(g).agg(min(v).as("vmin"), max(v).as("vmax"),
      count(lit(1)).as("n"))
    val cnts = df.join(broadcast(stats), Seq(groupCol))
      .select(g, least(floor((v - $"vmin") / (($"vmax" - $"vmin") / lit(nBins))),
        lit((nBins - 1).toLong)).as("bucket"))
      .groupBy(g, $"bucket").agg(count(lit(1)).as("cnt"))
    val cum = cnts
      .withColumn("cum", sum($"cnt").over(
        Window.partitionBy(g).orderBy($"bucket")))
      .join(broadcast(stats), Seq(groupCol))
    cum.crossJoin(broadcast(qs.toDF("q")))
      .filter($"cum" >= $"q" * $"n" && ($"cum" - $"cnt") < $"q" * $"n")
      .select(g, $"q",
        round($"vmin" + (($"vmax" - $"vmin") / lit(nBins))
          * ($"bucket" + ($"q" * $"n" - ($"cum" - $"cnt")) / $"cnt")
          + lit(1e-9), 6).as("est"))
  }

  /** DuckDB SQL replaying [[groupedQuantiles]]; the group output
    * column is named `groupAlias`. */
  def groupedOracleSql(from: String, groupExpr: String, groupAlias: String,
                       valueExpr: String, nBins: Int,
                       qs: Seq[Double]): String = {
    val qRows = qs.map(q => s"SELECT CAST($q AS DOUBLE) AS q")
      .mkString(" UNION ALL ")
    s"""WITH src AS (SELECT $groupExpr AS g, $valueExpr AS v FROM $from),
       |s AS (SELECT g, min(v) AS vmin, max(v) AS vmax, count(*) AS n
       |      FROM src GROUP BY 1),
       |b AS (SELECT src.g,
       |        least(floor((v - vmin) / ((vmax - vmin) / $nBins)),
       |          $nBins - 1) AS bucket
       |      FROM src JOIN s USING (g)),
       |c AS (SELECT g, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
       |cum AS (SELECT g, bucket, cnt,
       |          sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum
       |        FROM c),
       |qv AS ($qRows)
       |SELECT cum.g AS $groupAlias, qv.q,
       |  round(s.vmin + ((s.vmax - s.vmin) / $nBins)
       |    * (cum.bucket + (qv.q * s.n - (cum.cum - cum.cnt)) / cum.cnt)
       |    + 1e-9, 6) AS est
       |FROM qv, cum JOIN s USING (g)
       |WHERE cum.cum >= qv.q * s.n
       |  AND (cum.cum - cum.cnt) < qv.q * s.n""".stripMargin
  }

  /** DuckDB SQL replaying the identical sketch + interpolation over
    * `SELECT <valueExpr> AS v FROM <from>`. */
  def oracleSql(from: String, valueExpr: String, nBins: Int,
                qs: Seq[Double]): String = {
    val qRows = qs.map(q => s"SELECT CAST($q AS DOUBLE) AS q")
      .mkString(" UNION ALL ")
    s"""WITH src AS (SELECT $valueExpr AS v FROM $from),
       |s AS (SELECT min(v) AS vmin, max(v) AS vmax, count(*) AS n FROM src),
       |b AS (SELECT least(floor((v - vmin) / ((vmax - vmin) / $nBins)),
       |        $nBins - 1) AS bucket
       |      FROM src, s),
       |c AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
       |cum AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum
       |        FROM c),
       |qv AS ($qRows)
       |SELECT qv.q,
       |  round(s.vmin + ((s.vmax - s.vmin) / $nBins)
       |    * (cum.bucket + (qv.q * s.n - (cum.cum - cum.cnt)) / cum.cnt)
       |    + 1e-9, 6) AS est
       |FROM qv, cum, s
       |WHERE cum.cum >= qv.q * s.n
       |  AND (cum.cum - cum.cnt) < qv.q * s.n""".stripMargin
  }
}
