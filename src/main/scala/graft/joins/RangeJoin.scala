package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join (SURVEY §2.3 completeness — the
  * reference has no joins at all; an interval join is, with as-of, the
  * canonical time-series join an engine in this domain must offer).
  *
  * Naive formulation `points JOIN intervals ON p BETWEEN s AND e` is a
  * cross join with a residual filter — quadratic at scale. The scale
  * path here is BUCKETED: both sides are binned to fixed-width ordinal
  * buckets (an interval explodes to every bucket it covers), the join
  * becomes an equi-join on (keys..., bucket), and the containment
  * predicate is a residual filter on co-bucketed candidates only. Cost:
  * one shuffle per side on the bucket key; candidates are bounded by
  * bucket occupancy, not |points|×|intervals|. Same trick DuckDB/Spark
  * apply internally for IEJoin-style plans; `bucketWidth` should be of
  * the order of the typical interval length so intervals explode to
  * O(1) buckets.
  */
object RangeJoin {

  /** Join each point row to every interval row (same `keyCols`) with
    * `startCol <= ptCol <= endCol`. Interval frame must carry distinct
    * (keyCols, startCol, endCol) rows.
    *
    * @param bucketWidth bucket width in the ordinal's unit */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    val bw = lit(bucketWidth)
    val p = points.withColumn("__bkt", floor(col(ptCol) / bw).cast("long"))
    val i = intervals.withColumn("__bkt",
      explode(sequence(floor(col(startCol) / bw).cast("long"),
        floor(col(endCol) / bw).cast("long"))))
    p.join(i, keyCols :+ "__bkt")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bkt")
  }

  /** Interval-OVERLAP join: pair every left interval with every right
    * interval (same `keyCols`) satisfying `aStart <= bEnd && bStart <=
    * aEnd` (closed-interval overlap). Both sides explode to the fixed-
    * width buckets they span and equi-join on (keys..., bucket); an
    * overlapping pair co-occupies every bucket their intersection
    * spans, so to emit each pair EXACTLY ONCE — with no quadratic
    * dedup/distinct — the residual keeps only the bucket holding the
    * intersection's left edge, `floor(max(aStart, bStart) / width)`.
    * One shuffle per side; candidate volume is bucket occupancy, never
    * |A|×|B|. Left columns are suffixed `_a`, right `_b` when names
    * collide (caller supplies pre-renamed frames for clarity). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String],
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketWidth: Long): DataFrame = {
    val bw = lit(bucketWidth)
    def exploded(df: DataFrame, s: String, e: String) =
      df.withColumn("__bkt",
        explode(sequence(floor(col(s) / bw).cast("long"),
          floor(col(e) / bw).cast("long"))))
    exploded(left, aStart, aEnd)
      .join(exploded(right, bStart, bEnd), keyCols :+ "__bkt")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bkt") ===
        floor(greatest(col(aStart), col(bStart)) / bw).cast("long"))
      .drop("__bkt")
  }
}
