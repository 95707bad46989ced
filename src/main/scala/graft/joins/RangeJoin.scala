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
}
