package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key top-k as a DataFrame operator (see [[TopKAgg]] for the
  * shuffle-volume argument vs the `row_number` window idiom).
  *
  * `sortAsc` must be a deterministic TOTAL order per key (ascending;
  * negate numeric columns for descending) — identical to the
  * determinism the window form already demands. The result carries all
  * input columns plus `rankCol` = 1..k in sort order, exactly matching
  * `row_number().over(Window.partitionBy(keyCols).orderBy(sortAsc)) <= k`.
  */
object TopK {

  /** Above this k the heap buffer (k JVM pairs per group, per partial
    * hash-aggregate entry, with no content spilling) stops being a
    * clear win over the spillable window sort — fall back to the
    * window form. Keeps data-dependent k (class-balance downsampling)
    * from turning a bounded heap into an executor-OOM vector. */
  val MaxHeapK: Int = 4096

  /** Descending sort key with the window's `desc` ordering over a
    * FLOATING-POINT column: desc ranks NaN first (NaN is the largest
    * double in Spark's total order) and nulls last. A bare `negate(c)`
    * gets both edges wrong — negate(NaN) is still NaN (sorts last
    * ascending, silently dropping NaN rows from the top-k) and nulls
    * would flip to the front — so rank explicit (isnull, !isnan)
    * flags ahead of the negated value. For integral keys use
    * [[descNullsLastIntegral]] (negate alone overflows on MinValue). */
  def descNullsLast(c: Column): Column =
    struct(c.isNull.cast("int"), (!isnan(c)).cast("int"), negate(c))

  /** Descending sort key for an integral column, nulls last: widens to
    * decimal before negating so Long.MinValue (where -x overflows and
    * ANSI mode throws) still orders correctly. */
  def descNullsLastIntegral(c: Column): Column =
    struct(c.isNull.cast("int"), negate(c.cast("decimal(20,0)")))

  /** Ascending sort key with nulls LAST (window `asc_nulls_last`). */
  def ascNullsLast(c: Column): Column =
    struct(c.isNull.cast("int"), c)

  /** Schema-aware descending nulls-last key: dispatches on the column's
    * actual type so callers don't have to pick between [[descNullsLast]]
    * (floats: NaN flag) and [[descNullsLastIntegral]] (longs: widen
    * before negating — `negate(MinValue)` overflows and throws under
    * ANSI, Spark 4's default). Decimals negate directly (their range is
    * symmetric). */
  def descNullsLastFor(df: DataFrame, colName: String): Column = {
    import org.apache.spark.sql.types._
    val c = col(colName)
    df.schema(colName).dataType match {
      case FloatType | DoubleType => descNullsLast(c)
      case ByteType | ShortType | IntegerType =>
        struct(c.isNull.cast("int"), negate(c.cast("long")))
      case LongType => descNullsLastIntegral(c)
      case _: DecimalType => struct(c.isNull.cast("int"), negate(c))
      case dt => throw new IllegalArgumentException(
        s"descNullsLastFor: no descending encoding for $colName: $dt")
    }
  }

  def perKey(df: DataFrame, keyCols: Seq[String], sortAsc: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame = {
    if (k > MaxHeapK) {
      // window form: the sort spills, the heap buffer would not. The
      // window is evaluated over the FULL df (sortAsc may legitimately
      // reference an existing rankCol, which the heap path also sees);
      // the old rankCol is dropped only in the final projection.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(sortAsc: _*)
      val keep = df.columns.filterNot(_ == rankCol)
      val tmp = "__graft_win_rank"
      df.withColumn(tmp, row_number().over(w))
        .filter(col(tmp) <= k)
        .select((col(tmp).as(rankCol) +: keep.map(col)): _*)
    } else {
      // like withColumn(rankCol, row_number...), an existing rankCol is
      // replaced, not duplicated
      val payload = struct(df.columns.filterNot(_ == rankCol).map(col): _*)
      val key = struct(sortAsc: _*)
      df.groupBy(keyCols.map(col): _*)
        .agg(TopKAgg.topK(key, payload, k).as("__graft_topk"))
        .select(posexplode(col("__graft_topk")).as(Seq("__graft_pos", "__graft_kv")))
        .select((col("__graft_pos") + 1).as(rankCol), col("__graft_kv.value.*"))
    }
  }
}
