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

  /** Descending numeric sort key with the window's DESC null ordering
    * (nulls LAST): a bare `negate(c)` would flip nulls to the front
    * (asc-nulls-first), silently promoting null-scored rows into the
    * top-k — rank the null flag first instead. */
  def descNullsLast(c: Column): Column =
    struct(c.isNull.cast("int"), negate(c))

  /** Ascending sort key with nulls LAST (window `asc_nulls_last`). */
  def ascNullsLast(c: Column): Column =
    struct(c.isNull.cast("int"), c)

  def perKey(df: DataFrame, keyCols: Seq[String], sortAsc: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame = {
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
