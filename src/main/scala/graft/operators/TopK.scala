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

  def perKey(df: DataFrame, keyCols: Seq[String], sortAsc: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val key = struct(sortAsc: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(TopKAgg.topK(key, payload, k).as("__topk"))
      .select(posexplode(col("__topk")).as(Seq("__pos", "__kv")))
      .select((col("__pos") + 1).as(rankCol), col("__kv.value.*"))
  }
}
