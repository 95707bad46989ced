package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: changelog → SCD2 dimension history,
  * and latest-wins upsert compaction (the MERGE a lakehouse runs at
  * every ingest cycle).
  *
  * Both are single-key-shuffle plans: every window and aggregate is
  * partitioned by the business key, so at 100 TB each operator costs
  * exactly one hash exchange of the changelog (AQE-coalesced), with
  * no driver collection and no cross-key data movement. Versioning
  * semantics (which change wins a timestamp tie) are pinned by an
  * explicit total order `(ordCol, tieCol)` — the same
  * deterministic-tie-break contract the rest of the engine uses for
  * event time (QueryPack notes).
  */
object Cdc {

  /** Changelog → SCD2 (type-2 slowly-changing-dimension) history.
    *
    * Consecutive changes that carry the SAME `attrCol` value collapse
    * into one validity interval (true SCD2 semantics — a no-op update
    * opens no new version); each interval row carries
    * `valid_from` (first ord of the run), `valid_to` (next version's
    * valid_from; null while current), `version` (1-based per key) and
    * `is_current`.
    *
    * Shape: gaps-and-islands (lag ≠ → running sum) then one lead/
    * row_number pass — all windows share the key partitioning. */
  def scd2(changes: DataFrame, keyCols: Seq[String], ordCol: String,
           tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col(tieCol))
    val prev = lag(col(attrCol), 1).over(w)
    val islands = changes
      // null-SAFE change detection (<=>): with plain =!=, a change TO
      // null compares null, the when() falls through to 0, and the
      // null run silently merges into the previous version. The first
      // row (prev null) opens version 1 either way.
      .withColumn("__chg",
        when(!(col(attrCol) <=> prev), 1).otherwise(0))
      .withColumn("__island", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = islands
      .groupBy((keyCols :+ attrCol).map(col) :+ col("__island"): _*)
      .agg(min(col(ordCol)).as("valid_from"))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("version", row_number().over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__island")
  }

  /** Latest-wins compaction: ONE row per key — the change with the
    * greatest `(ordCol, tieCol)`. The standard snapshot-read of a
    * changelog table and the reduce side of a MERGE. */
  def compactLatest(changes: DataFrame, keyCols: Seq[String],
                    ordCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).desc, col(tieCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MERGE (upsert): apply a change batch onto a one-row-per-key
    * snapshot, latest `(ordCol, tieCol)` wins per key. Rows only in
    * the batch are inserts; rows only in the snapshot pass through.
    * Implemented as union + [[compactLatest]] — the shuffle-once
    * formulation that never materializes a join of snapshot ×
    * updates. */
  def merge(snapshot: DataFrame, updates: DataFrame, keyCols: Seq[String],
            ordCol: String, tieCol: String): DataFrame =
    compactLatest(snapshot.unionByName(updates), keyCols, ordCol, tieCol)
}
