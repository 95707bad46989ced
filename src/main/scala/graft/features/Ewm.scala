package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.PlanBridge

/** W9: exponentially-weighted moving mean, pandas
  * `ewm(span=s, adjust=False).mean()` — the recursion
  * `y_t = α·x_t + (1−α)·y_{t−1}`, α = 2/(span+1), `y_0 = x_0`
  * (reference `src/models/lstm_forecasting.py:151-164`, MACD).
  *
  * Not expressible as a Spark window frame (SURVEY §7.3): a window
  * aggregate sees frame rows, not the previous OUTPUT. Chosen plan (c)
  * from SURVEY W9: `mapPartitions` over key-sorted partitions carrying
  * running state — fully distributed (one shuffle on the partition key,
  * state is O(#specs) doubles per group), linear scan per partition, no
  * driver involvement. At 100 TB this behaves exactly like the Window
  * exchange every other W-operator already pays.
  *
  * Leading nulls stay null; state starts at the first non-null value.
  * (The reference only feeds it dense close prices.)
  */
object Ewm {

  /** Fused MACD pass: fast/slow/signal EWMs, histogram AND the per-key
    * max-|·| normalization in ONE exchange+sort+scan — `withMacd`
    * (two ewmMean calls) costs two exchanges and the normalization
    * windows a third; this costs one. Null in → null out, state
    * untouched, nulls excluded from the max-abs pass (ewmMean's
    * contract).
    *
    * Implemented as a first-class Catalyst operator
    * ([[graft.plans.EwmMacdPlan]] → [[graft.plans.EwmMacdExec]]): the
    * physical node declares its required distribution/ordering — so the
    * one exchange+sort Catalyst plans below it is REUSED by every
    * downstream `Window.partitionBy(partCols).orderBy(ordCols)` (a
    * mapPartitions lambda would hide both properties and force a
    * second shuffle), and rows stay in InternalRow form (no Row
    * encoder round-trip). The planner strategy self-registers on the
    * session at first use; `GraftExtensions` also injects it
    * config-time. */
  def ewmMacdNormalized(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
                        valueCol: String, fast: Double = 12, slow: Double = 26,
                        signal: Double = 9): DataFrame = {
    val spark = df.sparkSession
    PlanBridge.addStrategy(spark, graft.plans.EwmMacdStrategy)
    PlanBridge.ofRows(spark, graft.plans.EwmMacdPlan(
      PlanBridge.plan(df), partCols, ordCols, valueCol, fast, slow, signal))
  }

  /** Append one EWM output column per (inputCol, span, outputCol) spec.
    *
    * Same first-class-operator treatment as the fused MACD pass
    * ([[graft.plans.EwmPlan]]): O(#specs) state per key, rows emitted
    * streaming (no buffering), ordering/partitioning advertised — so
    * chained ewmMean calls (e.g. `Indicators.withMacd`'s line + signal
    * passes) and downstream windows all share ONE exchange+sort. */
  def ewmMean(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
              specs: Seq[(String, Double, String)]): DataFrame = {
    val spark = df.sparkSession
    PlanBridge.addStrategy(spark, graft.plans.EwmStrategy)
    PlanBridge.ofRows(spark, graft.plans.EwmPlan.create(
      PlanBridge.plan(df), partCols, ordCols,
      specs.map(s => (s._1, 2.0 / (s._2 + 1.0), s._3))))
  }
}
