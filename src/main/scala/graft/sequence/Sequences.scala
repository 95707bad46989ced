package graft.sequence

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Sequence-model data prep (SURVEY §2.5 W15-W16):
  * sliding sequence materialization and the ordered 70/15/15 split
  * (`src/models/lstm_forecasting.py:186-218`). */
object Sequences {

  /** W15: trailing `len`-row sequence of `c` per partition; null until a
    * full sequence exists (reference only emits complete windows). */
  def slidingSequence(c: Column, len: Int, w: WindowSpec): Column = {
    val seq = collect_list(c).over(w.rowsBetween(-(len - 1), 0))
    when(size(seq) === len, seq)
  }

  /** W16: ordered fractional split (train/val/test), per partition —
    * pandas `int(n*0.7)` truncation semantics, order preserved (NOT
    * randomSplit: time-ordered data must split by time). */
  def orderedSplit(w: WindowSpec, trainFrac: Double = 0.7,
                   valFrac: Double = 0.15): Column = {
    val rn = row_number().over(w)
    val n = count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing))
    val nTrain = floor(n * lit(trainFrac))
    val nVal = floor(n * lit(valFrac))
    when(rn <= nTrain, "train")
      .when(rn <= nTrain + nVal, "val")
      .otherwise("test")
  }
}
