package graft.features

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DoubleType

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
    * max-|·| normalization in ONE repartition+sort+scan — `withMacd`
    * (two ewmMean calls) costs two exchanges and the normalization
    * windows a third; this costs one. The signal EWM consumes the MACD
    * value computed in the same row visit, and each key's rows are
    * buffered (keys are contiguous after the sort) so the max-abs
    * normalization happens at key flush — O(rows-per-key) memory, the
    * same bound as any collect_list window. Appends `macd`,
    * `macd_signal`, `macd_hist`, normalized to [-1,1]-scale by the
    * per-key max unless that max is 0 (reference rule). */
  def ewmMacdNormalized(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
                        valueCol: String, fast: Double = 12, slow: Double = 26,
                        signal: Double = 9): DataFrame = {
    val outSchema = df.schema.add("macd", DoubleType)
      .add("macd_signal", DoubleType).add("macd_hist", DoubleType)
    val schema = df.schema
    val partIdx = partCols.map(schema.fieldIndex).toArray
    val vIdx = schema.fieldIndex(valueCol)
    val aF = 2.0 / (fast + 1.0)
    val aS = 2.0 / (slow + 1.0)
    val aG = 2.0 / (signal + 1.0)

    val sorted = df
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ ordCols).map(col): _*)

    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var pending: Row = null

        private def flushKey(): Unit = {
          if (pending == null && !it.hasNext) return
          val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
          val first = if (pending != null) pending else it.next()
          pending = null
          val key = partIdx.toIndexedSeq.map(first.get)
          rows += first
          var done = false
          while (!done && it.hasNext) {
            val r = it.next()
            if (partIdx.toIndexedSeq.map(r.get) == key) rows += r
            else { pending = r; done = true }
          }
          val n = rows.length
          val macd = new Array[Double](n)
          val sig = new Array[Double](n)
          val hist = new Array[Double](n)
          val valid = new Array[Boolean](n)
          var yF, yS, yG = 0.0
          var has = false
          var hasG = false
          var i = 0
          while (i < n) {
            // Null in → null out, state untouched — same contract as ewmMean.
            if (!rows(i).isNullAt(vIdx)) {
              val v = rows(i).getDouble(vIdx)
              if (!has) { yF = v; yS = v; has = true }
              else {
                yF = aF * v + (1.0 - aF) * yF
                yS = aS * v + (1.0 - aS) * yS
              }
              val m = yF - yS
              yG = if (!hasG) { hasG = true; m } else aG * m + (1.0 - aG) * yG
              macd(i) = m; sig(i) = yG; hist(i) = m - yG
              valid(i) = true
            }
            i += 1
          }
          def maxAbs(a: Array[Double]): Double = {
            var mx = 0.0; var j = 0
            while (j < a.length) { if (valid(j)) { val x = math.abs(a(j)); if (x > mx) mx = x }; j += 1 }
            mx
          }
          val (mm, sm, hm) = (maxAbs(macd), maxAbs(sig), maxAbs(hist))
          out = rows.iterator.zipWithIndex.map { case (r, j) =>
            if (!valid(j)) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
            else Row.fromSeq(r.toSeq ++ Seq(
              if (mm == 0) macd(j) else macd(j) / mm,
              if (sm == 0) sig(j) else sig(j) / sm,
              if (hm == 0) hist(j) else hist(j) / hm))
          }
        }

        def hasNext: Boolean = {
          while (!out.hasNext && (pending != null || it.hasNext)) flushKey()
          out.hasNext
        }
        def next(): Row = { if (!hasNext) throw new NoSuchElementException; out.next() }
      }
    }(Encoders.row(outSchema))
  }

  /** Append one EWM output column per (inputCol, span, outputCol) spec. */
  def ewmMean(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
              specs: Seq[(String, Double, String)]): DataFrame = {
    val outSchema = specs.foldLeft(df.schema)((sc, s) => sc.add(s._3, DoubleType))
    val schema = df.schema
    val partIdx = partCols.map(schema.fieldIndex).toArray
    val valIdx = specs.map(s => schema.fieldIndex(s._1)).toArray
    val alphas = specs.map(s => 2.0 / (s._2 + 1.0)).toArray

    val sorted = df
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ ordCols).map(col): _*)

    sorted.mapPartitions { it =>
      var curKey: IndexedSeq[Any] = null
      val state = new Array[Double](valIdx.length)
      val hasState = new Array[Boolean](valIdx.length)
      it.map { r =>
        val key = partIdx.toIndexedSeq.map(r.get)
        if (key != curKey) {
          curKey = key
          java.util.Arrays.fill(hasState, false)
        }
        val outs = new Array[Any](valIdx.length)
        var i = 0
        while (i < valIdx.length) {
          if (!r.isNullAt(valIdx(i))) {
            val v = r.getDouble(valIdx(i))
            state(i) = if (hasState(i)) alphas(i) * v + (1.0 - alphas(i)) * state(i) else v
            hasState(i) = true
            outs(i) = state(i)
          } else outs(i) = null
          i += 1
        }
        Row.fromSeq(r.toSeq ++ outs)
      }
    }(Encoders.row(outSchema))
  }
}
