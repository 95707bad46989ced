package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** The fused MACD pass as a first-class Catalyst operator (the full
  * extension ladder: logical node → strategy → physical node; SURVEY
  * §2.10 "custom Catalyst extension points", reference
  * `src/models/lstm_forecasting.py:151-164`).
  *
  * Why a custom plan and not `Dataset.mapPartitions`: a mapPartitions
  * lambda is opaque to Catalyst — its output loses the child's
  * partitioning AND ordering metadata, so the downstream 16-feature
  * window pipeline re-exchanges and re-sorts rows the EWM pass already
  * grouped and sorted. This node declares
  * `requiredChildDistribution`/`requiredChildOrdering` (Catalyst inserts
  * exactly one hash exchange + sort below it) and advertises
  * `outputPartitioning`/`outputOrdering`, so every downstream
  * `Window.partitionBy(keys).orderBy(ord)` reuses the SAME exchange and
  * sort — one shuffle for the whole feature frame. It also runs on
  * InternalRow directly (no Row encoder round-trip).
  *
  * Appends `macd`, `macd_signal`, `macd_hist`: fast/slow/signal EWMs,
  * histogram, and the per-key max-|·| normalization in one buffered
  * scan per key — O(rows-per-key) memory, the same bound as any
  * collect_list window (see [[graft.features.Ewm.ewmMacdNormalized]]'s
  * contract: null in → null out, state untouched, nulls excluded from
  * the max-abs pass).
  */
case class EwmMacdPlan(child: LogicalPlan, partCols: Seq[String],
                       ordCols: Seq[String], valueCol: String,
                       fast: Double, slow: Double, signal: Double,
                       // constructor parameter (not a val): tree copies
                       // during optimization must PRESERVE the output
                       // exprIds or downstream references dangle
                       macdAttrs: Seq[AttributeReference] =
                         EwmMacdPlan.freshMacdAttrs())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output ++ macdAttrs
  // valueCol must BE DoubleType: doExecute reads it via getDouble (cf.
  // EwmPlan — a reinterpreted long would be silent garbage). Names must
  // be UNIQUE in the child: binding is by name, and a duplicate (e.g.
  // after a self-join) would silently bind the wrong attribute —
  // refusing to resolve makes the analyzer fail loudly instead.
  private def uniquely(n: String): Boolean = child.output.count(_.name == n) == 1
  override lazy val resolved: Boolean = childrenResolved &&
    (partCols ++ ordCols).forall(uniquely) && uniquely(valueCol) &&
    child.output.exists(a => a.name == valueCol && a.dataType == DoubleType)

  // The key/order/value columns are consumed by name inside doExecute —
  // declare them so ColumnPruning keeps them when a downstream Project
  // drops everything else (it may still prune genuinely unused child
  // columns, shrinking `output` accordingly).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a =>
        partCols.contains(a.name) || ordCols.contains(a.name) || a.name == valueCol))

  override protected def withNewChildInternal(newChild: LogicalPlan): EwmMacdPlan =
    copy(child = newChild)
}

object EwmMacdPlan {
  private[plans] def freshMacdAttrs(): Seq[AttributeReference] = Seq(
    AttributeReference("macd", DoubleType)(),
    AttributeReference("macd_signal", DoubleType)(),
    AttributeReference("macd_hist", DoubleType)())
}

/** Planner rule: [[EwmMacdPlan]] → [[EwmMacdExec]]. Injected by
  * `GraftExtensions` (config-time) or lazily by
  * `Ewm.ewmMacdNormalized` (runtime, via `spark.experimental`). */
object EwmMacdStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: EwmMacdPlan =>
      EwmMacdExec(p.partCols, p.ordCols, p.valueCol, p.macdAttrs,
        p.fast, p.slow, p.signal, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class EwmMacdExec(partCols: Seq[String], ordCols: Seq[String],
                       valueCol: String, macdAttrs: Seq[AttributeReference],
                       fast: Double, slow: Double, signal: Double,
                       child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ macdAttrs

  private def attr(n: String): Attribute = child.output.filter(_.name == n) match {
    case Seq(a) => a
    case ms => throw new IllegalStateException(
      s"EwmMacdExec: expected exactly one column named $n in child, found ${ms.length}")
  }

  // one hash exchange on the keys + one in-partition sort, both planned
  // by Catalyst and SHARED with any same-keyed downstream window
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(partCols.map(attr)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((partCols ++ ordCols).map(n => SortOrder(attr(n), Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (partCols ++ ordCols).map(n => SortOrder(attr(n), Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partAttrs = partCols.map(attr)
    val vIdx = childOutput.indexWhere(_.name == valueCol)
    val aF = 2.0 / (fast + 1.0)
    val aS = 2.0 / (slow + 1.0)
    val aG = 2.0 / (signal + 1.0)
    val outAttrs = output

    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partAttrs, childOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var pending: InternalRow = null
        private var pendingKey: InternalRow = null

        private def flushKey(): Unit = {
          if (pending == null && !it.hasNext) return
          val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          val first =
            if (pending != null) pending else { val r = it.next(); r.copy() }
          val key =
            if (pendingKey != null) pendingKey else keyProj(first).copy()
          pending = null; pendingKey = null
          rows += first
          var done = false
          while (!done && it.hasNext) {
            val r = it.next()
            if (keyProj(r) == key) rows += r.copy()
            else { pending = r.copy(); pendingKey = keyProj(pending).copy(); done = true }
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
            while (j < a.length) {
              if (valid(j)) { val x = math.abs(a(j)); if (x > mx) mx = x }
              j += 1
            }
            mx
          }
          val (mm, sm, hm) = (maxAbs(macd), maxAbs(sig), maxAbs(hist))
          out = rows.iterator.zipWithIndex.map { case (r, j) =>
            val extra = new GenericInternalRow(3)
            if (valid(j)) {
              extra.update(0, if (mm == 0) macd(j) else macd(j) / mm)
              extra.update(1, if (sm == 0) sig(j) else sig(j) / sm)
              extra.update(2, if (hm == 0) hist(j) else hist(j) / hm)
            } else {
              extra.setNullAt(0); extra.setNullAt(1); extra.setNullAt(2)
            }
            resultProj(joined(r, extra))
          }
        }

        def hasNext: Boolean = {
          while (!out.hasNext && (pending != null || it.hasNext)) flushKey()
          out.hasNext
        }
        def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          out.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): EwmMacdExec =
    copy(child = newChild)
}
