package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Multi-spec EWM (`y ← α·x + (1−α)·y` per key, pandas
  * `ewm(span, adjust=False).mean()`) as a first-class operator — the
  * ordering-preserving generalization of the mapPartitions route (see
  * [[EwmMacdPlan]] for why declared distribution/ordering beat an
  * opaque lambda). One streaming scan, O(#specs) state per key, rows
  * emitted immediately (no per-key buffering); chained EwmPlan nodes
  * and downstream windows all share the ONE exchange+sort planned
  * below the first node. Null contract: null in → null out, state
  * untouched. */
case class EwmPlan(child: LogicalPlan, partCols: Seq[String],
                   ordCols: Seq[String],
                   specs: Seq[(String, Double, String)], // (valueCol, alpha, outName)
                   // constructor-carried (default evaluated once at
                   // construction) so tree copies preserve the output
                   // exprIds — cf. EwmMacdPlan
                   ewmAttrs: Seq[AttributeReference] = Nil)
  extends UnaryNode {

  private def attrs: Seq[AttributeReference] = {
    require(ewmAttrs.length == specs.length,
      "construct EwmPlan via EwmPlan.create (output attrs must be pre-generated)")
    ewmAttrs
  }

  override def output: Seq[Attribute] = child.output ++ attrs
  // value columns must BE DoubleType (not merely castable): doExecute
  // reads the raw 8-byte slot via getDouble — a long reinterpreted as
  // IEEE bits would be silent garbage, so refuse to resolve instead.
  // Names must be UNIQUE in the child: columns are bound by name, and a
  // duplicate (e.g. after a self-join) would silently bind the wrong
  // attribute — refusing to resolve makes the analyzer fail loudly.
  private def uniquely(n: String): Boolean = child.output.count(_.name == n) == 1
  override lazy val resolved: Boolean = childrenResolved &&
    (partCols ++ ordCols).forall(uniquely) &&
    specs.forall(s => uniquely(s._1) && child.output.exists(a =>
      a.name == s._1 && a.dataType == DoubleType))

  override def references: AttributeSet = AttributeSet(
    child.output.filter(a => partCols.contains(a.name) ||
      ordCols.contains(a.name) || specs.exists(_._1 == a.name)))

  override protected def withNewChildInternal(newChild: LogicalPlan): EwmPlan =
    copy(child = newChild)
}

object EwmPlan {
  /** Always construct through here — generates the output attrs ONCE. */
  def create(child: LogicalPlan, partCols: Seq[String], ordCols: Seq[String],
             specs: Seq[(String, Double, String)]): EwmPlan =
    EwmPlan(child, partCols, ordCols, specs,
      specs.map(s => AttributeReference(s._3, DoubleType)()))
}

object EwmStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: EwmPlan =>
      EwmExec(p.partCols, p.ordCols, p.specs, p.ewmAttrs, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class EwmExec(partCols: Seq[String], ordCols: Seq[String],
                   specs: Seq[(String, Double, String)],
                   ewmAttrs: Seq[AttributeReference], child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ ewmAttrs

  private def attr(n: String): Attribute = child.output.filter(_.name == n) match {
    case Seq(a) => a
    case ms => throw new IllegalStateException(
      s"EwmExec: expected exactly one column named $n in child, found ${ms.length}")
  }

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
    val valIdx = specs.map(s => childOutput.indexWhere(_.name == s._1)).toArray
    val alphas = specs.map(_._2).toArray
    val outAttrs = output
    val nSpecs = valIdx.length

    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partAttrs, childOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      var curKey: UnsafeRow = null
      val state = new Array[Double](nSpecs)
      val hasState = new Array[Boolean](nSpecs)

      it.map { r =>
        val key = keyProj(r)
        if (curKey == null || key != curKey) {
          curKey = key.copy()
          java.util.Arrays.fill(hasState, false)
        }
        val extra = new GenericInternalRow(nSpecs)
        var i = 0
        while (i < nSpecs) {
          if (!r.isNullAt(valIdx(i))) {
            val v = r.getDouble(valIdx(i))
            state(i) =
              if (hasState(i)) alphas(i) * v + (1.0 - alphas(i)) * state(i) else v
            hasState(i) = true
            extra.update(i, state(i))
          } else extra.setNullAt(i)
          i += 1
        }
        resultProj(joined(r, extra))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): EwmExec =
    copy(child = newChild)
}
