package graft.features

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** W9 as a native Catalyst aggregate (SURVEY §2.10 "one custom
  * scalar/agg surface"): pandas `ewm(span, adjust=False).mean()` as a
  * `TypedImperativeAggregate`, usable as a WINDOW function over an
  * ordered running frame — `ewm(c, span).over(w.rowsBetween(
  * unboundedPreceding, 0))`.
  *
  * Spark evaluates growing (unbounded-preceding) window frames
  * incrementally — one `update` per row — so the recursion
  * `y ← α·x + (1−α)·y` costs O(1) state and O(n) total per partition,
  * identical to [[Ewm]]'s mapPartitions route but expressible inside a
  * single Window stage alongside every other frame (no extra exchange,
  * no Dataset round-trip). The two implementations cross-verify in
  * EwmAggSpec.
  *
  * Buffer is (hasState, state); merge is only required for global
  * (non-window) aggregation, where EWM order-dependence makes a true
  * merge impossible — window frames never call it with two non-empty
  * buffers, and we fail loudly if that contract is ever violated.
  */
case class EwmAgg(child: Expression, alpha: Double,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EwmAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ewm"

  override def createAggregationBuffer(): EwmAgg.Buf = EwmAgg.Buf(false, 0.0)

  override def update(buf: EwmAgg.Buf, input: InternalRow): EwmAgg.Buf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val x = v.asInstanceOf[Double]
      if (!buf.hasState) EwmAgg.Buf(true, x)
      else EwmAgg.Buf(true, alpha * x + (1.0 - alpha) * buf.state)
    }
  }

  override def merge(a: EwmAgg.Buf, b: EwmAgg.Buf): EwmAgg.Buf =
    if (!b.hasState) a
    else if (!a.hasState) b
    else throw new UnsupportedOperationException(
      "ewm is order-dependent; merging two non-empty partial states is undefined " +
        "(use it as a window function over an ordered frame)")

  override def eval(buf: EwmAgg.Buf): Any =
    if (buf.hasState) buf.state else null

  override def serialize(buf: EwmAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(9)
    bb.put(if (buf.hasState) 1.toByte else 0.toByte).putDouble(buf.state)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): EwmAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    EwmAgg.Buf(bb.get() == 1.toByte, bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EwmAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EwmAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmAgg =
    copy(child = newChildren.head)
}

object EwmAgg {
  case class Buf(hasState: Boolean, state: Double)

  /** Column factory: `ewm(col, span)` — pair with an ordered
    * unbounded-preceding window frame. */
  def ewm(c: Column, span: Double): Column = {
    val alpha = 2.0 / (span + 1.0)
    ColumnBridge.column(
      EwmAgg(ColumnBridge.expression(c), alpha).toAggregateExpression())
  }
}
