package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate — the scale-path replacement for
  * the `row_number().over(partitionBy(key).orderBy(s)) <= k` idiom.
  *
  * The window form shuffles EVERY candidate row to its key's reducer
  * and sorts there: at 100 TB a brute-force top-k (s1-style cosine
  * scoring, kNN distance pairs) ships the entire scored candidate set
  * through the exchange. This aggregate keeps a k-bounded binary heap
  * per group INSIDE the partial (map-side) hash aggregate, so each
  * mapper emits at most k rows per locally-seen key and the shuffle
  * carries ≤ mappers × keys × k rows — independent of the candidate
  * count. Merge combines two heaps in O(k log k); the final heap emits
  * rows in ascending sort-key order.
  *
  * Ordering contract: ASCENDING over `sortKey`'s type (struct keys
  * compare lexicographically — negate numeric columns for descending,
  * exactly as the queries' deterministic orderBy + tie-break convention
  * already requires a total order). Null sort keys sort FIRST (Spark's
  * asc nulls-first default).
  */
case class TopKAgg(sortKey: Expression, payload: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def prettyName: String = "graft_topk"

  private def elementType: StructType = StructType(Seq(
    StructField("key", sortKey.dataType, nullable = true),
    StructField("value", payload.dataType, nullable = true)))

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(sortKey.dataType)
  // max-heap on the sort key: the root is the WORST kept row, evicted
  // first when a better candidate arrives (null-safe: nulls sort first)
  private def newHeap(): TopKAgg.Buf = {
    val asc = TopKAgg.nullsFirst(keyOrdering)
    new java.util.PriorityQueue[(Any, Any)](k + 1,
      (p: (Any, Any), q: (Any, Any)) => asc.compare(q._1, p._1))
  }

  private def copyVal(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case x => x
  }

  override def createAggregationBuffer(): TopKAgg.Buf = newHeap()

  private def offer(buf: TopKAgg.Buf, key: Any, value: Any): Unit = {
    if (buf.size < k) {
      buf.add((key, value))
    } else {
      // compare against the current worst; nulls sort first (= best),
      // so a null key always displaces a non-null worst
      val worst = buf.peek()._1
      val better =
        if (key == null) worst != null
        else if (worst == null) false
        else keyOrdering.compare(key, worst) < 0
      if (better) { buf.poll(); buf.add((key, value)) }
    }
  }

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    // test acceptance BEFORE copying: on the hot path nearly every row
    // is rejected by the full heap, and the deep copy of key+payload is
    // the operator's dominant allocation — only accepted rows pay it
    val key = sortKey.eval(input)
    val accept =
      if (buf.size < k) true
      else {
        val worst = buf.peek()._1
        if (key == null) worst != null
        else if (worst == null) false
        else keyOrdering.compare(key, worst) < 0
      }
    if (accept) {
      if (buf.size >= k) buf.poll()
      buf.add((copyVal(key), copyVal(payload.eval(input))))
    }
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    val it = b.iterator()
    while (it.hasNext) { val (key, value) = it.next(); offer(a, key, value) }
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val arr = buf.toArray(new Array[(Any, Any)](buf.size))
    val sorted = arr.sortBy(_._1)(
      Ordering.comparatorToOrdering(TopKAgg.nullsFirst(keyOrdering)))
    new GenericArrayData(sorted.map { case (key, value) =>
      InternalRow(key, value)
    })
  }

  // serialize partial heaps through the output row format: one
  // UnsafeRow holding the array<struct<key,value>> column
  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](dataType))
  override def serialize(buf: TopKAgg.Buf): Array[Byte] =
    ser(InternalRow(eval(buf))).asInstanceOf[UnsafeRow].getBytes

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = newHeap()
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      val st = arr.getStruct(i, 2)
      val key = copyVal(st.get(0, sortKey.dataType))
      val value = copyVal(st.get(1, payload.dataType))
      offer(buf, key, value)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(sortKey = newChildren(0), payload = newChildren(1))
}

object TopKAgg {
  type Buf = java.util.PriorityQueue[(Any, Any)]

  private[operators] def nullsFirst(ord: Ordering[Any]): java.util.Comparator[Any] =
    (x: Any, y: Any) =>
      if (x == null && y == null) 0
      else if (x == null) -1
      else if (y == null) 1
      else ord.compare(x, y)

  /** Column factory: `topK(sortKey, payload, k)` aggregate. */
  def topK(sortKey: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(sortKey),
        ColumnBridge.expression(payload), k).toAggregateExpression())
}
