package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.operators.{TopK, TopKAgg}

/** Optimizer rewrite: the per-key top-k window idiom
  *
  * {{{ Filter(rn <= k, Window(rn = row_number() over (PARTITION BY p ORDER BY o))) }}}
  *
  * becomes the bounded-heap aggregate plan
  *
  * {{{ Project(payload.*, rn = pos + 1,
  *       Generate(posexplode(arr),
  *         Aggregate(p, arr = graft_topk(sortKey, struct(child.*), k)))) }}}
  *
  * so any user query written with the familiar window pattern gets the
  * O(keys × k)-shuffle plan (map-side partial heaps, see [[TopKAgg]])
  * instead of shuffling and sorting every candidate row per key.
  *
  * Applied conservatively — only when:
  *  - the Window computes EXACTLY one expression, a plain `row_number()`;
  *  - the filter is a bare `rn <= k` / `rn < k` / `rn = 1` on an
  *    integer literal directly above the Window, with
  *    k <= [[graft.operators.TopK.MaxHeapK]] (the heap buffer does not
  *    spill its contents — huge k belongs to the window sort);
  *  - every sort order is ascending-nulls-first (any orderable type) or
  *    descending-nulls-last on a numeric type (encoded as an ascending
  *    (isnull[, !isnan], -x) struct, integrals widened before negation
  *    so MinValue can't overflow) — Spark's two default direction/null
  *    combinations.
  *
  * The rewritten subtree reproduces the original output attributes
  * (names, types AND exprIds), so parent operators bind unchanged.
  * Registered config-time via GraftExtensions (injectOptimizerRule) or
  * at runtime through `spark.experimental.extraOptimizations`.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** Ascending-comparable key expression for one sort order, or None if
    * the direction/null combination isn't safely encodable.
    *
    * Descending edge cases the naive (isnull, -x) encoding gets wrong:
    *  - NaN is the LARGEST double in Spark's total order, so `x DESC`
    *    ranks NaN rows first — but negate(NaN) is still NaN, which
    *    sorts LAST ascending; rank an explicit !isnan flag ahead of
    *    the negated value.
    *  - UnaryMinus(Int/Long.MinValue) overflows (throws under ANSI,
    *    Spark 4's default) — widen integrals before negating.
    */
  private def ascKey(so: SortOrder): Option[Expression] = (so.direction, so.nullOrdering) match {
    case (Ascending, NullsFirst) => Some(so.child)
    case (Descending, NullsLast) =>
      val nullFlag = Cast(IsNull(so.child), IntegerType)
      so.child.dataType match {
        case FloatType | DoubleType =>
          // desc order: NaN, then finite desc, then nulls — ascending
          // on (isnull, !isnan, -x); all-NaN ties are fine (-NaN = NaN
          // compares equal to itself in the interpreted ordering)
          Some(CreateStruct(Seq(nullFlag,
            Cast(Not(IsNaN(so.child)), IntegerType), UnaryMinus(so.child))))
        case ByteType | ShortType | IntegerType =>
          Some(CreateStruct(Seq(nullFlag,
            UnaryMinus(Cast(so.child, LongType)))))
        case LongType =>
          Some(CreateStruct(Seq(nullFlag,
            UnaryMinus(Cast(so.child, DecimalType(20, 0))))))
        case _: DecimalType =>
          // decimal range is symmetric: negation never overflows
          Some(CreateStruct(Seq(nullFlag, UnaryMinus(so.child))))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partSpec, orderSpec, child, _)) =>
      val rnAttr = alias.toAttribute
      // InferWindowGroupLimit (built-in, runs earlier) may have inserted a
      // per-partition sort-and-limit below the Window; the heap aggregate
      // already does map-side partial top-k, so that node is redundant work.
      val innerChild = child match {
        case WindowGroupLimit(p, o, RowNumber(), _, grandchild)
          if p == partSpec && o == orderSpec => grandchild
        case other => other
      }
      val keysOpt =
        if (orderSpec.isEmpty) None // row_number over unordered is nondeterministic anyway; leave it
        else {
          val ks = orderSpec.map(ascKey)
          if (ks.forall(_.isDefined)) Some(ks.map(_.get)) else None
        }
      (limitOf(cond, rnAttr), keysOpt) match {
        // k bounded: the heap holds k JVM pairs per group inside the
        // hash-aggregate buffer with no content spilling — past
        // MaxHeapK the spillable window sort is the safer plan
        case (Some(k), Some(keys)) if k > 0 && k <= TopK.MaxHeapK =>
          val sortKey = if (keys.length == 1) keys.head else CreateStruct(keys)
          val payload = CreateStruct(innerChild.output)
          val agg = TopKAgg(sortKey, payload, k).toAggregateExpression()
          val arrAlias = Alias(agg, "__graft_topk_arr")()
          val aggregate = Aggregate(partSpec, Seq(arrAlias), innerChild)
          val posAttr = AttributeReference("__graft_pos", IntegerType)()
          val kvAttr = AttributeReference("__graft_kv",
            arrAlias.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType)()
          val gen = Generate(PosExplode(arrAlias.toAttribute),
            unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
            generatorOutput = Seq(posAttr, kvAttr), aggregate)
          val valueField = GetStructField(kvAttr, 1, Some("value"))
          val payloadType = payload.dataType.asInstanceOf[StructType]
          // reproduce the ORIGINAL output attributes (exprIds included)
          val projList: Seq[NamedExpression] = innerChild.output.zipWithIndex.map {
            case (a, i) =>
              Alias(GetStructField(valueField, i, Some(payloadType(i).name)),
                a.name)(exprId = a.exprId, qualifier = a.qualifier)
          } :+ Alias(Add(posAttr, Literal(1)), rnAttr.name)(
            exprId = rnAttr.exprId, qualifier = rnAttr.qualifier)
          Project(projList, gen)
        case _ => f
      }
  }
}
