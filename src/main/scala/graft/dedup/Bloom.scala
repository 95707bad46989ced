package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership prefilter — the shuffle-avoidance pattern a
  * 100 TB decontamination / semi-join pass runs before any exact join:
  * build the sketch over the SMALL side once (distributed aggregate,
  * fixed-size result), ship its bytes to every corpus task as a plan
  * literal, and drop the overwhelming majority of corpus rows at scan
  * time — only probable hits reach the (exact, false-positive-killing)
  * join. No false negatives, so `bloom-prefilter → exact join` is
  * result-identical to the plain exact join.
  *
  * Uses Spark's own codegen'd sketch expressions (BloomFilterAggregate
  * / BloomFilterMightContain — what AQE's runtime row-filter injection
  * inserts), driven directly because the SQL surface only wires them
  * up inside the optimizer rule. Values are keyed by `xxhash64`, the
  * hash BloomFilterMightContain expects.
  */
object Bloom {

  /** Aggregate `keyCol` of `df` into a serialized bloom filter.
    * The result is a bounded sketch (numBits/8 bytes + header) — safe
    * to hold on the driver and embed as a literal regardless of the
    * input's row count. An EMPTY input yields null, and
    * [[mightContain]] over a null sketch evaluates null (filter-false)
    * — "nothing matches an empty set", the correct prefilter
    * semantics (spec-pinned). */
  def buildBytes(df: DataFrame, keyCol: Column,
                 expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership-probe predicate against a built sketch: true when
    * `keyCol` is possibly in the set (never false for a true member). */
  def mightContain(bloomBytes: Array[Byte], keyCol: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      ColumnBridge.expression(xxhash64(keyCol))))
}
