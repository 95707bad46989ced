package graft.sketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** [[Hll]] as a native Catalyst aggregate — `graft_hll(key, p)` in SQL
  * (registered by [[graft.GraftExtensions]]).
  *
  * Where the Column-API [[Hll.estimate]] builds the register table as
  * TWO ordinary aggregates (a (bucket)-keyed max, then the harmonic
  * reduction), this is the single-pass production shape Spark's own
  * `approx_count_distinct` uses: the aggregation BUFFER is the m-byte
  * register array itself, `update` folds each row into one register,
  * `merge` is the element-wise max of two register arrays — a true
  * CRDT merge, so map-side partial aggregation applies and the shuffle
  * carries ONE m-byte buffer per partition instead of up to m rows.
  *
  * The register derivation is bit-compatible with [[Hll.registers]]
  * (same md5-of-string-rendering hash, same hex-prefix bucket, same
  * leading-zero rank — HllAggSpec pins byte-equality of the whole
  * output struct against the Column path), so the SAME DuckDB oracle
  * checks both. The contract holds for key types whose Spark
  * cast-to-string equals JVM `toString` (integral/string keys — the
  * declared query uses the event id).
  *
  * Output: struct (m, v_nonzero, zsum40, estimate) — the [[Hll]]
  * estimate frame as a single value, estimate unrounded (callers round
  * r4 as usual).
  */
case class HllAgg(child: Expression, p: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p % 4 == 0 && p >= 4 && p <= 24, s"p=$p must be a multiple of 4 in [4,24]")

  private val m = 1 << p
  private val hexChars = p / 4

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"
  override def dataType: DataType = StructType(Seq(
    StructField("m", LongType), StructField("v_nonzero", LongType),
    StructField("zsum40", LongType), StructField("estimate", DoubleType)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val hex = HllAgg.md5Hex(v.toString)
    val bucket = Integer.parseInt(hex.substring(0, hexChars), 16)
    val rank = HllAgg.rankOf(hex, hexChars)
    if (rank > buf(bucket)) buf(bucket) = rank.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var vNonzero = 0L
    var zsum40 = 0L
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      if (r > 0) {
        vNonzero += 1
        if (r <= 40) zsum40 += 1L << (40 - r)
      }
      i += 1
    }
    val md = m.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / md)
    // identical operand order to Hll.estimateExpr / the DuckDB oracle
    val z = zsum40.toDouble / math.pow(2.0, 40) + (md - vNonzero.toDouble)
    val raw = alpha * md * md / z
    val vEmpty = md - vNonzero.toDouble
    val est =
      if (raw <= 2.5 * md && vEmpty > 0) md * math.log(md / vEmpty) else raw
    InternalRow(m.toLong, vNonzero, zsum40, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lowercase hex md5 of the UTF-8 string — the JVM twin of SQL
    * `md5(cast(k AS string))`. */
  def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Leading-zero rank over the 16 hex chars after the bucket prefix —
    * the JVM twin of [[Hll]]'s string-ops derivation (4·zero-prefix +
    * CASE on the first non-zero digit + 1; all-zero tail → 68). */
  def rankOf(hex: String, hexChars: Int): Int = {
    val tail = hex.substring(hexChars, hexChars + 16)
    var z = 0
    while (z < 16 && tail.charAt(z) == '0') z += 1
    val extra =
      if (z == 16) 3
      else tail.charAt(z) match {
        case '8' | '9' | 'a' | 'b' | 'c' | 'd' | 'e' | 'f' => 0
        case '4' | '5' | '6' | '7' => 1
        case '2' | '3' => 2
        case _ => 3
      }
    4 * z + extra + 1
  }
}
