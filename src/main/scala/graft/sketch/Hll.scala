package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count estimation (Flajolet et al. 2007), built
  * to be CROSS-ENGINE REPRODUCIBLE so the estimate itself — not just a
  * row count — survives a value-hash gate against a SQL oracle.
  *
  * Why this exists next to `approx_count_distinct`: Spark's built-in
  * HLL++ is the right production call, but its register layout and
  * hash are engine-private — no other engine can replay the estimate,
  * so a cross-engine pipeline can only rows-check it (g15_approx). This
  * implementation pays a constant factor for a portable contract:
  *
  *  - '''hash''': `md5(cast(key as string))` — identical lowercase hex
  *    on every engine; no seed, no engine-private mixing.
  *  - '''bucket''': the first p/4 hex chars, KEPT AS A STRING — the
  *    register index is only ever a group key, so no hex→int
  *    conversion (the one primitive engines disagree on) is needed.
  *  - '''rank''': leading-zero count of the NEXT 16 hex chars (64
  *    bits), computed with string ops only: 4 × (length of the `^0*`
  *    prefix) + a CASE on the first non-zero hex digit + 1.
  *  - '''harmonic sum''': Σ 2^−rank is the one place float summation
  *    order could diverge between engines, so it is computed EXACTLY:
  *    each register contributes the integer `floor(2^(40−rank))` and
  *    the engine sums longs (order-free). Registers with rank > 40
  *    contribute 0 on both engines (floor of a proper fraction) — a
  *    deterministic ≤2^−41 relative truncation, far below the sketch's
  *    own ~1.04/√m error. Max sum = m·2^39 ≪ 2^63: no overflow for
  *    any p ≤ 24.
  *
  * The final estimate arithmetic (alpha·m²/Z, linear-counting branch
  * below 2.5m when empty registers remain) is a single row of
  * identical IEEE doubles on both engines. The large-range (>2^32/30)
  * correction is omitted: at that cardinality you are past the 64-bit
  * hash regime this sketch targets and should raise p instead.
  *
  * At 100 TB this is the hh1/CountMin argument again: exact
  * `count(distinct key)` carries per-partition combine state (and a
  * shuffle) proportional to the KEY CARDINALITY — billions of keys for
  * web-scale ids — while the sketch's combine state is ≤ m=2^p
  * registers per partition and the shuffle is ≤ m·partitions rows,
  * data-size-independent. One scan, no second pass.
  */
object Hll {

  /** (bucket, r) register frame: one row per NON-EMPTY register.
    * `keyCol` is hashed as its string rendering. */
  def registers(items: DataFrame, keyCol: String, p: Int): DataFrame = {
    val (bucket, rank) = hashCols(keyCol, p)
    items.select(bucket.as("bucket"), rank.as("rank"))
      .groupBy(col("bucket"))
      .agg(max(col("rank")).as("r"))
  }

  /** (bucket, rank) expressions for one key — the portable register
    * derivation shared by the global and grouped estimators. */
  private def hashCols(keyCol: String, p: Int): (Column, Column) = {
    require(p % 4 == 0 && p >= 4 && p <= 24, s"p=$p must be a multiple of 4 in [4,24]")
    val h = md5(col(keyCol).cast("string"))
    val tail = substring(h, p / 4 + 1, 16)
    val zhex = length(regexp_extract(tail, "^0*", 0))
    val firstNz = substring(regexp_replace(tail, "^0+", ""), 1, 1)
    val extra = when(firstNz.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .when(firstNz.isin("2", "3"), 2)
      .otherwise(3) // '1', or the 2^-64-probability all-zero tail
    (substring(h, 1, p / 4), zhex * lit(4) + extra + lit(1))
  }

  /** One-row estimate frame: (m, v_nonzero, zsum40, estimate).
    * `zsum40` is the exact integer-scaled harmonic sum (×2^40) — part
    * of the output so the oracle checks the sketch state, not just the
    * rounded estimate. */
  def estimate(items: DataFrame, keyCol: String, p: Int = 12): DataFrame =
    estimateFromRegisters(registers(items, keyCol, p), p)

  /** The register→estimate reduction alone, for callers that maintain
    * the (bucket, r) register table themselves — e.g. the STREAMING
    * form, where each register is one stateful key holding a single
    * int (see st17): HLL registers are a max-merge CRDT, so a
    * streaming max per bucket IS the batch sketch of everything seen. */
  def estimateFromRegisters(regs: DataFrame, p: Int = 12): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 24, s"p=$p")
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m) // standard for m >= 128
    regs
      .agg(count(lit(1)).as("v_nonzero"),
        sum(floor(pow(lit(2.0), lit(40) - col("r"))).cast("long")).as("zsum40"))
      .select(lit(1L << p).as("m"), col("v_nonzero"), col("zsum40"),
        round(estimateExpr(col("zsum40"), col("v_nonzero"), m, alpha)
          + lit(1e-9), 4).as("estimate"))
  }

  /** (bucket, rank) columns appended for one key column — the
    * streaming entry point ([[registers]] without the aggregate). */
  def withRegisterCols(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    val (bucket, rank) = hashCols(keyCol, p)
    df.select(bucket.as("bucket"), rank.as("rank"))
  }

  /** Per-key register frame `(group, bucket, r)` — the sparse
    * representation HyperANF-style iterations merge with elementwise
    * max (registers are a max-merge CRDT, so a (group, bucket) max
    * aggregate IS the union of sketches). */
  def keyedRegisters(items: DataFrame, groupCol: String, keyCol: String,
                     p: Int): DataFrame = {
    val (bucket, rank) = hashCols(keyCol, p)
    items.select(col(groupCol), bucket.as("bucket"), rank.as("rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rank")).as("r"))
  }

  /** The register→estimate reduction per group, for callers that
    * maintain `(group, bucket, r)` register tables themselves. */
  def keyedEstimateFromRegisters(regs: DataFrame, groupCol: String,
                                 p: Int): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 24, s"p=$p")
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("v_nonzero"),
        sum(floor(pow(lit(2.0), lit(40) - col("r"))).cast("long")).as("zsum40"))
      .select(col(groupCol), lit(1L << p).as("m"), col("v_nonzero"),
        col("zsum40"),
        round(estimateExpr(col("zsum40"), col("v_nonzero"), m, alpha)
          + lit(1e-9), 4).as("estimate"))
  }

  /** SQL fragment: the portable rank of an md5 hex column named `h`
    * with a p/4-char bucket prefix — the same string-only derivation
    * as [[hashCols]], for oracle generators that build register
    * tables of their own (e.g. the HyperANF replay). */
  def rankCaseSql(pre: Int): String =
    s"""4 * length(regexp_extract(substring(h, ${pre + 1}, 16), '^0*'))
       |    + (CASE WHEN substring(regexp_replace(substring(h, ${pre + 1}, 16),
       |                 '^0+', ''), 1, 1)
       |              IN ('8','9','a','b','c','d','e','f') THEN 0
       |            WHEN substring(regexp_replace(substring(h, ${pre + 1}, 16),
       |                 '^0+', ''), 1, 1) IN ('4','5','6','7') THEN 1
       |            WHEN substring(regexp_replace(substring(h, ${pre + 1}, 16),
       |                 '^0+', ''), 1, 1) IN ('2','3') THEN 2
       |            ELSE 3 END) + 1""".stripMargin

  /** SQL: per-group estimate from a `(node, bucket, r)` register CTE —
    * the [[keyedEstimateFromRegisters]] arithmetic verbatim. CTE names
    * take `prefix` so several estimates can share one WITH list; a
    * nonempty `resultCte` wraps the final SELECT as one more CTE
    * (composable form) instead of ending the statement. */
  def keyedEstimateSql(regsCte: String, groupAlias: String, p: Int,
                       prefix: String = "", resultCte: String = ""): String = {
    require(p % 4 == 0 && p >= 4 && p <= 24)
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sel =
      s"""SELECT node AS $groupAlias, CAST(${1L << p} AS BIGINT) AS m,
         |  v_nonzero, zsum40,
         |  round((CASE WHEN raw <= CAST(2.5 AS DOUBLE) * CAST($m AS DOUBLE)
         |           AND v_empty > 0
         |         THEN CAST($m AS DOUBLE)
         |           * ln(CAST($m AS DOUBLE) / v_empty) ELSE raw END) + 1e-9, 4)
         |    AS estimate
         |FROM ${prefix}est""".stripMargin
    s"""${prefix}agg AS (SELECT node, count(*) AS v_nonzero,
       |    CAST(sum(CAST(floor(power(2.0, 40 - r)) AS BIGINT)) AS BIGINT)
       |      AS zsum40
       |  FROM $regsCte GROUP BY 1),
       |${prefix}est AS (SELECT node, v_nonzero, zsum40,
       |    CAST($alpha AS DOUBLE) * CAST($m AS DOUBLE) * CAST($m AS DOUBLE)
       |      / (CAST(zsum40 AS DOUBLE) / power(2.0, 40)
       |         + (CAST($m AS DOUBLE) - CAST(v_nonzero AS DOUBLE))) AS raw,
       |    CAST($m AS DOUBLE) - CAST(v_nonzero AS DOUBLE) AS v_empty
       |  FROM ${prefix}agg)
       |""".stripMargin +
      (if (resultCte.isEmpty) sel
       else s",\n$resultCte AS (\n$sel)")
  }

  /** Per-group estimates: one row per distinct `groupCol` value —
    * (group, m, v_nonzero, zsum40, estimate). The production shape
    * (distinct users per day/segment/shard): register state is ≤ m
    * rows PER GROUP, so combine state is bounded by groups·m — still
    * key-cardinality-independent — and the whole thing is ONE scan +
    * one (group, bucket)-keyed aggregate + one group aggregate. */
  def groupedEstimate(items: DataFrame, groupCol: String, keyCol: String,
                      p: Int = 12): DataFrame = {
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val (bucket, rank) = hashCols(keyCol, p)
    items
      .select(col(groupCol), bucket.as("bucket"), rank.as("rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rank")).as("r"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("v_nonzero"),
        sum(floor(pow(lit(2.0), lit(40) - col("r"))).cast("long")).as("zsum40"))
      .select(col(groupCol), lit(1L << p).as("m"), col("v_nonzero"),
        col("zsum40"),
        round(estimateExpr(col("zsum40"), col("v_nonzero"), m, alpha)
          + lit(1e-9), 4).as("estimate"))
  }

  private def estimateExpr(zsum40: Column, vNonzero: Column,
                           m: Double, alpha: Double): Column = {
    val z = zsum40.cast("double") / pow(lit(2.0), lit(40)) +
      (lit(m) - vNonzero.cast("double"))
    val raw = lit(alpha) * lit(m) * lit(m) / z
    val vEmpty = lit(m) - vNonzero.cast("double")
    when(raw <= lit(2.5) * lit(m) && vEmpty > 0,
      lit(m) * log(lit(m) / vEmpty)).otherwise(raw)
  }

  /** DuckDB SQL computing the identical per-group estimates; the
    * group output column is named `groupAlias` (match the Spark
    * frame's group column). */
  def groupedOracleSql(from: String, groupExpr: String, groupAlias: String,
                       keyExpr: String, p: Int = 12): String = {
    require(p % 4 == 0 && p >= 4 && p <= 24)
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val pre = p / 4
    s"""WITH h AS (SELECT $groupExpr AS g,
       |    md5(CAST($keyExpr AS VARCHAR)) AS h FROM $from),
       |rk AS (SELECT g, substring(h, 1, $pre) AS bucket,
       |    4 * length(regexp_extract(substring(h, $pre + 1, 16), '^0*'))
       |    + (CASE WHEN substring(regexp_replace(substring(h, $pre + 1, 16),
       |                 '^0+', ''), 1, 1)
       |              IN ('8','9','a','b','c','d','e','f') THEN 0
       |            WHEN substring(regexp_replace(substring(h, $pre + 1, 16),
       |                 '^0+', ''), 1, 1) IN ('4','5','6','7') THEN 1
       |            WHEN substring(regexp_replace(substring(h, $pre + 1, 16),
       |                 '^0+', ''), 1, 1) IN ('2','3') THEN 2
       |            ELSE 3 END) + 1 AS rank
       |  FROM h),
       |regs AS (SELECT g, bucket, max(rank) AS r FROM rk GROUP BY 1, 2),
       |agg AS (SELECT g, count(*) AS v_nonzero,
       |    CAST(sum(CAST(floor(power(2.0, 40 - r)) AS BIGINT)) AS BIGINT)
       |      AS zsum40
       |  FROM regs GROUP BY 1),
       |est AS (SELECT g, v_nonzero, zsum40,
       |    CAST($alpha AS DOUBLE) * CAST($m AS DOUBLE) * CAST($m AS DOUBLE)
       |      / (CAST(zsum40 AS DOUBLE) / power(2.0, 40)
       |         + (CAST($m AS DOUBLE) - CAST(v_nonzero AS DOUBLE))) AS raw,
       |    CAST($m AS DOUBLE) - CAST(v_nonzero AS DOUBLE) AS v_empty
       |  FROM agg)
       |SELECT g AS $groupAlias, CAST(${1L << p} AS BIGINT) AS m,
       |  v_nonzero, zsum40,
       |  round((CASE WHEN raw <= CAST(2.5 AS DOUBLE) * CAST($m AS DOUBLE)
       |           AND v_empty > 0
       |         THEN CAST($m AS DOUBLE)
       |           * ln(CAST($m AS DOUBLE) / v_empty) ELSE raw END) + 1e-9, 4)
       |    AS estimate
       |FROM est""".stripMargin
  }

  /** DuckDB SQL computing the identical one-row estimate over
    * `SELECT <keyExpr> AS k FROM <from>`. */
  def oracleSql(from: String, keyExpr: String, p: Int = 12): String = {
    require(p % 4 == 0 && p >= 4 && p <= 24)
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val pre = p / 4
    s"""WITH h AS (SELECT md5(CAST($keyExpr AS VARCHAR)) AS h FROM $from),
       |rk AS (SELECT substring(h, 1, $pre) AS bucket,
       |    4 * length(regexp_extract(substring(h, $pre + 1, 16), '^0*'))
       |    + (CASE WHEN substring(regexp_replace(substring(h, $pre + 1, 16),
       |                 '^0+', ''), 1, 1)
       |              IN ('8','9','a','b','c','d','e','f') THEN 0
       |            WHEN substring(regexp_replace(substring(h, $pre + 1, 16),
       |                 '^0+', ''), 1, 1) IN ('4','5','6','7') THEN 1
       |            WHEN substring(regexp_replace(substring(h, $pre + 1, 16),
       |                 '^0+', ''), 1, 1) IN ('2','3') THEN 2
       |            ELSE 3 END) + 1 AS rank
       |  FROM h),
       |regs AS (SELECT bucket, max(rank) AS r FROM rk GROUP BY 1),
       |agg AS (SELECT count(*) AS v_nonzero,
       |    CAST(sum(CAST(floor(power(2.0, 40 - r)) AS BIGINT)) AS BIGINT)
       |      AS zsum40
       |  FROM regs),
       |est AS (SELECT v_nonzero, zsum40,
       |    CAST($alpha AS DOUBLE) * CAST($m AS DOUBLE) * CAST($m AS DOUBLE)
       |      / (CAST(zsum40 AS DOUBLE) / power(2.0, 40)
       |         + (CAST($m AS DOUBLE) - CAST(v_nonzero AS DOUBLE))) AS raw,
       |    CAST($m AS DOUBLE) - CAST(v_nonzero AS DOUBLE) AS v_empty
       |  FROM agg)
       |SELECT CAST(${1L << p} AS BIGINT) AS m, v_nonzero, zsum40,
       |  round((CASE WHEN raw <= CAST(2.5 AS DOUBLE) * CAST($m AS DOUBLE)
       |           AND v_empty > 0
       |         THEN CAST($m AS DOUBLE)
       |           * ln(CAST($m AS DOUBLE) / v_empty) ELSE raw END) + 1e-9, 4)
       |    AS estimate
       |FROM est""".stripMargin
  }
}
