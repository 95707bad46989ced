package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV / bottom-k theta sketch (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD 2007 "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations"), built CROSS-ENGINE REPRODUCIBLE like
  * [[Hll]]: the estimates themselves — not just row counts — survive a
  * value-hash gate against a SQL oracle.
  *
  * Why this exists next to [[Hll]]: HLL registers support union only
  * (max-merge, hll3). The bottom-k sketch retains the k smallest
  * distinct hash VALUES, and those values support the full multiset
  * algebra — union, intersection, Jaccard — because the retained set
  * is a uniform size-k sample of the union's distinct hashes:
  *
  *  - '''union''': bottom-k of (A ∪ B) = bottom-k of
  *    (retained(A) ∪ retained(B)) — any hash in the union's bottom-k
  *    is necessarily in its own set's bottom-k, so sketches merge
  *    without touching raw data (associative, like hll3).
  *  - '''Jaccard''': among the union's retained k hashes, the fraction
  *    also present in BOTH inputs is an unbiased estimate of
  *    |A∩B|/|A∪B| (a k-sample of the union, hypergeometric error
  *    ~1/√k).
  *  - '''intersection''': Jaccard × union estimate (the Beyer et al.
  *    composed estimator).
  *
  * Reproducibility contract (the [[Hll]] decisions, re-applied):
  *  - '''hash''': first 13 hex chars of `md5(cast(key as string))` as
  *    a non-negative long in [0, 2^52) — below 2^53, so the long→
  *    double conversion in the estimator is EXACT on every engine (no
  *    round-to-nearest divergence; the [[graft.text.TextOps.hash60]]
  *    idiom, two hex digits narrower).
  *  - '''retained set''': bottom-k DISTINCT hashes per group through
  *    the bounded-heap aggregate DIRECTLY ([[graft.operators.TopK]]
  *    .perKey — the o6 operator, not the window idiom, so the heap
  *    plan holds in ANY session, extensions registered or not), so
  *    combine state is ≤ k values per group per partition (map-side
  *    partial heaps), never the key cardinality.
  *  - '''estimator''': exact count when fewer than k distinct hashes
  *    exist (the retained set IS the distinct set); otherwise the
  *    unbiased (k−1)·2^52 / h_(k) with h_(k) the k-th smallest hash
  *    (both operands exactly double-representable, one IEEE multiply
  *    and divide — bit-identical across engines). RSE ≈ 1/√(k−2).
  *
  * At 100 TB: exact `count(distinct)` / exact set intersection carry
  * combine state proportional to KEY CARDINALITY (billions of ids) and
  * a full shuffle of distinct keys; the sketch's combine state is ≤ k
  * values per (group, partition), the shuffle ≤ k·groups rows, and
  * cross-corpus overlap questions (crawl-snapshot overlap, segment
  * audience overlap, corpus-contamination estimates) become broadcast
  * joins of k-row register frames. ThetaKmvSpec pins the accuracy
  * contract and the merge-equals-direct property.
  */
object ThetaKmv {

  /** Hash space size 2^52 as an (exactly representable) double. */
  val M: Double = 4503599627370496.0

  /** Stable 52-bit hash: first 13 hex chars of md5 as a non-negative
    * long. Portable: DuckDB `('0x'||substr(md5(x),1,13))::BIGINT`. */
  def hash52(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 13), 16, 10).cast("long")

  /** DuckDB rendering of [[hash52]]. */
  def hash52Sql(expr: String): String =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 13))::BIGINT"

  /** Bottom-k distinct-hash registers per group: `(g string, h long,
    * rn int)` with rn = 1..k ascending by h. Goes straight through the
    * bounded-heap aggregate (TopK.perKey, the o6 operator) — the
    * O(groups·k) partial-heap plan with no window sort and no
    * dependence on the optimizer-rule registration — and rows are
    * unique per (g, h) after the distinct, so ascending-h is
    * tie-free. */
  def registers(items: DataFrame, groupCol: String, keyCol: String,
                k: Int): DataFrame = {
    require(k > 1 && k <= graft.operators.TopK.MaxHeapK,
      s"k must be in (1, ${graft.operators.TopK.MaxHeapK}], got $k")
    val d = items
      .select(col(groupCol).cast("string").as("g"),
        hash52(col(keyCol)).as("h"))
      .distinct()
    graft.operators.TopK.perKey(d, Seq("g"), Seq(col("h")), k, rankCol = "rn")
      .select(col("g"), col("h"), col("rn"))
  }

  /** Distinct estimate per group from a [[registers]] frame:
    * `(g string, n_ret bigint, est_distinct double r4)`. */
  def estimateFromRegisters(regs: DataFrame, k: Int): DataFrame =
    regs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_ret"),
        max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("g"), col("n_ret"),
        graft.queries.Rx.r4(estExpr(col("n_ret"), col("hk"), k))
          .as("est_distinct"))

  /** One-scan grouped distinct estimate. */
  def estimate(items: DataFrame, groupCol: String, keyCol: String,
               k: Int): DataFrame =
    estimateFromRegisters(registers(items, groupCol, keyCol, k), k)

  /** The branch-exact estimator: exact below capacity, (k−1)·M/h_(k)
    * at capacity. `greatest(hk,1)` guards the measure-zero h=0 hash
    * (identically on both engines). */
  private def estExpr(nRet: Column, hk: Column, k: Int): Column =
    when(nRet < k, nRet.cast("double"))
      .otherwise(lit((k - 1).toDouble * M) / greatest(hk, lit(1L))
        .cast("double"))

  private def estSqlExpr(nRet: String, hk: String, k: Int): String =
    s"CASE WHEN $nRet < $k THEN CAST($nRet AS DOUBLE) " +
      s"ELSE ${(k - 1).toDouble * M} / CAST(greatest($hk, 1) AS DOUBLE) END"

  /** DuckDB oracle for a grouped distinct estimate over `from`
    * (mirrors [[estimate]]; also the batch truth st27's streaming
    * register path must land on exactly). */
  def groupedEstimateSql(from: String, groupExpr: String, keyExpr: String,
                         k: Int): String =
    s"""WITH regs AS (
       |  SELECT g, h, rn FROM (
       |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT CAST($groupExpr AS VARCHAR) AS g,
       |                 ${hash52Sql(keyExpr)} AS h FROM $from))
       |  WHERE rn <= $k),
       |a AS (
       |  SELECT g, count(*) AS n_ret,
       |    max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM regs GROUP BY 1)
       |SELECT g, n_ret,
       |  round(${estSqlExpr("n_ret", "hk", k)} + 1e-9, 4) AS est_distinct
       |FROM a""".stripMargin

  /** Pairwise set-overlap estimates between every unordered pair of
    * groups: `(ga, gb, n_common bigint, jaccard double r6, est_union
    * double r4, est_intersection double r4)` for ga < gb.
    *
    * Shape at scale: the per-group register build is the bounded-heap
    * aggregate; the tiny (≤ groups²/2 row) pair list broadcasts onto
    * the k·groups register rows; the pair-union bottom-k is again the
    * heap aggregate. No stage touches raw keys twice. */
  def pairwiseOverlap(items: DataFrame, groupCol: String, keyCol: String,
                      k: Int): DataFrame = {
    val regs = registers(items, groupCol, keyCol, k).select("g", "h")
    val gs = regs.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("ga"))
      .join(gs.select(col("g").as("gb")), col("ga") < col("gb"))
    val contrib = regs.join(broadcast(pairs), col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("h"),
        lit(1).as("ia"), lit(0).as("ib"))
      .unionByName(
        regs.join(broadcast(pairs), col("g") === col("gb"))
          .select(col("ga"), col("gb"), col("h"),
            lit(0).as("ia"), lit(1).as("ib")))
    val merged = contrib.groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val kk = graft.operators.TopK.perKey(
      merged, Seq("ga", "gb"), Seq(col("h")), k, rankCol = "rn")
    val agg = kk.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_ret"),
        max(when(col("rn") === k, col("h"))).as("hk"),
        sum(col("ia") * col("ib")).as("n_common"))
    agg.select(col("ga"), col("gb"), col("n_common"),
      graft.queries.Rx.r6(col("n_common").cast("double") /
        col("n_ret").cast("double")).as("jaccard"),
      graft.queries.Rx.r4(estExpr(col("n_ret"), col("hk"), k))
        .as("est_union"),
      graft.queries.Rx.r4(
        (col("n_common").cast("double") / col("n_ret").cast("double")) *
          estExpr(col("n_ret"), col("hk"), k)).as("est_intersection"))
  }

  /** Merge-vs-direct comparison (the hll3 associativity argument, for
    * bottom-k): per-group registers max-merged into one sketch MUST
    * retain exactly the same k hashes as a sketch built directly over
    * all keys — any hash in the global bottom-k is in its own group's
    * bottom-k, so nothing the merge needs was discarded. Emits one row
    * `(n_ret_direct, est_direct, n_ret_merged, est_merged, diff)`
    * with diff structurally 0.0; the oracle replays BOTH paths. */
  def mergeVsDirect(items: DataFrame, groupCol: String, keyCol: String,
                    k: Int): DataFrame = {
    val per = registers(items, groupCol, keyCol, k).select("g", "h")
    val merged = graft.operators.TopK.perKey(
      per.select(lit("all").as("g"), col("h")).distinct(),
      Seq("g"), Seq(col("h")), k, rankCol = "rn")
    val direct = registers(
      items.withColumn("__all", lit("all")), "__all", keyCol, k)
    val de = estimateFromRegisters(direct, k)
      .select(col("n_ret").as("n_ret_direct"),
        col("est_distinct").as("est_direct"))
    val me = estimateFromRegisters(merged, k)
      .select(col("n_ret").as("n_ret_merged"),
        col("est_distinct").as("est_merged"))
    de.crossJoin(broadcast(me))
      .withColumn("diff",
        graft.queries.Rx.r4(col("est_direct") - col("est_merged")))
  }

  /** DuckDB oracle for [[pairwiseOverlap]] over `from`, grouping by
    * `groupExpr`, keying by `keyExpr`. */
  def pairwiseSql(from: String, groupExpr: String, keyExpr: String,
                  k: Int): String = {
    s"""WITH regs AS (
       |  SELECT g, h FROM (
       |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT CAST($groupExpr AS VARCHAR) AS g,
       |                 ${hash52Sql(keyExpr)} AS h FROM $from))
       |  WHERE rn <= $k),
       |gs AS (SELECT DISTINCT g FROM regs),
       |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g),
       |contrib AS (
       |  SELECT p.ga, p.gb, r.h, 1 AS ia, 0 AS ib
       |  FROM regs r JOIN pairs p ON r.g = p.ga
       |  UNION ALL
       |  SELECT p.ga, p.gb, r.h, 0 AS ia, 1 AS ib
       |  FROM regs r JOIN pairs p ON r.g = p.gb),
       |merged AS (
       |  SELECT ga, gb, h, max(ia) AS ia, max(ib) AS ib
       |  FROM contrib GROUP BY 1, 2, 3),
       |kk AS (
       |  SELECT * FROM (
       |    SELECT ga, gb, h, ia, ib,
       |      row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
       |    FROM merged)
       |  WHERE rn <= $k),
       |agg AS (
       |  SELECT ga, gb, count(*) AS n_ret,
       |    max(CASE WHEN rn = $k THEN h END) AS hk,
       |    CAST(sum(ia * ib) AS BIGINT) AS n_common
       |  FROM kk GROUP BY 1, 2)
       |SELECT ga, gb, n_common,
       |  round(CAST(n_common AS DOUBLE) / CAST(n_ret AS DOUBLE) + 1e-9, 6)
       |    AS jaccard,
       |  round(${estSqlExpr("n_ret", "hk", k)} + 1e-9, 4) AS est_union,
       |  round(CAST(n_common AS DOUBLE) / CAST(n_ret AS DOUBLE) *
       |        (${estSqlExpr("n_ret", "hk", k)}) + 1e-9, 4)
       |    AS est_intersection
       |FROM agg""".stripMargin
  }

  /** DuckDB oracle for a two-path merge-vs-direct comparison (see
    * th2_theta_merge): per-`groupExpr` registers max-merged into one
    * sketch vs one sketch built directly over all keys. Emits one row
    * `(n_ret_direct, est_direct, n_ret_merged, est_merged, diff)`. */
  def mergeSql(from: String, groupExpr: String, keyExpr: String,
               k: Int): String = {
    s"""WITH per AS (
       |  SELECT g, h FROM (
       |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT CAST($groupExpr AS VARCHAR) AS g,
       |                 ${hash52Sql(keyExpr)} AS h FROM $from))
       |  WHERE rn <= $k),
       |mg AS (
       |  SELECT h FROM (
       |    SELECT h, row_number() OVER (ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT h FROM per))
       |  WHERE rn <= $k),
       |ma AS (
       |  SELECT count(*) AS n_ret, max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM mg)),
       |dr AS (
       |  SELECT h FROM (
       |    SELECT h, row_number() OVER (ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT ${hash52Sql(keyExpr)} AS h FROM $from))
       |  WHERE rn <= $k),
       |da AS (
       |  SELECT count(*) AS n_ret, max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM dr)),
       |sel AS (
       |  SELECT da.n_ret AS n_ret_direct,
       |    round(${estSqlExpr("da.n_ret", "da.hk", k)} + 1e-9, 4)
       |      AS est_direct,
       |    ma.n_ret AS n_ret_merged,
       |    round(${estSqlExpr("ma.n_ret", "ma.hk", k)} + 1e-9, 4)
       |      AS est_merged
       |  FROM da, ma)
       |SELECT n_ret_direct, est_direct, n_ret_merged, est_merged,
       |  round(est_direct - est_merged + 1e-9, 4) AS diff
       |FROM sel""".stripMargin
  }
}
