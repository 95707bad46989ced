package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sim.Pq
import graft.text.TextOps

/** Distributed Lloyd's k-means with an ENGINE-PORTABLE deterministic
  * fit — the fully-oracle-checked counterpart of m2's MLlib KMeans
  * (whose seeded parallel init is not reproducible outside Spark, so
  * m2 is rows-only checkable). Portability comes from three choices,
  * each already proven elsewhere in the repo:
  *
  *  - init = the k corpus vectors FIRST in md5-hash order of their id
  *    (the [[Pq.codebook]] sample idiom) — no RNG;
  *  - fixed R rounds, each replayable as two chained CTEs (assign =
  *    argmin with ties to the smallest cid; update = per-dimension
  *    mean) — every CTE reference-linear (the m13 lesson);
  *  - centroids re-canonicalized r6 after EVERY update (the w26
  *    tiered-rounding idiom), so the next round's distances are
  *    computed from identical doubles on both engines even though the
  *    mean's summation order differs.
  *
  * Scale shape per round: one broadcast of k·D doubles against the
  * corpus scan + one (vec)-keyed argmin aggregate + one
  * (cid, dim)-keyed mean — the canonical distributed Lloyd's cost; no
  * all-pairs, no driver-side data motion. Empty clusters simply drop
  * out of the centroid frame (identically in the oracle).
  */
object PortableKMeans {

  /** Assignments after R update rounds: `(vec_id, cid, d2)` — each
    * vector with its final cluster and squared distance to that
    * centroid. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
             rounds: Int, dims: Int): DataFrame = {
    // the unpartitioned centroid-id window sees ≤ k rows (limit
    // precedes it); enforce the bound explicitly (r18 VERDICT item 6)
    require(k <= 65536,
      s"k $k: centroid-id rank window is single-partition")
    val h = TextOps.hash60(col(idCol).cast("string"))
    var centroids = corpus.orderBy(h, col(idCol)).limit(k)
      .withColumn("cid", row_number().over(Window.orderBy(h, col(idCol))) - 1)
      .select(col("cid"), col(vecCol).as("cvec"))
      .localCheckpoint()

    // Optimization note (round-20): an in-row argmin — pivot the k
    // centroids into one broadcast row, take array_min over k unrolled
    // distances, making assign map-only with no per-round corpus
    // shuffle — was MEASURED AND REJECTED: k·dims (8·64) unrolled
    // subtraction terms in one projection overflow janino's method
    // limit, whole-stage codegen falls back to interpreted execution
    // (CodegenMonitor: 16 fallbacks), and the bench line went 7.2 s →
    // 18.3 s. The explode + partial-aggregated groupBy(id) argmin
    // below keeps codegen whole; its shuffle is already reduced to one
    // row per vector by map-side partial aggregation.
    def assignTo(cent: DataFrame): DataFrame =
      corpus.crossJoin(broadcast(cent))
        .withColumn("d2", Pq.dist2Unrolled(col(vecCol), col("cvec"), dims))
        .groupBy(col(idCol))
        .agg(min(struct(col("d2"), col("cid"))).as("mn"),
          first(col(vecCol)).as("__v")) // constant per id — safe first()
        .select(col(idCol), col("mn.cid").as("cid"),
          col("mn.d2").as("d2"), col("__v"))

    for (_ <- 1 to rounds) {
      val a = assignTo(centroids)
      centroids = a
        .select(col("cid"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(graft.queries.Rx.r6(avg(col("x"))).as("av"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("av").as("a")))),
          s => s("a")).as("cvec"))
        .localCheckpoint()
    }
    assignTo(centroids)
      .select(col(idCol).as("vec_id"), col("cid"), col("d2"))
  }

  /** Chained-CTE replay of [[assign]] for a DuckDB oracle: expects an
    * `e(vec_id, v)` CTE in scope; defines `c_0 … c_$rounds` and
    * `a_1 … a_${rounds + 1}` (the final assignment). */
  def oracleSqlSuffix(k: Int, rounds: Int, dims: Int): String = {
    val d2 = (vec: String, cent: String) =>
      s"""list_reduce(list_prepend(0.0,
         |      list_transform(range(1, $dims + 1),
         |        i -> ($vec[i] - $cent[i]) * ($vec[i] - $cent[i]))),
         |      (acc, x) -> acc + x)""".stripMargin
    val init =
      s"""hs AS (SELECT vec_id, v,
         |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) AS h
         |  FROM e),
         |c_0 AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid,
         |    v AS cvec
         |  FROM hs ORDER BY h, vec_id LIMIT $k)""".stripMargin
    val steps = (1 to rounds + 1).map { i =>
      val a =
        s"""a_$i AS (SELECT vec_id, v, cid, d2 FROM (
           |    SELECT e.vec_id, e.v, c.cid,
           |      ${d2("e.v", "c.cvec")} AS d2,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${d2("e.v", "c.cvec")}, c.cid) AS rn
           |    FROM e, c_${i - 1} c) WHERE rn = 1)""".stripMargin
      if (i == rounds + 1) a
      else
        a + ",\n" +
          s"""c_$i AS (SELECT cid, list(av ORDER BY i) AS cvec FROM (
             |    SELECT cid, i, round(avg(v[i]) + 1e-9, 6) AS av
             |    FROM a_$i, range(1, $dims + 1) t(i) GROUP BY 1, 2)
             |  GROUP BY 1)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}
