package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983; the
  * distributed formulation of Montresor et al. 2013 simplified to
  * synchronous rounds): repeatedly delete every node of degree < k
  * until the remainder — the k-core — is stable. The k-core is the
  * standard "dense enough to matter" graph filter: spam/bot rings,
  * community cores, and feature pruning all start from it.
  *
  * Contract: `edges` is SYMMETRIZED (both directions present, no
  * self-loops), like [[Components]] — then out-degree per `src` IS the
  * node degree. Each round is one degree aggregate (map-side combined)
  * + a semi-join of the edge list against surviving nodes on each
  * endpoint — two hash joins co-partitioned on the edge keys. Cost per
  * round is proportional to the SURVIVING edge set, which shrinks
  * monotonically; `localCheckpoint` every other round bounds lineage
  * (the PageRank cadence, measured there).
  *
  * Fixed `rounds` (not a loop-until-fixpoint) keeps the operator
  * replayable as chained oracle CTEs — the g16/m11 convention; the
  * caller pins "rounds reaches the fixpoint" in a spec (KCoreSpec) the
  * same way ComponentsSpec does for WCC. Peeling converges in at most
  * the degeneracy-ordering depth, which is ≪ node count on real
  * graphs (each round removes EVERY sub-k node simultaneously).
  */
object KCore {

  /** Surviving (node, deg) rows of the k-core after `rounds` peels.
    * `deg` is the node's degree WITHIN the core (≥ k at fixpoint). */
  def run(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var e = edges.select(col("src"), col("dst"))
    for (i <- 1 to rounds) {
      val alive = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      e = e.join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .select(col("src"), col("dst"))
      if (i % 2 == 0 && i < rounds) e = e.localCheckpoint()
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Peeling trajectory: one row per round — (round, n_nodes,
    * n_edges) of the surviving core after that round. The trajectory
    * is the operative DIAGNOSTIC of k-core peeling (how fast the
    * cascade collapses, and whether a stable core survives) and stays
    * meaningful on any graph — including near-uniform ones whose
    * k-core is all-or-nothing, where the final-core shape alone would
    * read as trivially full or trivially empty. Each round is
    * `localCheckpoint`ed (caps lineage depth at one round), then both
    * counts come from ONE combined aggregate over the checkpointed
    * edge set (round-11: was distinct().count() + count() — two full
    * jobs; the fold halves the per-round action overhead on the
    * SHRINKING edge set). `n_edges` counts undirected edges
    * (directed/2). */
  def profile(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges.select(col("src"), col("dst"))
    val rows = (1 to rounds).map { i =>
      val alive = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      e = e.join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val c = e.agg(count_distinct(col("src")).as("n"),
        count(lit(1)).as("m")).head()
      (i.toLong, c.getLong(0), c.getLong(1) / 2)
    }
    rows.toDF("round", "n_nodes", "n_edges")
  }

  /** Chained-CTE oracle suffix replaying the identical `rounds` peels.
    * Expects a CTE `edges(src, dst)` (symmetrized); emits CTE bodies
    * `e_1, ..., e_R` — the caller's final SELECT reads `e_$rounds`
    * (or each `e_i` for the [[profile]] trajectory). `kSql` names a
    * one-row CTE `(k)` holding the threshold, cross-joined in (pass
    * `"(SELECT 3 AS k)"` for a literal).
    *
    * Each round is expressed with WINDOW degree counts over the
    * symmetrized edge list — count(*) per src partition IS the
    * endpoint degree — so every CTE references its predecessor
    * EXACTLY ONCE. The first (join-shaped) formulation referenced it
    * four times, and an engine that inlines rather than materializes
    * multi-referenced CTEs (DuckDB's planner does for these) expands
    * that into 4^R re-evaluations of the base edge build — the
    * textbook exponential-CTE trap; the window form is linear by
    * construction. */
  def oracleSqlSuffix(kSql: String, rounds: Int): String =
    (1 to rounds).map { i =>
      val prev = if (i == 1) "edges" else s"e_${i - 1}"
      s"""e_$i AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      count(*) OVER (PARTITION BY src) AS ds,
         |      count(*) OVER (PARTITION BY dst) AS dd
         |    FROM $prev), $kSql kv$i
         |  WHERE ds >= kv$i.k AND dd >= kv$i.k)""".stripMargin
    }.mkString(",\n")

  def oracleSqlSuffix(k: Int, rounds: Int): String =
    oracleSqlSuffix(s"(SELECT $k AS k)", rounds)
}
