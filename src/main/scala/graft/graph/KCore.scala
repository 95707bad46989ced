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
  * replayable as chained oracle CTEs — the g16/m11 convention — with
  * a HASH-PRESERVING fixpoint early-exit (the m6b/LouvainDist
  * pattern, ported round-14): a round that removes ZERO edges leaves
  * the edge set unchanged, so every later round of the deterministic
  * schedule recomputes the identical degrees and removes nothing —
  * provable no-ops, exactly like the oracle's extra CTE rounds, so
  * skipping them cannot change the output or the hash (KCoreSpec
  * proves exit ≡ full schedule). The check is one `count()` on the
  * round's already-checkpointed frame. Peeling converges in at most
  * the degeneracy-ordering depth, which is ≪ node count on real
  * graphs (each round removes EVERY sub-k node simultaneously) — and
  * with the exit free, a generous round budget costs nothing when
  * the cascade dries early.
  */
object KCore {

  /** Surviving (node, deg) rows of the k-core after up to `rounds`
    * peels — the loop stops early at fixpoint (zero removals; see the
    * object scaladoc for the hash-preservation argument). `deg` is
    * the node's degree WITHIN the core (≥ k at fixpoint);
    * `earlyExit = false` forces the full schedule (KCoreSpec's
    * equivalence baseline; keeps the cheaper every-other-round
    * checkpoint cadence of the pre-exit form). */
  def run(edges: DataFrame, k: Int, rounds: Int,
          earlyExit: Boolean = true): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var e = edges.select(col("src"), col("dst"))
    var prev = -1L
    var i = 1
    var fixed = false
    while (i <= rounds && !fixed) {
      val alive = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      e = e.join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .select(col("src"), col("dst"))
      if (earlyExit) {
        // checkpoint EVERY round so the exit check is a cheap count
        // on a materialized frame (the LouvainDist cadence)
        e = e.localCheckpoint()
        if (i < rounds) {
          val m = e.count()
          if (m == prev || m == 0L) fixed = true
          prev = m
        }
      } else if (i % 2 == 0 && i < rounds) e = e.localCheckpoint()
      i += 1
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
    * (directed/2).
    *
    * Fixpoint early-exit, trajectory-shaped (round-14): the output
    * contract is ONE ROW PER SCHEDULED ROUND, so the exit cannot drop
    * rows — instead, once a round's edge count matches the previous
    * round's (zero removals ⇒ every later round is a provable no-op
    * producing the identical counts), the remaining rows are emitted
    * as COPIES without running their joins. Byte-identical output —
    * the flat tail the oracle's no-op CTE rounds produce — at the
    * cost of only the pre-fixpoint rounds. */
  def profile(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges.select(col("src"), col("dst"))
    var prev = -1L
    var fixed = false
    var last = (0L, 0L)
    val rows = (1 to rounds).map { i =>
      if (!fixed) {
        val alive = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("src").as("node"))
        e = e.join(alive.select(col("node").as("src")), Seq("src"))
          .join(alive.select(col("node").as("dst")), Seq("dst"))
          .select(col("src"), col("dst"))
          .localCheckpoint()
        val c = e.agg(count_distinct(col("src")).as("n"),
          count(lit(1)).as("m")).head()
        if (c.getLong(1) == prev || c.getLong(1) == 0L) fixed = true
        prev = c.getLong(1)
        last = (c.getLong(0), c.getLong(1) / 2)
      }
      (i.toLong, last._1, last._2)
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
