package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by K rounds of min-label propagation — the
  * iterative component operator in its oracle-expressible form (the
  * [[PageRank]] convention): label_0(v) = v; label_{i+1}(v) =
  * min(label_i(v), min over in-neighbors u of label_i(u)). After
  * k ≥ graph diameter rounds every node carries its component's min
  * id — the weakly-connected-components fixpoint (callers verify
  * convergence by comparing round k to k−1, see ComponentsSpec; the
  * declared query pins it on the panel graph).
  *
  * Scale shape: each round is ONE edge-keyed shuffle join (edge list
  * against the node-sized label frame) plus one destination-keyed
  * min aggregate — the canonical Pregel round — with the label frame
  * localCheckpoint'ed on a depth-2 cadence so lineage stays linear.
  * No driver-side iteration state; the only driver decision is the
  * fixed round count. (Production WCC uses large-star/small-star to
  * converge in O(log n) rounds — implemented here as [[runStars]],
  * spec-pinned equivalent; fixed-K min-propagation remains the
  * DECLARED form because a second engine can replay it exactly as K
  * chained CTEs, keeping the output hash-checkable end to end.)
  */
object Components {

  /** @param edges (src, dst), BOTH directions present for undirected
    *              graphs — the node set is derived from edge sources
    *              (the [[PageRank.run]] contract).
    * @return (node, label) after `k` rounds; label = component min id
    *         once k ≥ diameter. */
  def run(edges: DataFrame, k: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // loop constant keyed on the per-round join key (round-20)
    val e = graft.operators.LoopFrames.keyed(edges, "src")
    var labels = e.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
      .localCheckpoint()
    (1 to k).foreach { i =>
      val nbrMin = e
        .join(labels.select($"node".as("src"), $"label".as("slabel")), "src")
        .groupBy($"dst".as("node")).agg(min($"slabel").as("nbr"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select($"node", least($"label", coalesce($"nbr", $"label")).as("label"))
      if (i % 2 == 0 || i == k) labels = labels.localCheckpoint()
    }
    labels
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al. 2014) — the O(log n)-round PRODUCTION
    * path [[run]]'s scaladoc promises: min-propagation needs
    * diameter-many rounds (a 1000-hop chain in 100 TB of web graph =
    * 1000 shuffles), star contraction collapses the same chain in
    * ~log² n rounds because every round re-points whole neighborhoods
    * at their minimum, not just adjacent nodes.
    *
    * Round = large-star (every strictly-larger neighbor of u re-points
    * to m = min(Γ(u) ∪ {u})) then small-star (grouped by the LARGER
    * endpoint u, its smaller neighbors and u itself re-point to their
    * minimum). Both are one groupBy + one join over the current edge
    * set, which only ever shrinks toward the star forest. At the
    * fixpoint every non-root carries exactly one edge to its component
    * minimum.
    *
    * Not SQL-replayable in bounded CTEs (per-round DISTINCT over a
    * mutating pair set), so the declared WCC query stays on [[run]] —
    * this is the scale path, pinned equivalent to [[run]]'s fixpoint in
    * ComponentsSpec (chain fixture where min-propagation at the same
    * round budget is provably NOT converged, plus the real panel
    * graph).
    *
    * @param edges (src, dst), both directions present (the [[run]]
    *              contract); self-loops ignored.
    * @return (node, label), label = component min id at the fixpoint. */
  def runStars(edges: DataFrame, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nodes = edges.select($"src".as("node")).distinct().localCheckpoint()
    var e = edges
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct().localCheckpoint()
    (1 to rounds).foreach { _ =>
      val sym = e.select($"a".as("u"), $"b".as("v"))
        .unionByName(e.select($"b".as("u"), $"a".as("v")))
      val lm = sym.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      val ls = sym.join(lm, "u").filter($"v" > $"u")
        .select(least($"v", $"m").as("a"), greatest($"v", $"m").as("b"))
        .filter($"a" =!= $"b").distinct()
      val sm = ls.groupBy($"b").agg(min($"a").as("m"))
        .select($"b".as("u"), $"m")
      val ss = ls.select($"b".as("u"), $"a".as("v")).join(sm, "u")
      e = ss.filter($"v" =!= $"m").select($"v".as("x"), $"m")
        .unionByName(ss.select($"u".as("x"), $"m"))
        .select(least($"x", $"m").as("a"), greatest($"x", $"m").as("b"))
        .filter($"a" =!= $"b").distinct()
        .localCheckpoint()
    }
    val parent = e.select($"b".as("node"), $"a".as("label"))
      .groupBy($"node").agg(min($"label").as("label"))
    nodes.join(parent, Seq("node"), "left")
      .select($"node", coalesce($"label", $"node").as("label"))
  }

  /** DuckDB CTE chain replaying [[run]] on an `edges(src, dst)` CTE the
    * caller prepends: emits `nodes, l_0 … l_K`; select from `l_$k`. */
  def oracleSqlSuffix(k: Int): String = {
    // AS MATERIALIZED is load-bearing (round-19): each l_i references
    // l_{i−1} TWICE, and DuckDB's planner inlines rather than
    // materializes these — without the keyword the evaluation tree
    // doubles per round (2^k re-evaluations of the whole upstream
    // graph build; g16_wcc's 8-round oracle measured 425s at sf0.01,
    // 0.5s materialized). The per-round frames are node-sized — tiny.
    val rounds = (0 until k).map { i =>
      s"""l_${i + 1} AS MATERIALIZED (
         |  SELECT n.node, least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM l_$i n LEFT JOIN (
         |    SELECT e.dst AS node, min(p.label) AS nbr
         |    FROM edges e JOIN l_$i p ON p.node = e.src GROUP BY 1) m
         |  USING (node))""".stripMargin
    }.mkString(",\n")
    s"""nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |l_0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
       |$rounds""".stripMargin
  }
}
