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
  * converge in O(log n) rounds; fixed-K min-propagation is chosen
  * here because a second engine can replay it exactly as K chained
  * CTEs, keeping the output hash-checkable end to end.)
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
    var labels = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
      .localCheckpoint()
    (1 to k).foreach { i =>
      val nbrMin = edges
        .join(labels.select($"node".as("src"), $"label".as("slabel")), "src")
        .groupBy($"dst".as("node")).agg(min($"slabel").as("nbr"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select($"node", least($"label", coalesce($"nbr", $"label")).as("label"))
      if (i % 2 == 0 || i == k) labels = labels.localCheckpoint()
    }
    labels
  }

  /** DuckDB CTE chain replaying [[run]] on an `edges(src, dst)` CTE the
    * caller prepends: emits `nodes, l_0 … l_K`; select from `l_$k`. */
  def oracleSqlSuffix(k: Int): String = {
    val rounds = (0 until k).map { i =>
      s"""l_${i + 1} AS (
         |  SELECT n.node, least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM l_$i n LEFT JOIN (
         |    SELECT e.dst AS node, min(p.label) AS nbr
         |    FROM edges e JOIN l_$i p ON p.node = e.src GROUP BY 1) m
         |  USING (node))""".stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT DISTINCT src AS node FROM edges),
       |l_0 AS (SELECT node, node AS label FROM nodes),
       |$rounds""".stripMargin
  }
}
