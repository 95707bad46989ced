package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over an id-oriented undirected edge list
  * (`ka < kb` — each triangle generated exactly once as a < b < c via
  * the standard wedge join). Wedge work is bounded by Σ deg²; at
  * cluster scale the classic refinement — orient edges low-degree →
  * high-degree instead of by id — drops the bound to O(m^1.5) without
  * changing counts (the declared query keeps id orientation so its
  * SQL oracle is byte-identical). */
object Triangles {

  /** Triangle corner rows (a, b, c), a < b < c. */
  def enumerate(und: DataFrame): DataFrame = {
    val e = und.select(col("ka"), col("kb"))
      .localCheckpoint() // read by three join branches
    e.as("ab")
      .join(e.as("bc"), col("ab.kb") === col("bc.ka"))
      .join(e.as("ac"),
        col("ac.ka") === col("ab.ka") && col("ac.kb") === col("bc.kb"))
      .select(col("ab.ka").as("a"), col("ab.kb").as("b"),
        col("bc.kb").as("c"))
  }

  /** Per-node triangle participation counts (nodes in ≥ 1 triangle). */
  def perNode(und: DataFrame): DataFrame = {
    val tri = enumerate(und)
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
