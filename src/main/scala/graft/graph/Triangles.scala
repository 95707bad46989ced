package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over an undirected edge list in canonical
  * `ka < kb` form, via the DEGREE-ORIENTED wedge join (Chiba–Nishizeki
  * orientation, the Schank–Wagner forward algorithm): each edge is
  * directed from its lower-(degree, id) endpoint to its
  * higher-(degree, id) endpoint, wedges are generated only from a
  * node's OUT-neighbors, and the closing edge is probed in the same
  * orientation. Every triangle's three nodes are totally ordered by
  * (degree, id), so it is generated exactly once — counts are
  * identical to the naive id-oriented join (orientation is
  * count-invariant, which is why the m12 SQL oracle is unchanged).
  *
  * Why orientation matters at scale: wedge work is Σ out-deg², and
  * degree orientation bounds every out-degree by O(√m), giving
  * O(m^1.5) total — on a skewed graph a single id-oriented hub of
  * degree d generates d²/2 wedges where degree orientation generates
  * ZERO from the hub (all its edges point inward). TrianglesSpec pins
  * exactly that hub-and-spoke separation via [[wedgeCount]].
  */
object Triangles {

  /** Direct each canonical edge from its smaller (degree, id) endpoint:
    * output (src, dst, dkey) with dkey = struct(deg(dst), dst) — the
    * wedge join orders out-neighbors by dkey so each triangle closes
    * once. Degrees come from one count aggregate over the edge list;
    * the two attach joins are node-keyed and AQE-broadcastable when
    * the degree table is small. */
  private def orientByDegree(e: DataFrame): DataFrame = {
    val deg = e.select(col("ka").as("node"))
      .unionAll(e.select(col("kb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val aFirst =
      struct(col("da"), col("ka")) < struct(col("db"), col("kb"))
    e.join(deg.select(col("node").as("ka"), col("deg").as("da")), "ka")
      .join(deg.select(col("node").as("kb"), col("deg").as("db")), "kb")
      .select(
        when(aFirst, col("ka")).otherwise(col("kb")).as("src"),
        when(aFirst, col("kb")).otherwise(col("ka")).as("dst"),
        when(aFirst, struct(col("db").as("d"), col("kb").as("n")))
          .otherwise(struct(col("da").as("d"), col("ka").as("n")))
          .as("dkey"))
  }

  /** Triangle corner rows (a, b, c), a < b < c (id order — the output
    * contract is orientation-independent). */
  def enumerate(und: DataFrame): DataFrame = {
    val o = orientByDegree(und.select(col("ka"), col("kb")))
      .localCheckpoint() // read by both wedge branches + the closer
    o.as("e1")
      .join(o.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dkey") < col("e2.dkey"))
      .join(o.as("cl"),
        col("cl.src") === col("e1.dst") && col("cl.dst") === col("e2.dst"))
      .select(array_sort(
        array(col("e1.src"), col("e1.dst"), col("e2.dst"))).as("t"))
      .select(element_at(col("t"), 1).as("a"),
        element_at(col("t"), 2).as("b"), element_at(col("t"), 3).as("c"))
  }

  /** Per-node triangle participation counts (nodes in ≥ 1 triangle). */
  def perNode(und: DataFrame): DataFrame = {
    val tri = enumerate(und)
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Candidate-wedge count Σ C(out-deg, 2) under the chosen
    * orientation — the cost the wedge join actually pays. Exposed for
    * TrianglesSpec's skew pin: on a hub-and-spoke graph id orientation
    * pays C(spokes, 2) from the hub, degree orientation pays 0. */
  private[graft] def wedgeCount(und: DataFrame, byDegree: Boolean): Long = {
    val e = und.select(col("ka"), col("kb"))
    val srcs =
      if (byDegree) orientByDegree(e).select(col("src"))
      else e.select(col("ka").as("src"))
    val n = srcs.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(sum(col("d") * (col("d") - 1))).head.get(0)
    if (n == null) 0L else n.asInstanceOf[Long] / 2
  }
}
