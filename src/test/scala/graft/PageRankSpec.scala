package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PageRank

/** PageRank semantics pins on closed-form graphs: uniform rank on a
  * symmetric ring, center dominance on a star, and conservation of
  * total mass (symmetric edge lists have no dangling nodes, so ranks
  * must sum to exactly the teleport+damping budget = 1). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def both(e: Seq[(Long, Long, Double)]) =
    (e ++ e.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")

  test("symmetric ring: uniform rank 1/N") {
    val n = 6L
    val ring = both((0L until n).map(i => (i, (i + 1) % n, 1.0)))
    val pr = PageRank.run(ring, k = 10, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(pr.size == n)
    pr.values.foreach(p => assert(math.abs(p - 1.0 / n) < 1e-12, pr))
  }

  test("star: center outranks every leaf; mass sums to 1") {
    val leaves = 1L to 8L
    val star = both(leaves.map(l => (0L, l, 1.0)))
    // convergence is geometric at rate d: 0.85^100 ≈ 4e-8 < the 1e-6
    // tolerance on the fixed-point comparison
    val pr = PageRank.run(star, k = 100, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val center = pr(0L)
    leaves.foreach(l => assert(center > pr(l) * 2, pr))
    // closed form at the fixed point: pr_c = (1-d)(1+dL) / (N(1-d^2))
    val (d, nN, lL) = (0.85, 9.0, 8.0)
    val expected = (1 - d) * (1 + d * lL) / (nN * (1 - d * d))
    assert(math.abs(center - expected) < 1e-6, s"center=$center expected=$expected")
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("weights matter: heavier edge pulls more rank") {
    // two leaves, one edge 3x the weight of the other
    val g = both(Seq((0L, 1L, 3.0), (0L, 2L, 1.0)))
    val pr = PageRank.run(g, k = 15, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(pr(1L) > pr(2L), pr)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("validateSymmetry: sink-only node fails fast, symmetric passes") {
    // 0→1 with no back edge: node 1 would silently drop from the node
    // set and leak its rank mass — the round-9 ADVICE contract gap
    val dangling = Seq((0L, 1L, 1.0)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      PageRank.run(dangling, k = 2, damping = 0.85,
        validateSymmetry = true)
    }
    assert(e.getMessage.contains("dst"))
    val ok = PageRank.run(both(Seq((0L, 1L, 1.0))), k = 2,
        damping = 0.85, validateSymmetry = true)
      .as[(Long, Double)].collect().toMap
    assert(ok.size == 2)
  }

  test("personalized rank decays with distance from the seed") {
    // path 1-2-3-4-5, seed {1}. The degree-1 seed forwards ALL its
    // walk mass to node 2, so ppr(2) can exceed ppr(1) — the honest
    // contract is decay BEYOND the seed's neighborhood plus the
    // seed dominating every non-adjacent node.
    val path = both(Seq((1L, 2L, 1.0), (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0)))
    val seeds = Seq(1L).toDF("node")
    val ppr = PageRank.runPersonalized(path, seeds, k = 20, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(ppr(2L) > ppr(3L) && ppr(3L) > ppr(4L) && ppr(4L) > ppr(5L),
      s"expected monotone decay with distance, got $ppr")
    assert(ppr(1L) > ppr(3L),
      s"seed must dominate non-adjacent nodes, got $ppr")
    // total mass stays ~1 (no dangling leak on a symmetric path)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-6)
  }

  test("uniform seed set reproduces global PageRank") {
    val ring = both((0L until 5L).map(i => (i, (i + 1) % 5, 1.0)))
    val allSeeds = (0L until 5L).toDF("node")
    val a = PageRank.run(ring, k = 8, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val b = PageRank.runPersonalized(ring, allSeeds, k = 8, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    a.foreach { case (n, v) => assert(math.abs(b(n) - v) < 1e-12) }
  }
}
