package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Landmarks

/** g30's landmark eccentricity on a graph where every distance is
  * hand-computable: the 8-node path 0–1–…–7 with every node a landmark
  * (nLandmarks = 10 ≥ 8), horizon k = 6. True ecc(i) = max(i, 7−i);
  * the 6-hop horizon caps what BFS can see, so
  * ecc_lb(i) = min(max(i, 7−i), 6) — always a LOWER bound, tight
  * whenever the true value fits the horizon. */
class EccentricitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pathEdges(n: Int) = {
    val und = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  test("path-graph eccentricity lower bounds are exact within the horizon") {
    val out = Landmarks.eccentricity(pathEdges(8), nLandmarks = 10, k = 6)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L to 7L), s"every node present: ${out.toSeq}")
    out.foreach { case (node, nReach, ecc) =>
      val trueEcc = math.max(node, 7 - node)
      assert(ecc == math.min(trueEcc, 6L),
        s"node $node: ecc_lb $ecc != min(trueEcc=$trueEcc, horizon=6)")
      assert(ecc <= trueEcc, s"node $node: $ecc is not a lower bound")
      // n_reach = nodes within 6 hops, excluding self
      val expReach = (0 to 7).count(j => j != node && math.abs(j - node) <= 6)
      assert(nReach == expReach, s"node $node: n_reach $nReach != $expReach")
    }
  }

  test("max ecc_lb lower-bounds the diameter on a cycle") {
    // 10-cycle: true ecc(v) = 5 for all v; k = 6 covers it exactly
    val und = (0 until 10).map(i => (i.toLong, ((i + 1) % 10).toLong))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Landmarks.eccentricity(edges, nLandmarks = 10, k = 6)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 10)
    assert(out.forall(_._3 == 5L), s"cycle eccentricity must be 5: ${out.toSeq}")
  }
}
