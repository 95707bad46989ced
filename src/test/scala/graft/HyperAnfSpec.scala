package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.HyperAnf

/** Contracts for the neighborhood function (g23/g24): exact k-hop
  * counts on a path fixture, the sketch's accuracy against the exact
  * form (at p=12 / tiny n the linear-counting branch is near-exact),
  * and determinism. Cross-engine replay of registers and estimates is
  * the g24 hash gate. */
class HyperAnfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  // path 1-2-3-4-5
  private def path = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))

  test("exact k-hop reach on a path graph") {
    val got = HyperAnf.khopExact(path, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ball(v,2) includes v: ends reach 3, node 3 reaches all 5
    assert(got === Map(1L -> 3L, 2L -> 4L, 3L -> 5L, 4L -> 4L, 5L -> 3L))
  }

  test("sketched reach tracks exact reach within HLL error") {
    val exact = HyperAnf.khopExact(path, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val est = HyperAnf.run(path, k = 2, p = 12)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (node, n) =>
      assert(math.abs(est(node) - n) / n < 0.05,
        s"node $node: estimate ${est(node)} vs exact $n")
    }
  }

  test("register iteration is deterministic") {
    val a = HyperAnf.run(path, k = 3, p = 8).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    val b = HyperAnf.run(path, k = 3, p = 8).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("neighborhood curve is nondecreasing and ends at frac 1") {
    val rows = HyperAnf.neighborhoodFunction(path, k = 3, p = 12)
      .orderBy("t").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2, 3))
    rows.sliding(2).foreach { case Array((_, a, _), (_, b, _)) =>
      assert(b >= a, s"N(t) must be nondecreasing: $a then $b")
    }
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
    // path of 5 nodes: N(0) ≈ 5, N(3) ≈ 4+5+5+5+4 = 23 (p=12 near-exact)
    assert(math.abs(rows.head._2 - 5.0) / 5.0 < 0.05)
    assert(math.abs(rows.last._2 - 23.0) / 23.0 < 0.05)
  }

  test("k=0-equivalent: one round on an edgeless pair set") {
    // two isolated self-symmetric components: a single edge graph,
    // k=1 → each node reaches both endpoints
    val one = sym((7L, 8L))
    val got = HyperAnf.khopExact(one, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(7L -> 2L, 8L -> 2L))
  }
}
