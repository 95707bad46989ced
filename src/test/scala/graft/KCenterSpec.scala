package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.KCenter

/** s15's greedy farthest-point selection: the selection-distance
  * sequence is non-increasing (each round picks the current farthest
  * point, and adding a center can only shrink min-distances), every
  * corpus point is assigned exactly once, and on well-separated
  * clusters with k = #clusters the greedy provably picks one center
  * per cluster (the Gonzalez 2-approximation argument: a second pick
  * in a covered cluster would be closer to the chosen set than any
  * point of an uncovered cluster). */
class KCenterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 3 tight clusters of 5 points around centers 60 apart; intra-cluster
    * spread <= 2 per dim over 4 dims. */
  private def clustered = {
    val base = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(60.0, 0.0, 0.0, 0.0),
      Seq(0.0, 60.0, 0.0, 0.0))
    val rows = for {
      (c, g) <- base.zipWithIndex
      i <- 0 until 5
    } yield ((g * 5 + i).toLong,
      c.zipWithIndex.map { case (x, d) => x + ((i + d) % 3) - 1.0 })
    rows.toDF("vec_id", "v")
  }

  test("sel_dist non-increasing; assignment partitions the corpus") {
    val out = KCenter.greedy(clustered, "vec_id", "v", k = 5)
      .select("rank", "center_id", "sel_dist", "n_assigned")
      .as[(Int, Long, Double, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to 5), "ranks must be 1..k")
    assert(out.map(_._2).distinct.length == 5, "centers must be distinct points")
    val sd = out.map(_._3)
    assert(sd.head == 0.0, "seed sel_dist is 0 by definition")
    sd.drop(1).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1) - 1e-12,
        s"farthest-point sel_dist must be non-increasing, got ${sd.toSeq}")
    }
    assert(out.map(_._4).sum == 15L, "every point assigned exactly once")
  }

  test("k = #clusters on separated clusters: one center per cluster") {
    val out = KCenter.greedy(clustered, "vec_id", "v", k = 3)
      .select("center_id", "n_assigned", "cover_radius")
      .as[(Long, Long, Double)].collect()
    val groups = out.map(_._1 / 5).sorted.toSeq
    assert(groups == Seq(0L, 1L, 2L),
      s"greedy must pick one center per separated cluster, got $out")
    assert(out.forall(_._2 == 5L), s"each center covers its 5-point cluster: $out")
    // intra-cluster squared diameter is at most 4 dims × 2² = 16
    assert(out.forall(_._3 <= 16.0), s"cover radius exceeds cluster spread: $out")
  }

  test("k beyond the distinct-point count fails loudly, not with " +
      "silently duplicated centers") {
    // 4 rows but only 2 DISTINCT embeddings: once both are chosen every
    // min-distance is 0 and the argmax would re-select a chosen point
    // (round-15 ADVICE fix — the distinct-centers contract only holds
    // for k <= #distinct points, so exceeding it must throw).
    val dups = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)),
      (2L, Seq(5.0, 5.0)), (3L, Seq(5.0, 5.0))).toDF("vec_id", "v")
    val ok = KCenter.greedy(dups, "vec_id", "v", k = 2).collect()
    assert(ok.map(_.getLong(1)).toSet == Set(0L, 2L))
    val e = intercept[IllegalArgumentException](
      KCenter.greedy(dups, "vec_id", "v", k = 3).collect())
    assert(e.getMessage.contains("distinct corpus points"))
  }

  test("deterministic across runs") {
    val a = KCenter.greedy(clustered, "vec_id", "v", k = 4).collect().toSeq
    val b = KCenter.greedy(clustered, "vec_id", "v", k = 4).collect().toSeq
    assert(a == b)
  }
}
