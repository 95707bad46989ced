package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.KTruss

/** k-truss peel contracts: a K4 with a dangling triangle reduces to
  * exactly the K4 at k = 4 (the dangling triangle's edges have
  * support 1 and peel in round 1; the K4's edges certify support 2);
  * a triangle-free graph empties; peeling CASCADES (an edge whose
  * support only drops below threshold after round 1's removals goes
  * in round 2, which a single-pass filter would miss). */
class KTrussSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .toDF("ka", "kb")
  }

  // K4 on 1..4 + triangle (4,5,6) hanging off node 4
  private def k4PlusTri = edges(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (4L, 6L), (5L, 6L))

  test("4-truss of K4 + dangling triangle is exactly the K4") {
    val out = KTruss.run(k4PlusTri, k = 4, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2))
    assert(out.map(e => (e._1, e._2)).toSeq ==
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(out.forall(_._3 == 2L), s"every K4 edge sits in 2 triangles: ${out.toSeq}")
  }

  test("3-truss keeps both the K4 and the triangle") {
    val out = KTruss.run(k4PlusTri, k = 3, rounds = 3).count()
    assert(out == 9L)
  }

  test("triangle-free graph empties at any k") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(KTruss.run(path, k = 3, rounds = 2).count() == 0L)
  }

  test("property: converged output certifies the truss on random graphs") {
    // seeded G(n, p) graphs: run to a generous round count, then check
    // (a) output ⊆ input, (b) every surviving edge's RECOMPUTED support
    // meets k−2 (the certification the final left-join provides), and
    // (c) one more round is a no-op — i.e. the schedule converged, so
    // the fixed-round output IS the k-truss, not a truncation artifact
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 3
      val pairs = for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (a, b)
      val in = edges(pairs: _*).localCheckpoint()
      val out = KTruss.run(in, k = 4, rounds = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val inSet = pairs.toSet
      assert(out.forall(e => inSet((e._1, e._2))), "output ⊄ input")
      assert(out.forall(_._3 >= 2L),
        s"under-supported survivor in trial $trial: ${out.toSeq}")
      val more = KTruss.run(in, k = 4, rounds = 7).count()
      assert(more == out.length.toLong,
        s"round 7 still peeled (trial $trial): schedule not converged")
    }
  }

  test("fixpoint early-exit equals the full schedule (random + fixtures)") {
    // the m6b hash-preservation contract ported to the truss peel: a
    // zero-removal round is the fixpoint, so exiting there must yield
    // the byte-identical edge set and supports the full fixed schedule
    // produces — on graphs that converge EARLY (K4 fixture: round 1),
    // LATE (cascading chain), and on seeded G(n, p) randoms
    val rnd = new scala.util.Random(4242)
    val cases = Seq(k4PlusTri,
      edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
        (3L, 5L), (4L, 5L))) ++ (1 to 2).map { trial =>
      val n = 14 + trial * 4
      edges((for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (a, b)): _*).localCheckpoint()
    }
    for ((g, i) <- cases.zipWithIndex) {
      val fast = KTruss.run(g, k = 4, rounds = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(e => (e._1, e._2)).toSeq
      val full = KTruss.run(g, k = 4, rounds = 6, earlyExit = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(e => (e._1, e._2)).toSeq
      assert(fast == full, s"early-exit diverged from full schedule (case $i)")
    }
  }

  test("peeling cascades across rounds") {
    // triangle chain: (1,2,3), (2,3,4) share edge (2,3); plus (3,4,5)
    // sharing (3,4). At k = 4: round 1 removes every edge with
    // support < 2 — only (2,3) and (3,4) have support 2 — and the
    // SURVIVING pair no longer forms any triangle, so round 2 removes
    // them too: the 4-truss is empty, which a one-pass filter misses.
    val chain = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L))
    assert(KTruss.run(chain, k = 4, rounds = 1).count() == 2L,
      "one round leaves the two shared edges")
    assert(KTruss.run(chain, k = 4, rounds = 2).count() == 0L,
      "round 2 peels the no-longer-supported survivors")
  }
}
