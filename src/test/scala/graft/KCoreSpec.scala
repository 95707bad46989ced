package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.KCore

/** Contracts for k-core peeling that the m13 hash gate can't see:
  * multi-round cascade semantics (one round is NOT enough on chains),
  * nonempty stable cores on structured fixtures (the declared query's
  * near-uniform co-occurrence graph collapses, by design of the
  * trajectory output), in-core degree accounting, and profile/run
  * consistency. */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def result(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("triangle + pendant: 2-core keeps the triangle, drops the pendant") {
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(result(KCore.run(g, k = 2, rounds = 3)) ===
      Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("chain peels iteratively: a 5-path has no 2-core, and needs >1 round") {
    val path = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // one round only strips the endpoints — inner nodes still look safe
    assert(KCore.run(path, k = 2, rounds = 1).count() === 3)
    // the cascade empties it
    assert(KCore.run(path, k = 2, rounds = 4).count() === 0)
  }

  test("every survivor's reported degree is its in-core degree (>= k at fixpoint)") {
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val core = result(KCore.run(g, k = 3, rounds = 4))
    // K4 on {1,2,3,4}; 5-6 tail peeled; all degrees counted inside the core
    assert(core === Set((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("fixpoint early-exit equals the full schedule") {
    // zero-removal round ⇒ every later round is a no-op (the m6b
    // argument, KCore scaladoc) — run() with the exit must match the
    // full fixed schedule on early converger, full cascade, and a
    // seeded random graph; profile() keeps its one-row-per-round
    // shape, emitting the flat tail as copies
    val rnd = new scala.util.Random(777)
    val rand = sym((for {
      a <- 0L until 20L; b <- (a + 1) until 20L
      if rnd.nextDouble() < 0.25
    } yield (a, b)): _*).localCheckpoint()
    val cases = Seq(
      (sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), 2L),      // stable by r1
      (sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 2L),      // full cascade
      (rand, 3L))
    for (((g, k), i) <- cases.zipWithIndex) {
      val fast = result(KCore.run(g, k.toInt, rounds = 6))
      val full = result(KCore.run(g, k.toInt, rounds = 6, earlyExit = false))
      assert(fast === full, s"early-exit diverged from full schedule (case $i)")
      val traj = KCore.profile(g, k, rounds = 6).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      assert(traj.map(_._1) === (1L to 6L).toList,
        s"profile must keep one row per scheduled round (case $i)")
      // flat tail: once stable, counts repeat verbatim
      assert(traj.last._2 === fast.size.toLong, s"final nodes (case $i)")
    }
  }

  test("profile records the cascade and agrees with run at every depth") {
    val path = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val traj = KCore.profile(path, k = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(traj === List((1L, 3L, 2L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 0L, 0L)))
    // a stabilizing fixture: trajectory flat once the core is stable,
    // and each round's node count equals run() at that depth
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val t2 = KCore.profile(g, k = 2, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(t2 === List((1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L)))
    assert(KCore.run(g, k = 2, rounds = 3).count() === 3)
  }
}
