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
