package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LouvainDist

/** Contracts for the distributed parity-gated Louvain (m6b/m6c): exact
  * community recovery on the canonical two-triangle fixture with the
  * hand-computed modularity, rejection of a modularity-lowering merge
  * at the coarse level, determinism across runs, and the empty-graph
  * guard. Cross-engine replay of the same run is the m6b/m6c hash gate
  * (the oracle SQL is generated from the identical round structure). */
class LouvainDistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Symmetric unit-weight edge list from undirected pairs. */
  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "w")

  // two triangles bridged by one edge — the textbook Louvain input
  private def triangles = sym(
    (0L, 1L), (1L, 2L), (0L, 2L),
    (10L, 11L), (11L, 12L), (10L, 12L),
    (2L, 10L))

  test("two bridged triangles resolve to the two triangle communities") {
    val asg = LouvainDist.run(triangles, roundsPerLevel = 4, levels = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(asg.keySet === Set(0L, 1L, 2L, 10L, 11L, 12L))
    assert(asg(0L) === asg(1L) && asg(1L) === asg(2L))
    assert(asg(10L) === asg(11L) && asg(11L) === asg(12L))
    assert(asg(0L) !== asg(10L),
      "the coarse level must REJECT the modularity-lowering merge of " +
        "the two triangles")
  }

  test("modularity of the triangle partition matches the closed form") {
    // m = 7 undirected edges, m2 = 14; each triangle: in_c = 6
    // (directed), deg_c = 7 → Q = 2·(6/14 − (7/14)²) = 5/14
    val asg = LouvainDist.run(triangles, roundsPerLevel = 4, levels = 2)
    val row = LouvainDist.modularity(triangles, asg).head()
    assert(row.getLong(0) === 2L)
    assert(math.abs(row.getDouble(1) - 5.0 / 14.0) < 1e-12)
  }

  test("run is deterministic across invocations") {
    val a = LouvainDist.run(triangles, roundsPerLevel = 4, levels = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = LouvainDist.run(triangles, roundsPerLevel = 4, levels = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("fixpoint early-exit equals the full schedule (sf0.1 corr graph)") {
    // the real m6b input: the r4-rounded weighted correlation graph at
    // the bench SF — the graph the round-12 verdict observed is already
    // fixpoint-adjacent, so the early-exit must cut rounds there WITHOUT
    // moving a single assignment (the hash-preservation contract)
    val daily = graft.io.Tables.events(spark, "/root/testdata/sf0.1")
      .filter($"user_id" < 200)
      .groupBy(unix_micros(date_trunc("day", $"ts")).as("day"), $"user_id")
      .agg(sum($"value").as("v"))
    val und = graft.analytics.Analytics
      .pairwiseCorr(daily, "day", "user_id", "v")
      .select($"key_a".cast("long").as("ka"), $"key_b".cast("long").as("kb"),
        round(abs($"corr") + lit(1e-9), 4).as("w"))
      .filter($"w" > 0.3)
    val edges = und.select($"ka".as("src"), $"kb".as("dst"), $"w")
      .unionByName(und.select($"kb".as("src"), $"ka".as("dst"), $"w"))
      .localCheckpoint()
    val fast = LouvainDist.run(edges, roundsPerLevel = 4, levels = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val full = LouvainDist.run(edges, roundsPerLevel = 4, levels = 2,
        earlyExit = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(fast.nonEmpty && fast.sameElements(full),
      "early-exit changed the assignment — the exit fired before fixpoint")
  }

  test("early-exit preserves the two-triangle result exactly") {
    val fast = LouvainDist.run(triangles, roundsPerLevel = 4, levels = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val full = LouvainDist.run(triangles, roundsPerLevel = 4, levels = 2,
        earlyExit = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(fast.sameElements(full))
  }

  test("empty edge list yields an empty assignment, not a crash") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "w")
    assert(LouvainDist.run(empty, roundsPerLevel = 2, levels = 2)
      .count() === 0L)
  }

  test("single-level run on a clique keeps one community") {
    val clique = sym((1L, 2L), (1L, 3L), (2L, 3L))
    val asg = LouvainDist.run(clique, roundsPerLevel = 4, levels = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(asg.values.toSet.size === 1)
  }
}
