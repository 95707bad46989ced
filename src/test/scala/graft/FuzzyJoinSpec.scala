package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.joins.FuzzyJoin

/** Blocked fuzzy matching (the er1 candidate generator): match
  * correctness on a hand-computed fixture, the never-all-pairs
  * blocking contract, and the declared query's 2-round component
  * fixpoint on the real sf0.01 blocking graph. */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("selfMatch scores only within blocks and honors maxDist") {
    val df = Seq(
      (1L, "smith", "a"), (2L, "smyth", "a"), (3L, "smith", "b"),
      (4L, "jones", "a"), (5L, "smithe", "a"))
      .toDF("id", "name", "blk")
    val got = FuzzyJoin.selfMatch(df, "id", "name",
        block = Seq(col("blk")), maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    // 1-2 (substitution), 1-5 (insertion) match inside block a;
    // 2-5 is dist 2; 3 is blocked apart despite an exact name match;
    // jones matches nothing
    assert(got == Set((1L, 2L, 1), (1L, 5L, 1)))
  }

  test("er1's 2 min-label rounds reach the fixpoint on sf0.01") {
    val c = graft.io.Tables.customer(spark, "/root/testdata/sf0.01")
      .select($"c_custkey".as("id"), $"c_name".as("name"),
        $"c_nationkey".as("nat"))
    val pairs = FuzzyJoin.selfMatch(c, "id", "name",
      block = Seq($"nat", substring($"name", 1, 17)), maxDist = 1)
    val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
      .unionByName(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
      .localCheckpoint()
    def labels(k: Int) = graft.graph.Components.run(edges, k)
      .as[(Long, Long)].collect().toMap
    val l1 = labels(1)
    val l2 = labels(2)
    assert(l1 == l2,
      "prefix blocks cannot chain, so round 1 must already be the fixpoint")
    assert(l2.nonEmpty && l2.exists { case (n, l) => n != l },
      "the sf0.01 blocking graph must contain real multi-record entities")
  }
}
