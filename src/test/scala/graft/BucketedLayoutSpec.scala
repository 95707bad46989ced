package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{BucketedLayout, Tables}

/** The bucketed fact layout must (a) make the fact-fact order-key join
  * AND the bucket-keyed aggregate run with ZERO Exchange — the whole
  * point of the layout at 100 TB — and (b) be semantics-neutral versus
  * the flat scans. Broadcast is disabled for the plan pin so the join
  * takes the fact-fact (sort-merge) shape it has at scale, where no
  * side fits in an executor. */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def joinAgg(li: org.apache.spark.sql.DataFrame,
                      o: org.apache.spark.sql.DataFrame) =
    li.select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .join(o.select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
          .as("revenue"))

  test("join + bucket-keyed agg plan over the bucketed layout has zero Exchange") {
    val df = joinAgg(BucketedLayout.lineitem(spark, sf),
      BucketedLayout.orders(spark, sf))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must be shuffle-free, got:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected the fact-fact join shape, got:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("flat-scan sibling of the same query DOES shuffle (the layout's win)") {
    val df = joinAgg(Tables.lineitem(spark, sf), Tables.orders(spark, sf))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), "flat scans should require a shuffle")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed layout is semantics-neutral versus flat scans") {
    val got = joinAgg(BucketedLayout.lineitem(spark, sf),
        BucketedLayout.orders(spark, sf))
      .as[(Long, String, Long, Double)].collect().toSet
    val want = joinAgg(Tables.lineitem(spark, sf), Tables.orders(spark, sf))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("layout is memoized: second call returns the same tables") {
    val a = BucketedLayout.tableNames(spark, sf)
    val b = BucketedLayout.tableNames(spark, sf)
    assert(a == b)
    assert(spark.catalog.tableExists(a._1) && spark.catalog.tableExists(a._2))
  }
}
