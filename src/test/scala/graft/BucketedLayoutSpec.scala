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

  test("one-file-per-bucket + sortBy makes the merge join SORT-free under sorted-scan planning") {
    // Spark ignores bucket sort order at planning time by default
    // (listing files during planning costs; SPARK-28169's legacy flag
    // keeps the old behavior available). With it on, the single-file
    // buckets written by BucketedLayout report their sortBy order and
    // the merge join drops BOTH its Exchanges and its Sorts — the full
    // co-located-layout payoff. Default-config behavior (Exchange-free,
    // Sort kept) is pinned by the previous test.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val df = joinAgg(BucketedLayout.lineitem(spark, sf),
        BucketedLayout.orders(spark, sf))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no Exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
      assert(!plan.contains("- Sort "),
        s"sorted-bucket scan should eliminate the join Sorts, got:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("each bucketed table has exactly one file per bucket") {
    val (lin, orn) = BucketedLayout.tableNames(spark, sf)
    for (t <- Seq(lin, orn)) {
      val loc = spark.sql(s"DESCRIBE FORMATTED $t")
        .filter($"col_name" === "Location").select("data_type")
        .first.getString(0)
      val files = new java.io.File(new java.net.URI(loc))
        .listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == BucketedLayout.Buckets,
        s"$t: expected ${BucketedLayout.Buckets} files (one per bucket), got ${files.length}")
    }
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
