package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape gate for dpp1_dynamic_pruning: the weekend-dim join must
  * reach the date-partitioned events scan as a DynamicPruningExpression
  * — the runtime directory-skipping mechanism the query exists to
  * exercise. (The hash gate proves the VALUES; only the plan proves the
  * scan didn't read all partitions.) */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("dpp1's events scan carries a dynamic partition pruning filter") {
    val df = graft.queries.MiscPack.queries
      .find(_.name == "dpp1_dynamic_pruning").get
      .run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in the scan's PartitionFilters; plan:\n$plan")
  }
}
