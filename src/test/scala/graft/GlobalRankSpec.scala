package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GlobalRank

/** Contracts for the distributed global-rank operator: exact equality
  * with the single-partition `row_number`/`ntile` windows it replaces
  * (the point is removing the one-task bottleneck WITHOUT changing a
  * single output value), across unbalanced counts and many partitions. */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(n: Long) =
    spark.range(n).select((($"id" * 7919) % n).as("k"), $"id".as("tie"))

  test("withRowNumber == row_number over a global window") {
    val df = fixture(1000L)
    val (got, total) = GlobalRank.withRowNumber(
      df, Seq($"k", $"tie"), "r", numPartitions = 7)
    assert(total === 1000L)
    val want = df.withColumn("r", row_number().over(
      Window.orderBy($"k", $"tie")).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("withNtile == SQL ntile on unbalanced counts (n % k != 0)") {
    for ((n, k) <- Seq((10L, 4), (1003L, 4), (997L, 7), (3L, 5))) {
      val df = fixture(n)
      val got = GlobalRank.withNtile(df, Seq($"k", $"tie"), k, "q")
      val want = df.withColumn("q",
        ntile(k).over(Window.orderBy($"k", $"tie")))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"n=$n k=$k diverged from SQL ntile")
    }
  }

  test("the ranked plan has no single-partition global Sort exchange") {
    val df = fixture(1000L)
    val (got, _) = GlobalRank.withRowNumber(
      df, Seq($"k", $"tie"), "r", numPartitions = 7)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global rank must not funnel through one partition; plan:\n$plan")
  }
}
