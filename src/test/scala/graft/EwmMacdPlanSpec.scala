package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.features.{Ewm, FeatureEngineering}

/** The custom EwmMacd operator (logical node → strategy → physical
  * node) must (a) keep its bit-exact semantics — covered in EwmAggSpec —
  * and (b) actually SHARE its exchange+sort with downstream windows:
  * the whole point of declaring required/output distribution+ordering
  * instead of hiding them in a mapPartitions lambda. */
class EwmMacdPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def panel = {
    val rows = for (k <- Seq("a", "b"); i <- 0 until 200)
      yield (k, i.toLong, 50.0 + math.sin(i * 0.21) * 6, 1000.0 + i)
    rows.toDF("k", "t", "close", "volume").repartition(7) // scrambled input
  }

  test("macd pass + downstream window share ONE exchange and ONE sort") {
    val w = Window.partitionBy($"k").orderBy($"t")
    val df = Ewm.ewmMacdNormalized(panel, Seq("k"), Seq("t"), "close")
      .withColumn("ret", $"close" / lag($"close", 1).over(w) - 1)
      .withColumn("ma", avg($"close").over(w.rowsBetween(-4, 0)))
    val plan = df.queryExecution.executedPlan.toString
    val nExchange = "Exchange hashpartitioning".r.findAllIn(plan).length
    val nSort = "\\bSort \\[".r.findAllIn(plan).length
    assert(nExchange == 1, s"expected 1 exchange, got $nExchange:\n$plan")
    assert(nSort == 1, s"expected 1 sort, got $nSort:\n$plan")
    assert(plan.contains("EwmMacd"), plan)
  }

  test("the full 16-feature frame plans exactly one exchange on the key") {
    val df = FeatureEngineering.prepare(
      panel, Seq("k"), Seq("t"), "close", "close", "close", "volume")
    val plan = df.queryExecution.executedPlan.toString
    val nExchange = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchange == 1, s"expected 1 exchange, got $nExchange:\n$plan")
  }

  test("duplicate column names (self-join shape) fail loudly, never mis-bind") {
    // both custom plans bind part/ord/value columns BY NAME — an
    // ambiguous name after a self-join must refuse to resolve, not
    // silently bind whichever attribute happens to come first
    val dup = panel.select($"k", $"t", $"close", $"close") // two `close` attrs
    val e1 = intercept[Exception] {
      Ewm.ewmMacdNormalized(dup, Seq("k"), Seq("t"), "close").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("unresolved")
      || e1.getMessage.contains("EwmMacd"), e1.getMessage)
    val e2 = intercept[Exception] {
      Ewm.ewmMean(dup, Seq("k"), Seq("t"), Seq(("close", 12.0, "e12"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("unresolved")
      || e2.getMessage.contains("Ewm"), e2.getMessage)
    // unambiguous frames still work (same shape, distinct names)
    val ok = Ewm.ewmMacdNormalized(
      panel.select($"k", $"t", $"close", $"close".as("close2")),
      Seq("k"), Seq("t"), "close")
    assert(ok.count() == 400)
  }

  test("column pruning through the node keeps key/order/value columns") {
    val out = Ewm.ewmMacdNormalized(panel, Seq("k"), Seq("t"), "close")
      .select($"k", $"macd_hist") // drops close/volume downstream
    assert(out.count() == 400)
    val scan = out.queryExecution.executedPlan.toString
    // volume is not referenced by the operator or the projection —
    // pruning should remove it below the exchange
    assert(!scan.contains("volume"), scan)
  }

}
