package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.HistQuantile

/** Contracts for the histogram-sketch quantiles the g17 hash gate
  * can't see: the deterministic one-bucket-width error bound against
  * exact percentiles, interpolation exactness when the histogram
  * resolves the distribution, and layout invariance. */
class HistQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("error vs exact percentile is bounded by one bucket width (sf0.001)") {
    val li = graft.io.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_extendedprice")
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val est = HistQuantile.quantiles(li, "l_extendedprice", 2048, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val Row = li.agg(min($"l_extendedprice"), max($"l_extendedprice")).head()
    val width = (Row.getDouble(1) - Row.getDouble(0)) / 2048.0
    val exact = li.agg(
      percentile($"l_extendedprice", typedLit(qs)).as("p")).head()
      .getSeq[Double](0)
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= width,
        s"q=$q est=${est(q)} exact=$ex width=$width")
    }
  }

  test("uniform integers: interpolation lands within the straddling bucket") {
    // 1..1000 with 1000 bins: each bucket holds ~1 value, so the
    // estimate must sit within one bucket width of the exact quantile
    val df = spark.range(1, 1001).select($"id".cast("double").as("v"))
    val est = HistQuantile.quantiles(df, "v", 1000, Seq(0.5))
      .head().getDouble(1)
    assert(math.abs(est - 500.5) <= 1.0, s"median est $est")
  }

  test("partition layout does not move the estimate") {
    val df = spark.range(0, 50000)
      .select((pmod(hash($"id"), lit(977)).cast("double") + lit(0.5)).as("v"))
    val a = HistQuantile.quantiles(df.repartition(1), "v", 256, Seq(0.9)).head()
    val b = HistQuantile.quantiles(df.repartition(13), "v", 256, Seq(0.9)).head()
    assert(a == b, s"layout changed the sketch: $a vs $b")
  }

  test("parameter validation") {
    val df = spark.range(10).select($"id".cast("double").as("v"))
    intercept[IllegalArgumentException](
      HistQuantile.quantiles(df, "v", 1, Seq(0.5)))
    intercept[IllegalArgumentException](
      HistQuantile.quantiles(df, "v", 16, Seq(1.5)))
  }
}
