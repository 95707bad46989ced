package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.regimes.{Regimes, Transitions}

/** End-to-end reference-domain pipeline on a deterministic synthetic
  * OHLCV panel (FIXTURES.md §1.1 shapes): features → 5-class regime →
  * transitions → stats. Pins the full spine the reference runs in EP2
  * (SURVEY §3) and exercises every regime class + the degenerate
  * symbols (constant price, short series). */
class RegimePipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic panel: per symbol, 400 hourly rows.
    *  - "bull": strong steady uptrend (stable_bull rows expected)
    *  - "vbear": volatile downtrend (volatile_bear rows expected)
    *  - "flat": constant price (consolidation only, zero volatility)
    *  - "short": 10 rows (all warm-up → consolidation) */
  private lazy val panel = {
    def series(sym: String, n: Int, price: Int => Double,
               vol: Int => Double): Seq[(String, Long, Double, Double)] =
      (0 until n).map(i => (sym, i.toLong * 3600L, price(i), vol(i)))
    val rows =
      series("bull", 400, i => 100.0 * math.pow(1.002, i), _ => 50.0) ++
      series("vbear", 400, i => 100.0 * math.pow(0.97, i) *
        (1.0 + 0.04 * math.sin(i * 1.7)), i => 50.0 + (i % 7) * 20.0) ++
      series("flat", 400, _ => 100.0, _ => 50.0) ++
      series("short", 10, i => 100.0 + i, _ => 50.0)
    rows.toDF("symbol", "ts_sec", "close", "volume")
  }

  private lazy val w = Window.partitionBy($"symbol").orderBy($"ts_sec")

  private lazy val labeled = Regimes
    .shortTermFeatures(panel, "close", "volume", w)
    .withColumn("regime", Regimes.shortTermRegime())

  test("all five regime classes are reachable; flat symbol is pure consolidation") {
    val dist = labeled.groupBy($"symbol", $"regime").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(dist.keys.exists(_ == ("bull", "stable_bull")), s"want stable_bull in $dist")
    assert(dist.keys.exists(k => k._1 == "vbear" && k._2.contains("bear")),
      s"want bear regimes in $dist")
    assert(dist.keys.filter(_._1 == "flat").map(_._2).toSet == Set("consolidation"))
    assert(dist.keys.filter(_._1 == "short").map(_._2).toSet == Set("consolidation"))
  }

  test("warm-up rows are consolidation (pandas NaN-comparison semantics)") {
    val early = labeled.filter($"ts_sec" < 24L * 3600L)
      .select($"regime").distinct().as[String].collect()
    assert(early.toSet == Set("consolidation"), s"got ${early.toSet}")
  }

  test("transitions: from != to, positive duration, no transitions for single-regime symbols") {
    val trans = Transitions.transitions(labeled, Seq("symbol"), "ts_sec", "ts_sec",
      "regime", (s, e) => (e - s) / lit(3600.0))
    val rows = trans.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("from_label") != r.getAs[String]("to_label"))
      assert(r.getAs[Double]("duration") > 0)
    }
    val symbols = trans.select($"symbol").distinct().as[String].collect().toSet
    assert(!symbols.contains("flat") && !symbols.contains("short"))
  }

  test("island count equals 1 + number of label changes per symbol") {
    val isl = Transitions.islands(labeled, Seq("symbol"), "ts_sec", "ts_sec", "regime")
    val nIslands = isl.groupBy($"symbol").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val changes = labeled
      .withColumn("chg",
        when(lag($"regime", 1).over(w).isNotNull &&
          $"regime" =!= lag($"regime", 1).over(w), 1).otherwise(0))
      .groupBy($"symbol").agg(sum($"chg").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    nIslands.foreach { case (s, n) => assert(n == changes(s) + 1, s"symbol $s") }
  }

  test("coarse regime: percentile-thresholded codes cover all three classes on mixed data") {
    val coarse = Regimes.coarseRegime(panel, Seq("symbol"), "close", w)
    val codes = coarse.filter($"symbol" === "vbear")
      .select($"regime_code").distinct().as[Int].collect().toSet
    assert(codes.subsetOf(Set(0, 1, 2)) && codes.contains(2))
    // momentum below -threshold must exist in a downtrend
    assert(codes.contains(1), s"bear rows expected, got $codes")
  }

  test("ewm matches the closed-form recursion on a hand-computed series") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 11.0), ("a", 4L, 15.0))
      .toDF("k", "t", "x")
    val out = graft.features.Ewm.ewmMean(df, Seq("k"), Seq("t"),
        Seq(("x", 12.0, "e")))
      .orderBy($"t").select($"e").as[Double].collect()
    val alpha = 2.0 / 13.0
    val expect = Seq(10.0, alpha * 12 + (1 - alpha) * 10.0,
      alpha * 11 + (1 - alpha) * (alpha * 12 + (1 - alpha) * 10.0))
    out.take(3).zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }
}
