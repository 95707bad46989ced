package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.features.{Ewm, EwmAgg}

/** Cross-verification of the two EWM implementations (SURVEY W9):
  * the Catalyst TypedImperativeAggregate window function must agree
  * bit-for-bit with the mapPartitions operator, and both with the
  * closed-form recursion. */
class EwmAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("EwmAgg window function equals mapPartitions Ewm on a multi-key frame") {
    val rows = for (k <- Seq("a", "b"); i <- 0 until 50)
      yield (k, i.toLong, math.sin(i * 0.7) * 10 + i * 0.3)
    val df = rows.toDF("k", "t", "x")
    val w = Window.partitionBy($"k").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaAggRows = df.withColumn("e", EwmAgg.ewm($"x", 12.0).over(w))
      .orderBy($"k", $"t").select($"e").as[Double].collect()
    val viaMp = Ewm.ewmMean(df, Seq("k"), Seq("t"), Seq(("x", 12.0, "e")))
      .orderBy($"k", $"t").select($"e").as[Double].collect()
    assert(viaAggRows.length == viaMp.length)
    viaAggRows.zip(viaMp).foreach { case (a, b) =>
      assert(a == b, s"bitwise equality expected: $a vs $b")
    }
  }

  test("ewm is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val rows = for (k <- Seq("a", "b"); i <- 0 until 30)
      yield (k, i.toLong, math.cos(i * 0.5) * 5 + i * 0.1)
    rows.toDF("k", "t", "x").createOrReplaceTempView("ewm_in")
    val viaSql = spark.sql(
      """SELECT k, t, ewm(x, 12) OVER (PARTITION BY k ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ewm_in ORDER BY k, t""".stripMargin)
      .select($"e").as[Double].collect()
    val viaMp = Ewm.ewmMean(rows.toDF("k", "t", "x"), Seq("k"), Seq("t"),
        Seq(("x", 12.0, "e")))
      .orderBy($"k", $"t").select($"e").as[Double].collect()
    viaSql.zip(viaMp).foreach { case (a, b) => assert(a == b) }
  }

  test("column-algebra operators are callable from SQL (native, no UDF)") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  graft_clip(9.0d, 0.0d, 5.0d) AS cl,
        |  graft_token_count('hello, world 42') AS tc,
        |  graft_fingerprint('B a. a b') AS fp""".stripMargin).collect().head
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getDouble(2) == 5.0)
    assert(row.getInt(3) == 4) // hello | , | world | 42
    // fingerprint = md5 of sorted distinct lowercase alnum tokens "a b"
    assert(row.getString(4) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("fused ewmMacdNormalized == withMacd + window normalization, bit-exact") {
    import org.apache.spark.sql.functions._
    val rows = for (k <- Seq("a", "b", "c"); i <- 0 until 80)
      yield (k, i.toLong, math.sin(i * 0.37) * 7 + 50 + (k.hashCode % 5))
    val df = rows.toDF("k", "t", "x").repartition(5) // scrambled input layout
    val fused = Ewm.ewmMacdNormalized(df, Seq("k"), Seq("t"), "x")
      .select($"k", $"t", $"macd", $"macd_signal", $"macd_hist")
    val wAll = Window.partitionBy($"k")
    val unfused0 = graft.features.Indicators.withMacd(df, Seq("k"), Seq("t"), "x")
    val unfused = Seq("macd", "macd_signal", "macd_hist").foldLeft(unfused0) {
      (d, c) =>
        val m = max(abs(col(c))).over(wAll)
        d.withColumn(c, when(m === 0, col(c)).otherwise(col(c) / m))
    }.select($"k", $"t", $"macd", $"macd_signal", $"macd_hist")
    val f = fused.orderBy($"k", $"t").collect().map(_.toSeq)
    val u = unfused.orderBy($"k", $"t").collect().map(_.toSeq)
    assert(f.length == 240)
    f.zip(u).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("ewmMacdNormalized: null in → null out, EWM state untouched, like ewmMean") {
    val df = Seq(
      ("a", 1L, Some(50.0)), ("a", 2L, None: Option[Double]),
      ("a", 3L, Some(52.0)), ("a", 4L, Some(49.0))).toDF("k", "t", "x")
    val withNull = Ewm.ewmMacdNormalized(df, Seq("k"), Seq("t"), "x")
      .orderBy($"t")
      .select($"macd", $"macd_signal", $"macd_hist")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(withNull(1) == ((None, None, None)), "null row emits null macd columns")
    // State skips the null: remaining rows equal the dense-input run.
    val dense = Ewm.ewmMacdNormalized(
      df.filter($"x".isNotNull), Seq("k"), Seq("t"), "x")
      .orderBy($"t")
      .select($"macd", $"macd_signal", $"macd_hist")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(Seq(withNull(0), withNull(2), withNull(3)) == dense.toSeq)
  }

  test("graft_clip passes NULL through (pandas clip), never coerces to lo") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_clip(CAST(NULL AS DOUBLE), 0.0d, 5.0d) AS c").collect().head
    assert(r.isNullAt(0), "graft_clip(NULL, lo, hi) must be NULL")
  }

  test("EwmAgg handles leading nulls (null out, state starts at first value)") {
    val df = Seq(("a", 1L, None: Option[Double]), ("a", 2L, Some(10.0)),
      ("a", 3L, Some(12.0))).toDF("k", "t", "x")
    val w = Window.partitionBy($"k").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.withColumn("e", EwmAgg.ewm($"x", 12.0).over(w))
      .orderBy($"t").select($"e").as[Option[Double]].collect()
    assert(out(0).isEmpty)
    assert(out(1).contains(10.0))
    val alpha = 2.0 / 13.0
    assert(math.abs(out(2).get - (alpha * 12 + (1 - alpha) * 10)) < 1e-15)
  }
}
