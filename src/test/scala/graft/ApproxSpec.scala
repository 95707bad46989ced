package graft

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contract of the approximate aggregates vs exact values. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx distinct within 5% and approx p50 within 1% at sf0.001") {
    val rows = SparkEntry.queries("g15_approx")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactU = r.getAs[Long]("exact_users").toDouble
      val approxU = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approxU - exactU) / exactU <= 0.05,
        s"HLL off: $approxU vs $exactU")
      val exactP = r.getAs[Double]("exact_p50")
      val approxP = r.getAs[Double]("approx_p50")
      assert(math.abs(approxP - exactP) / math.max(exactP, 1.0) <= 0.01,
        s"quantile sketch off: $approxP vs $exactP")
    }
  }
}
