package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.Analytics

/** pairwiseCorrDense must agree with the row-level pairwiseCorr
  * (including pairwise-complete handling of missing align keys). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dense and row-level pairwise correlation agree") {
    val rnd = new scala.util.Random(7)
    val long = (for {
      k <- Seq("a", "b", "c", "d")
      day <- 0 until 20
      // key "c" misses some days → exercises pairwise-complete
      if !(k == "c" && day % 5 == 0)
    } yield (day.toLong, k, rnd.nextDouble() * 10 + (if (k == "a") day else 0)))
      .toDF("day", "k", "v")
    val rowLevel = Analytics.pairwiseCorr(long, "day", "k", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val dense = Analytics.pairwiseCorrDense(long, "day", "k", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3).toLong)).toMap
    assert(dense.keySet == rowLevel.keySet)
    dense.foreach { case (k, (c, n)) =>
      val (c2, n2) = rowLevel(k)
      assert(n == n2, s"pair $k n")
      assert(math.abs(c - c2) < 1e-10, s"pair $k corr $c vs $c2")
    }
  }
}
