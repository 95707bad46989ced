package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.Clustering

/** Pins the two contracts of `Clustering.sampledKneeEps` (the bounded
  * m4b ε-tuner): below the cap it is BIT-IDENTICAL to the
  * collect-everything `kneeEps(twoNNDistances(...))` path the DuckDB
  * oracle mirrors, and above the cap the sampled knee tracks the full
  * knee (each sampled distance is exact vs the full set; the sorted
  * sample curve is a uniform quantile subsample of the full curve). */
class KneeSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 gaussian blobs + sparse noise: a curve with a real knee
  private def fixture(n: Int): Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(3)
    (0 until n).map { i =>
      val (cx, cy) = Seq((0.0, 0.0), (8.0, 1.0), (3.0, 7.0))(i % 3)
      if (i % 29 == 0) (i.toLong, rnd.nextDouble() * 20 - 5, rnd.nextDouble() * 20 - 5)
      else (i.toLong, cx + rnd.nextGaussian(), cy + rnd.nextGaussian())
    }
  }

  private def fullKnee(rows: Seq[(Long, Double, Double)]): Double =
    Clustering.kneeEps(Clustering.twoNNDistances(
      rows.map(r => Array(r._2, r._3)).toArray))

  test("below the cap the sampled knee is bit-identical to the full knee") {
    val rows = fixture(120)
    val df = rows.toDF("user_id", "mu", "sd").repartition(4)
    val got = Clustering.sampledKneeEps(df, "user_id", "mu", "sd", cap = 4096)
    assert(got == fullKnee(rows), s"got $got want ${fullKnee(rows)}")
  }

  test("above the cap the sampled knee agrees with the full knee") {
    val rows = fixture(900)
    val df = rows.toDF("user_id", "mu", "sd").repartition(4)
    val full = fullKnee(rows)
    val sampled = Clustering.sampledKneeEps(df, "user_id", "mu", "sd", cap = 200)
    assert(full > 0 && sampled > 0)
    val rel = math.abs(sampled - full) / full
    assert(rel < 0.35, s"sampled=$sampled full=$full rel=$rel")
  }
}
