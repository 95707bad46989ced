package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cluster.GridKnn

/** The exact-kNN rebuild (j6/M8) must stay BOUNDED and stay EXACT.
  * Bounded: candidate pairs come only from 3×3 grid neighborhoods —
  * on a clustered fixture the per-round pair count must be far below
  * N². Exact: the certified output must equal the brute-force
  * all-pairs top-k on the same fixture, including the ring-expansion
  * path (far outliers that can't certify in round 0). */
class GridKnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic clustered fixture: `nClusters` tight blobs plus a
    * few far outliers (forcing ring expansion for the outliers). */
  private def fixture(nClusters: Int, perCluster: Int, outliers: Int) = {
    val rows = (for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      // deterministic jitter via integer mixing, no RNG
      val jx = ((c * 7919 + i * 104729) % 1000) / 10000.0
      val jy = ((c * 15485863L + i * 32452843L) % 1000) / 10000.0
      (s"p_${c}_$i", (c % 4) * 30.0 + jx, (c / 4) * 30.0 + jy)
    }) ++ (0 until outliers).map { o =>
      (s"out_$o", 1000.0 + o * 500.0, -800.0 - o * 250.0)
    }
    rows.toDF("id", "x", "y")
  }

  private def brute(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val a = df.select($"id".as("pid"), $"x".as("xa"), $"y".as("ya"))
    val b = df.select($"id".as("nid"), $"x".as("xb"), $"y".as("yb"))
    val pairs = a.join(b, $"pid" =!= $"nid")
      .withColumn("dist", sqrt(pow($"xa" - $"xb", 2) + pow($"ya" - $"yb", 2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"pid").orderBy($"dist", $"nid")
    pairs.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"pid", $"nid", $"dist", $"rank")
  }

  test("exactness: grid kNN equals brute-force all-pairs, outliers force expansion") {
    val df = fixture(8, 12, 3).persist()
    // smallN = 0 forces the grid rounds (the fixture would otherwise
    // take the probed direct path)
    val (out, rounds) = GridKnn.exactKnnWithRounds(df, "id", "x", "y", 2,
      smallN = 0)
    val got = out.select($"id", $"nid", round($"dist", 9).as("d"), $"rank")
      .as[(String, String, Double, Int)].collect().toSet
    val want = brute(df, 2)
      .select($"pid", $"nid", round($"dist", 9).as("d"), $"rank")
      .as[(String, String, Double, Int)].collect().toSet
    assert(got == want)
    assert(rounds > 1, s"outlier fixture should need ring expansion, used $rounds round(s)")
    df.unpersist()
  }

  test("bound: clustered fixture generates far fewer pairs than N²") {
    val df = fixture(10, 20, 2).persist()
    // width exactly as exactKnn's round 0 picks it (robust-span w0) —
    // the 2 far outliers must NOT inflate the cell width
    val (n, w0) = GridKnn.initialWidth(df.select($"id", $"x", $"y"))
    val pairCount = GridKnn.candidates(
      df.select($"id", $"x", $"y"), df.select($"id", $"x", $"y"), w0).count()
    // each blob of 20 is its own neighborhood: pair work ~ Σ blob² =
    // 10·20² = 4000 ≪ N² = 40804; assert an order of magnitude under N²
    assert(pairCount <= n * n / 8,
      s"candidate fan-out $pairCount not bounded (N²=${n * n})")
    assert(pairCount >= n, "candidates suspiciously sparse")
    df.unpersist()
  }

  test("probed direct path (n <= smallN) is identical to the grid rounds") {
    val df = fixture(6, 9, 2).persist()
    val (direct, dRounds) = GridKnn.exactKnnWithRounds(df, "id", "x", "y", 3)
    val (grid, gRounds) = GridKnn.exactKnnWithRounds(df, "id", "x", "y", 3,
      smallN = 0)
    assert(dRounds == 0, "small fixture must take the probed direct path")
    assert(gRounds >= 1)
    def key(f: org.apache.spark.sql.DataFrame) =
      f.select($"id", $"nid", round($"dist", 9).as("d"), $"rank")
        .as[(String, String, Double, Int)].collect().toSet
    assert(key(direct) == key(grid))
    df.unpersist()
  }

  test("edge cases: k > n-1 clamps; single point yields empty") {
    val tiny = Seq(("a", 0.0, 0.0), ("b", 1.0, 0.0), ("c", 0.0, 1.0))
      .toDF("id", "x", "y")
    val out = GridKnn.exactKnn(tiny, "id", "x", "y", 10)
    assert(out.count() == 6) // 3 points × (n-1)=2 neighbors
    val one = Seq(("solo", 5.0, 5.0)).toDF("id", "x", "y")
    assert(GridKnn.exactKnn(one, "id", "x", "y", 2).count() == 0)
  }
}
