package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.PeriodAnalysis
import graft.cluster.Clustering
import graft.io.Tables

/** EP2 end-to-end: run_period_analysis over a synthetic OHLCV panel —
  * distribution shares sum to 1, probs sum to 1, stats cohere, report
  * renders; plus the per-symbol file-layout reader and the M2/M3 parity
  * helpers. */
class PeriodAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val panel = {
    val rows = for {
      (sym, drift) <- Seq(("up", 1.003), ("down", 0.996), ("flat", 1.0))
      i <- 0 until 300
    } yield (sym,
      java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusHours(i).format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))),
      100.0 * math.pow(drift, i) * (1 + 0.01 * math.sin(i * 1.3)),
      50.0 + (i % 5) * 10.0)
    rows.toDF("symbol", "ts", "close", "volume")
  }

  test("run_period_analysis: coherent distribution, transitions, stats, report") {
    val r = PeriodAnalysis.run(panel, "2024-01-02", "2024-01-13")
    val shareSum = r.regimeDistribution.agg(sum($"share")).collect()(0).getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val nTrans = r.transitions.count()
    val stats = r.stats.collect()(0)
    assert(stats.getAs[Long]("n_transitions") == nTrans)
    assert(stats.getAs[Long]("n_symbols") <= 3)
    if (nTrans > 0) {
      val probSums = r.transitionProbs.groupBy($"from_label")
        .agg(sum($"prob").as("p")).select($"p").as[Double].collect()
      probSums.foreach(p => assert(math.abs(p - 1.0) < 1e-9))
      assert(r.topTransitions.count() <= 5)
    }
    val text = PeriodAnalysis.report("test-period", r)
    assert(text.contains("Period: test-period") &&
      text.contains("Number of transitions:"))
  }

  test("per-symbol file layout: one scan, symbol from file name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_persym").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("close",
        org.apache.spark.sql.types.DoubleType)))
    Seq((1L, 10.0), (2L, 11.0)).toDF("ts", "close").coalesce(1)
      .write.parquet(s"$dir/tmp_btc")
    Seq((1L, 5.0)).toDF("ts", "close").coalesce(1)
      .write.parquet(s"$dir/tmp_eth")
    // rename to the reference's {SYM}_data.parquet layout
    def move(sub: String, name: String): Unit = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        new java.io.File(s"$dir/$name").toPath)
    }
    move("tmp_btc", "BTCUSDT_data.parquet")
    move("tmp_eth", "ETHUSDT_data.parquet")
    val df = Tables.readPerSymbolDir(spark, s"$dir/*_data.parquet", schema)
    val bySym = df.groupBy($"symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySym == Map("BTCUSDT" -> 2L, "ETHUSDT" -> 1L))
  }

  test("silhouetteExact: perfect separation scores near 1, and kmeansBestOfN not worse") {
    val pts = Array(Array(0.0, 0.0), Array(0.1, 0.0), Array(10.0, 10.0), Array(10.1, 10.0))
    val sil = Clustering.silhouetteExact(pts, Array(0, 0, 1, 1))
    assert(sil > 0.95, s"sil=$sil")
    val df = pts.zipWithIndex.toSeq.map { case (p, i) => (i.toLong, p(0), p(1)) }
      .toDF("id", "x", "y")
    val (_, costSingle, _) = Clustering.kmeansAssign(df, Seq("x", "y"), 2, 42L)
    val (_, costBest, _) = Clustering.kmeansBestOfN(df, Seq("x", "y"), 2, 42L, 3)
    assert(costBest <= costSingle + 1e-9)
  }
}
