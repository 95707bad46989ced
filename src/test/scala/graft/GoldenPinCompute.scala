package graft

import org.apache.spark.sql.functions._
import graft.cluster.Clustering

/** One-off: prints the golden values GoldenPinSpec pins. Run with
  * `sbt "Test/runMain graft.GoldenPinCompute"`, paste outputs into the
  * spec. Kept in test scope so the pins are reproducible on demand. */
object GoldenPinCompute {

  def blobs: Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(5)
    val centers = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 9.0))
    for {
      (cx, cy) <- centers
      _ <- 0 until 10
    } yield (cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)
  }

  def louvainGraph: (Seq[Long], Seq[(Long, Long, Double)]) = {
    // two 6-cliques (nodes 0-5, 10-15) bridged by one weak edge
    val c1 = for (a <- 0 until 6; b <- a + 1 until 6) yield (a.toLong, b.toLong, 1.0)
    val c2 = for (a <- 10 until 16; b <- a + 1 until 16) yield (a.toLong, b.toLong, 1.0)
    val edges = c1 ++ c2 :+ (5L, 10L, 0.1)
    (edges.flatMap(e => Seq(e._1, e._2)).distinct, edges)
  }

  def classifierFixture(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    // 2 keys × 300 steps of a deterministic sine-driven series; label =
    // sign regime of the slope (3 classes)
    val rows = for (k <- Seq(1L, 2L); i <- 0 until 300) yield {
      val v = 50.0 + math.sin(i * 0.11 + k) * 8 + (i % 7) * 0.3
      val lbl = if (math.cos(i * 0.11 + k) > 0.3) "up"
        else if (math.cos(i * 0.11 + k) < -0.3) "down" else "flat"
      (k, i.toLong, i.toLong, v, v + 0.5, v - 0.5, 1000.0 + i, lbl)
    }
    rows.toDF("user_id", "t", "event_id", "value", "high", "low", "volume", "label")
  }

  def ivfFixture(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    // 300 deterministic 8-dim gaussian embeddings, multi-partition so
    // the sampled quantizer fit must be order-independent
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))
    }
    rows.toDF("vec_id", "v").repartition(4, col("vec_id"))
  }

  def g15Fixture(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    // 6000 rows, 3 types, deterministic integer mixing — enough
    // distinct users (~700 per type) that the HLL estimate differs from
    // exact, so the pin actually covers the sketch path
    val rows = (0 until 6000).map { i =>
      (s"t${i % 3}", ((i * 7919 + 13) % 2100).toLong,
        ((i * 104729) % 10007) / 100.0)
    }
    rows.toDF("event_type", "user_id", "value").coalesce(1)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // m2/m3 pin: KMeans(3, seed 42) on the blob fixture
    val df = blobs.toDF("x", "y").coalesce(1)
    val (assigned, inertia, _) = Clustering.kmeansAssign(df, Seq("x", "y"), 3, 42L)
    val sizes = assigned.groupBy($"cluster").count()
      .select($"count").as[Long].collect().sorted.toSeq
    println(s"PIN m2 sizes=$sizes inertia=${math.round(inertia * 1e4) / 1e4}")
    val rows = assigned.select($"x", $"y", $"cluster").collect()
    val exact = Clustering.silhouetteExact(
      rows.map(r => Array(r.getDouble(0), r.getDouble(1))),
      rows.map(_.getInt(2)))
    val sq = Clustering.silhouette(assigned, Seq("x", "y"), "cluster")
    println(s"PIN m3 exact=${math.round(exact * 1e6) / 1e6} sq=${math.round(sq * 1e6) / 1e6}")

    // m6 pin: Louvain on the 12-node two-clique graph
    val (nodes, edges) = louvainGraph
    val (comm, q) = Clustering.louvain(nodes, edges)
    val csizes = comm.groupBy(_._2).map(_._2.size).toSeq.sorted
    println(s"PIN m6 communities=${comm.values.toSet.size} sizes=$csizes q=${math.round(q * 1e6) / 1e6}")

    // m9 pin: classifier pipeline on the frozen series
    val feats = graft.features.FeatureEngineering.prepare(
      classifierFixture(spark), Seq("user_id"), Seq("t", "event_id"),
      "value", "high", "low", "volume")
    val result = graft.sequence.ClassifierPipeline.run(
      feats, "user_id", "t", "event_id",
      graft.features.FeatureEngineering.featureNames, "label",
      labels = Seq("down", "flat", "up"),
      seqLen = 30, seed = 42L, maxIter = 15, hidden = 8)
    val m = result.metrics.select($"label", $"tp", $"fp", $"fn",
      round($"accuracy" + 1e-9, 4).as("acc")).orderBy($"label").collect()
    m.foreach(r => println(s"PIN m9 ${r.get(0)} tp=${r.getLong(1)} fp=${r.getLong(2)} fn=${r.getLong(3)} acc=${r.getDouble(4)}"))

    // m10 pin: spring layout on the two-clique graph (seed 42)
    val lpos = Clustering.springLayout(nodes, edges)
    val lp = Seq(0L, 5L, 10L, 15L).map { n =>
      (n, math.round(lpos(n)._1 * 1e4) / 1e4, math.round(lpos(n)._2 * 1e4) / 1e4)
    }
    println(s"PIN m10 $lp")

    // g15 pin: approx aggregates (HLL++ distinct + KLL-ish percentile)
    // on the frozen integer-mixed fixture, single partition so sketch
    // merge order is fixed
    val g15 = graft.queries.PanelPack.g15Agg(g15Fixture(spark))
      .select($"event_type", $"exact_users", $"approx_users",
        $"exact_p50", $"approx_p50")
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    println(s"PIN g15 $g15")

    // s3 pin: IVF topK with the bounded sampled quantizer fit
    val ivf = graft.sim.IvfAnn.topK(ivfFixture(spark), "vec_id", "v",
        queryPred = col("vec_id") < 4, k = 3, nCells = 4, nprobe = 2,
        seed = 42L, quantizerSampleSize = 64)
      .select($"query_id", $"corpus_id", $"rank",
        round($"cos" + 1e-9, 4).as("cos"))
      .as[(Long, Long, Int, Double)].collect().sortBy(t => (t._1, t._3)).toSeq
    println(s"PIN s3 $ivf")
    spark.stop()
  }
}
