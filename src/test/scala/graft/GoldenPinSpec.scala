package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cluster.Clustering

/** Golden-value pins for the four rows-only queries' engines (m2 KMeans,
  * m3 silhouette, m6 Louvain, m9 classifier). No second engine
  * reproduces seeded KMeans/Louvain/MLP outputs, so the driver's oracle
  * gate records them rows-only — these pins are the compensating
  * regression net: exact expected values on frozen fixtures, computed
  * once ([[GoldenPinCompute]]) and committed. A pin moving means the
  * ALGORITHM changed, not the data. */
class GoldenPinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r4(x: Double): Double = math.round(x * 1e4) / 1e4
  private def r6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("g15 pin: approx aggregates on the frozen fixture — HLL and percentile sketches") {
    // exact columns double as sanity (700 users per type by
    // construction); approx columns pin the sketch outputs themselves —
    // deterministic for fixed input + single-partition merge order
    val got = graft.queries.PanelPack.g15Agg(GoldenPinCompute.g15Fixture(spark))
      .select($"event_type", $"exact_users", $"approx_users",
        $"exact_p50", $"approx_p50")
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("t0", 700L, 692L, 49.985, 49.97),
      ("t1", 700L, 705L, 50.005, 49.99),
      ("t2", 700L, 703L, 49.935, 49.92)))
  }

  test("m2 pin: KMeans(3, seed 42) on the blob fixture — sizes and inertia") {
    val df = GoldenPinCompute.blobs.toDF("x", "y").coalesce(1)
    val (assigned, inertia, _) = Clustering.kmeansAssign(df, Seq("x", "y"), 3, 42L)
    val sizes = assigned.groupBy($"cluster").count()
      .select($"count").as[Long].collect().sorted.toSeq
    assert(sizes == Seq(10L, 10L, 10L))
    assert(r4(inertia) == 13.365, s"inertia drifted: $inertia")
  }

  test("m3 pin: exact (sklearn) and squared-Euclidean (Spark ML) silhouettes") {
    val df = GoldenPinCompute.blobs.toDF("x", "y").coalesce(1)
    val (assigned, _, _) = Clustering.kmeansAssign(df, Seq("x", "y"), 3, 42L)
    val rows = assigned.select($"x", $"y", $"cluster").collect()
    val exact = Clustering.silhouetteExact(
      rows.map(r => Array(r.getDouble(0), r.getDouble(1))),
      rows.map(_.getInt(2)))
    val sq = Clustering.silhouette(assigned, Seq("x", "y"), "cluster")
    assert(r6(exact) == 0.915226, s"exact silhouette drifted: $exact")
    assert(r6(sq) == 0.990353, s"squared-variant silhouette drifted: $sq")
  }

  test("m6 pin: Louvain on the two-clique bridge graph — communities and Q") {
    val (nodes, edges) = GoldenPinCompute.louvainGraph
    val (comm, q) = Clustering.louvain(nodes, edges)
    assert(comm.values.toSet.size == 2)
    assert(comm.groupBy(_._2).map(_._2.size).toSeq.sorted == Seq(6, 6))
    // both cliques must land whole: every clique node shares its
    // community with node 0 / node 10 respectively
    assert((0L to 5L).map(comm).toSet.size == 1)
    assert((10L to 15L).map(comm).toSet.size == 1)
    assert(r6(q) == 0.496678, s"modularity drifted: $q")
  }

  test("m9 pin: MLP classifier pipeline on the frozen sine series") {
    val feats = graft.features.FeatureEngineering.prepare(
      GoldenPinCompute.classifierFixture(spark), Seq("user_id"), Seq("t", "event_id"),
      "value", "high", "low", "volume")
    val result = graft.sequence.ClassifierPipeline.run(
      feats, "user_id", "t", "event_id",
      graft.features.FeatureEngineering.featureNames, "label",
      labels = Seq("down", "flat", "up"),
      seqLen = 30, seed = 42L, maxIter = 15, hidden = 8)
    val m = result.metrics
      .select($"label".cast("int"), $"tp", $"fp", $"fn",
        round($"accuracy" + 1e-9, 4))
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(m == Seq(
      (0, 22L, 0L, 0L, 0.9878),
      (1, 16L, 1L, 0L, 0.9878),
      (2, 43L, 0L, 1L, 0.9878)), s"classifier metrics drifted: $m")
  }

  test("m10 pin: spring layout on the two-clique graph (seed 42)") {
    val (nodes, edges) = GoldenPinCompute.louvainGraph
    val pos = Clustering.springLayout(nodes, edges)
    val got = Seq(0L, 5L, 10L, 15L).map { n =>
      (n, math.round(pos(n)._1 * 1e4) / 1e4, math.round(pos(n)._2 * 1e4) / 1e4)
    }
    assert(got == Seq(
      (0L, 0.8577, -0.6507), (5L, 0.6228, -0.6169),
      (10L, -0.6218, 0.6141), (15L, -0.9996, 0.7656)),
      s"layout pin drifted: $got")
  }

  test("s3 pin: IVF topK with the bounded sampled quantizer fit (seed 42)") {
    val out = graft.sim.IvfAnn.topK(GoldenPinCompute.ivfFixture(spark),
        "vec_id", "v", queryPred = col("vec_id") < 4, k = 3, nCells = 4,
        nprobe = 2, seed = 42L, quantizerSampleSize = 64)
      .select($"query_id", $"corpus_id", $"rank",
        round($"cos" + 1e-9, 4).as("cos"))
      .as[(Long, Long, Int, Double)].collect().sortBy(t => (t._1, t._3)).toSeq
    assert(out == Seq(
      (0L, 224L, 1, 0.7846), (0L, 33L, 2, 0.7406), (0L, 107L, 3, 0.7232),
      (1L, 134L, 1, 0.8732), (1L, 117L, 2, 0.8358), (1L, 219L, 3, 0.768),
      (2L, 283L, 1, 0.7158), (2L, 133L, 2, 0.7141), (2L, 83L, 3, 0.6898),
      (3L, 151L, 1, 0.7924), (3L, 22L, 2, 0.6988), (3L, 216L, 3, 0.6679)),
      s"IVF pin drifted: $out")
  }
}
