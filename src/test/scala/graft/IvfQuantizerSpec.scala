package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.IvfAnn

/** The IVF coarse-quantizer fit must be BOUNDED at any corpus scale:
  * `quantizerFitInput` is a seeded hash-order + limit that Catalyst
  * plans as TakeOrderedAndProject (per-partition bounded heap + driver
  * merge — never a full sort, never a full-corpus single-partition
  * materialization). These tests pin the bound, the physical plan, and
  * the seed-determinism on a corpus larger than the sample. */
class IvfQuantizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  test("fit input is bounded to sampleN on a corpus larger than the sample") {
    val e = GoldenPinCompute.ivfFixture(spark) // 300 rows, 4 partitions
    val fit = IvfAnn.quantizerFitInput(e, 64, 42L)
    assert(fit.count() == 64L)
    val plan = fit.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected bounded-heap top-N plan, got:\n$plan")
  }

  test("fit sample is deterministic under the seed and seed-sensitive") {
    val e = GoldenPinCompute.ivfFixture(spark)
    val a = ids(IvfAnn.quantizerFitInput(e, 64, 42L))
    val b = ids(IvfAnn.quantizerFitInput(e, 64, 42L))
    val c = ids(IvfAnn.quantizerFitInput(e, 64, 7L))
    assert(a.size == 64 && a == b)
    assert(a != c, "different seeds must draw different samples")
    // physical layout must not change the sample (hash order is global)
    val one = ids(IvfAnn.quantizerFitInput(e.coalesce(1), 64, 42L))
    assert(one == a, "sample must be partitioning-invariant")
  }

  test("sample covers the whole corpus when sampleN >= corpus size") {
    val e = GoldenPinCompute.ivfFixture(spark)
    assert(IvfAnn.quantizerFitInput(e, 1000, 42L).count() == 300L)
  }

  test("fit/save/load/search lifecycle reproduces the fused topK") {
    import org.apache.spark.sql.functions.col
    val e = GoldenPinCompute.ivfFixture(spark)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fused = rows(IvfAnn.topK(e, "vec_id", "v", col("vec_id") < 4,
      k = 3, nCells = 4, nprobe = 2, seed = 42L, quantizerSampleSize = 64))
    val model = IvfAnn.fit(e, "vec_id", "v", nCells = 4, seed = 42L,
      quantizerSampleSize = 64)
    assert(rows(IvfAnn.search(model, e, "vec_id", "v", col("vec_id") < 4,
      k = 3, nprobe = 2)) == fused)
    // persist, reload, search again: the index survives a round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    model.save(s"$dir/ivf")
    val reloaded = IvfAnn.load(s"$dir/ivf")
    assert(reloaded.nCells == 4)
    assert(rows(IvfAnn.search(reloaded, e, "vec_id", "v", col("vec_id") < 4,
      k = 3, nprobe = 2)) == fused)
  }

  test("sampled-fit IVF keeps recall on a corpus 8x the sample") {
    // The test-SF embeddings tables are smaller than the default sample,
    // so only this fixture exercises the sample<corpus regime: 2048
    // clustered 16-dim embeddings, quantizer fit on 256 of them.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 3)
    val rows = (0 until 2048).map { i =>
      (i.toLong, centers(i % 8).toSeq.map(_ + rnd.nextGaussian() * 0.3))
    }
    val df = rows.toDF("vec_id", "v").repartition(8)
    def pairs(res: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      res.select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.sim.Similarity.cosineTopK(
      df, df.filter(col("vec_id") < 10), "vec_id", "v", k = 5))
    val ivf = pairs(IvfAnn.topK(df, "vec_id", "v",
      queryPred = col("vec_id") < 10, k = 5, nCells = 8, nprobe = 2,
      seed = 42L, quantizerSampleSize = 256))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"sampled-fit recall@5 = $recall (clustered corpus: nprobe=2 of 8 " +
      "cells must find nearly all true neighbors)")
  }
}
