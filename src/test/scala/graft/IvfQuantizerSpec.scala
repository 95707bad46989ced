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
  }

  test("sample covers the whole corpus when sampleN >= corpus size") {
    val e = GoldenPinCompute.ivfFixture(spark)
    assert(IvfAnn.quantizerFitInput(e, 1000, 42L).count() == 300L)
  }
}
