package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Pins the data-skipping claim of the Z-order layout: on a uniform 2-D
  * grid written as 16 files, a narrow y-range predicate must touch
  * every x-sorted file (y is unclustered there) but at most half of the
  * z-ordered files, while x-predicates stay prunable in both layouts.
  * File-level min/max here is exactly what a parquet footer-stats
  * reader prunes on. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("z-order layout: both dimensions prune; x-sort prunes only x") {
    val n = 100000
    // deterministic pseudo-uniform grid (no RNG: stable across runs)
    val df = spark.range(n.toLong)
      .select($"id",
        (($"id" * 48271L) % 1000L).as("x"),
        (($"id" * 16807L) % 1000L).as("y"))
    TestDirs.withTempDir("graft_zorder") { dir =>
      ZOrder.writeZOrdered(df, "x", "y", s"$dir/z", numFiles = 16)
      df.repartitionByRange(16, $"x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(s"$dir/xsort")

      val z = spark.read.parquet(s"$dir/z")
      val xs = spark.read.parquet(s"$dir/xsort")
      assert(z.count() == n && xs.count() == n)

      // 5% y-range: unclustered under x-sort -> all 16 files overlap
      val yTouchedXsort = ZOrder.filesTouched(xs, "y", 100, 150)
      val yTouchedZ = ZOrder.filesTouched(z, "y", 100, 150)
      assert(yTouchedXsort == 16, s"x-sorted layout: $yTouchedXsort")
      assert(yTouchedZ <= 8, s"z-ordered layout must skip y-files: $yTouchedZ")

      // 5% x-range: prunable in both layouts
      val xTouchedXsort = ZOrder.filesTouched(xs, "x", 100, 150)
      val xTouchedZ = ZOrder.filesTouched(z, "x", 100, 150)
      assert(xTouchedXsort <= 3, s"x-sorted layout: $xTouchedXsort")
      assert(xTouchedZ <= 8, s"z-ordered layout must skip x-files: $xTouchedZ")
    }
  }

  test("interleave: known Morton values") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.interleave($"x", $"y", 8).as("z"))
      .as[Long].collect().toSeq
    // z(5,3) = x bits 101 in even slots -> 010001, y bits 011 in odd
    // slots -> 001010 => 011011 = 27
    assert(out == Seq(0L, 1L, 2L, 3L, 27L))
  }
}
