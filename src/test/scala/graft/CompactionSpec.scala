package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Compaction

/** Contracts for the OPTIMIZE-style compaction pass: fewer files, data
  * identical, and — the part that matters for a skipping scan — the
  * output files are RANGE-clustered on the sort key (near-disjoint
  * per-file min/max), which a round-robin rewrite would destroy. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compaction shrinks the file count and preserves every row") {
    TestDirs.withTempDir("graft_compact") { dir =>
      // simulate a drip-fed landing: 16 tiny files
      val src = s"$dir/landing"
      (0 until 16).foreach { i =>
        spark.range(i * 100L, (i + 1) * 100L)
          .select($"id", ($"id" % 97).as("v"))
          .coalesce(1).write.mode("append").parquet(src)
      }
      assert(Compaction.parquetFileCount(src) >= 16)

      val dst = s"$dir/compacted"
      val files = Compaction.compact(spark, src, dst,
        sortCols = Seq("id"), targetRows = 500L)
      assert(files === 4) // 1600 rows / 500 → ⌈3.2⌉
      assert(Compaction.parquetFileCount(dst) === 4)

      val a = spark.read.parquet(src)
      val b = spark.read.parquet(dst)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "compaction must be a pure rewrite")
    }
  }

  test("compacted files are range-clustered (footer stats stay selective)") {
    TestDirs.withTempDir("graft_compact_rng") { dir =>
      val src = s"$dir/landing"
      // shuffled landing order: file i does NOT own a key range
      spark.range(0L, 2000L)
        .select((($"id" * 7919) % 2000).as("k"))
        .repartition(8).write.parquet(src)

      val dst = s"$dir/compacted"
      Compaction.compact(spark, src, dst, Seq("k"), targetRows = 500L)

      val ranges = Compaction.fileRanges(spark, dst, "k")
        .orderBy($"lo")
        .select($"lo".cast("long"), $"hi".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // every adjacent pair of files must be disjoint: hi(i) < lo(i+1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) =>
          assert(hi < lo2, s"file ranges overlap: hi=$hi lo2=$lo2 — " +
            "range clustering lost, min/max skipping is dead")
        case _ => ()
      }
      // and a point lookup would touch exactly one file
      val hits = ranges.count { case (lo, hi) => lo <= 1000L && 1000L <= hi }
      assert(hits === 1)
    }
  }
}
