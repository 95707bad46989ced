package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{EventsLayout, Tables}

/** The declared-query partitioned layout (P2/W14 read path): the
  * re-layout must preserve rows exactly, and the p2-style day predicate
  * must land in PartitionFilters (directory pruning), not merely
  * PushedFilters. */
class EventsLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("events.ts unit contract: raw int64 is a µs epoch (2024 data)") {
    // Round 10 regression guard: the driver regenerated testdata with
    // TIMESTAMP(MICROS) where earlier rounds wrote TIMESTAMP(NANOS),
    // which silently zeroed every time-filtered events query (a ns
    // predicate on µs values matches nothing). Pin the unit so a future
    // regeneration flip fails HERE, by name, not as 40 hash mismatches.
    val mm = Tables.eventsRaw(spark, sf)
      .agg(min($"ts").as("lo"), max($"ts").as("hi")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // 2024-01-01..2025-01-01 in µs; a ns epoch would be ~1000× larger
    assert(lo >= 1704067200000000L && hi < 1735689600000000L,
      s"events.ts range [$lo, $hi] is not a 2024 µs epoch — testdata " +
        "unit changed?")
  }

  test("layout preserves rows exactly (ts stays the raw µs long)") {
    val src = Tables.eventsRaw(spark, sf)
    val part = EventsLayout.read(spark, sf).drop("day")
    assert(part.schema == src.schema)
    assert(src.exceptAll(part).isEmpty && part.exceptAll(src).isEmpty)
  }

  test("day range predicate prunes partitions in the executed plan") {
    val lo = EventsLayout.dayOfUs(1704844800000000L) // 2024-01-10
    val hi = EventsLayout.dayOfUs(1705708800000000L) // 2024-01-20
    val q = EventsLayout.read(spark, sf)
      .filter($"day" >= lit(lo) && $"day" < lit(hi))
      .groupBy($"event_type").count()
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("Scan parquet")).getOrElse("")
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pf.contains("day"),
      s"expected day predicate in PartitionFilters, scan:\n$scan")
    // pruned read ≡ raw-ns range filter on the flat layout
    val want = Tables.eventsRaw(spark, sf)
      .filter($"ts" >= 1704844800000000L && $"ts" < 1705708800000000L)
      .count()
    val got = EventsLayout.read(spark, sf)
      .filter($"day" >= lit(lo) && $"day" < lit(hi)).count()
    assert(got == want && want > 0)
  }

  test("day partition values equal UTC calendar days of ts") {
    val bad = EventsLayout.read(spark, sf)
      .withColumn("expect_day",
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          expr("CAST((ts div 1000000) div 86400 AS INT)")))
      .filter($"day" =!= $"expect_day").count()
    assert(bad == 0)
  }
}
