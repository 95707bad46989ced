package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventAnalyticsPack

/** Edge semantics for the event-analytics pack that the sf0.01 hash gate
  * can't isolate: funnel strict-time advancement, attribution of
  * pre-touch purchases, zero-volume VWAP, and the closed top histogram
  * edge — each pinned on a crafted events fixture written through the
  * same parquet contract the driver tables use (raw µs `ts` int64).
  */
case class Ev(event_id: Long, ts: Long, user_id: Long,
              event_type: String, value: Double, props: String)

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def q(name: String) =
    EventAnalyticsPack.queries.find(_.name == name).get

  private def withEvents[A](rows: Seq[Ev])(body: String => A): A =
    TestDirs.withTempDir("graft_ev") { dir =>
      rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
      body(dir)
    }

  test("f1_funnel: same-timestamp events do not advance the stage") {
    val rows = Seq(
      // user 1: view at the SAME µs as signup must not count (strict >);
      // the click before the (later) view must not count either.
      Ev(1, 1000L, 1, "signup", 1.0, "{\"k\": 1}"),
      Ev(2, 1000L, 1, "view", 1.0, "{\"k\": 1}"),
      Ev(3, 2000L, 1, "click", 1.0, "{\"k\": 1}"),
      Ev(4, 3000L, 1, "view", 1.0, "{\"k\": 1}"),
      Ev(5, 4000L, 1, "click", 1.0, "{\"k\": 1}"),
      Ev(6, 5000L, 1, "purchase", 1.0, "{\"k\": 1}"),
      // user 2: full path but no signup — reaches nothing
      Ev(7, 1L, 2, "view", 1.0, "{\"k\": 1}"),
      Ev(8, 2L, 2, "click", 1.0, "{\"k\": 1}"),
      Ev(9, 3L, 2, "purchase", 1.0, "{\"k\": 1}"),
      // user 3: signup only
      Ev(10, 10L, 3, "signup", 1.0, "{\"k\": 1}"))
    withEvents(rows) { dir =>
      val got = q("f1_funnel").run(spark, dir)
        .select($"stage_idx", $"stage", $"users")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set((1L, "signup", 2L), (2L, "view", 1L),
        (3L, "click", 1L), (4L, "purchase", 1L)))
    }
  }

  test("f3_attribution: purchase before any touch attributes to none") {
    val rows = Seq(
      Ev(1, 50L, 1, "view", 0.0, "{\"k\": 1}"),
      Ev(2, 100L, 1, "purchase", 10.0, "{\"k\": 1}"),
      Ev(3, 10L, 2, "purchase", 5.0, "{\"k\": 1}"),
      Ev(4, 20L, 2, "click", 0.0, "{\"k\": 1}"),
      Ev(5, 10L, 3, "view", 0.0, "{\"k\": 1}"),
      Ev(6, 20L, 3, "click", 0.0, "{\"k\": 1}"),
      Ev(7, 30L, 3, "purchase", 2.0, "{\"k\": 1}"))
    withEvents(rows) { dir =>
      val got = q("f3_attribution").run(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(got === Set(
        ("last_touch", "view", 1L, 10.0), ("last_touch", "click", 1L, 2.0),
        ("last_touch", "none", 1L, 5.0),
        ("first_touch", "view", 2L, 12.0), ("first_touch", "none", 1L, 5.0)))
    }
  }

  test("f4_bars: zero-volume day yields NULL vwap, open/close by time") {
    val rows = Seq(
      // user 1 day 0: zero total volume
      Ev(1, 1000L, 1, "view", 3.0, "{\"k\": 0}"),
      Ev(2, 2000L, 1, "view", 7.0, "{\"k\": 0}"),
      // user 2 day 0: open 2.0 (earliest t), close 8.0 (latest t)
      Ev(3, 1000L, 2, "view", 2.0, "{\"k\": 10}"),
      Ev(4, 9000L, 2, "view", 8.0, "{\"k\": 30}"))
    withEvents(rows) { dir =>
      val got = q("f4_bars").run(spark, dir)
        .select($"user_id", $"open", $"close", $"volume", $"vwap")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSet
      assert(got === Set(
        (1L, 3.0, 7.0, 0.0, None),
        (2L, 2.0, 8.0, 40.0, Some((2.0 * 10 + 8.0 * 30) / 40.0))))
    }
  }

  test("f6_histogram: the max value lands in the closed top bucket 19") {
    val rows = (0 to 100).map(i =>
      Ev(i.toLong, i.toLong * 1000, 1, "view", i.toDouble, "{\"k\": 1}"))
    withEvents(rows) { dir =>
      val got = q("f6_histogram").run(spark, dir)
        .select($"bucket", $"n", $"lo_obs", $"hi_obs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1)
      assert(got.map(_._2).sum === 101L)
      assert(got.last._1 === 19L)
      // top bucket is CLOSED: holds both [95,100) and the max itself
      assert(got.last === ((19L, 6L, 95.0, 100.0)))
      assert(got.forall(b => b._1 >= 0L && b._1 <= 19L))
    }
  }

  test("f2_retention: day-0 row per cohort covers every user exactly once") {
    val dir001 = "/root/testdata/sf0.001"
    val r = q("f2_retention").run(spark, dir001)
    val day0 = r.filter($"day_offset" === 0).agg(sum($"users")).first().getLong(0)
    val users = graft.io.Tables.events(spark, dir001)
      .select($"user_id").distinct().count()
    assert(day0 === users) // every user is active on their own cohort day
    assert(r.filter($"day_offset" < 0).count() === 0)
  }
}
