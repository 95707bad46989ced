package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pin for h1_holt's coupled (level, trend) recurrence —
  * the property the hash gate can't isolate: the fold IS Holt's method
  * (α=0.5, β=0.3, l₁=y₁, b₁=0), not some other smoothing that happens
  * to agree on the panel. */
class HoltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("three-point series matches the hand-computed Holt states") {
    // y = 10, 20, 30 on consecutive days:
    //   t1: l=10,    b=0
    //   t2: l=15,    b=1.5
    //   t3: l=23.25, b=3.525  → forecast 26.775
    val rows = Seq(
      Ev(1, 0L, 7, "view", 10.0, "{\"k\": 1}"),
      Ev(2, 86400000000L, 7, "view", 20.0, "{\"k\": 1}"),
      Ev(3, 172800000000L, 7, "view", 30.0, "{\"k\": 1}"))
    TestDirs.withTempDir("graft_holt") { dir =>
      rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
      val r = graft.queries.TimeSeriesPack.queries.find(_.name == "h1_holt").get
        .run(spark, dir)
        .select($"n_days", $"level", $"trend", $"forecast").head()
      assert(r.getLong(0) === 3L)
      assert(math.abs(r.getDouble(1) - 23.25) < 1e-9)
      assert(math.abs(r.getDouble(2) - 3.525) < 1e-9)
      assert(math.abs(r.getDouble(3) - 26.775) < 1e-9)
    }
  }

  test("a single-point series yields level=y, trend=0") {
    val rows = Seq(Ev(1, 0L, 7, "view", 42.0, "{\"k\": 1}"))
    TestDirs.withTempDir("graft_holt1") { dir =>
      rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
      val r = graft.queries.TimeSeriesPack.queries.find(_.name == "h1_holt").get
        .run(spark, dir)
        .select($"n_days", $"level", $"trend", $"forecast").head()
      assert(r.getLong(0) === 1L)
      assert(r.getDouble(1) === 42.0 && r.getDouble(2) === 0.0
        && r.getDouble(3) === 42.0)
    }
  }
}
