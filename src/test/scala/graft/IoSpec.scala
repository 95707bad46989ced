package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{PagedIngest, Sinks}
import graft.analytics.Analytics
import graft.regimes.Transitions

/** Sinks (S2/S3/S6), paged ingestion shape (S4), mean imputation (G11),
  * transition flags (W13). */
class IoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parquet sink partitioned by key round-trips and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0))
      .toDF("sym", "day", "v")
    Sinks.parquet(df, s"$dir/p", partitionBy = Seq("sym"))
    val back = spark.read.parquet(s"$dir/p")
    assert(back.count() == 3)
    assert(back.filter($"sym" === "a").count() == 2)
    assert(new java.io.File(s"$dir/p/sym=a").exists, "hive partition layout")
  }

  test("date-partitioned sink: a P2 range filter becomes partition PRUNING") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date($"ts"))
    Sinks.parquet(events, s"$dir/events_by_day", partitionBy = Seq("day"))
    val days = spark.read.parquet(s"$dir/events_by_day")
      .select($"day").distinct().orderBy($"day").as[java.sql.Date].collect()
    assert(days.length >= 5, "fixture needs a multi-day panel")
    val (lo, hi) = (days(1), days(3))
    val back = spark.read.parquet(s"$dir/events_by_day")
      .filter($"day" >= lo && $"day" <= hi)
    // the range predicate must land in PartitionFilters (directory-level
    // pruning at plan time), not merely PushedFilters (row-group skipping
    // inside files already opened)
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("Scan parquet")).getOrElse("")
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pf.contains("day"), s"expected a day predicate in PartitionFilters, scan:\n$scan")
    // and the pruned read returns exactly the rows of the logical filter
    val want = events.filter($"day" >= lo && $"day" <= hi).count()
    assert(back.count() == want && want > 0)
  }

  test("json sink round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    Sinks.json(Seq(("BTC", 1L), ("ETH", 2L)).toDF("symbol", "rank"), s"$dir/j")
    val back = spark.read.json(s"$dir/j")
    assert(back.count() == 2 && back.columns.toSet == Set("symbol", "rank"))
  }

  test("period report mirrors the reference stats structure") {
    val rpt = Sinks.periodReport("2023", 58531L, 0.4, 70L, 1.709193029399e10,
      ("volatile_bear", "consolidation", 11497L))
    assert(rpt.contains("Number of transitions: 58,531"))
    assert(rpt.contains("Average regime duration: 0.4 days"))
    assert(rpt.contains("volatile_bear -> consolidation (11,497 times)"))
  }

  test("paged ingestion: cursor advance, retries, window filter, distribution") {
    val failures = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def fakeApi(sym: String, since: Long, limit: Int): Seq[PagedIngest.Candle] = {
      // first call for symbol "flaky" fails once (retry path)
      if (sym == "flaky" && failures.putIfAbsent(sym, 1) == null)
        throw new RuntimeException("transient")
      val all = (0L until 25L).map(i =>
        PagedIngest.Candle(sym, i * 3600L, 1, 2, 0.5, 1.5, 10))
      all.filter(_.ts >= since).take(limit)
    }
    val out = PagedIngest.fetchAll(spark, Seq("ok", "flaky"), startTs = 0L,
      endTs = 20L * 3600L, pageLimit = 10, fetchPage = fakeApi)
    val counts = out.groupBy($"symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ok" -> 20L, "flaky" -> 20L), s"got $counts")
  }

  test("mean imputation fills nulls with column means") {
    val df = Seq((1, Some(10.0)), (2, None), (3, Some(20.0)))
      .toDF("id", "x")
    val out = Analytics.imputeMean(df, Seq("x"))
      .orderBy($"id").select($"x").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 15.0, 20.0))
  }

  test("transition flags: volatility increase + bull/bear cross") {
    val df = Seq(
      ("stable_bull", "volatile_bear"), ("volatile_bear", "consolidation"))
      .toDF("from_label", "to_label")
    val out = Transitions.withFlags(df).collect()
    assert(out(0).getAs[Boolean]("is_volatility_increase"))
    assert(out(0).getAs[Boolean]("is_trend_change"))
    assert(!out(1).getAs[Boolean]("is_volatility_increase"))
    assert(!out(1).getAs[Boolean]("is_trend_change"))
  }
}
