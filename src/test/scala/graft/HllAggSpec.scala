package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Contract for the native graft_hll TypedImperativeAggregate: the
  * single-pass register-buffer path must reproduce the Column-API
  * two-aggregate path EXACTLY (same md5/bucket/rank derivation, same
  * harmonic reduction, same estimate arithmetic), and the CRDT merge
  * must be partitioning-invariant — the property that makes map-side
  * combine sound. */
class HllAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("graft_hll == the Column-path Hll.estimate, field by field") {
    val events = graft.io.Tables.events(spark, sf)
    val want = graft.sketch.Hll.estimate(events, "event_id", p = 12)
      .select($"m", $"v_nonzero", $"zsum40", $"estimate")
      .as[(Long, Long, Long, Double)].head()
    graft.GraftExtensions.register(spark)
    events.createOrReplaceTempView("hllagg_events")
    val got = spark.sql(
      """SELECT h.m, h.v_nonzero, h.zsum40,
        |  round(h.estimate + 1e-9, 4) AS estimate
        |FROM (SELECT graft_hll(event_id, 12) AS h FROM hllagg_events)"""
        .stripMargin)
      .as[(Long, Long, Long, Double)].head()
    assert(got === want)
  }

  test("merge is partitioning-invariant (1 vs 16 partitions)") {
    graft.GraftExtensions.register(spark)
    val events = graft.io.Tables.events(spark, sf).select($"event_id")
    def run(parts: Int): (Long, Long, Long) = {
      events.repartition(parts).createOrReplaceTempView("hllagg_parts")
      spark.sql(
        """SELECT h.m, h.v_nonzero, h.zsum40
          |FROM (SELECT graft_hll(event_id, 12) AS h FROM hllagg_parts)"""
          .stripMargin)
        .as[(Long, Long, Long)].head()
    }
    assert(run(1) === run(16))
  }

  test("JVM hash/rank derivation matches the SQL string ops") {
    // the bit-compatibility the whole contract rests on: md5 hex and
    // leading-zero rank computed in the JVM equal the Column path's
    // md5()/regexp derivation for the same keys
    val keys = Seq("0", "1", "42", "999983", "-7")
    val viaSql = keys.toDF("k")
      .select(md5($"k").as("h"))
      .withColumn("tail", substring($"h", 4, 16))
      .withColumn("z", length(regexp_extract($"tail", "^0*", 0)))
      .withColumn("fnz", substring(regexp_replace($"tail", "^0+", ""), 1, 1))
      .withColumn("extra",
        when($"fnz".isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
          .when($"fnz".isin("4", "5", "6", "7"), 1)
          .when($"fnz".isin("2", "3"), 2).otherwise(3))
      .select($"h", ($"z" * 4 + $"extra" + 1).as("rank"))
      .as[(String, Int)].collect()
    keys.zip(viaSql).foreach { case (k, (hexSql, rankSql)) =>
      val hexJvm = graft.sketch.HllAgg.md5Hex(k)
      assert(hexJvm === hexSql, s"md5 mismatch for $k")
      assert(graft.sketch.HllAgg.rankOf(hexJvm, 3) === rankSql,
        s"rank mismatch for $k")
    }
  }
  test("graft_hll rejects invalid p uniformly at registration") {
    // round-11 advice fix: both Int and Long literals validated at
    // registration (p in [4,24], multiple of 4) with the
    // graft_hll-prefixed message — not HllAgg's analyzer-stage require
    graft.GraftExtensions.register(spark)
    graft.io.Tables.events(spark, sf)
      .createOrReplaceTempView("hllagg_badp_events")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    Seq("13", "0", "28", "13L").foreach { bad =>
      val ex = intercept[Exception] {
        spark.sql(
          s"SELECT graft_hll(event_id, $bad) FROM hllagg_badp_events")
          .collect()
      }
      assert(msgs(ex).exists(_.contains(
        "graft_hll p must be in [4, 24] and a multiple of 4")),
        s"p=$bad: ${msgs(ex).mkString(" | ")}")
    }
  }
}
