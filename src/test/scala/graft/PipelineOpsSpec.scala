package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.Cdc
import graft.quality.DataQuality
import graft.sketch.CountMin

/** Operator-level contracts for the pipeline-operations pack
  * (sketch heavy hitters, CDC/SCD2, data quality). The declared
  * queries are hash-gated against DuckDB; these specs pin the
  * properties the hash can't see — exactness under adversarial sketch
  * shapes, interval structure, merge placement. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- CountMin ----------------------------------------------------

  private def grams = {
    import graft.io.Tables
    import graft.text.TextOps
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextOps.tokens($"text").as("__toks"))
      .select(explode(TextOps.ngrams($"__toks", 2)).as("gram"))
  }

  test("CMS heavy hitters == brute force, even under heavy collisions") {
    val items = grams
    val brute = items.groupBy($"gram").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(items.agg(count(lit(1)).as("n"))))
      .filter($"cnt" * 1000000L >= $"n" * 1500L)
      .select($"gram", $"cnt")
    // width 16 << vocabulary forces massive collision over-counting:
    // the shortlist balloons but the exact recount must still agree
    for (w <- Seq(16, 1024)) {
      val hh = CountMin.heavyHitters(items, "gram", 4, w, 1500L)
      assert(hh.exceptAll(brute).isEmpty && brute.exceptAll(hh).isEmpty,
        s"width $w diverged from brute force")
    }
  }

  test("CMS heavy hitters: empty input → empty output, no failure") {
    val empty = grams.filter(lit(false))
    assert(CountMin.heavyHitters(empty, "gram", 4, 64, 1500L).isEmpty)
  }

  test("CMS sketch mass: every depth row sums to the occurrence count") {
    val total = grams.count()
    val perRow = CountMin.sketch(grams, "gram", 3, 64)
      .groupBy($"j").agg(sum($"cnt").as("mass")).collect()
    assert(perRow.length == 3)
    perRow.foreach(r => assert(r.getLong(1) == total))
  }

  // ---- Cdc ---------------------------------------------------------

  private def changelog = Seq(
    // user 1: A A B A — the no-op second A must NOT open a version
    (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"),
    (1L, 30L, 102L, "B"), (1L, 40L, 103L, "A"),
    // user 2: single state
    (2L, 15L, 104L, "X"),
    // user 3: timestamp tie broken by event_id (105 then 106)
    (3L, 50L, 106L, "Q"), (3L, 50L, 105L, "P")
  ).toDF("k", "t", "eid", "state")

  test("scd2: versions, interval chaining, no-op compression, ties") {
    val out = Cdc.scd2(changelog, Seq("k"), "t", "eid", "state")
      .orderBy($"k", $"version")
      .select($"k", $"state", $"valid_from", $"valid_to", $"version",
        $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, 30L, 1, false),  // A-run 10..20 collapsed
      (1L, "B", 30L, 40L, 2, false),
      (1L, "A", 40L, -1L, 3, true),   // A again = NEW version
      (2L, "X", 15L, -1L, 1, true),
      (3L, "P", 50L, 50L, 1, false),  // eid 105 first at equal t
      (3L, "Q", 50L, -1L, 2, true)))
  }

  test("scd2: a change TO null opens a version (null-safe detection)") {
    val log = Seq((1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None),
        (1L, 30L, 3L, None), (1L, 40L, 4L, Some("A")))
      .toDF("k", "t", "eid", "state")
    val out = Cdc.scd2(log, Seq("k"), "t", "eid", "state")
      .orderBy($"version")
      .collect().map(r => (Option(r.getString(1)), r.getLong(2), r.getInt(4)))
    // A@10 → null run 20..30 (ONE version) → A@40
    assert(out.toSeq == Seq((Some("A"), 10L, 1), (None, 20L, 2),
      (Some("A"), 40L, 3)))
  }

  test("scd2 property: random changelogs — intervals tile the " +
    "timeline and replay to the changelog's state function") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong * 10, i.toLong,
        ("ABC")(rnd.nextInt(3)).toString)
    }
    val out = Cdc.scd2(rows.toDF("k", "t", "eid", "state"),
        Seq("k"), "t", "eid", "state")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getInt(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._5)).toMap
    // ground truth: the state at time t is the state of the last
    // change with (t', eid') <= (t, eid) in the declared total order
    val truth = rows.groupBy(_._1).view
      .mapValues(_.sortBy(r => (r._2, r._3))).toMap
    truth.foreach { case (k, changes) =>
      val ivs = out(k)
      // versions 1..n, contiguous interval chaining, open tail
      assert(ivs.map(_._5).toSeq == (1 to ivs.length))
      ivs.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"gap in key $k")
        case _ =>
      }
      assert(ivs.last._4 == Long.MaxValue)
      // no-op compression: adjacent intervals change state
      ivs.sliding(2).foreach {
        case Array(a, b) => assert(a._2 != b._2, s"uncompressed $k")
        case _ =>
      }
      // replay: every change timestamp is covered by exactly one
      // interval, and where the state at t is unambiguous (all
      // changes at t agree — equal-t runs collapse into one
      // interval), the covering interval carries that state
      changes.foreach { case (_, t, _, _) =>
        val covering = ivs.filter(iv => iv._3 <= t && t < iv._4)
        assert(covering.length == 1, s"cover count ${covering.length}" +
          s" at t=$t key=$k")
        val sameT = changes.filter(_._2 == t)
        if (sameT.map(_._4).distinct.size == 1)
          assert(covering.head._2 == sameT.last._4,
            s"state mismatch at t=$t key=$k")
      }
    }
  }

  test("merge: update wins, stale loses, insert appears, keep passes") {
    val snap = Seq((1L, 10L, 100L, "old1"), (2L, 20L, 101L, "old2"))
      .toDF("k", "t", "eid", "v")
    val batch = Seq(
      (1L, 50L, 200L, "new1"),   // newer → replaces
      (2L, 5L, 201L, "stale2"),  // older → snapshot survives
      (3L, 60L, 202L, "ins3"))   // unseen key → insert
      .toDF("k", "t", "eid", "v")
    val out = Cdc.merge(snap, batch, Seq("k"), "t", "eid")
      .orderBy($"k").select($"k", $"v").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "new1"), (2L, "old2"), (3L, "ins3")))
  }

  // ---- DataQuality -------------------------------------------------

  test("profile batches metrics in one aggregate; orphanCount counts") {
    val child = Seq((1L, "a"), (2L, "b"), (5L, "c"), (6L, "d"))
      .toDF("fk", "x")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val prof = DataQuality.profile(child, Seq(
        "rows" -> count(lit(1)),
        "fk.distinct" -> countDistinct($"fk"),
        "fk.max" -> max($"fk")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prof == Map("rows" -> 4.0, "fk.distinct" -> 4.0, "fk.max" -> 6.0))
    val orphans = DataQuality.orphanCount("orph", child, "fk", parent, "pk")
      .collect()
    assert(orphans.head.getString(0) == "orph" &&
      orphans.head.getDouble(1) == 2.0)
  }
}
