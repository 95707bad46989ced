package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Watermark semantics under real multi-micro-batch execution:
  *  - a windowed aggregate in append mode DROPS data arriving later than
  *    the watermark horizon (the closed window's emitted count is final);
  *  - dedupWithinWatermark drops duplicate keys arriving within the
  *    horizon while keeping state bounded.
  * Both use the two-file / maxFilesPerTrigger=1 pattern from
  * StreamingSpec so each file is its own micro-batch and the watermark
  * advances between them. */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write each batch as one parquet file into a fresh stream dir and
    * run `f` over a maxFilesPerTrigger=1 file stream, draining between
    * file drops; returns the memory-sink table name. */
  private def runBatches(name: String,
                         batches: Seq[org.apache.spark.sql.DataFrame],
                         plan: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                         outputMode: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val schema = batches.head.schema
    val files = batches.zipWithIndex.map { case (b, i) =>
      b.coalesce(1).write.parquet(s"$dir/in/p$i")
      new java.io.File(s"$dir/in/p$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    val streamDir = new java.io.File(s"$dir/stream"); streamDir.mkdirs()
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val q = plan(stream).writeStream.outputMode(outputMode)
      .format("memory").queryName(name).start()
    try {
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(streamDir, f"batch_$i%03d.parquet").toPath)
        q.processAllAvailable()
      }
    } finally q.stop()
    name
  }

  test("10s tumbling windows: late row below watermark is dropped") {
    def ev(ts: Long, label: String) =
      (new java.sql.Timestamp(ts * 1000L), label, 1.0)
    val b1 = ((0 until 10).map(i => ev(i, "a")) :+ ev(30, "b"))
      .toDF("ts", "event_type", "value")
    // t=50 pushes the final watermark to 45s > 40s so window [30,40)
    // also closes and emits before the stream stops.
    val b2 = Seq(ev(2, "a"), ev(50, "c")).toDF("ts", "event_type", "value")

    val table = runBatches("wm_win_test", Seq(b1, b2),
      s => s.withWatermark("ts", "5 seconds")
        .groupBy(window(col("ts"), "10 seconds").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("win.start").cast("long").as("w0"), col("event_type"), col("n")),
      "append")

    val rows = spark.table(table)
      .select($"w0", $"event_type", $"n").as[(Long, String, Long)]
      .collect().toSet
    // Window [0,10) closed with 10 rows — the late t=2s row did NOT
    // reopen or grow it; window [30,40) closed with its single row.
    assert(rows.contains((0L, "a", 10L)), s"got $rows")
    assert(rows.contains((30L, "b", 1L)), s"got $rows")
    assert(!rows.exists { case (w, l, n) => w == 0L && l == "a" && n != 10L },
      s"late row leaked into a closed window: $rows")
  }

  test("stream-stream interval join across micro-batches == batch interval join") {
    def ev(ts: Long, k: Long, id: Long) =
      (new java.sql.Timestamp(ts * 1000L), k, id)
    // purchases at t=100..104 per key; views scattered before/after
    val purchases = (0 until 10).map(i => ev(100 + i, i % 3, 1000 + i))
      .toDF("ts", "k", "pid")
    val views = (0 until 30).map(i => ev(60 + i * 3, i % 3, 2000 + i))
      .toDF("ts", "k", "vid")

    // batch ground truth: views within 30s before the purchase, same key
    val batch = purchases.as("p").join(views.as("v"),
        $"p.k" === $"v.k" &&
          $"v.ts" >= $"p.ts" - expr("INTERVAL 30 seconds") && $"v.ts" <= $"p.ts")
      .select($"p.pid", $"v.vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // streaming: drive BOTH sides from one file stream, split by role
    val all = purchases.withColumnRenamed("pid", "id").withColumn("role", lit("p"))
      .unionByName(views.withColumnRenamed("vid", "id").withColumn("role", lit("v")))
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    val half = all.filter($"ts" < new java.sql.Timestamp(90 * 1000L))
    val rest = all.filter($"ts" >= new java.sql.Timestamp(90 * 1000L))
    half.coalesce(1).write.parquet(s"$dir/in/p0")
    rest.coalesce(1).write.parquet(s"$dir/in/p1")
    val files = Seq(0, 1).map(i => new java.io.File(s"$dir/in/p$i").listFiles()
      .filter(_.getName.endsWith(".parquet")).head)
    val streamDir = new java.io.File(s"$dir/stream"); streamDir.mkdirs()
    val src = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val joined = StreamOps.intervalJoinStream(
      src.filter($"role" === "p").select($"ts", $"k", $"id".as("pid")),
      src.filter($"role" === "v").select($"ts", $"k", $"id".as("vid")),
      keyCol = "k", lookback = "30 seconds", watermark = "2 minutes")
    val q = joined.select($"l_pid".as("pid"), $"r_vid".as("vid"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_test").start()
    try {
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(streamDir, s"batch_$i.parquet").toPath)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("ssj_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("streaming session_window aggregation == batch sessions") {
    def ev(ts: Long, k: Long, v: Double) =
      (new java.sql.Timestamp(ts * 1000L), k, v)
    // two sessions per key separated by a > 60s gap; the second batch
    // EXTENDS an open session from the first (state merge across
    // micro-batches), plus a late watermark-pushing row to close all
    val rows = Seq(
      ev(0, 1, 1.0), ev(20, 1, 2.0), ev(40, 1, 3.0),   // session A (k=1)
      ev(200, 1, 4.0),                                  // session B starts
      ev(10, 2, 5.0), ev(30, 2, 6.0))                   // session C (k=2)
    val more = Seq(
      ev(230, 1, 7.0),                                  // extends session B
      ev(1000, 1, 0.0), ev(1000, 2, 0.0))               // watermark pushers
    val b1 = rows.toDF("ts", "k", "v")
    val b2 = more.toDF("ts", "k", "v")

    val all = b1.unionByName(b2)
    // the t=1000 pusher sessions stay OPEN at stream end and never emit
    // in append mode — compare only the closed sessions
    val batch = all
      .groupBy($"k", session_window($"ts", "60 seconds").as("sw"))
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .select($"k", $"sw.start".cast("long").as("s"), $"n", $"sv")
      .filter($"s" < 1000)
      .collect().map(_.toSeq).toSet

    val table = runBatches("wm_sess_test", Seq(b1, b2),
      s => s.withWatermark("ts", "10 seconds")
        .groupBy($"k", session_window($"ts", "60 seconds").as("sw"))
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .select($"k", $"sw.start".cast("long").as("s"), $"n", $"sv"),
      "append")
    val streamed = spark.table(table)
      .filter($"s" < 1000).collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(4)} extra=${(streamed -- batch).take(4)}")
  }

  test("dedupWithinWatermark drops cross-batch duplicates inside the horizon") {
    def ev(ts: Long, id: Long) = (new java.sql.Timestamp(ts * 1000L), id, s"p$id")
    val b1 = Seq(ev(0, 1), ev(1, 2), ev(2, 1), ev(30, 3))
      .toDF("ts", "doc_id", "payload")       // in-batch dup of id 1
    val b2 = Seq(ev(31, 2), ev(32, 4)).toDF("ts", "doc_id", "payload")

    val table = runBatches("wm_dedup_test", Seq(b1, b2),
      s => StreamOps.dedupWithinWatermark(s, "ts", Seq("doc_id"), "1 hour"),
      "append")

    val ids = spark.table(table).select($"doc_id").as[Long].collect().sorted
    // id 1 deduped in-batch; id 2's second arrival (t=31, within the 1h
    // horizon of t=1) deduped across batches; ids 3 and 4 kept.
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L), s"got ${ids.toSeq}")
  }
}
