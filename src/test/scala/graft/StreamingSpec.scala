package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.regimes.Transitions
import graft.streaming.StreamOps

/** Cross-batch state correctness: the stateful islands stream must emit
  * exactly the batch transitions when the input arrives split across
  * MULTIPLE micro-batches (GroupState carries the open island over the
  * batch boundary — the single-batch driver query can't exercise that). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stateful transitions across two micro-batches == batch islands") {
    val rows = for (k <- 0L until 5L; i <- 0 until 40) yield {
      val label = if ((i / 7) % 3 == 0) "x" else if ((i / 7) % 3 == 1) "y" else "z"
      (k, i.toLong * 1000L, (k * 1000 + i).toLong, label)
    }
    val df = rows.toDF("user_id", "t", "event_id", "event_type")

    // batch ground truth
    val batch = Transitions.transitions(df, Seq("user_id"), "t", "event_id",
        "event_type", (s, e) => e - s)
      .select($"user_id", $"from_label", $"to_label", $"start_time", $"end_time")
      .collect().map(_.toSeq).toSet

    // two time-ordered files → two micro-batches (maxFilesPerTrigger=1)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    df.filter($"t" < 20000L).coalesce(1).write.parquet(s"$dir/in/p1")
    df.filter($"t" >= 20000L).coalesce(1).write.parquet(s"$dir/in/p2")
    // glob-ordered single directory with lexicographic batch order
    val f1 = new java.io.File(s"$dir/in/p1").listFiles().filter(_.getName.endsWith(".parquet")).head
    val f2 = new java.io.File(s"$dir/in/p2").listFiles().filter(_.getName.endsWith(".parquet")).head
    val streamDir = new java.io.File(s"$dir/stream"); streamDir.mkdirs()
    java.nio.file.Files.copy(f1.toPath, new java.io.File(streamDir, "batch_a.parquet").toPath)

    val schema = df.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      .as[StreamOps.KeyedEvent]
    val q = StreamOps.transitionsStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_trans_test").start()
    try {
      q.processAllAvailable()
      // second batch arrives after the first is fully processed
      java.nio.file.Files.copy(f2.toPath, new java.io.File(streamDir, "batch_b.parquet").toPath)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stream_trans_test")
      .select($"user_id", $"from_label", $"to_label", $"start_time", $"end_time")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
