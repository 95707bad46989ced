package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextOps

/** Checkpoint-restart proofs for the STATELESS streaming near-dedup
  * shapes (round-20, VERDICT item 7): st28 (text, banded MinHash
  * against the standing index) and st30 (embeddings, hyperplane-LSH
  * multi-probe) carry no state store — their restart contract is the
  * file source's offset log plus the exactly-once parquet sink. These
  * specs run each shape against an incrementally-delivered input
  * (maxFilesPerTrigger=1), KILL the query mid-drain, restart from the
  * same checkpoint, and require the final sink MULTISET to equal the
  * batch run of the identical plan over the same files — committed
  * batches must not re-emit (exactly-once) and uncommitted ones must
  * replay (no loss), including the by-design band/probe fan-out
  * duplicates the declared queries collapse post-drain. */
class StreamNearDedupRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def waitFirstRows(sunk: () => Seq[_]): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (sunk().isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
  }

  test("st28 shape: stream-static text near-dedup recovers from checkpoint") {
    TestDirs.withTempDir("graft_st28_ckpt") { dir =>
      val docs = graft.io.Tables.documents(spark, Sf)
      val shIdx = Dedup.shingleRows(docs, "doc_id", "text", 3)
        .localCheckpoint()
      val index = Dedup.bandIndex(Dedup.minhashSignatures(shIdx, 16), 4, 4)
        .withColumnRenamed("id", "corpus_id").localCheckpoint()
      val corpusShs = shIdx.groupBy($"id".as("corpus_id"))
        .agg(collect_set($"sh").as("shs_c")).localCheckpoint()
      // arriving delta as 6 one-file micro-batches
      docs.filter($"doc_id" % 5 === 0).repartition(6)
        .write.parquet(s"$dir/in")

      val p = 2147483647L
      // st28's transform verbatim: in-row signature → band →
      // stream-static join → in-row exact verify (no state store)
      def chain(df: DataFrame): DataFrame = df
        .select($"doc_id",
          TextOps.shingles(TextOps.tokens($"text"), 3).as("shs"))
        .filter(size($"shs") > 0)
        .withColumn("h30s", transform($"shs",
          sh => pmod(TextOps.hash60(sh), lit(1073741824L))))
        .withColumn("sig", array((0 until 16).map(i =>
          array_min(transform($"h30s", h =>
            (h * Dedup.permA(i) + Dedup.permB(i)) % p))): _*))
        .select($"doc_id", $"shs",
          posexplode(array((0 until 4).map(b =>
            md5(concat_ws(",", (0 until 4).map(r =>
              element_at($"sig", b * 4 + r + 1).cast("string")): _*))): _*))
            .as(Seq("band", "band_key")))
        .join(index, Seq("band", "band_key"))
        .filter($"doc_id" =!= $"corpus_id")
        .join(corpusShs, Seq("corpus_id"))
        .select(least($"doc_id", $"corpus_id").as("id_a"),
          greatest($"doc_id", $"corpus_id").as("id_b"),
          size(array_intersect($"shs", $"shs_c")).as("n_inter"))

      def start() = chain(
          spark.readStream.schema(graft.io.Tables.documentsSchema)
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt").start()
      def sunk(): Seq[(Long, Long, Int)] =
        try spark.read.parquet(s"$dir/out")
          .as[(Long, Long, Int)].collect().toSeq
        catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }

      val q1 = start()
      try waitFirstRows(() => sunk()) finally q1.stop()
      val run1 = sunk()
      assert(run1.nonEmpty, "run 1 produced no committed output to survive")

      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = sunk()
      assert(got.size >= run1.size, "restart must keep prior committed output")

      // MULTISET equality vs the batch run of the same plan over the
      // same files: stricter than the post-drain distinct — proves no
      // replayed batch double-committed AND nothing was lost
      val want = chain(spark.read.parquet(s"$dir/in"))
        .as[(Long, Long, Int)].collect().toSeq
      assert(got.sorted == want.sorted,
        s"stream multiset diverges from batch: stream=${got.size} " +
          s"batch=${want.size} missingSample=${(want.toSet -- got.toSet).take(3)}")
    }
  }

  test("st30 shape: stream-static embedding near-dedup recovers from checkpoint") {
    TestDirs.withTempDir("graft_st30_ckpt") { dir =>
      val emb = graft.io.Tables.embeddings(spark, Sf)
        .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      val bits = Similarity.adaptiveBits(emb.count())
      val index = Similarity.withNormalized(emb, "v", "nv")
        .select($"vec_id".as("corpus_id"), $"label",
          Similarity.signBucket($"v", bits).as("probe"), $"nv".as("nv_c"))
        .localCheckpoint()
      // raw-schema delta files (vec_id, embedding, label) — both the
      // stream and the batch ground-truth read them with the same
      // declared schema + projection
      graft.io.Tables.embeddings(spark, Sf)
        .filter($"vec_id" % 5 === 0).repartition(6)
        .write.parquet(s"$dir/in")

      // st30's transform verbatim: normalize → bucket → Hamming-≤1
      // multi-probe fan on the arriving side → stream-static join → dot
      def chain(df: DataFrame): DataFrame = {
        val probed = Similarity.withNormalized(df, "v", "nv")
          .withColumn("b0", Similarity.signBucket($"v", bits))
          .withColumn("probe", explode(array(
            ($"b0" +: (0 until bits).map(i =>
              $"b0".bitwiseXOR(lit(1 << i)))): _*)))
        probed.join(index, Seq("label", "probe"))
          .filter($"vec_id" =!= $"corpus_id")
          .select($"label",
            least($"vec_id", $"corpus_id").as("id_a"),
            greatest($"vec_id", $"corpus_id").as("id_b"),
            Similarity.dot($"nv", $"nv_c").as("cos"))
      }

      def start() = chain(
          spark.readStream.schema(graft.io.Tables.embeddingsSchema)
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
            .select($"vec_id", $"label",
              $"embedding".cast("array<double>").as("v")))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt").start()
      def sunk(): Seq[(String, Long, Long, Option[Double])] =
        try spark.read.parquet(s"$dir/out")
          .as[(String, Long, Long, Option[Double])].collect().toSeq
        catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }

      val q1 = start()
      try waitFirstRows(() => sunk()) finally q1.stop()
      val run1 = sunk()
      assert(run1.nonEmpty, "run 1 produced no committed output to survive")

      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = sunk()
      assert(got.size >= run1.size, "restart must keep prior committed output")

      val want = chain(spark.read.parquet(s"$dir/in")
          .select($"vec_id", $"label",
            $"embedding".cast("array<double>").as("v")))
        .as[(String, Long, Long, Option[Double])].collect().toSeq
      // doubles are bit-identical (same plan, same engine) → exact
      // multiset compare is safe; Option covers zero-norm null cos
      implicit val ord: Ordering[(String, Long, Long, Option[Double])] =
        Ordering.by(t => (t._1, t._2, t._3, t._4.getOrElse(Double.NaN).toString))
      assert(got.sorted == want.sorted,
        s"stream multiset diverges from batch: stream=${got.size} " +
          s"batch=${want.size}")
    }
  }
}
