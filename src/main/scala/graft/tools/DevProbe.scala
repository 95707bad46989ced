package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.io.Tables

/** Dev-only scratch probe for isolating stage costs of queries under
  * optimization. Edited freely between measurements. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "10")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val p = 2147483647L
    val docs = Tables.documents(spark, dir)
    (1 to 2).foreach { rep =>
      val aggd = t(s"rep$rep st28 index agg build (single-pass)") {
        val a = Dedup.shingleRows(docs, "doc_id", "text", 3)
          .withColumn("h30",
            pmod(graft.text.TextOps.hash60($"sh"), lit(1073741824L)))
          .groupBy($"id")
          .agg(collect_set($"sh").as("shs_c"),
            (0 until 16).map(i =>
              min(($"h30" * Dedup.permA(i) + Dedup.permB(i)) % p)
                .as(s"__s$i")): _*)
          .localCheckpoint()
        a
      }
      val streamShape = docs
        .filter($"doc_id" % 5 === 0)
        .select($"doc_id",
          graft.text.TextOps.shingles(
            graft.text.TextOps.tokens($"text"), 3).as("shs"))
        .filter(size($"shs") > 0)
        .withColumn("h30s", transform($"shs",
          sh => pmod(graft.text.TextOps.hash60(sh), lit(1073741824L))))
      t(s"rep$rep stream-side shingle+h30s only (noop)") {
        streamShape.select($"doc_id", $"h30s")
          .write.format("noop").mode("overwrite").save()
      }
      val withSig = streamShape
        .withColumn("sig", array((0 until 16).map(i =>
          array_min(transform($"h30s", h =>
            (h * Dedup.permA(i) + Dedup.permB(i)) % p))): _*))
      t(s"rep$rep stream-side + 16-perm in-row sig (noop)") {
        withSig.select($"doc_id", $"sig")
          .write.format("noop").mode("overwrite").save()
      }
      val banded = withSig
        .select($"doc_id", $"shs",
          posexplode(array((0 until 4).map(b =>
            md5(concat_ws(",", (0 until 4).map(r =>
              element_at($"sig", b * 4 + r + 1).cast("string")): _*))): _*))
            .as(Seq("band", "band_key")))
      val index = aggd.select($"id".as("corpus_id"),
        posexplode(array((0 until 4).map(b =>
          md5(concat_ws(",", (0 until 4).map(r =>
            col(s"__s${b * 4 + r}").cast("string")): _*))): _*))
          .as(Seq("band", "band_key")))
      val corpusShs = aggd.select($"id".as("corpus_id"), $"shs_c")
      t(s"rep$rep full join+verify batch-shape (noop)") {
        banded.join(index, Seq("band", "band_key"))
          .filter($"doc_id" =!= $"corpus_id")
          .join(corpusShs, Seq("corpus_id"))
          .select(least($"doc_id", $"corpus_id").as("id_a"),
            greatest($"doc_id", $"corpus_id").as("id_b"),
            size(array_intersect($"shs", $"shs_c")).as("n_inter"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
