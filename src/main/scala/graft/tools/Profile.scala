package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.io.Tables

/** Dev utility: stage-wise timing of the heavier operators (not part of
  * the driver contract). */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3).persist()
    time("shingleRows materialize")(sh.count())
    val sigs = Dedup.minhashSignatures(sh, 16).persist()
    time("signatures materialize")(sigs.count())
    val cands = Dedup.lshCandidates(sigs, 4, 4).persist()
    time("lsh candidates")(cands.count())
    val ver = Dedup.verifyJaccard(cands, sh, sigs.select(col("id"), col("n_sh")))
    time("verify jaccard")(ver.count())
    spark.stop()
  }
}
