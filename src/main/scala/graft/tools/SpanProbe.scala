package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-19): stage decomposition of d15_span_dedup at the
  * sf3d decade — where do the ~100s go (gram explode+checkpoint, DF
  * band, banded self-join, diagonal windows)?
  *
  *   sbt "runMain graft.tools.SpanProbe /root/repo/target/sf3d"
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/target/sf3d"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextOps
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[span-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val docs = graft.io.Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .localCheckpoint()
    val grams = toks
      .select(col("doc_id"), when(size(col("ts")) >= 3,
        transform(sequence(lit(1), size(col("ts")) - 2), i =>
          TextOps.hash60(concat_ws(" ", element_at(col("ts"), i),
            element_at(col("ts"), i + 1), element_at(col("ts"), i + 2)))))
        .otherwise(array().cast("array<long>")).as("ghs"))
      .select(col("doc_id"), posexplode(col("ghs")).as(Seq("pos0", "gh")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("gh"))
    val g = t("grams explode + localCheckpoint")(grams.localCheckpoint())
    println(s"[span-probe] gram rows: ${g.count()}")
    val band = t("DF band agg")(
      g.groupBy(col("gh")).agg(countDistinct(col("doc_id")).as("ndocs"))
        .filter(col("ndocs").between(2, 10)).select(col("gh"))
        .localCheckpoint())
    println(s"[span-probe] banded grams: ${band.count()}")
    val banded = g.join(band, "gh")
    val m = t("band join + self-join + diag agg") {
      import org.apache.spark.sql.expressions.Window
      val matches = banded.as("a").join(banded.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pa"), (col("a.pos") - col("b.pos")).as("diag"))
      val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
        .orderBy(col("pa"))
      matches.withColumn("grp", col("pa") - row_number().over(w))
        .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
        .agg(count(lit(1)).as("run_anchors"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(max(col("run_anchors")).as("mx"))
        .filter(col("mx") + 2 >= 5)
        .count()
    }
    println(s"[span-probe] pairs: $m")
    spark.stop()
  }
}
