package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch probe for isolating stage costs / per-round plan
  * shapes of queries under optimization. Not part of any declared
  * surface; edited freely between measurements. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "10")
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
    // real corr graph (the m11/m20 input)
    val d = graft.io.Tables.events(spark, dir)
      .filter($"user_id" < 200)
      .groupBy(expr("unix_micros(date_trunc('day', ts))")
        .as("day"), $"user_id")
      .agg(sum($"value").as("v"))
    val c = d.as("a").join(d.as("b"),
        $"a.day" === $"b.day" && $"a.user_id" < $"b.user_id")
      .groupBy($"a.user_id".as("ka"), $"b.user_id".as("kb"))
      .agg(round(corr($"a.v", $"b.v") + lit(1e-9), 4).as("r"))
      .filter(abs($"r") > 0.3).localCheckpoint()
    println(s"[probe] corr edges: ${c.count()}")
    val cw = c.select($"ka", $"kb", abs($"r").as("w"))
    val edges = cw.select($"ka".as("src"), $"kb".as("dst"), $"w")
      .unionByName(cw.select($"kb".as("src"), $"ka".as("dst"), $"w"))
    val seeds = edges.select($"src".as("node")).distinct()
      .filter($"node" < 20)

    def rounds(tag: String, mkNorm: DataFrame => DataFrame,
               mkNodes: DataFrame => DataFrame): Unit = {
      val outw = edges.groupBy($"src").agg(sum($"w").as("outw"))
      val norm = t(s"$tag norm build") { mkNorm(edges.join(outw, "src")
        .select($"src", $"dst", ($"w" / $"outw").as("wn"))) }
      val nodes = t(s"$tag nodes build") {
        mkNodes(edges.select($"src".as("node")).distinct()) }
      val seedF = seeds.select($"node").distinct()
        .withColumn("is_seed", lit(1.0))
      val ns = seedF.agg(count(lit(1)).as("ns"))
      def restart = nodes.join(broadcast(seedF), Seq("node"), "left")
        .crossJoin(broadcast(ns))
        .select($"node", (coalesce($"is_seed", lit(0.0)) / $"ns").as("r0"))
      var pr = t(s"$tag pr0") {
        restart.select($"node", $"r0".as("pr")).localCheckpoint() }
      (1 to 10).foreach { i =>
        t(s"$tag round $i") {
          val contrib = norm.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy($"dst".as("node"))
            .agg(sum($"pr" * $"wn").as("c"))
          pr = restart.join(contrib, Seq("node"), "left")
            .select($"node",
              (lit(0.15) * $"r0" + lit(0.85) * coalesce($"c", lit(0.0)))
                .as("pr"))
          if (i % 2 == 0 || i == 10) pr = pr.localCheckpoint()
        }
      }
      t(s"$tag final noop") {
        pr.write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 2).foreach { rep =>
      rounds(s"OLD rep$rep", _.localCheckpoint(), _.localCheckpoint())
      rounds(s"NEW rep$rep",
        df => graft.operators.LoopFrames.keyed(df, "src"),
        df => graft.operators.LoopFrames.keyed(df, "node"))
    }
    spark.stop()
  }
}
