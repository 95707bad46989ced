package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // suite-sized codegen-class cache — see the Bench.scala note
      // (default 100 entries thrash across ~300 queries; this caches
      // compiled code only, never results)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // exact state metrics for the st* runs (listener must precede the
    // first stream start; see StateMetrics.ensureListener)
    graft.streaming.StateMetrics.ensureListener(spark)
    new java.io.File(outDir).mkdirs()
    // NO data-proportional shuffle cap here, deliberately (round-19):
    // unlike Bench (where partitions=cpus at 32 measured ~60s of pure
    // scheduling overhead across the sf0.1 suite), Verify's wall time
    // at sf0.01 is latency-dominated — measured this round: 304s of
    // query time at 8/8, 319s at 32/32, 339s capped to 4, 349s capped
    // to 1. Partition count is noise for the gate; keeping the
    // 18-round-green config is worth more than ±5%.
    // Dev loop only (driver sets no env): SPARK_GRAFT_ONLY=a,b dumps a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Per-query wall timings (round-19, VERDICT item 1): CORRECTNESS_r18
    // came back empty — the leading hypothesis is the driver's
    // Verify+compare path outgrowing a wall budget (builder-measured
    // ~14 min Verify + >10 min DuckDB at sf0.01). Timing every query to
    // stderr and into outDir/timings.json makes the budget measurable
    // and names the lines to trim; stdout stays untouched for the driver.
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        timings(name) = dt
        System.err.println(f"[verify] $name%-28s ${dt}%6.2fs")
      }
    }
    // Locale.ROOT, not the default f"": a comma-decimal locale would
    // emit invalid JSON into a machine-read artifact (round-19 ADVICE)
    Files.writeString(Paths.get(s"$outDir/timings.json"),
      timings.map { case (k, v) =>
        "\"" + k + "\":" + "%.2f".formatLocal(java.util.Locale.ROOT, v)
      }.mkString("{", ",", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // release memoized/persisted frames before shutdown — keeps the
    // registries from pinning the session if this main is embedded
    SparkEntry.clearPackCaches(spark)
    spark.stop()
  }
}
