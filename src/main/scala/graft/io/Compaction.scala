package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the OPTIMIZE-style maintenance pass a
  * lakehouse runs over landed data (the write-side sibling of the
  * CDC/SCD2 tier): rewrite a parquet directory so each output file is
  * close to `targetRows` (the row-count stand-in for a byte budget —
  * the container has no table-format dependency to read footer sizes
  * through), preserving a declared sort within every file.
  *
  * Plan shape: ONE pass — `repartitionByRange` on the sort key with a
  * file count derived from a 1-action row count, then
  * `sortWithinPartitions` → each partition writes exactly one
  * range-clustered, internally-sorted file. This is what keeps
  * downstream range/min-max skipping effective after compaction: a
  * round-robin repartition would balance sizes but scatter the key
  * space across every file, destroying footer-stats selectivity.
  *
  * At 100 TB the same operator runs per partition directory (compact
  * yesterday's landing, not the table); the API takes the directory,
  * not the table root, for exactly that reason.
  */
object Compaction {

  /** Rewrite `srcDir` (parquet) into `dstDir` with ~`targetRows` rows
    * per file, each file sorted by `sortCols`. Returns the file count
    * written. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              sortCols: Seq[String], targetRows: Long): Int = {
    require(sortCols.nonEmpty, "compaction needs a sort key — an unsorted " +
      "rewrite destroys footer-stats skipping, use coalesce directly instead")
    val df = spark.read.parquet(srcDir)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val clustered = df
      .repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    clustered.write.mode("overwrite").parquet(dstDir)
    files
  }

  /** Count the parquet data files under a directory (spec probe). */
  def parquetFileCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)

  /** Per-file (min, max) of a column — the footer-stats view a skipping
    * scan sees; used by CompactionSpec to prove compaction preserves
    * range clustering (disjoint or near-disjoint file ranges). */
  def fileRanges(spark: SparkSession, dir: String,
                 column: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select(col(column), input_file_name().as("file"))
      .groupBy($"file")
      .agg(min(col(column)).as("lo"), max(col(column)).as("hi"))
  }
}
