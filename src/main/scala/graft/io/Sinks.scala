package graft.io

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY §2.1 S2/S3/S6).
  *
  * S2 parquet: date/key-partitioned layout so downstream period filters
  * (P2) become partition PRUNING, not just row-group skipping — the
  * 100 TB reason the reference's "load everything then filter in memory"
  * (`market_analysis.py:656,674-678`) disappears.
  */
object Sinks {

  /** S2: parquet sink, optionally hive-partitioned by key columns. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S3: JSON-lines sink (`json.dump` of the symbol list,
    * data_fetching.py:56-57). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S6: the reference's plain-text multi-section stats report
    * (`market_analysis.py:824-841`; mirrors
    * period_comparison_stats.txt's structure). Driver-side formatting of
    * already-aggregated rows — the distributed work happened upstream. */
  def periodReport(periodName: String, nTransitions: Long, avgDurationDays: Double,
                   nSymbols: Long, avgDailyVolume: Double,
                   topTransition: (String, String, Long)): String = {
    f"""Period: $periodName
       |----------------------------------------
       |Number of transitions: $nTransitions%,d
       |Average regime duration: $avgDurationDays%.1f days
       |Number of assets: $nSymbols%d
       |Average daily volume: $avgDailyVolume%,.2f
       |Most common transition: ${topTransition._1} -> ${topTransition._2} (${topTransition._3}%,d times)
       |""".stripMargin
  }
}
