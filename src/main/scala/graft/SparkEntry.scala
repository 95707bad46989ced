package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries._
import graft.regimes.Transitions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are declared in per-domain `QueryPack`s under `graft.queries`;
  * each pack row maps 1:1 to a SURVEY §2 operator and carries its DuckDB
  * oracle SQL where SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalPack,
    TimeSeriesPack,
    IndicatorPack,
    PanelPack,
    TextPack,
    DedupSimPack,
    MlPack,
    StreamMultimodalPack)

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Full regime-transition pipeline: scan → window sessionization
    * (gaps-and-islands) → transition-count aggregate (SURVEY EP2 stages
    * 1-6 re-keyed to the events panel). */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("t", unix_micros(col("ts")))
    val trans = Transitions.transitions(
      ev, Seq("user_id"), "t", "event_id", "event_type",
      (start, end) => (end - start) / lit(3600e6))
    Transitions.transitionProbabilities(trans, "from_label", "to_label")
      .orderBy(desc("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
