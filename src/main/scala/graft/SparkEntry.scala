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
    StreamMultimodalPack,
    MiscPack)

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * The full EP2 pipeline (SURVEY §3): events mapped onto the OHLCV
    * panel contract → windowed features → 5-class regime → islands →
    * transition probabilities, via the PeriodAnalysis API. */
  def entry(spark: SparkSession): DataFrame = {
    val panel = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("string").as("symbol"), col("ts"),
        col("value").as("close"),
        get_json_object(col("props"), "$.k").cast("double").as("volume"))
    val r = graft.analytics.PeriodAnalysis.run(panel, "2024-01-01", "2024-03-01")
    r.regimeDistribution.orderBy(desc("n"))
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
