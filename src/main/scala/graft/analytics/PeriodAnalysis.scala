package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Sinks
import graft.regimes.{Regimes, Transitions}

/** EP2 — the reference's top-level analytical entry point
  * (`market_analysis.py:652-736` run_period_analysis) as ONE composable
  * API over a (symbol, ts, close, volume) panel.
  *
  * Everything through `stats` is a single lazy DAG (SURVEY §3 EP2
  * "Spark shape"): scan → windowed features → classify → islands →
  * aggregates; the windowed feature frame is computed once (the
  * reference recomputes regimes three times), and only the terminal
  * aggregates are actions.
  */
object PeriodAnalysis {

  final case class PeriodResult(
      labeled: DataFrame,        // panel + features + regime
      regimeDistribution: DataFrame, // (regime, n, share)
      transitions: DataFrame,    // islands output + flags
      transitionProbs: DataFrame,
      topTransitions: DataFrame, // top-5 (from,to) by count
      stats: DataFrame)          // one-row period stats

  /** @param panel columns: symbol, ts (TimestampType), close, volume
    * @param start/end inclusive/exclusive period bounds (P2 filter —
    *        pushed to the scan when the panel is a raw parquet read) */
  def run(panel: DataFrame, start: String, end: String,
          excludeSymbols: Seq[String] = Nil): PeriodResult = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("ts"))
    val period = panel
      .filter(col("ts") >= to_timestamp(lit(start)) &&
              col("ts") < to_timestamp(lit(end)))
      .filter(!col("symbol").isin(excludeSymbols: _*))

    val labeled = Regimes
      .shortTermFeatures(period, "close", "volume", w)
      .withColumn("regime", Regimes.shortTermRegime())

    val dist = labeled.groupBy(col("regime")).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / sum(col("n")).over(Window.partitionBy()))

    val trans = Transitions.withFlags(
      Transitions.transitions(
        labeled.withColumn("t", unix_timestamp(col("ts"))),
        Seq("symbol"), "t", "t", "regime",
        (s, e) => (e - s) / lit(3600.0))) // hours, short_term.py:91
      .withColumn("duration_days", col("duration") / 24.0)

    val probs = Transitions.transitionProbabilities(trans, "from_label", "to_label")

    val top = trans.groupBy(col("from_label"), col("to_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("from_label"), col("to_label")).limit(5)

    val stats = trans.agg(
        count(lit(1)).as("n_transitions"),
        avg(col("duration_days")).as("avg_duration_days"),
        countDistinct(col("symbol")).as("n_symbols"))
      .crossJoin(broadcast(period
        .groupBy(date_trunc("day", col("ts")).as("__day"))
        .agg(sum(col("volume")).as("__dv"))
        .agg(avg(col("__dv")).as("avg_daily_volume"))))

    PeriodResult(labeled, dist, trans, probs, top, stats)
  }

  /** S6: render the period report text from a computed result
    * (period_comparison_stats.txt structure). */
  def report(name: String, r: PeriodResult): String = {
    val s = r.stats.collect()(0)
    val t = r.topTransitions.collect()
    val top = if (t.isEmpty) ("-", "-", 0L)
      else (t(0).getAs[String]("from_label"), t(0).getAs[String]("to_label"),
        t(0).getAs[Long]("n"))
    Sinks.periodReport(name,
      s.getAs[Long]("n_transitions"),
      Option(s.getAs[java.lang.Double]("avg_duration_days")).map(_.toDouble).getOrElse(0.0),
      s.getAs[Long]("n_symbols"),
      Option(s.getAs[java.lang.Double]("avg_daily_volume")).map(_.toDouble).getOrElse(0.0),
      top)
  }
}
