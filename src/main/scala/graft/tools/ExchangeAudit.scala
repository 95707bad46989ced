package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev utility: count shuffle Exchanges in every declared query's
  * physical plan (sf0.001) — the generator for ShuffleBudgetSpec's
  * checked-in budget. A shuffle is THE unit of distributed cost; a
  * query whose Exchange count silently grows has regressed at 100 TB
  * even if its local wall time hasn't moved.
  *
  * Counting is textual over the printed plan: AQE's
  * `AdaptiveSparkPlanExec` exposes no public pre-execution child tree
  * (`inputPlan` predates EnsureRequirements, so it carries no Exchange
  * nodes yet), but its toString IS the initial plan with every
  * `Exchange hashpartitioning/rangepartitioning/SinglePartition` line.
  * `BroadcastExchange` (not a shuffle) and `ReusedExchange` (no second
  * shuffle) deliberately do not match the pattern, and everything
  * under an `InMemoryRelation` is skipped: a cached frame prints its
  * BUILD plan at every reference, but those shuffles run once, at
  * materialization — charging them to every reader would make any
  * query over a persisted frame look quadratic in references. */
object ExchangeAudit {

  def countShuffles(planString: String): Int = {
    var n = 0
    var skipIndent = -1 // inside an InMemoryRelation subtree when >= 0
    planString.split("\n").foreach { line =>
      val indent = line.indexWhere(c => c != ' ' && c != ':' && c != '+'
        && c != '-' && c != '*' && c != '(')
      val depth = if (indent < 0) 0 else indent
      if (skipIndent >= 0 && depth <= skipIndent) skipIndent = -1
      if (skipIndent < 0) {
        if (line.contains("InMemoryRelation")) skipIndent = depth
        else if (line.contains("- Exchange ")) n += 1
      }
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    // optional args(1): comma-separated name filter (incremental budget
    // lines for new queries; counts must still be taken cold — see
    // ShuffleBudgetSpec's cache-clearing preamble)
    val only = if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        println(s"[shuffles] $name " +
          countShuffles(df.queryExecution.executedPlan.toString))
      } catch {
        case e: Throwable => println(s"[shuffles] $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
