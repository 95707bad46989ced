package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the manual fallback when AQE's
  * skew-join splitting isn't applicable, e.g. skewed aggregations or
  * non-sort-merge joins).
  *
  * Salts are DERIVED deterministically from a high-cardinality column
  * (`pmod(hash(tiebreak), n)`) — never `rand()` — so plans stay
  * reproducible and retries/speculative tasks can't diverge.
  */
object Salting {

  /** Deterministic salt in [0, n). */
  def salt(tiebreak: Column, n: Int): Column = pmod(hash(tiebreak), lit(n))

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (key, salt) — spreading one hot key over n reducers — then final
    * aggregate on key. sum/count re-aggregate losslessly. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     tiebreakCol: String, n: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(col(tiebreakCol), n))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__c")).as("cnt"))
  }

  /** Skewed equi-join: replicate the SMALL side n× (one copy per salt),
    * salt the big side deterministically, join on (key, salt). The hot
    * key's rows land on n tasks instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 tiebreakCol: String, n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(col(tiebreakCol), n))
    val replicated = small.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
