package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for frames that library functions persist
  * INTERNALLY (mid-pipeline frames the caller never sees, e.g. the
  * df-capped shingle table in `Dedup.blockedNgramNearDup` or the
  * normalized-embedding table in `Similarity.nearDupPairs`). The caller
  * can't unpersist what it can't reach; without tracking, repeated
  * invocations in a long-lived session (or Bench's warm + measured +
  * re-time passes) accumulate cached RDD blocks indefinitely.
  * `clear(session)` releases every tracked frame — Bench calls it
  * alongside the query packs' own clearCaches. */
object PersistRegistry {
  // All map access is under the registry lock: a lock-free variant can
  // interleave computeIfAbsent/add with a concurrent clear()'s remove and
  // strand a persisted frame in a dropped queue. The lock covers only
  // bookkeeping (unpersist runs outside it), and calls are rare
  // driver-side events, so contention is irrelevant.
  private val frames = scala.collection.mutable.Map[
    SparkSession, scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** Persist `df` and remember it for a later [[clear]]. */
  def trackPersist(df: DataFrame): DataFrame = {
    df.persist()
    synchronized {
      frames.getOrElseUpdate(df.sparkSession,
        scala.collection.mutable.ArrayBuffer.empty) += df
    }
    df
  }

  /** Unpersist every frame tracked for `session`. */
  def clear(session: SparkSession): Unit = {
    val tracked = synchronized { frames.remove(session) }
    tracked.foreach(_.foreach(_.unpersist()))
  }
}
