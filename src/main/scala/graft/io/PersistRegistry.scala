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
  private val frames = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.Queue[DataFrame]]()

  /** Persist `df` and remember it for a later [[clear]]. */
  def trackPersist(df: DataFrame): DataFrame = {
    df.persist()
    frames.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Unpersist every frame tracked for `session`. */
  def clear(session: SparkSession): Unit = {
    val q = frames.remove(session)
    if (q != null) q.forEach(df => df.unpersist())
  }
}
