package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S4: paged batch ingestion shape (reference
  * `src/data_processing/data_fetching.py:74-123`: since-cursor paging,
  * retry with exponential backoff, per-symbol loop).
  *
  * Spark-native shape: the symbol list is a Dataset; `mapPartitions`
  * fans the paging loops out across executors (the reference serializes
  * them in one Python process). The page function is pluggable so tests
  * inject an in-memory "API"; a production deployment plugs an HTTP
  * client in the same signature — the engine ships the orchestration
  * (cursor advance, retry, backoff), not the network client.
  */
object PagedIngest {

  final case class Candle(symbol: String, ts: Long, open: Double, high: Double,
                          low: Double, close: Double, volume: Double)

  /** Fetch all pages for all symbols.
    * @param fetchPage (symbol, sinceTs, limit) → page of candles ordered
    *                  by ts; empty page terminates that symbol's cursor.
    * @param retries   attempts per page; backoff is (attempt²)·baseBackoffMs
    *                  (exponential like the reference's 2^attempt sleep). */
  def fetchAll(spark: SparkSession, symbols: Seq[String], startTs: Long,
               endTs: Long, pageLimit: Int,
               fetchPage: (String, Long, Int) => Seq[Candle],
               retries: Int = 3, baseBackoffMs: Long = 0L): Dataset[Candle] = {
    import spark.implicits._
    symbols.toDS().repartition(math.min(symbols.size, 32))
      .mapPartitions { syms =>
        syms.flatMap { sym =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Candle]
          var since = startTs
          var done = false
          while (!done) {
            var page: Seq[Candle] = Seq.empty
            var attempt = 0
            var ok = false
            while (!ok && attempt < retries) {
              try { page = fetchPage(sym, since, pageLimit); ok = true }
              catch {
                case _: Exception if attempt < retries - 1 =>
                  attempt += 1
                  if (baseBackoffMs > 0)
                    Thread.sleep(baseBackoffMs * attempt * attempt)
                case e: Exception => throw e
              }
            }
            val kept = page.filter(c => c.ts >= since && c.ts < endTs)
            out ++= kept
            if (page.isEmpty || kept.isEmpty || page.last.ts >= endTs) done = true
            else since = page.last.ts + 1
          }
          out
        }
      }
  }
}
