package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** State-store observability for the streaming tier: after a drained
  * run, [[record]] captures the PEAK total state rows the query's
  * stateful operators held (from the progress stream's
  * `stateOperators.numRowsTotal`). Bench emits the collected map as a
  * `stream_state_rows` sideline in BENCH_FULL.json, so the
  * "watermark-bounded state" claims on st9/st10/st12 are MEASURED
  * per round instead of asserted — a state-size regression (e.g. a
  * watermark accidentally dropped) shows up as a number, not a
  * wall-time mystery. */
object StateMetrics {

  private val peak =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Record `name` → max over progress reports of the sum of state
    * rows across the query's stateful operators. Stateless streams
    * (e.g. st11's broadcast enrich) record 0 — itself a useful pin. */
  def record(name: String, q: StreamingQuery): Unit = {
    val rows = q.recentProgress.map(p =>
      p.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    peak.merge(name, rows, math.max(_, _)): Unit
  }

  /** Peak state rows per recorded stream query (bench-run lifetime). */
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    peak.asScala.toMap
  }
}
