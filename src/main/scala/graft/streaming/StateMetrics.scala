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
    * (e.g. st11's broadcast enrich) record 0 — itself a useful pin.
    * Also records `name:late` → total rows dropped by the watermark
    * (summed over the run): the declared streams replay a complete
    * ordered file feed, so ANY watermark drop is silent data loss the
    * hash gate might not see (a dropped row can still produce the
    * right aggregate at sf0.01) — surfacing it in the bench sideline
    * makes that loss visible per round. */
  def record(name: String, q: StreamingQuery): Unit = {
    recordRaw(name, q.recentProgress.map(p =>
      p.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max))
    recordRaw(s"$name:late", q.recentProgress.map(p =>
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum)
  }

  /** Direct peak entry (the [[record]] reduction's sink; exposed for
    * StateMetricsSpec to exercise [[violations]] without a live
    * streaming query). */
  private[graft] def recordRaw(name: String, rows: Long): Unit =
    peak.merge(name, rows, math.max(_, _)): Unit

  /** Test hook: drop all recorded peaks. */
  private[graft] def reset(): Unit = peak.clear()

  /** Peak state rows per recorded stream query (bench-run lifetime). */
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    peak.asScala.toMap
  }

  /** Declared state-size ceiling: `abs + perInput × nInput` rows.
    * Set at ~1.5–2× the measured sf0.1 ratio (BENCH_FULL round 10), so
    * routine variance passes and a structural regression — a dropped
    * watermark, a key-cardinality state leak, an accidentally stateful
    * rewrite — trips the ALARM (round-11, VERDICT item 9): Bench marks
    * the query failed, so super-linear state growth fails the round
    * instead of hiding in a sideline. */
  final case class Ceiling(abs: Long, perInput: Double)

  /** Per-query ceilings. Key-cardinality states (per-user folds) sit
    * ~0.015×events at every SF — capped at 0.05×; stream-stream join
    * state measured 0.4× — capped 0.8×; st10's dedup state holds every
    * id inside the watermark (linear BY CONTRACT, measured 0.95×) —
    * capped 1.5×; sketch states are absolute (st17 = 2^12 HLL
    * registers EXACTLY, st20 quantile bins); st22 is PINNED stateless
    * — if the serving path ever grows state, that's a design
    * regression worth failing. */
  val ceilings: Map[String, Ceiling] = Map(
    "st1"  -> Ceiling(256, 0.01),
    "st2"  -> Ceiling(64, 0.05),
    "st3"  -> Ceiling(64, 0.2),
    "st4"  -> Ceiling(64, 0.05),
    "st5"  -> Ceiling(64, 0.05),
    "st6"  -> Ceiling(64, 0.05),
    "st7"  -> Ceiling(64, 0.0),
    "st8"  -> Ceiling(64, 0.0),
    "st9"  -> Ceiling(256, 0.8),
    "st10" -> Ceiling(256, 1.5),
    // st11's state is windowed-agg GROUP cardinality — day-windows ×
    // 5 segments × 5 types — bounded by the data's calendar span, NOT
    // by input rows (measured 750 at sf0.01 = 30 days × 25; 2250 at
    // sf0.1's 90 days). The old perInput model tripped falsely at
    // small SF (round 12: sf0.01 cap 564 < 750) while the honest bound
    // is absolute; a per-user or per-event leak lands ≥ 150×25 ≫ 4096
    // at every SF, so the ALARM keeps its teeth.
    "st11" -> Ceiling(4096, 0.0),
    "st12" -> Ceiling(256, 0.8),
    "st13" -> Ceiling(64, 0.05),
    "st14" -> Ceiling(64, 0.05),
    "st15" -> Ceiling(64, 0.05),
    "st16" -> Ceiling(64, 0.05),
    "st17" -> Ceiling(4096, 0.0),
    "st18" -> Ceiling(4096, 0.0),
    "st19" -> Ceiling(64, 0.05),
    "st20" -> Ceiling(64, 0.0),
    // st21's state is one row per touched CMS cell — structurally
    // ≤ depth × width = 4096 EXACTLY, input-independent (measured 2441
    // cells at sf0.01). Same round-12 recalibration as st11: the
    // perInput model was the wrong shape for a sketch-bounded state.
    "st21" -> Ceiling(4096, 0.0),
    "st22" -> Ceiling(0, 0.0),
    "st23" -> Ceiling(64, 0.05),
    // st24 is a stream-STATIC join — stateless by construction (the
    // dimension is a batch frame re-joined per micro-batch, no state
    // store); pinned at 0 like st22 so an accidentally stateful
    // rewrite fails the bench.
    "st24" -> Ceiling(0, 0.0))

  /** Recorded stream queries whose peak state exceeds their declared
    * ceiling at `nInput` input rows — empty on a healthy run. */
  def violations(nInput: Long): Seq[(String, Long, Long)] =
    snapshot.toSeq.sorted.flatMap { case (name, rows) =>
      ceilings.get(name).flatMap { c =>
        val cap = c.abs + (c.perInput * nInput).toLong
        if (rows > cap) Some((name, rows, cap)) else None
      }
    }
}
