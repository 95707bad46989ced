package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StateMetrics

/** The streaming state-size ALARM's decision logic (round 11): a
  * recorded peak over its declared ceiling must surface as a
  * violation (Bench marks the query failed), a peak within must not,
  * and st22's PINNED-stateless ceiling (0 rows) must trip on ANY
  * state — the serving path growing state is a design regression. */
class StateMetricsSpec extends AnyFunSuite {

  test("violations flags over-ceiling peaks and passes in-ceiling ones") {
    StateMetrics.reset()
    try {
      val n = 10000L
      // st2 ceiling = 64 + 0.05 * 10000 = 564
      StateMetrics.recordRaw("st2", 564L) // at the cap — passes
      StateMetrics.recordRaw("st9", 256L + 8001L) // 0.8x cap + abs + 1 — trips
      StateMetrics.recordRaw("st17", 4096L) // exactly the register count — passes
      StateMetrics.recordRaw("st22", 1L) // pinned stateless — ANY state trips
      val got = StateMetrics.violations(n).map(_._1)
      assert(got == Seq("st22", "st9"), s"got $got")
      // and the reported numbers are (rows, cap)
      val st9 = StateMetrics.violations(n).find(_._1 == "st9").get
      assert(st9._2 == 8257L && st9._3 == 8256L)
    } finally StateMetrics.reset()
  }

  test("byte ceilings trip on wide-payload growth at constant rows") {
    StateMetrics.reset()
    try {
      val n = 10000L
      // st2 rows cap = 564 → bytes cap = max(16 MiB, 564 × 4096) = 16 MiB
      StateMetrics.recordRaw("st2", 100L)           // rows fine
      StateMetrics.recordRaw("st2:bytes", 16L << 20) // at the floor — passes
      StateMetrics.recordRaw("st9:bytes", 64L << 20) // cap 8256×4096≈32 MiB — trips
      val got = StateMetrics.violations(n).map(_._1)
      assert(got == Seq("st9:bytes"), s"got $got")
    } finally StateMetrics.reset()
  }

  test("st11 ceiling derives from the measured calendar span") {
    StateMetrics.reset()
    try {
      // 900-day span × 25 groups = 22500 healthy state rows: the old
      // absolute 4096 would false-trip; the span-derived cap
      // (900 × 25 × 2 = 45000) passes, while a per-event leak still trips
      StateMetrics.recordRaw("st11", 22500L)
      assert(StateMetrics.violations(10000L, spanDays = 900L).isEmpty)
      assert(StateMetrics.violations(10000L).map(_._1) == Seq("st11"),
        "no-span fallback keeps the absolute cap")
      StateMetrics.recordRaw("st11", 150L * 25L * 100L)
      assert(StateMetrics.violations(10000L, spanDays = 900L)
        .map(_._1) == Seq("st11"), "a real leak exceeds the span cap too")
    } finally StateMetrics.reset()
  }

  test("late totals accumulate additively") {
    StateMetrics.reset()
    try {
      StateMetrics.addRaw("st3:late", 5L)
      StateMetrics.addRaw("st3:late", 7L)
      assert(StateMetrics.snapshot("st3:late") == 12L)
      // and :late keys are never ceiling-checked
      assert(StateMetrics.violations(10L).isEmpty)
    } finally StateMetrics.reset()
  }

  test("late publishes the max SINGLE-RUN total, not a cross-run sum") {
    // warmup pass + bench reps replay the same stream prefix; summing
    // across those runs multiply-counts a nonzero drop (round-14
    // ADVICE fix) — within a run totals add, across runs they max-merge
    StateMetrics.reset()
    try {
      StateMetrics.recordLate("sty", "run-a", 3L)
      StateMetrics.recordLate("sty", "run-a", 4L) // same run: 3+4
      StateMetrics.recordLate("sty", "run-b", 5L) // other run: total 5
      assert(StateMetrics.snapshot("sty:late") == 7L,
        s"want max(7, 5): ${StateMetrics.snapshot}")
      StateMetrics.recordLate("sty", "run-c", 9L)
      assert(StateMetrics.snapshot("sty:late") == 9L)
    } finally StateMetrics.reset()
  }

  test("session listener records rows, bytes and late keys for a real run") {
    val spark = SparkTestSession.spark // fixture registers ensureListener
    import spark.implicits._
    StateMetrics.reset()
    try {
      val stream = spark.readStream
        .schema(graft.io.Tables.eventsSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet("/root/testdata/sf0.001")
      val q = stream.groupBy($"event_type").count()
        .writeStream.outputMode("complete")
        .format("memory").queryName("stx_out_1").start()
      try q.processAllAvailable() finally q.stop()
      // listener events are posted asynchronously — wait for delivery
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!StateMetrics.snapshot.contains("stx") &&
          System.nanoTime() < deadline) Thread.sleep(50)
      val snap = StateMetrics.snapshot
      assert(snap.getOrElse("stx", 0L) > 0L, s"no rows peak in $snap")
      assert(snap.getOrElse("stx:bytes", 0L) > 0L, s"no bytes peak in $snap")
      assert(snap.getOrElse("stx:late", -1L) == 0L,
        s"complete ordered feed must drop nothing: $snap")
    } finally StateMetrics.reset()
  }

  test("every stream query with measured state has a declared ceiling") {
    // the alarm can't rot by omission: the bench-measured set (st1-st25)
    // must all be present in the ceilings map
    val want = (1 to 25).map(i => s"st$i").toSet
    assert(want.subsetOf(StateMetrics.ceilings.keySet),
      s"missing ceilings: ${want -- StateMetrics.ceilings.keySet}")
  }

  test("declared state shape covers all 25 st lines, including the zeros") {
    // round-16, VERDICT item 5: st22 (stream-static NB model serving),
    // st24 (stream-static enrich) and st28/st30 (stream-static text /
    // embedding near-dedup, round-19) are the ONLY structurally
    // stateless lines — their ceilings pin 0 so appearing state trips
    // — and every other line declares a nonzero cap so vanished state
    // trips the shape check instead of passing ceilings-green on an
    // accidental 0.
    assert(StateMetrics.statelessByDesign ==
      Set("st22", "st24", "st28", "st30", "st31"))
    StateMetrics.statelessByDesign.foreach { q =>
      val c = StateMetrics.ceilings(q)
      assert(c.abs == 0L && c.perInput == 0.0,
        s"$q declared stateless but its ceiling admits state: $c")
    }
    (1 to 25).map(i => s"st$i")
      .filterNot(StateMetrics.statelessByDesign).foreach { q =>
        val c = StateMetrics.ceilings(q)
        assert(c.abs > 0L || c.perInput > 0.0,
          s"$q declared stateful but its ceiling pins zero: $c")
      }
  }

  test("shapeViolations trips on vanished state, not on designed zeros") {
    StateMetrics.reset()
    try {
      // st22/st24 at zero: by design — no shape violation
      StateMetrics.recordRaw("st22", 0L)
      StateMetrics.recordRaw("st22:bytes", 0L)
      StateMetrics.recordRaw("st24", 0L)
      StateMetrics.recordRaw("st24:bytes", 0L)
      // st2 healthy: rows AND bytes nonzero
      StateMetrics.recordRaw("st2", 100L)
      StateMetrics.recordRaw("st2:bytes", 4096L)
      assert(StateMetrics.shapeViolations.isEmpty,
        s"healthy run flagged: ${StateMetrics.shapeViolations}")
      // a stateful line reading zero rows IS a violation
      StateMetrics.recordRaw("st3", 0L)
      StateMetrics.recordRaw("st3:bytes", 0L)
      // and zero BYTES at nonzero rows too (impossible store payload)
      StateMetrics.recordRaw("st9", 50L)
      val got = StateMetrics.shapeViolations
      assert(got.size == 2 && got.exists(_.startsWith("st3:")) &&
        got.exists(_.startsWith("st9:")), s"got $got")
      // unmeasured lines (subset run) are never flagged: st1..st21
      // absent from this snapshot and absent from the violations
      assert(!got.exists(_.startsWith("st1:")))
    } finally StateMetrics.reset()
  }
}
