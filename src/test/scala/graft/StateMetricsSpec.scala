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

  test("every stream query with measured state has a declared ceiling") {
    // the alarm can't rot by omission: the bench-measured set (st1-st22)
    // must all be present in the ceilings map
    val want = (1 to 23).map(i => s"st$i").toSet
    assert(want.subsetOf(StateMetrics.ceilings.keySet),
      s"missing ceilings: ${want -- StateMetrics.ceilings.keySet}")
  }
}
