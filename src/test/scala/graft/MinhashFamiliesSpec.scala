package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Pins for the s-curve family-count derivation (round-20, d23's
  * adaptive knob): `Dedup.familiesForRecall` must reproduce the exact
  * ladder the DuckDB oracle replays — the declared configuration's
  * F=2 and the branch boundaries around it. */
class MinhashFamiliesSpec extends AnyFunSuite {

  test("declared d23 configuration derives F=2") {
    // p1 = 1 − (1 − 0.5²)^8 = 0.899887…: one family misses the 0.9
    // target by 1.1e-4 (the margin making the cross-engine power()
    // replay safe), two families reach 0.9900
    assert(Dedup.familiesForRecall(target = 0.9, s0 = 0.5, r = 2, b = 8) == 2)
  }

  test("targets on either side of one family's catch probability") {
    // 0.89 < p1 = 0.8999 → a single family suffices
    assert(Dedup.familiesForRecall(0.89, 0.5, 2, 8) == 1)
    // 0.99: (1−p1)² = 0.0100226 > 0.01 by 2.3e-5 → three families
    assert(Dedup.familiesForRecall(0.99, 0.5, 2, 8) == 3)
  }

  test("unreachable target under maxF fails loudly, not silently short") {
    // 4×4 banding at J=0.5 catches 0.2275 per family → 0.9 needs 9
    // families; the default maxF=8 must refuse (the oracle's
    // error() branch, not a silently-weaker composition)
    val e = intercept[IllegalArgumentException](
      Dedup.familiesForRecall(0.9, 0.5, 4, 4))
    assert(e.getMessage.contains("unreachable"), e.getMessage)
    // and raising maxF resolves it at the closed-form count
    assert(Dedup.familiesForRecall(0.9, 0.5, 4, 4, maxF = 16) == 9)
  }

  test("domain guards") {
    intercept[IllegalArgumentException](Dedup.familiesForRecall(1.0, 0.5, 2, 8))
    intercept[IllegalArgumentException](Dedup.familiesForRecall(0.9, 0.0, 2, 8))
  }
}
