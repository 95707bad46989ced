package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Explain

/** Pins for the SinglePartition-exchange classifier behind the
  * `[plan-police]` close-out gate (round-20, VERDICT item 5): the
  * parse must locate each SinglePartition exchange in the formatted
  * tree, attribute it to its CONSUMER (nearest line one indent level
  * up), and split aggregate final-merges from everything else. */
class PlanPoliceSpec extends AnyFunSuite {

  private val plan =
    """== Physical Plan ==
* HashAggregate (5)
+- Exchange (4)
   +- * HashAggregate (3)
      +- * Sort (2)
         +- Exchange (1)
            +- Scan parquet (0)

(1) Exchange
Input [1]: [x#1]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]

(4) Exchange
Input [1]: [sum#2L]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
"""

  test("classify attributes each SinglePartition exchange to its consumer") {
    val c = Explain.classify(plan).toMap
    assert(c == Map(4 -> "HashAggregate", 1 -> "Sort"), c)
    assert(Explain.isAggregateMerge("HashAggregate"))
    assert(Explain.isAggregateMerge("ObjectHashAggregate"))
    assert(!Explain.isAggregateMerge("Sort"))
    assert(!Explain.isAggregateMerge("Window"))
    assert(!Explain.isAggregateMerge("<unlocated>"))
  }

  test("hash-partitioned exchanges are not flagged") {
    val p2 =
      """* HashAggregate (3)
+- Exchange (2)
   +- Scan parquet (1)

(2) Exchange
Input [1]: [x#1]
Arguments: hashpartitioning(x#1, 32), ENSURE_REQUIREMENTS, [plan_id=9]
"""
    assert(Explain.classify(p2).isEmpty)
  }

  test("an exchange id missing from the tree surfaces as unlocated") {
    val p3 =
      """* HashAggregate (3)
+- Scan parquet (1)

(7) Exchange
Input [1]: [x#1]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
"""
    assert(Explain.classify(p3) == Seq((7, "<unlocated>")))
  }

  test("the bounded-contract allowlist names only require-guarded sites") {
    // every entry must cite its bound; the list is an allowlist of
    // specific queries, not consumer kinds
    Explain.boundedByContract.foreach { case (q, why) =>
      assert(why.contains("require"), s"$q: citation must name the require")
    }
    assert(Explain.boundedByContract.keySet == Set(
      "g17_approx_quantile", "g18_grouped_quantile",
      "st18_stream_quantile", "km1_kaplan_meier"))
  }
}
