package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.ThetaKmv

/** Contracts for the KMV / bottom-k theta sketch (sketch.ThetaKmv).
  * The declared queries (th1_theta_overlap, th2_theta_merge) hash-gate
  * the estimates against the DuckDB replay; these specs pin what the
  * hash can't see — ACCURACY vs exact set algebra on planted-overlap
  * fixtures, the exact-count branch below capacity, duplicate
  * insensitivity, and the merge-equals-direct retained-set identity
  * that makes the sketch a rollup primitive. */
class ThetaKmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two segments with planted overlap: A = keys [0, 4000),
    * B = keys [2000, 6000) → |A|=|B|=4000, |A∩B|=2000, |A∪B|=6000,
    * J = 1/3. Key strings are disambiguated through the same md5 the
    * sketch uses, so no accidental structure survives hashing. */
  private lazy val planted = {
    val a = spark.range(0, 4000).select(lit("A").as("g"), $"id".as("k"))
    val b = spark.range(2000, 6000).select(lit("B").as("g"), $"id".as("k"))
    a.union(b)
  }

  test("grouped distinct estimate: estimator branch within 4/sqrt(k)") {
    // k=256 -> RSE ~ 1/sqrt(254) ~ 6.3%; 4 sigma bound (fixed draw,
    // asserts branch sanity not a re-roll)
    val est = ThetaKmv.estimate(planted, "g", "k", k = 256)
      .select($"g", $"est_distinct").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("A") - 4000) / 4000.0 < 0.25, s"A: ${est("A")}")
    assert(math.abs(est("B") - 4000) / 4000.0 < 0.25, s"B: ${est("B")}")
  }

  test("decade accuracy: relative error <= 3/sqrt(k) at >=100k keys") {
    // Pins the THIRD-DECADE accuracy claim at spec level (round-18,
    // VERDICT item 7): docs/SCALING.md measured −0.11% at 1.5M keys on
    // sf2x, but only prose carried it — estimator drift (a changed
    // hash prefix width, a k-th-order-statistic off-by-one) must fail
    // the SUITE. Three cardinalities spanning the 100k decade, one
    // fixed deterministic draw (md5 keyspace), bound 3/√k ≈ 18.8% at
    // k=256 — generous vs the measured ~0.1% but tight enough that
    // any structural estimator bug (wrong denominator, truncated
    // hash, estimate-from-k−1) trips it.
    val ns = Seq(100000L, 130000L, 170000L)
    val corpus = ns.zipWithIndex.map { case (n, i) =>
      spark.range(0, n).select(lit(s"D$i").as("g"), ($"id" + i * 1000000L).as("k"))
    }.reduce(_ union _)
    val est = ThetaKmv.estimate(corpus, "g", "k", k = 256)
      .select($"g", $"est_distinct").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bound = 3.0 / math.sqrt(256.0)
    ns.zipWithIndex.foreach { case (n, i) =>
      val rel = math.abs(est(s"D$i") - n) / n.toDouble
      assert(rel <= bound,
        s"D$i: est ${est(s"D$i")} vs $n (rel ${"%.4f".format(rel)} > $bound)")
    }
  }

  test("exact branch: below-capacity group returns the exact count") {
    val small = spark.range(0, 100).select(lit("S").as("g"), $"id".as("k"))
    val r = ThetaKmv.estimate(small, "g", "k", k = 256)
      .select($"n_ret", $"est_distinct").head()
    assert(r.getLong(0) == 100L)
    assert(r.getDouble(1) == 100.0)
  }

  test("duplicates don't move the estimate (distinct semantics)") {
    val dup = planted.union(planted).union(planted)
    val a = ThetaKmv.estimate(planted, "g", "k", 256)
      .orderBy($"g").collect().map(_.getDouble(2)).toSeq
    val b = ThetaKmv.estimate(dup, "g", "k", 256)
      .orderBy($"g").collect().map(_.getDouble(2)).toSeq
    assert(a == b, s"duplication changed estimates: $a vs $b")
  }

  test("registers retain at most k ascending distinct hashes per group") {
    val regs = ThetaKmv.registers(planted, "g", "k", k = 256).collect()
    val byG = regs.groupBy(_.getString(0))
    assert(byG.keySet == Set("A", "B"))
    byG.values.foreach { rows =>
      assert(rows.length == 256)
      val hs = rows.sortBy(_.getInt(2)).map(_.getLong(1))
      assert(hs.toSeq == hs.sorted.toSeq, "rn order is not h order")
      assert(hs.distinct.length == hs.length, "duplicate hash retained")
      assert(hs.forall(h => h >= 0 && h < (1L << 52)), "hash out of range")
    }
  }

  test("pairwise overlap: union/intersection/jaccard near planted truth") {
    val r = ThetaKmv.pairwiseOverlap(planted, "g", "k", k = 256).head()
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    val jacc = r.getDouble(3)
    val estU = r.getDouble(4)
    val estI = r.getDouble(5)
    // Jaccard from a 256-sample of the union: sd ~ sqrt(J(1-J)/k) ~ 3%
    assert(math.abs(jacc - 1.0 / 3) < 0.12, s"jaccard $jacc vs 1/3")
    assert(math.abs(estU - 6000) / 6000.0 < 0.25, s"union $estU vs 6000")
    assert(math.abs(estI - 2000) / 2000.0 < 0.40, s"inter $estI vs 2000")
  }

  test("disjoint segments estimate zero intersection exactly") {
    val a = spark.range(0, 3000).select(lit("A").as("g"), $"id".as("k"))
    val b = spark.range(10000, 13000).select(lit("B").as("g"), $"id".as("k"))
    val r = ThetaKmv.pairwiseOverlap(a.union(b), "g", "k", k = 256).head()
    assert(r.getLong(2) == 0L, "common hash in disjoint sets")
    assert(r.getDouble(3) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("identical segments estimate jaccard 1 and intersection = union") {
    val a = spark.range(0, 3000).select(lit("A").as("g"), $"id".as("k"))
    val b = spark.range(0, 3000).select(lit("B").as("g"), $"id".as("k"))
    val r = ThetaKmv.pairwiseOverlap(a.union(b), "g", "k", k = 256).head()
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == r.getDouble(5), "union != intersection at J=1")
  }

  test("merge equals direct: retained sets identical, diff 0") {
    val r = ThetaKmv.mergeVsDirect(planted, "g", "k", k = 256).head()
    assert(r.getLong(0) == r.getLong(2), "retained counts differ")
    assert(r.getDouble(1) == r.getDouble(3), "estimates differ")
    assert(r.getDouble(4) == 0.0)
  }

  test("merge equals direct on the exact branch too") {
    val r = ThetaKmv.mergeVsDirect(planted, "g", "k", k = 4096).head()
    // 6000 distinct keys > 4096 -> still estimator; shrink to force exact
    val small = planted.filter($"k" < 1000)
    val r2 = ThetaKmv.mergeVsDirect(small, "g", "k", k = 4096).head()
    assert(r.getDouble(4) == 0.0 && r2.getDouble(4) == 0.0)
    assert(r2.getLong(0) == 1000L && r2.getDouble(1) == 1000.0)
  }

  test("partition-layout invariance: estimates at 1 and 16 partitions") {
    val p1 = ThetaKmv.estimate(planted.repartition(1), "g", "k", 256)
      .orderBy($"g").collect().map(_.getDouble(2)).toSeq
    val p16 = ThetaKmv.estimate(planted.repartition(16), "g", "k", 256)
      .orderBy($"g").collect().map(_.getDouble(2)).toSeq
    assert(p1 == p16, s"parallelism changed the estimate: $p1 vs $p16")
  }
}
