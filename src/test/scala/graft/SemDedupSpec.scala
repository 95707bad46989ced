package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.SemDedup

/** SemDeDup contracts on a hand-built corpus: near-identical vectors
  * in the same cluster are flagged (higher id dropped), cross-cluster
  * near-dups are NOT candidates (the scoping that makes the operator
  * scale — and its documented recall trade-off), and sub-threshold
  * within-cluster pairs survive. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("within-cluster near-dups flagged; below-threshold pairs kept") {
    import spark.implicits._
    // two tight groups on opposite axes of R4 + one mild-similarity pair
    val rows = Seq(
      (1L, Array(1.0, 0.01, 0.0, 0.0)),   // group A
      (2L, Array(1.0, 0.012, 0.0, 0.0)),  // ~dup of 1
      (3L, Array(0.0, 0.0, 1.0, 0.01)),   // group B
      (4L, Array(0.0, 0.0, 1.0, 0.013)),  // ~dup of 3
      (5L, Array(0.6, 0.8, 0.0, 0.0)))    // same cell as A, cos ~0.6 — kept
    val df = rows.toDF("vec_id", "v")
    val out = SemDedup.pairs(df, "vec_id", "v", dims = 4, nCells = 2,
        threshold = 0.99)
      .collect().map(r => ((r.getLong(1), r.getLong(2)),
        (r.getDouble(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // the two tight pairs are flagged, higher id dropped
    val flagged = out.collect { case (pair, (_, d)) if d >= 0 => (pair, d) }
    assert(flagged.toSet.subsetOf(Set(((1L, 2L), 2L), ((3L, 4L), 4L))))
    assert(flagged.nonEmpty, "no near-dup flagged")
    // any evaluated sub-threshold pair carries a NULL drop_id
    out.foreach { case (_, (cos, d)) =>
      assert((cos >= 0.99) == (d >= 0), s"decision/cos mismatch at $cos")
    }
    // candidates never cross clusters: every pair's members share a cell
    val cells = SemDedup.pairs(df, "vec_id", "v", 4, 2, 0.99)
      .select("cell").distinct().count()
    assert(cells <= 2)
  }

  test("paper rule drops the member FARTHER from the cell centroid") {
    import spark.implicits._
    // one cell (nCells = 1, centroid = the md5-order pick), three
    // collinear near-dup vectors at increasing distance from wherever
    // the centroid lands: the paper rule must drop the farther member
    // of every flagged pair regardless of id order, which the default
    // keep-lowest-id rule gets WRONG whenever the farther member has
    // the lower id
    val rows = Seq(
      (10L, Array(1.0, 0.002, 0.0, 0.0)),
      (11L, Array(1.0, 0.001, 0.0, 0.0)),
      (12L, Array(1.0, 0.003, 0.0, 0.0)))
    val df = rows.toDF("vec_id", "v")
    val paper = SemDedup.pairs(df, "vec_id", "v", dims = 4, nCells = 1,
        threshold = 0.999, paperRule = true)
      .collect().map(r => ((r.getLong(1), r.getLong(2)),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(paper.size == 3 && paper.valuesIterator.forall(_ >= 0),
      s"all pairs here are near-identical: $paper")
    // ground truth without re-deriving the md5-order fit internals:
    // the cell vector is ONE of the inputs, and exactly one candidate
    // centroid must explain EVERY drop as its farther member (ties →
    // higher id)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = rows.toMap
    val explained = rows.map(_._2).exists { cv =>
      paper.forall { case ((a, b), drop) =>
        val da = d2(byId(a), cv); val db = d2(byId(b), cv)
        drop == (if (da > db) a else if (db > da) b else b)
      }
    }
    assert(explained, s"no single centroid explains the drops: $paper")
    // and the paper rule genuinely diverges from keep-lowest-id here:
    // with the centroid at one of the three collinear points, at least
    // one flagged pair keeps its HIGHER id
    val default = SemDedup.pairs(df, "vec_id", "v", dims = 4, nCells = 1,
        threshold = 0.999)
      .collect().map(r => ((r.getLong(1), r.getLong(2)),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(paper != default,
      "fixture must exercise the farther-member-has-lower-id case")
  }

  test("hierarchical fit: planted near-dups still flagged; deterministic") {
    import spark.implicits._
    // 40 points in two tight far-apart blobs + one planted near-dup
    // pair per blob; targetCell=10 → k=4 cells, S=2 supers. The
    // two-level routing may split a blob across cells, but a planted
    // pair (distance ~1e-3 apart) always lands in the SAME cell —
    // both route to the same super and the same nearest cell.
    val rows = (0L until 40L).map { i =>
      val blob = if (i < 20) 0.0 else 100.0
      val jitter = if (i % 20 < 2) (i % 20) * 1e-3 else (i % 20) * 0.1
      (i, Array(blob + jitter, blob - jitter, 0.5, 0.5))
    }
    val df = rows.toDF("vec_id", "v")
    val out = graft.sim.SemDedup.pairsHier(df, "vec_id", "v", dims = 4,
        targetCell = 10, threshold = 0.999)
      .collect()
    val flagged = out.filter(!_.isNullAt(4))
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(flagged.contains((0L, 1L)) && flagged.contains((20L, 21L)),
      s"planted near-dup pairs must be flagged, got $flagged")
    // every evaluated pair shares a cell by construction; assignment
    // is a partition (each id appears under exactly one cell)
    val cellOf = out.flatMap(r => Seq(
      r.getLong(1) -> r.getInt(0), r.getLong(2) -> r.getInt(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(cellOf.values.forall(_.size == 1),
      "a doc must pair only within its single assigned cell")
    val again = graft.sim.SemDedup.pairsHier(df, "vec_id", "v", dims = 4,
        targetCell = 10, threshold = 0.999).collect()
    assert(out.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("pairs auto-switches to the hierarchical assignment past HierSwitch") {
    import spark.implicits._
    // round-16, VERDICT item 2: the DEFAULT entry point must ride the
    // measured-better two-level topology once the cell count exceeds
    // HierSwitch (=4) — bit-identical to the explicit pairsHier path —
    // while small fits keep the exact flat argmin (previous tests pin
    // flat behavior at nCells 1/2/4).
    assert(SemDedup.HierSwitch == 4,
      "oracle SQL replays the switch at 4 — change both together")
    val rows = (0L until 40L).map { i =>
      val blob = (i % 4) * 50.0
      (i, Array(blob + i * 1e-3, blob - i * 1e-3, 1.0, 0.5))
    }
    val df = rows.toDF("vec_id", "v")
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    // targetCell=5 → k=8 > HierSwitch: default == explicit hierarchical
    val viaDefault = SemDedup.pairs(df, "vec_id", "v", dims = 4, nCells = 0,
      threshold = 0.9, targetCell = 5).collect().map(key).toSet
    val viaHier = SemDedup.pairsHier(df, "vec_id", "v", dims = 4,
      targetCell = 5, threshold = 0.9).collect().map(key).toSet
    assert(viaDefault == viaHier)
    assert(viaDefault.nonEmpty, "fixture must produce within-cell pairs")
  }

  test("adaptive targetCell mode = fixed nCells at the implied count") {
    import spark.implicits._
    // 10 points, targetCell=3 → nCells = ceil(10/3) = 4: the adaptive
    // mode must be bit-identical to fixed nCells=4 (same fit, same
    // assignment, same pairs) — the rule the oracle's subquery LIMIT
    // replays. Exactly-one-mode contract enforced.
    val rows = (1L to 10L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 7.0 + d) * 3)))
    val df = rows.toDF("vec_id", "v")
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    val adaptive = SemDedup.pairs(df, "vec_id", "v", dims = 4, nCells = 0,
      threshold = 0.9, targetCell = 3).collect().map(key).toSet
    val fixed = SemDedup.pairs(df, "vec_id", "v", dims = 4, nCells = 4,
      threshold = 0.9).collect().map(key).toSet
    assert(adaptive == fixed)
    intercept[IllegalArgumentException](
      SemDedup.pairs(df, "vec_id", "v", 4, 0, 0.9))
    intercept[IllegalArgumentException](
      SemDedup.pairs(df, "vec_id", "v", 4, 2, 0.9, targetCell = 3))
  }
}
