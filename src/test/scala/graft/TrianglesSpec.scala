package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Triangles

/** Triangle-count pins on closed-form graphs, plus the wedge-cost
  * separation that motivates degree orientation. Edge lists are in
  * canonical (ka < kb) form as the operator requires. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def counts(e: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(e.toDF("ka", "kb"))
      .as[(Long, Long)].collect().toMap

  test("K4: every node in C(3,2) = 3 triangles, 4 triangles total") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val c = counts(k4)
    assert(c == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val tri = Triangles.enumerate(k4.toDF("ka", "kb")).count()
    assert(tri == 4)
  }

  test("path graph: no triangles") {
    assert(counts(Seq((0L, 1L), (1L, 2L), (2L, 3L))).isEmpty)
  }

  test("square with one diagonal: diagonal nodes in 2, others in 1") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    assert(counts(g) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("hub-and-spoke: degree orientation pays 0 wedges where id " +
    "orientation pays C(spokes, 2)") {
    // hub id 0 < every spoke id → id orientation points all 100 edges
    // OUT of the hub (4950 candidate wedges, the d² skew blow-up);
    // degree orientation points them all IN (deg 1 < deg 100): zero
    // wedges, zero triangles — the O(m^1.5) bound in action
    val star = (1L to 100L).map(s => (0L, s))
    val starDf = star.toDF("ka", "kb")
    assert(Triangles.wedgeCount(starDf, byDegree = false) == 4950L)
    assert(Triangles.wedgeCount(starDf, byDegree = true) == 0L)
    assert(Triangles.enumerate(starDf).count() == 0L)
    // adding one spoke-spoke edge closes exactly one triangle and
    // costs exactly one degree-oriented wedge
    val starPlus = starDf.unionAll(Seq((1L, 2L)).toDF("ka", "kb"))
    assert(Triangles.wedgeCount(starPlus, byDegree = true) == 1L)
    assert(counts(star :+ (1L, 2L)) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("both orientations enumerate the same triangles (probe-path " +
    "equivalence)") {
    // K4 ∪ star-with-chord: triangles in both dense and skewed parts
    val g = ((for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)) ++
      (10L to 40L).map(s => (4L, s)) :+ (10L, 11L)).toDF("ka", "kb")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val id = set(Triangles.idOriented(g.localCheckpoint()))
    val deg = set(Triangles.degreeOriented(g.localCheckpoint()))
    assert(id == deg && id.size == 5, s"id=${id.size} deg=${deg.size}")
  }
}
