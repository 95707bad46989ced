package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Triangles

/** Triangle-count pins on closed-form graphs. Edge lists are
  * id-oriented (ka < kb) as the operator requires. */
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
}
