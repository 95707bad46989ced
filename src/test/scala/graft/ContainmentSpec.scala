package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** d16's containment score must catch the doc-in-doc shape Jaccard
  * misses (a short doc copied verbatim into a much longer one), share
  * d4's bounded candidate generation, and keep cont >= jaccard as an
  * algebraic invariant (|A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always). */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("short doc contained in long doc: containment ~1.0, jaccard low") {
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val pad = (0 until 60).map(i => s"pad$i tail${i * 7} filler${i * 13}").mkString(" ")
    val docs = Seq(
      (1L, "en", "cc", short),
      (2L, "en", "cc", s"$pad $short")).toDF("doc_id", "lang", "source", "text")
    val out = Dedup.containmentNearDup(docs, "doc_id", "text",
        Seq("lang", "source"), 3, maxDf = 64, minCont = 0.8, perDocK = 5)
      .select($"id_a", $"id_b", $"cont_a", $"cont_b", $"jaccard")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.length == 1, s"expected exactly the contained pair, got ${out.toSeq}")
    val (a, b, ca, cb, j) = out.head
    assert((a, b) == (1L, 2L))
    assert(ca == 1.0, s"short-side containment should be exactly 1.0, got $ca")
    assert(j < 0.5, s"jaccard should stay low for the asymmetric pair, got $j")
    assert(cb < 0.5, s"long-side containment should stay low, got $cb")
  }

  test("cont_a/cont_b >= jaccard invariant and fan-out bound on a hot block") {
    val rows = (0 until 40).map { i =>
      val g = i / 4
      val boiler = "common boilerplate header text present in every single document here"
      val group = s"group $g special marker sequence alpha beta gamma delta"
      (i.toLong, "en", "cc", s"$boiler $group unique tail $i content ${i * 7}")
    }
    val docs = rows.toDF("doc_id", "lang", "source", "text")
    val out = Dedup.containmentNearDup(docs, "doc_id", "text",
        Seq("lang", "source"), 3, maxDf = 5, minCont = 0.0, perDocK = 3)
      .select($"cont_a", $"cont_b", $"jaccard")
      .as[(Double, Double, Double)].collect()
    assert(out.nonEmpty)
    assert(out.length <= 40 * 3, s"fan-out ${out.length} exceeds docs × perDocK")
    out.foreach { case (ca, cb, j) =>
      assert(ca >= j - 1e-12 && cb >= j - 1e-12,
        s"containment ($ca, $cb) fell below jaccard $j")
    }
  }
}
