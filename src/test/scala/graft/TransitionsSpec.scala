package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.regimes.Transitions

/** Unit semantics of the gaps-and-islands rewrite against hand-computed
  * expectations, including the reference's open-final-island rule
  * (`short_term.py:82-111`: the last island emits no transition). */
class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def panel = Seq(
    // (key, ord, tiebreak, label)
    ("a", 0L, 0L, "x"), ("a", 10L, 1L, "x"), ("a", 20L, 2L, "y"),
    ("a", 30L, 3L, "y"), ("a", 40L, 4L, "x"),
    ("b", 0L, 5L, "z") // single island → no transitions
  ).toDF("k", "t", "id", "lbl")

  test("islands: consecutive equal labels collapse; counts and bounds") {
    val isl = Transitions.islands(panel, Seq("k"), "t", "id", "lbl")
      .orderBy($"k", $"island").collect()
    assert(isl.length == 4)
    val a1 = isl(0)
    assert(a1.getAs[String]("label") == "x" && a1.getAs[Long]("start_ord") == 0L &&
      a1.getAs[Long]("end_ord") == 10L && a1.getAs[Long]("n_rows") == 2L)
  }

  test("transitions: one row per change, final island open, duration from island start") {
    val tr = Transitions.transitions(panel, Seq("k"), "t", "id", "lbl",
        (s, e) => e - s)
      .orderBy($"k", $"start_time").collect()
    assert(tr.length == 2) // x→y, y→x for key a; none for key b
    assert(tr(0).getAs[String]("from_label") == "x" &&
      tr(0).getAs[String]("to_label") == "y" &&
      tr(0).getAs[Long]("start_time") == 0L &&
      tr(0).getAs[Long]("end_time") == 20L &&
      tr(0).getAs[Long]("duration") == 20L)
    assert(tr(1).getAs[String]("from_label") == "y" &&
      tr(1).getAs[String]("to_label") == "x" &&
      tr(1).getAs[Long]("duration") == 20L)
  }

  test("transition probabilities sum to 1 per from-label") {
    val tr = Transitions.transitions(panel, Seq("k"), "t", "id", "lbl",
      (s, e) => e - s)
    val probs = Transitions.transitionProbabilities(tr, "from_label", "to_label")
      .groupBy($"from_label").agg(sum($"prob").as("p")).collect()
    probs.foreach(r => assert(math.abs(r.getAs[Double]("p") - 1.0) < 1e-12))
  }
}
