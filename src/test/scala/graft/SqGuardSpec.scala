package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Sq

/** Degenerate-input guard for the scalar quantizer (round-11 advice
  * fix): a CONSTANT dimension has step = 0, and the unguarded code
  * floor((v - min)/0) is 0/0 = NaN — which floor/least silently
  * propagate into every asymmetric distance. The guard codes the
  * dimension to 0 on both engines; this spec pins that codes stay 0,
  * distances stay finite, and ranking still orders by the varying
  * dimensions. */
class SqGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = Seq(
    (0L, Seq(0.0, 5.0)), (1L, Seq(1.0, 5.0)),
    (2L, Seq(2.0, 5.0)), (3L, Seq(9.0, 5.0)))
    .toDF("vec_id", "v")

  test("a constant dimension codes to 0 for every row, not NaN") {
    val stats = Sq.fit(fixture, "v", dims = 2, levels = 4)
    val codes = Sq.encode(fixture, "vec_id", "v", stats, dims = 2, levels = 4)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(_(1) == 0),
      s"constant dim must code 0: $codes")
    // the varying dimension still spans the level range
    assert(codes(0L)(0) == 0 && codes(3L)(0) == 3, s"codes: $codes")
  }

  test("rerank top-k over a constant dimension stays finite and ordered") {
    val out = Sq.rerankTopK(fixture, "vec_id", "v",
        queryPred = col("vec_id") === 0, k = 3, kShort = 3,
        dims = 2, levels = 4)
      .select($"corpus_id", $"d2", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(out.forall(r => !r._2.isNaN && !r._2.isInfinite),
      s"non-finite distance: ${out.toSeq}")
    // true L2 order from vec 0: 1 (d2=1), 2 (d2=4), 3 (d2=81)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), s"order: ${out.toSeq}")
  }
}
