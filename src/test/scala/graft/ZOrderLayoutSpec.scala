package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Tables, ZOrderLayout}
import graft.operators.ZOrder

/** The declared z-order layout (lineitem along the (price, quantity)
  * Morton curve) must (a) skip files for range predicates on EITHER
  * dimension — the reason the layout exists — (b) push both range
  * predicates into the scan, and (c) be row-identical to the flat
  * table. ZOrderSpec pins the curve math on a uniform grid; this spec
  * pins the layout the query surface actually reads. */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("2-D range predicates skip files on the real lineitem layout") {
    val z = ZOrderLayout.lineitem(spark, sf)
    val files = z.select(input_file_name()).distinct.count()
    assert(files == ZOrderLayout.Files, s"expected ${ZOrderLayout.Files} files, got $files")
    // the declared query's bands: ~10% of the price range, ~20% of qty.
    // Bounds carry slack (skip ≥ ~1/3 of files): repartitionByRange
    // samples boundaries, so exact file splits shift a file or two with
    // the session state that built the memoized layout — measured
    // 16-17/32 (price) and 18-20/32 (qty); an unclustered dimension
    // touches all 32 (ZOrderSpec pins that contrast on a fixed grid).
    val priceTouched = ZOrder.filesTouched(z, "l_extendedprice", 20000, 30000)
    val qtyTouched = ZOrder.filesTouched(z, "l_quantity", 10, 20)
    assert(priceTouched <= 21,
      s"price band should skip at least a third of the files, touched $priceTouched/$files")
    assert(qtyTouched <= 24,
      s"quantity band should skip files too, touched $qtyTouched/$files")
  }

  test("both range predicates reach the scan as PushedFilters") {
    val pushed = ZOrderLayout.lineitem(spark, sf)
      .filter($"l_extendedprice".between(20000.0, 30000.0) &&
        $"l_quantity".between(10.0, 20.0))
      .queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata("PushedFilters") }
      .mkString
    for (f <- Seq("GreaterThanOrEqual(l_extendedprice,20000.0)",
        "LessThanOrEqual(l_extendedprice,30000.0)",
        "GreaterThanOrEqual(l_quantity,10.0)",
        "LessThanOrEqual(l_quantity,20.0)"))
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
  }

  test("layout is row-identical to the flat table") {
    val zCnt = ZOrderLayout.lineitem(spark, sf)
      .groupBy($"l_returnflag").count().as[(String, Long)].collect().toMap
    val flatCnt = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").count().as[(String, Long)].collect().toMap
    assert(zCnt == flatCnt && zCnt.nonEmpty)
  }
}
