package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sim.SqAdist2

/** The codegen'd-loop SQ asymmetric distance must be bit-identical to
  * the round-11 per-dimension unrolled Column tree it replaced (the
  * tree that overflowed janino's method limit at dims = 64 — the
  * BENCH_r11 codegen-fallback root cause), including the null
  * contract, AND must actually compile: the whole point of the loop
  * form is that the surrounding WholeStageCodegen span stays compiled
  * instead of silently falling back to interpreted execution. */
class SqAdistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The round-11 unrolled formulation, verbatim. */
  private def unrolled(qv: Column, codes: Column, vm: Column, st: Column,
                       dims: Int): Column =
    (1 to dims).map { i =>
      val d = element_at(qv, i) - (element_at(vm, i) +
        (element_at(codes, i) + lit(0.5)) * element_at(st, i))
      d * d
    }.reduce(_ + _)

  test("bit-equal to the unrolled tree on random 64-dim inputs") {
    val rnd = new scala.util.Random(12)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextDouble() * 4 - 2),
        Array.fill(64)(rnd.nextInt(256)),
        Array.fill(64)(rnd.nextDouble() - 2),
        Array.fill(64)(rnd.nextDouble() * 0.05))
    }
    val df = rows.toDF("id", "qv", "codes", "vm", "st")
    val out = df.select(
        SqAdist2($"qv", $"codes", $"vm", $"st").as("native"),
        unrolled($"qv", $"codes", $"vm", $"st", 64).as("tree"))
      .as[(Double, Double)].collect()
    assert(out.length == 200)
    out.foreach { case (n, t) =>
      assert(java.lang.Double.doubleToRawLongBits(n)
        == java.lang.Double.doubleToRawLongBits(t), s"$n vs $t")
    }
  }

  test("null contract: null array / null element / length mismatch") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3), Some(4))),
        Some(Seq(Some(0.0), Some(0.0))), Some(Seq(Some(0.5), Some(0.5)))),
      (2L, None, Some(Seq(Some(3), Some(4))),
        Some(Seq(Some(0.0), Some(0.0))), Some(Seq(Some(0.5), Some(0.5)))),
      (3L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3), None)),
        Some(Seq(Some(0.0), Some(0.0))), Some(Seq(Some(0.5), Some(0.5)))),
      (4L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3))),
        Some(Seq(Some(0.0), Some(0.0))), Some(Seq(Some(0.5), Some(0.5)))))
      .toDF("id", "qv", "codes", "vm", "st")
      .select($"id", $"qv".cast("array<double>"),
        $"codes".cast("array<int>"), $"vm".cast("array<double>"),
        $"st".cast("array<double>"))
    val out = df.orderBy($"id")
      .select(SqAdist2($"qv", $"codes", $"vm", $"st"))
      .as[Option[Double]].collect()
    // row 1: (1 - 3.5·0.5)² + (2 - 4.5·0.5)² = (-0.75)² + (-0.25)²
    assert(out(0).exists(v => math.abs(v - (0.5625 + 0.0625)) < 1e-12))
    assert(out(1).isEmpty, "null query array → null")
    assert(out(2).isEmpty, "null code element → null")
    assert(out(3).isEmpty, "length mismatch → null")
    // expectedDims contract (round-13): arrays CONSISTENTLY shorter than
    // the declared dims — internally consistent, so the cross-array
    // check alone passes them — null out when the caller declares dims
    val guarded = df.orderBy($"id")
      .select(SqAdist2($"qv", $"codes", $"vm", $"st", 3))
      .as[Option[Double]].collect()
    assert(guarded.forall(_.isEmpty), "2-long arrays vs declared dims=3")
    val match2 = df.filter($"id" === 1)
      .select(SqAdist2($"qv", $"codes", $"vm", $"st", 2))
      .as[Option[Double]].collect()
    assert(match2.head.exists(v => math.abs(v - 0.625) < 1e-12))
    // interpreted eval path agrees with codegen
    val interp = df.filter($"id" === 1)
      .select(SqAdist2($"qv", $"codes", $"vm", $"st"))
      .queryExecution.executedPlan.executeCollect()
    assert(math.abs(interp.head.getDouble(0) - 0.625) < 1e-12)
  }

  test("generated code compiles — no codegen fallback on the s10 shape") {
    // A Project carrying the distance over 64-dim arrays, the s10/s12
    // hot-path shape. With the unrolled tree this logged an
    // InternalCompilerException and fell back; the loop form must
    // compile. CodegenMonitor is the assertion instrument.
    graft.tools.CodegenMonitor.install()
    graft.tools.CodegenMonitor.reset()
    graft.tools.CodegenMonitor.setCurrent("sqadist-spec")
    val dims = 64
    val df = spark.range(500).select(
      transform(sequence(lit(1), lit(dims)),
        i => ($"id" + i).cast("double")).as("qv"),
      transform(sequence(lit(1), lit(dims)),
        i => (i % 256).cast("int")).as("codes"),
      transform(sequence(lit(1), lit(dims)),
        i => i.cast("double") * -0.1).as("vm"),
      transform(sequence(lit(1), lit(dims)),
        i => i.cast("double") * 0.01).as("st"))
    val n = df.select(SqAdist2($"qv", $"codes", $"vm", $"st").as("d"))
      .filter($"d" >= 0).count()
    assert(n == 500L)
    val hits = graft.tools.CodegenMonitor.snapshot
      .filter(_._1 == "sqadist-spec")
    assert(hits.isEmpty,
      s"codegen fallback fired: ${graft.tools.CodegenMonitor.messages}")
  }
}
