package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.regimes.Transitions

/** Property tests (SURVEY §5.2 item 3): invariants of the islands /
  * transition operators over generated label sequences. Raw ScalaCheck
  * generators with fixed seeds (scalatestplus bridge isn't on the
  * classpath) — deterministic across runs. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("probabilities per from-label sum to 1; one transition per change") {
    val gen = Gen.listOfN(40, Gen.oneOf("a", "b", "c"))
    samples(gen, 8).foreach { labels =>
      val df = labels.zipWithIndex
        .map { case (l, i) => ("k", i.toLong, l) }.toDF("k", "t", "lbl")
      val trans = Transitions.transitions(df, Seq("k"), "t", "t", "lbl",
        (s, e) => e - s)
      val n = trans.count()
      val changes = labels.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
      assert(n == changes, s"one transition per change: $n vs $changes")
      if (n > 0) {
        val probs = Transitions.transitionProbabilities(trans, "from_label", "to_label")
          .groupBy($"from_label").agg(sum($"prob").as("p"))
          .select($"p").as[Double].collect()
        probs.foreach(p => assert(math.abs(p - 1.0) < 1e-9))
        trans.collect().foreach { r =>
          assert(r.getAs[String]("from_label") != r.getAs[String]("to_label"))
          assert(r.getAs[Long]("duration") > 0)
        }
      }
    }
  }

  test("rsi stays within [0, 100] on random walks") {
    val gen = Gen.listOfN(60, Gen.choose(-5.0, 5.0))
    samples(gen, 5).foreach { deltas =>
      val prices = deltas.scanLeft(100.0)((p, d) => math.max(1.0, p + d))
      val df = prices.zipWithIndex.map { case (p, i) => ("k", i.toLong, p) }
        .toDF("k", "t", "close")
      val w = Window.partitionBy($"k").orderBy($"t")
      val rsi = df.withColumn("rsi", graft.features.Indicators.rsi($"close", 14, w))
        .select($"rsi").as[Double].collect()
      rsi.foreach(v => assert(v >= 0.0 && v <= 100.0, s"rsi $v out of range"))
    }
  }

  test("bollinger position within [0,1] after clip; width non-negative") {
    val gen = Gen.listOfN(50, Gen.choose(10.0, 200.0))
    samples(gen, 5).foreach { prices =>
      val df = prices.zipWithIndex.map { case (p, i) => ("k", i.toLong, p) }
        .toDF("k", "t", "close")
      val w = Window.partitionBy($"k").orderBy($"t")
      val out = df
        .withColumn("pos", graft.features.WindowOps.clip(
          graft.features.Indicators.bollingerPosition($"close", 20, 2.0, w), 0.0, 1.0))
        .withColumn("width", graft.features.Indicators.bollingerWidth($"close", 20, w))
        .select($"pos", $"width").collect()
      out.foreach { r =>
        if (!r.isNullAt(0)) assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
        if (!r.isNullAt(1)) assert(r.getDouble(1) >= 0.0)
      }
    }
  }
}
