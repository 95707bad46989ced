package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** TopK.perKey must reproduce the row_number-window idiom exactly —
  * including multi-column orderings, descending numeric keys (negated),
  * null sort values (asc nulls first), k larger than the group, and
  * partial/merge paths (forced by many input partitions). */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame,
                        keys: Seq[String], sort: Seq[org.apache.spark.sql.Column],
                        k: Int) = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(sort: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  test("matches row_number window on a multi-partition frame") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(5000) { i =>
      (s"k${i % 7}", rnd.nextDouble() * 100, i.toLong)
    }
    val df = rows.toDF("key", "score", "id").repartition(13)
    val expected = viaWindow(df, Seq("key"), Seq($"score".desc, $"id"), 5)
      .select($"key", $"score", $"id", $"rank")
      .orderBy($"key", $"rank").collect()
    val actual = TopK.perKey(df, Seq("key"), Seq(negate($"score"), $"id"), 5)
      .select($"key", $"score", $"id", $"rank")
      .orderBy($"key", $"rank").collect()
    assert(actual.toSeq == expected.toSeq)
    assert(actual.length == 35)
  }

  test("k exceeding group size returns the whole group, ranked") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("key", "v")
    val out = TopK.perKey(df, Seq("key"), Seq($"v"), 10)
      .orderBy($"key", $"rank")
      .select($"key", $"v", $"rank").as[(String, Int, Int)].collect()
    assert(out.toSeq == Seq(("a", 1, 1), ("a", 3, 2), ("b", 2, 1)))
  }

  test("null sort fields rank first (asc nulls-first), like the window") {
    val df = Seq(("a", Some(2.0), 1L), ("a", None, 2L), ("a", Some(1.0), 3L))
      .toDF("key", "score", "id")
    val expected = viaWindow(df, Seq("key"), Seq($"score", $"id"), 2)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    val actual = TopK.perKey(df, Seq("key"), Seq($"score", $"id"), 2)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    assert(actual.toSeq == expected.toSeq)
    assert(actual.head == ((2L, 1))) // the null-scored row wins
  }

  test("descNullsLast matches the window's desc (nulls LAST), never promoting nulls") {
    val df = Seq(("a", Some(2.0), 1L), ("a", None, 2L), ("a", Some(5.0), 3L),
      ("a", Some(1.0), 4L)).toDF("key", "score", "id")
    val expected = viaWindow(df, Seq("key"), Seq($"score".desc, $"id"), 2)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    val actual = TopK.perKey(df, Seq("key"),
        Seq(TopK.descNullsLast($"score"), $"id"), 2)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    assert(actual.toSeq == expected.toSeq)
    assert(actual.map(_._1).toSeq == Seq(3L, 1L), "null row must NOT be in top-2")
  }

  test("an existing rank column is replaced, like withColumn(row_number)") {
    val df = Seq(("a", 3, 99), ("a", 1, 98)).toDF("key", "v", "rank")
    val out = TopK.perKey(df, Seq("key"), Seq($"v"), 1)
    assert(out.columns.count(_ == "rank") == 1)
    assert(out.select($"rank").as[Int].collect().toSeq == Seq(1))
  }

  test("plan uses partial aggregation, not a global sort-per-key") {
    val df = spark.range(1000)
      .select(($"id" % 10).as("key"), $"id".as("v"))
    val plan = TopK.perKey(df, Seq("key"), Seq($"v"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("graft_topk is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    Seq(("a", 5.0, 1L), ("a", 1.0, 2L), ("a", 3.0, 3L), ("b", 2.0, 4L))
      .toDF("k", "score", "id").createOrReplaceTempView("topk_in")
    val out = spark.sql(
      """SELECT k, t.value.id AS id, t.value.score AS score
        |FROM (SELECT k, graft_topk(struct(-score, id),
        |              struct(score, id), 2) AS tk
        |      FROM topk_in GROUP BY k)
        |LATERAL VIEW explode(tk) AS t
        |ORDER BY k, t.key""".stripMargin)
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", 1L, 5.0), ("a", 3L, 3.0), ("b", 4L, 2.0)))
  }

  test("heavy ties at the k-boundary resolve identically to the window") {
    // 500 rows, only 3 distinct scores → the k=4 boundary cuts through
    // a tie group in every key; the id tie-break must decide both forms
    val rows = Seq.tabulate(500)(i => (s"k${i % 4}", (i % 3).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id").repartition(11)
    val expected = viaWindow(df, Seq("key"), Seq($"score", $"id"), 4)
      .select($"key", $"score", $"id", $"rank")
      .orderBy($"key", $"rank").collect()
    val actual = TopK.perKey(df, Seq("key"), Seq($"score", $"id"), 4)
      .select($"key", $"score", $"id", $"rank")
      .orderBy($"key", $"rank").collect()
    assert(actual.toSeq == expected.toSeq)
  }

  test("descNullsLast ranks NaN first, finite desc, nulls last — like the window") {
    // desc over doubles: NaN is the LARGEST value in Spark's total
    // order (ranks first), nulls rank last — both edges that a bare
    // negate(c) encoding gets wrong
    val df = Seq(("a", Some(2.0), 1L), ("a", None, 2L),
      ("a", Some(Double.NaN), 3L), ("a", Some(5.0), 4L),
      ("a", Some(Double.NaN), 5L), ("a", Some(1.0), 6L))
      .toDF("key", "score", "id")
    val expected = viaWindow(df, Seq("key"), Seq($"score".desc, $"id"), 4)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    val actual = TopK.perKey(df, Seq("key"),
        Seq(TopK.descNullsLast($"score"), $"id"), 4)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    assert(actual.toSeq == expected.toSeq)
    assert(actual.map(_._1).toSeq == Seq(3L, 5L, 4L, 1L),
      "NaN rows first (id tie-break), then finite desc; null row excluded")
  }

  test("descNullsLastIntegral orders Long.MinValue without ANSI overflow") {
    // negate(Long.MinValue) overflows; under ANSI (Spark 4 default) it
    // throws — the decimal widening must not
    val df = Seq(("a", Some(Long.MinValue), 1L), ("a", Some(5L), 2L),
      ("a", Some(Long.MaxValue), 3L), ("a", Option.empty[Long], 4L),
      ("a", Some(0L), 5L)).toDF("key", "v", "id")
    val expected = viaWindow(df, Seq("key"), Seq($"v".desc, $"id"), 5)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    val actual = TopK.perKey(df, Seq("key"),
        Seq(TopK.descNullsLastIntegral($"v"), $"id"), 5)
      .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
    assert(actual.toSeq == expected.toSeq)
    assert(actual.map(_._1).toSeq == Seq(3L, 2L, 5L, 1L, 4L))
  }

  test("descNullsLastFor dispatches on schema: double, int, long, decimal") {
    val df = Seq(
      ("a", Some(Double.NaN), Some(Int.MinValue), Some(Long.MinValue), Some(BigDecimal(3)), 1L),
      ("a", Some(2.0), Some(7), Some(5L), Some(BigDecimal(-9)), 2L),
      ("a", None, None, None, None, 3L),
      ("a", Some(9.0), Some(Int.MaxValue), Some(Long.MaxValue), Some(BigDecimal(11)), 4L))
      .toDF("key", "d", "i", "l", "dec", "id")
    for (c <- Seq("d", "i", "l", "dec")) {
      val expected = viaWindow(df, Seq("key"), Seq(col(c).desc, $"id"), 4)
        .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
      val actual = TopK.perKey(df, Seq("key"),
          Seq(TopK.descNullsLastFor(df, c), $"id"), 4)
        .select($"id", $"rank").orderBy($"rank").as[(Long, Int)].collect()
      assert(actual.toSeq == expected.toSeq, s"column $c")
    }
    intercept[IllegalArgumentException] { TopK.descNullsLastFor(df, "key") }
  }

  test("k above MaxHeapK falls back to the window form with identical shape") {
    val rows = Seq.tabulate(6000)(i => (s"k${i % 2}", (i % 97).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id").repartition(7)
    val kBig = TopK.MaxHeapK + 100
    val small = TopK.perKey(df, Seq("key"), Seq($"score", $"id"), 5)
    val big = TopK.perKey(df, Seq("key"), Seq($"score", $"id"), kBig)
    // same column order as the heap path — callers select positionally
    assert(big.columns.toSeq == small.columns.toSeq)
    val expected = viaWindow(df, Seq("key"), Seq($"score", $"id"), kBig)
      .select($"key", $"score", $"id", $"rank")
      .orderBy($"key", $"rank").collect()
    val actual = big.select($"key", $"score", $"id", $"rank")
      .orderBy($"key", $"rank").collect()
    assert(actual.toSeq == expected.toSeq)
    // the fallback plans the spillable window sort, not the heap agg
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("graft_topk"), plan)
  }

  test("fallback path accepts a sort expression over an existing rank column") {
    // regression: the fallback used to drop the old rankCol BEFORE
    // evaluating sortAsc, so a sort referencing it resolved on the heap
    // path but threw AnalysisException past MaxHeapK
    val df = Seq(("a", 3, 99), ("a", 1, 98), ("b", 2, 97)).toDF("key", "v", "rank")
    val kBig = TopK.MaxHeapK + 1
    val viaHeap = TopK.perKey(df, Seq("key"), Seq($"rank", $"v"), 2)
      .select($"key", $"v", $"rank").orderBy($"key", $"rank").collect()
    val viaFallback = TopK.perKey(df, Seq("key"), Seq($"rank", $"v"), kBig)
      .select($"key", $"v", $"rank").orderBy($"key", $"rank").collect()
    assert(viaFallback.toSeq == viaHeap.toSeq)
  }

  test("string keys and multi-column payloads survive serialization") {
    val rows = Seq.tabulate(200)(i => (i % 5, s"name_$i", s"cat_${i % 3}", i * 1.5))
    val df = rows.toDF("key", "name", "cat", "v").repartition(8)
    val expected = viaWindow(df, Seq("key"), Seq($"cat", negate($"v"), $"name"), 4)
      .select($"key", $"name", $"cat", $"v", $"rank")
      .orderBy($"key", $"rank").collect()
    val actual = TopK.perKey(df, Seq("key"), Seq($"cat", negate($"v"), $"name"), 4)
      .select($"key", $"name", $"cat", $"v", $"rank")
      .orderBy($"key", $"rank").collect()
    assert(actual.toSeq == expected.toSeq)
  }
}
