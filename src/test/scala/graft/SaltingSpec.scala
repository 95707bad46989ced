package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.joins.Salting

/** Salting must be result-transparent: salted aggregation / join equal
  * their unsalted counterparts on skewed data. */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val skewed = {
    // one hot key (90%) + long tail
    val hot = (0 until 900).map(i => ("hot", i.toLong, i.toDouble))
    val tail = (0 until 100).map(i => (s"k$i", i.toLong, i.toDouble))
    (hot ++ tail).toDF("key", "uid", "v")
  }

  test("salted sum/count equals plain aggregation") {
    val plain = skewed.groupBy($"key")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Salting.saltedSumCount(skewed, Seq("key"), "v", "uid", 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "name")
    val plain = skewed.join(dim, Seq("key")).groupBy($"key", $"name")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = Salting.saltedJoin(skewed, dim, "key", "uid", 8)
      .groupBy($"key", $"name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }
}
