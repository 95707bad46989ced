package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** d17's leakage-safety contract: the split is a pure function of the
  * CLUSTER id, so (1) two docs connected by a dup edge can never land
  * in different splits, (2) every split is populated at corpus scale,
  * and (3) the assignment is stable — recomputing over a grown corpus
  * never moves an existing cluster's split (no reshuffling of
  * already-trained-on data when the crawl grows). */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def splitOf(clusterCol: org.apache.spark.sql.Column) = {
    val b = TextOps.hash60(clusterCol.cast("string")) % 100
    when(b < 70, "train").when(b < 85, "val").otherwise("test")
  }

  test("dup-edge endpoints always share a split") {
    // 4 planted clusters (0,1,2), (10,11), (20,21,22,23), (30,31) + singletons
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L), (30L, 31L)).toDF("id_a", "id_b")
    val docs = ((0L to 31L) ++ (100L to 140L)).toDF("doc_id")
    val comp = Dedup.components(edges)
    val assigned = docs
      .join(comp.select($"id".as("doc_id"), $"cluster"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"cluster", $"doc_id"))
      .withColumn("split", splitOf($"cluster"))
    val bySplit = assigned.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L), (30L, 31L)).foreach { case (a, b) =>
      assert(bySplit(a) == bySplit(b),
        s"dup pair ($a,$b) straddles splits ${bySplit(a)}/${bySplit(b)}")
    }
  }

  test("all three splits populated and roughly 70/15/15 over many clusters") {
    val docs = (0L until 1000L).toDF("doc_id")
    val counts = docs.withColumn("split", splitOf($"doc_id"))
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts("train") > 600 && counts("train") < 800, counts.toString)
    assert(counts("val") > 80 && counts("val") < 220, counts.toString)
    assert(counts("test") > 80 && counts("test") < 220, counts.toString)
  }

  test("cluster splits are stable under corpus growth") {
    val small = (0L until 100L).toDF("doc_id")
      .withColumn("split", splitOf($"doc_id"))
    val grown = (0L until 400L).toDF("doc_id")
      .withColumn("split", splitOf($"doc_id"))
      .filter($"doc_id" < 100)
    assert(small.exceptAll(grown).isEmpty && grown.exceptAll(small).isEmpty,
      "growing the corpus moved an existing cluster's split")
  }
}
