package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** s16's filtered-ANN contract: every returned candidate satisfies the
  * metadata predicate, the index is the SHARED full-corpus fit (the
  * probe cells match s3's — one index serves every predicate), and
  * recall vs the exact filtered brute-force top-k clears the floor
  * despite the filter thinning every probed cell. */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.01"

  test("every filtered-ANN candidate satisfies the predicate") {
    val out = SparkEntry.queries("s16_filtered_ann")(spark, Sf)
    val labels = graft.io.Tables.embeddings(spark, Sf)
      .select(col("vec_id").as("corpus_id"), col("label"))
    val bad = out.join(labels, "corpus_id")
      .filter(col("label") =!= 2).count()
    assert(bad == 0, s"$bad candidates violate label = 2")
  }

  test("recall@5 vs exact filtered brute-force >= 0.4") {
    val rows = graft.io.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val corpus = rows.filter(_._2 == 2)
    val exact = rows.filter(_._1 < 10).flatMap { case (q, _, qv) =>
      corpus.filter(_._1 != q)
        .map { case (c, _, cv) => (q, c, cos(qv, cv)) }
        .sortBy { case (_, c, s) => (-s, c) }.take(5).map { case (_, c, _) => (q, c) }
    }.toSet
    assert(exact.nonEmpty)
    val approx = SparkEntry.queries("s16_filtered_ann")(spark, Sf)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"filtered recall@5 = $recall")
  }
}
