package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN accuracy contract (the approximate-operator analogue of
  * ApproxSpec): recall@5 of the bucketed variants against the exact
  * brute-force top-k on the sf0.01 embeddings. Multi-probe LSH
  * (Hamming-1) sits ≥ ~0.5; the declared s3 (portable md5-order fit,
  * nprobe=3 — round-11) measures 0.56; trained-KMeans IVF at nprobe=3
  * measures higher still (second test). Floors are set with margin;
  * single-probe variants measured ~0.2/0.34 — the floor also guards
  * against silently reverting the probe settings. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairs(name: String): Set[(Long, Long)] = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("multi-probe LSH and portable-fit IVF recall@5 >= 0.4 vs exact top-k") {
    val exact = pairs("s1_cosine_topk")
    assert(exact.nonEmpty)
    val lsh = pairs("s2_ann_lsh")
    val ivf = pairs("s3_ann_ivf")
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(lshRecall >= 0.4, s"LSH recall@5 = $lshRecall")
    assert(ivfRecall >= 0.4, s"IVF recall@5 = $ivfRecall")
  }

  test("hierarchical IVF (s17) keeps recall@5 >= 0.9 at the declared " +
      "knobs (nprobe=8, nprobeSup=2, nAssignSup=3)") {
    // the two-level routing's recall price vs flat s3: a query sees
    // only its nprobeSup supers' member cells. The round-18
    // tools/AnnKnobs grid re-derived the declared knobs — the r17
    // setting (nprobe=3, nAssignSup=2) measured 0.74 here at sf0.01
    // but only 0.38 at sf0.1's 32-cell index (recall at FIXED nprobe
    // falls as the adaptive cell count grows with the corpus);
    // (8, 2, 3) measures 1.00 at sf0.01 and 0.84 at sf0.1 at
    // unchanged wall time. The 0.9 floor pins the knobs at their
    // declared settings: any revert (nprobe=3 → 0.74, nprobeSup=1 →
    // 0.38-class, nAssignSup=1 → 0.46-class) fails it.
    val exact = pairs("s1_cosine_topk")
    assert(exact.nonEmpty)
    val hier = pairs("s17_ann_ivf_hier")
    val recall = (exact & hier).size.toDouble / exact.size
    info(s"s17 hierarchical recall@5 = $recall")
    assert(recall >= 0.9, s"hier IVF recall@5 = $recall")
  }

  test("the IVF nprobe knob raises recall@5 to >= 0.6 at nprobe=3") {
    import org.apache.spark.sql.functions.col
    val exact = pairs("s1_cosine_topk")
    assert(exact.nonEmpty)
    val e = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ivf3 = graft.sim.IvfAnn.topK(e, "vec_id", "v",
        queryPred = col("vec_id") < 10, k = 5, nCells = 8, nprobe = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf3).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF nprobe=3 recall@5 = $recall")
  }
}
