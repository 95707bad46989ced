package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Mmr

/** Contract for the MMR rerank (s13): on a pool where the two most
  * relevant candidates are near-duplicates, the second pick must be
  * the DIVERSE lower-relevance candidate — the behavior that
  * distinguishes MMR from plain top-k. Cross-engine replay of the
  * greedy trajectory is the s13 hash gate. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("near-duplicate top candidates are separated by a diverse pick") {
    val pool = Seq((1L, 10L, 0.95), (1L, 11L, 0.94), (1L, 12L, 0.80))
      .toDF("query_id", "corpus_id", "rel")
    val pairs = Seq((10L, 11L, 0.99), (10L, 12L, 0.10), (11L, 12L, 0.10))
    val pcos = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .map { case (a, b, c) => (1L, a, b, c) }
      .toDF("query_id", "a", "b", "c")
    val got = Mmr.run(pool, pcos, k = 3, lam = 0.7)
      .orderBy("pick").collect()
      .map(r => (r.getInt(2), r.getLong(1))).toSeq
    // pick 1: best relevance (10); pick 2: 12 beats near-dup 11
    // (0.7·0.80 − 0.3·0.10 = 0.53 > 0.7·0.94 − 0.3·0.99 = 0.361);
    // pick 3: the remaining 11
    assert(got === Seq((1, 10L), (2, 12L), (3, 11L)))
  }

  test("k=1 degenerates to the relevance argmax") {
    val pool = Seq((1L, 5L, 0.3), (1L, 6L, 0.9))
      .toDF("query_id", "corpus_id", "rel")
    val pcos = Seq((1L, 5L, 6L, 0.0), (1L, 6L, 5L, 0.0))
      .toDF("query_id", "a", "b", "c")
    val got = Mmr.run(pool, pcos, k = 1, lam = 0.7).collect()
    assert(got.length === 1 && got.head.getLong(1) === 6L)
  }
}
