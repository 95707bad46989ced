package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.{Bloom, Dedup}
import graft.text.Bm25

/** Pins the retrieval/membership contracts added in round 8:
  *  - Bm25.topK against a hand-computed score on a 4-doc fixture
  *    (Lucene's +1 idf variant, k1=1.5, b=0.75);
  *  - Bloom.buildBytes/mightContain: zero false negatives by
  *    construction, and bloom-prefilter → exact join is
  *    result-identical to the plain exact join even with the sketch
  *    sized to force false positives.
  */
class Bm25BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bm25: hand-computed score, ordering, and term pushdown") {
    // dl: d1=4, d2=4, d3=4, d4=4 -> avgdl = 4.0 exactly
    val docs = Seq(
      (1L, "spark spark join sort"),
      (2L, "spark sort sort sort"),
      (3L, "join join join join"),
      (4L, "sort sort sort sort")).toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("spark", "join"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // N=4, avgdl=4.0, dl=4 -> length norm = 1 -> denom = tf + 1.5
    // df(spark)=2, df(join)=2 -> idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    def w(tf: Double) = math.log(2.0) * (tf * 2.5) / (tf + 1.5)
    def r6(x: Double) = math.rint((x + 1e-9) * 1e6) / 1e6
    // d1: spark tf=2, join tf=1 ; d3: join tf=4 ; d2: spark tf=1
    val d1 = r6(w(2) + w(1))
    val d3 = r6(w(4))
    val d2 = r6(w(1))
    assert(out.length == 3)
    assert(out(0) == ((1L, 2L, d1)), s"got ${out(0)}")
    assert(out(1) == ((3L, 1L, d3)), s"got ${out(1)}")
    assert(out(2) == ((2L, 1L, d2)), s"got ${out(2)}")
    // d4 matches no query term and must not appear even with k=3 slots
    assert(!out.exists(_._1 == 4L))
  }

  test("bm25 batch: single-query batch == topK; per-query isolation") {
    val docs = Seq(
      (1L, "spark spark join sort"),
      (2L, "spark sort sort sort"),
      (3L, "join join join join"),
      (4L, "sort sort sort sort")).toDF("doc_id", "text")
    // duplicate term row must not double-count (set semantics)
    val queries = Seq(
      (10L, "spark"), (10L, "join"), (10L, "join"),
      (20L, "sort")).toDF("qid", "term")
    // perKey output order: rank first, then the payload columns
    val batch = Bm25.topKBatch(docs, "doc_id", "text",
        queries, "qid", "term", k = 3)
      .select($"query_id", $"doc_id", $"n_terms", $"score", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))

    val single = Bm25.topK(docs, "doc_id", "text", Seq("spark", "join"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val q10 = batch.filter(_._1 == 10L).sortBy(_._5)
      .map(t => (t._2, t._3, t._4))
    assert(q10.sameElements(single),
      s"batch ${q10.toSeq} != single ${single.toSeq}")

    // query 20 ("sort") must rank pure-sort docs and not see q10 terms
    val q20 = batch.filter(_._1 == 20L).sortBy(_._5).map(_._2)
    assert(q20.head == 4L, s"got ${q20.toSeq}")
    assert(batch.filter(_._1 == 20L).forall(_._3 == 1L))
  }

  test("banded-index variant == lshCandidatesAgainst") {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g x"),
      (2L, "p q r s t u v w"),
      (3L, "p q r s t u v y"),
      (4L, "m n o m n o m n")).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val sigs = Dedup.minhashSignatures(sh, 16).persist()
    val delta = sigs.filter($"id" >= 3)
    val direct = Dedup.lshCandidatesAgainst(delta, sigs, 4, 4)
      .as[(Long, Long)].collect().toSet
    val viaIndex = Dedup.lshCandidatesAgainstIndex(
        Dedup.bandIndex(delta, 4, 4), Dedup.bandIndex(sigs, 4, 4))
      .as[(Long, Long)].collect().toSet
    sigs.unpersist()
    assert(direct == viaIndex)
    // every pair touches the delta; no existing-vs-existing pair
    assert(viaIndex.forall { case (a, bb) => a >= 3 || bb >= 3 })
  }

  test("bloom: no false negatives; prefilter+exact == exact") {
    val keys = spark.range(0, 2000).select(concat(lit("k"), $"id").as("sh"))
    // deliberately undersized sketch -> false positives guaranteed
    val bytes = Bloom.buildBytes(keys, $"sh", expectedItems = 64, numBits = 512)

    // every inserted key probes true (bloom filters cannot false-negative)
    val misses = keys.filter(!Bloom.mightContain(bytes, $"sh")).count()
    assert(misses == 0, s"$misses inserted keys probed false")

    // prefilter -> exact join equals the plain exact join on a
    // disjoint+overlapping probe set (ids 1000..2999: half in, half out)
    val probes = spark.range(1000, 3000).select(concat(lit("k"), $"id").as("sh"))
    val viaBloom = probes.filter(Bloom.mightContain(bytes, $"sh"))
      .join(keys, Seq("sh"), "left_semi").collect().map(_.getString(0)).sorted
    val exact = probes.join(keys, Seq("sh"), "left_semi")
      .collect().map(_.getString(0)).sorted
    assert(viaBloom.sameElements(exact))
    assert(exact.length == 1000)
  }

  test("edge cases: no-hit query, empty query set, empty bloom build") {
    val docs = Seq((1L, "spark join"), (2L, "sort scan")).toDF("doc_id", "text")
    // query terms absent from every doc -> empty result, no error
    assert(Bm25.topK(docs, "doc_id", "text", Seq("zzz"), 5).count() == 0)
    // EMPTY query terms -> empty frame with the normal schema (an
    // empty array() literal would be NullType and fail analysis)
    val emptyQ = Bm25.topK(docs, "doc_id", "text", Nil, 5)
    assert(emptyQ.columns.toSeq == Seq("doc_id", "n_terms", "score"))
    assert(emptyQ.count() == 0)
    // empty query table -> empty batch result
    val noQ = spark.emptyDataset[(Long, String)].toDF("qid", "term")
    assert(Bm25.topKBatch(docs, "doc_id", "text", noQ, "qid", "term", 5)
      .count() == 0)
    // bloom built over zero rows: might_contain must not match anything
    // (null sketch -> null predicate -> filter drops every row), so an
    // empty exclusion set keeps the whole corpus in d10's shape
    val empty = spark.emptyDataset[String].toDF("sh")
    val bytes = Bloom.buildBytes(empty, $"sh", 64, 512)
    val probes = Seq("a", "b").toDF("sh")
    assert(probes.filter(Bloom.mightContain(bytes, $"sh")).count() == 0)
  }

  test("bloom decontamination drops the planted near-copy only") {
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (20L, "alpha beta gamma delta other words"), // shares 3 shingles
      (21L, "totally unrelated content goes here now"),
      (22L, "alpha beta nothing else in common xx")  // shares 1 shingle
    ).toDF("doc_id", "text")
    val benchSh = Dedup.shingleRows(bench, "doc_id", "text", 3)
      .select($"id".as("bench_id"), $"sh")
    val bytes = Bloom.buildBytes(benchSh, $"sh", 64, 1024)
    val dropped = Dedup.shingleRows(corpus, "doc_id", "text", 3)
      .filter(Bloom.mightContain(bytes, $"sh"))
      .join(broadcast(benchSh), Seq("sh"))
      .groupBy($"id", $"bench_id").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2).select($"id").distinct()
      .as[Long].collect().toSet
    assert(dropped == Set(20L))
  }
}
