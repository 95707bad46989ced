package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity

/** The two near-dup candidate generators must stay BOUNDED on skewed
  * inputs — the 100 TB failure mode is one hot block (`en ×
  * commoncrawl`) whose all-pairs enumeration goes quadratic. d4's
  * generator caps shingle document-frequency and per-doc candidates;
  * d5's buckets pairs by (label, sign-LSH cell). Both are also checked
  * for RESULT correctness against a brute-force reference on the same
  * fixture. */
class DedupFanoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val MaxDf = 5
  private val K = 3

  /** One hot block: every doc shares boilerplate with ALL others (df =
    * #docs, above the cap); true near-dup signal lives in per-group
    * phrases shared by 4 docs (df = 4, under the cap). */
  private def skewedDocs(n: Int) = {
    val rows = (0 until n).map { i =>
      val g = i / 4
      val boiler = "common boilerplate header text present in every single document here"
      val group = s"group $g special marker sequence alpha beta gamma delta"
      val unique = s"unique tail $i content ${i * 7} filler ${i * 13}"
      (i.toLong, "en", "cc", s"$boiler $group $unique")
    }
    rows.toDF("doc_id", "lang", "source", "text")
  }

  test("d4 generator: hot-block pair count bounded by docs × perDocK") {
    val docs = skewedDocs(48)
    val out = Dedup.blockedNgramNearDup(docs, "doc_id", "text",
      Seq("lang", "source"), 3, MaxDf, K).persist()
    val n = out.count()
    assert(n <= 48 * K, s"fan-out $n exceeds docs × K = ${48 * K}")
    assert(n > 0, "no candidates found at all")
    // the boilerplate (df = 48 > MaxDf) must generate no cross-group
    // pairs: every surviving pair lives inside one 4-doc group
    val crossGroup = out.filter(($"id_a" / 4).cast("long") =!= ($"id_b" / 4).cast("long")).count()
    assert(crossGroup == 0, s"$crossGroup pairs leaked across groups via hot shingles")
    out.unpersist()
  }

  test("d4 generator: null block keys are excluded regardless of build path") {
    // two identical docs under a NULL lang must produce no pairs — the
    // old groupBy+join cap dropped them via equi-join null semantics;
    // the count-window build keeps that contract via the explicit filter
    val docs = skewedDocs(8).unionByName(Seq(
      (100L, null.asInstanceOf[String], "cc", "same text marker alpha beta gamma delta epsilon"),
      (101L, null.asInstanceOf[String], "cc", "same text marker alpha beta gamma delta epsilon"))
      .toDF("doc_id", "lang", "source", "text"))
    val out = Dedup.blockedNgramNearDup(docs, "doc_id", "text",
      Seq("lang", "source"), 3, MaxDf, K)
    assert(out.filter($"id_a" >= 100L || $"id_b" >= 100L).count() == 0)
  }

  test("d4 generator: matches the brute-force top-k over capped shingle sets") {
    val docs = skewedDocs(24)
    val actual = Dedup.blockedNgramNearDup(docs, "doc_id", "text",
        Seq("lang", "source"), 3, MaxDf, K)
      .select($"id_a", $"id_b", $"n_inter", $"jaccard", $"cand_rank")
      .orderBy($"id_a", $"cand_rank")
      .as[(Long, Long, Long, Double, Int)].collect()
    // brute force: all pairs over the df-capped distinct shingle sets
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val ts = t.trim.split("\\s+")
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val raw = texts.map { case (id, t) => id -> shingles(t) }.toMap
    val df = raw.values.flatten.groupBy(identity).map { case (sh, xs) => sh -> xs.size }
    val capped = raw.map { case (id, shs) => id -> shs.filter(df(_) <= MaxDf) }
    val pairs = for {
      a <- raw.keys.toSeq; b <- raw.keys.toSeq if a < b
      inter = (capped(a) intersect capped(b)).size if inter > 0
    } yield (a, b, inter.toLong,
      inter.toDouble / (capped(a).size + capped(b).size - inter))
    val expected = pairs.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      ps.sortBy(p => (-p._4, p._2)).take(K).zipWithIndex
        .map { case ((a, b, i, j), r) => (a, b, i, j, r + 1) }
    }.sortBy(p => (p._1, p._5))
    assert(actual.map(t => (t._1, t._2, t._3, t._5)).toSeq ==
      expected.map(t => (t._1, t._2, t._3, t._5)),
      s"actual=${actual.mkString(";")}\nexpected=${expected.mkString(";")}")
    actual.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a._4 - e._4) < 1e-9, s"jaccard mismatch: $a vs $e")
    }
  }

  test("d5 generator: bucketed pairs ≪ all-pairs, near-identical pair found") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(8)(rnd.nextGaussian())
    // 40 vectors, ONE label (the hot block); ids 0 and 1 near-identical
    val rows = (0 until 40).map { i =>
      val v =
        if (i == 1) base.map(_ + 1e-4)
        else if (i == 0) base
        else Array.fill(8)(rnd.nextGaussian())
      (i.toLong, "lab", v.toSeq)
    }
    val df = rows.toDF("vec_id", "label", "v")
    val pairs = Similarity.nearDupPairs(df, "label", "vec_id", "v", nBits = 4)
      .persist()
    val n = pairs.count()
    val allPairs = 40L * 39 / 2
    assert(n < allPairs, s"bucketing produced the full all-pairs join ($n)")
    // expected candidate volume: Σ_cell |cell|²-ish × probes — on random
    // gaussians the 16 cells split ~uniformly, so well under half
    assert(n < allPairs / 2, s"fan-out $n not meaningfully bounded vs $allPairs")
    val top = pairs.orderBy(desc("cos")).limit(1)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)].head()
    assert(top._1 == 0L && top._2 == 1L && top._3 > 0.999,
      s"near-identical pair not surfaced: $top")
    pairs.unpersist()
  }

  test("adaptiveBits derives the sign-bucket width from the corpus " +
      "count; candidate recall on jittered clusters >= 95%") {
    // the d20 contract (round-18): width ladder boundaries, floor and
    // cap, then recall on the sf3d-shaped fixture in miniature —
    // clustered near-dups with jitter big enough to flip near-zero
    // sign bits. Hamming-1 multi-probe must absorb single flips, so
    // candidate recall of same-cluster pairs stays high at the larger
    // derived width (measured 99.72% over 7.97M pairs at the real
    // sf3d decade; this pins a conservative 95% floor on the miniature).
    assert(Similarity.adaptiveBits(1L) == 4)
    assert(Similarity.adaptiveBits(1024L) == 4)
    assert(Similarity.adaptiveBits(1025L) == 5)
    assert(Similarity.adaptiveBits(2048L) == 5)
    assert(Similarity.adaptiveBits(200000L) == 12)
    assert(Similarity.adaptiveBits(Long.MaxValue / 2) == 16) // capped
    val rnd = new scala.util.Random(11)
    val nClusters = 300
    val perCluster = 6
    val rows = (0 until nClusters).flatMap { c =>
      val base = Array.fill(16)(rnd.nextGaussian())
      (0 until perCluster).map { j =>
        val v = base.map(_ + (rnd.nextDouble() - 0.5) * 2e-2)
        ((c * perCluster + j).toLong, "lab", v.toSeq)
      }
    }
    val df = rows.toDF("vec_id", "label", "v")
    val bits = Similarity.adaptiveBits(rows.size.toLong)
    assert(bits == 5, s"1800 vectors should derive 5 bits, got $bits")
    val found = Similarity.nearDupPairs(df, "label", "vec_id", "v", bits)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => a / perCluster == b / perCluster }.toSet
    val total = nClusters * (perCluster * (perCluster - 1) / 2)
    val recall = found.size.toDouble / total
    assert(recall >= 0.95,
      s"candidate recall $recall < 0.95 (${found.size}/$total)")
  }

  test("decontaminate: planted eval leak flagged, clean docs untouched") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different benchmark question about spark joins"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // doc 1: contains bench 100's first 8 tokens verbatim → 6 shared
      // 3-gram shingles
      (1L, "prefix words the quick brown fox jumps over the lazy suffix"),
      // doc 2: one shared shingle with bench 101
      (2L, "a question about spark tuning not benchmarks"),
      // doc 3: no overlap at all
      (3L, "entirely unrelated text with zero common trigrams here"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
      .select($"doc_id", $"bench_id", $"n_overlap", $"n_doc")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((1L, 100L, 6L), (2L, 101L, 1L)),
      s"got $out")
    // ratio denominator is the corpus doc's own distinct shingle count
    assert(out.head._4 == 9L) // 11 tokens → 9 trigrams, all distinct
  }

  test("incremental candidates == full-batch candidates touching the delta") {
    val docs = skewedDocs(32)
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3).persist()
    val sigs = Dedup.minhashSignatures(sh, 16).persist()
    try {
      val deltaFrom = 24L // the last 8 docs are the new batch
      val full = Dedup.lshCandidates(sigs, 4, 4)
        .filter($"id_b" >= deltaFrom) // delta ids are the max range
        .as[(Long, Long)].collect().toSet
      val incr = Dedup.lshCandidatesAgainst(
          sigs.filter($"id" >= deltaFrom), sigs, 4, 4)
        .as[(Long, Long)].collect().toSet
      assert(incr == full,
        s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
      assert(incr.nonEmpty, "fixture must produce delta-touching pairs")
      // never an existing-vs-existing pair
      assert(incr.forall(_._2 >= deltaFrom))
    } finally { sh.unpersist(); sigs.unpersist() }
  }
}
