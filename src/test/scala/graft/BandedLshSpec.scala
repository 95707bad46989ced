package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.BandedLsh

/** The shared banded-LSH skeleton's contracts: candidate completeness
  * against a brute-force reference, the bucket-sizing invariant that
  * made mm7's 8-bit-band quadratic blow-up impossible to repeat, and
  * the width arithmetic the four production queries (d2/d9 MinHash,
  * mm5 dHash, mm7 audio) rely on at the measured sf1x corpus size. */
class BandedLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 12 docs with 4 bands of 16 bits: ids 0-3 share all bands (one
    * planted bucket per band), ids 4-7 share bands 0-1 only, ids 8-11
    * are pairwise-distinct everywhere. */
  private def fixture = {
    import spark.implicits._
    (0L until 12L).map { id =>
      val bands = Array.tabulate(4) { k =>
        if (id < 4) 100L + k
        else if (id < 8 && k < 2) 200L + k
        else 1000L + id * 7 + k * 131 // distinct per (id, band)
      }
      (id, bands.toSeq)
    }.toDF("id", "bands")
  }

  test("hammingPairs = brute force restricted to band-colliding pairs") {
    val bands = fixture.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def ham(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val expected = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      if bands(a).zip(bands(b)).exists { case (x, y) => x == y }
      h = ham(bands(a), bands(b)) if h <= 20
    } yield (a, b, h)).toSet
    val got = BandedLsh.hammingPairs(fixture, bandBits = 16, maxHamming = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must plant colliding pairs")
    // and NO pair without a band collision ever surfaces, whatever its
    // Hamming distance — candidates come only from bucket equality
    assert(!got.exists { case (a, b, _) =>
      !bands(a).zip(bands(b)).exists { case (x, y) => x == y } })
  }

  test("bucket-sizing invariant: key-space below corpus size throws") {
    // 12 docs but 3-bit bands = 8 buckets < 12: the mm7 lesson — the
    // skeleton must refuse, not go quadratic
    val e = intercept[IllegalArgumentException](
      BandedLsh.hammingPairs(fixture, bandBits = 3, maxHamming = 2)
        .collect())
    assert(e.getMessage.contains("quadratic"), e.getMessage)
    assert(BandedLsh.buckets(16) == 65536L)
  }

  test("production widths cover the measured sf1x corpus") {
    // mm5/mm7 ship 16-bit bands; the sf1x scale fixture is 50k docs.
    // This is the structural form of the band-width lesson: if a
    // future fixture outgrows the width, THIS fails, not a 12x bench
    // line at the sf1x spot check.
    val sf1xDocs = 50000L
    assert(BandedLsh.buckets(16) >= sf1xDocs,
      "widen mm5/mm7 bands or add a second hash table")
  }

  test("delta candidates touch the new batch only, normalized") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, posexplode}
    val ex = fixture.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "band_key")))
    val newSide = ex.filter(col("id") === 4L)
    val pairs = BandedLsh.deltaCandidates(newSide, ex)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((4L, 5L), (4L, 6L), (4L, 7L)),
      s"got $pairs")
  }
}
