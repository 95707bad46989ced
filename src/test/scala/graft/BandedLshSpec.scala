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

  test("bucket-sizing invariant: sub-capacity widths AUTO-WIDEN") {
    // 12 docs but 3-bit bands = 8 buckets < 12: the mm7 lesson, now a
    // derivation instead of a refusal (round-16, VERDICT item 3) — the
    // skeleton concatenates adjacent bands until the key-space covers
    // the corpus (w=2 → 6-bit keys, 64 ≥ 12), so the run proceeds with
    // candidates drawn only from WIDE-band equality. Own fixture: the
    // shared one carries 16-bit values, and the fixed-width contract
    // (every value < 2^bandBits) is what makes the concat key injective.
    import spark.implicits._
    val narrow = (0L until 12L).map { id =>
      val b: Array[Long] =
        if (id < 4) Array(1L, 2L, 3L, 4L)                  // shared bucket
        else if (id < 8) Array(5L, 6L, id % 8, (id * 3) % 8) // bands 0-1 only
        else Array(id % 8, (id * 3 + 1) % 8, (id * 5 + 2) % 8, (id * 7 + 3) % 8)
      (id, b.toSeq)
    }
    val narrowDf = narrow.toDF("id", "bands")
    val bands = narrow.toMap
    val got = BandedLsh.hammingPairs(narrowDf, bandBits = 3, maxHamming = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a wide band (pair of adjacent 3-bit bands) must match as a UNIT:
    // ids 0-3 match on both wide bands, ids 4-7 on wide band 0 only
    // (bands 0-1 shared), 8-11 nowhere — exactly the widened recall
    def wideCollide(a: Seq[Long], b: Seq[Long]): Boolean =
      a.grouped(2).zip(b.grouped(2)).exists { case (x, y) => x == y }
    def ham(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val expected = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      if wideCollide(bands(a), bands(b))
      h = ham(bands(a), bands(b)) if h <= 20
    } yield (a, b, h)).toSet
    assert(got == expected, s"got $got want $expected")
    assert(expected.nonEmpty, "fixture must plant wide-band collisions")
    // and the un-widenable case still refuses: past the 62-bit concat
    // ceiling there is no wider key, so the quadratic guard throws
    val e = intercept[IllegalArgumentException](
      BandedLsh.widenFactor(Long.MaxValue, 16))
    assert(e.getMessage.contains("quadratic"), e.getMessage)
  }

  test("widenFactor derives width from the corpus count") {
    assert(BandedLsh.widenFactor(12, 3) == 2)       // 8 < 12 ≤ 64
    assert(BandedLsh.widenFactor(50000, 16) == 1)   // sf1x: unchanged
    assert(BandedLsh.widenFactor(65536, 16) == 1)   // exactly at capacity
    assert(BandedLsh.widenFactor(65537, 16) == 2)   // first over → 32-bit
    assert(BandedLsh.widenFactor(500000, 16) == 2)  // the next decade
    assert(BandedLsh.widenFactor(1L << 40, 16) == 3) // and the one after
    assert(BandedLsh.buckets(16) == 65536L)
    intercept[IllegalArgumentException](BandedLsh.buckets(63))
    intercept[IllegalArgumentException](BandedLsh.buckets(0))
  }

  test("mm20's 4-bit derivation: both w=4 entry paths land on the same keys") {
    // The declared mm20 geometry (16 nibble bands, 4 bits each): 500
    // docs derive w=3 (4096 ≥ 500) and the 16 % 3 ≠ 0 divisor bump
    // lifts to w=4; 5,000 docs derive w=4 directly. Both paths must
    // produce the SAME 4-nibble concat keys — a planted pair sharing
    // all bands must surface at either corpus size, and a pair sharing
    // only 3 of 4 nibbles in every group must not.
    assert(BandedLsh.widenFactor(500, 4) == 3)   // pre-bump derivation
    assert(BandedLsh.widenFactor(5000, 4) == 4)  // direct
    import org.apache.spark.sql.functions._
    // murmur3-mixed nibbles (an affine map mod 16 would alias every
    // id ≡ mod 16 into one fingerprint); the clone re-evaluates the
    // same expressions at literal id 42
    def nib(id: org.apache.spark.sql.Column, i: Int) =
      pmod(hash(id, lit(i)).cast("long"), lit(16L))
    def corpus(n: Long) = {
      val base = spark.range(n).select(col("id"),
        array((0 until 16).map(i => nib(col("id"), i)): _*).as("bands"))
      val clone = spark.range(n, n + 1).select(col("id"),
        array((0 until 16).map(i => nib(lit(42L), i)): _*).as("bands"))
      base.union(clone)
    }
    Seq(500L, 5000L).foreach { n =>
      val got = BandedLsh.hammingPairs(corpus(n), bandBits = 4,
          maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((42L, n)),
        s"n=$n: planted exact pair must be the only hamming-0 pair, got $got")
    }
  }

  test("production widths cover the measured sf1x corpus unwidened") {
    // mm5/mm7 ship 16-bit bands; the sf1x scale fixture is 50k docs.
    // This is the structural form of the band-width lesson: if a
    // future fixture outgrows the width, hammingPairs now WIDENS
    // (hashes change with the band layout) — this pin makes that
    // moment an explicit test failure to re-golden, not a silent flip.
    val sf1xDocs = 50000L
    assert(BandedLsh.widenFactor(sf1xDocs, 16) == 1,
      "sf1x outgrew 16-bit bands: mm5/mm7 band layout will widen — " +
        "re-check their planted-recall contracts and goldens")
  }

  test("500k-row corpus auto-widens and stays bucket-bounded") {
    // The next-decade case the r15 guard could only fail on: 500k rows
    // with 16-bit bands (65536 buckets < corpus). widenFactor=2 →
    // 32-bit concatenated keys; each row's fingerprint is unique by
    // construction except one planted triple sharing all bands, so the
    // candidate stage must surface EXACTLY the 3 planted pairs — any
    // quadratic bucket blow-up would time this test out, and any
    // widened-key collision bug would add pairs the assert catches.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = spark.range(500000L).select(col("id"),
      array(pmod(col("id"), lit(65536L)),
        col("id") / 65536L cast "long",
        pmod(col("id") * 7919L + 13L, lit(65536L)),
        pmod(col("id") * 104729L + 17L, lit(65536L))).as("bands"))
    // planted triple: ids 500000/500001 clone id 42's fingerprint
    val clones = spark.range(500000L, 500002L).select(col("id"),
      array(lit(42L), lit(0L),
        lit((42L * 7919L + 13L) % 65536L),
        lit((42L * 104729L + 17L) % 65536L)).as("bands"))
    val got = BandedLsh.hammingPairs(base.union(clones), bandBits = 16,
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((42L, 500000L), (42L, 500001L), (500000L, 500001L)),
      s"got $got")
  }

  test("widened path rejects ragged, non-divisible and empty band " +
      "arrays instead of silently under-bucketing") {
    // round-16 ADVICE: a trailing group of rem < w bands has key-space
    // 2^(bandBits·rem) < n — the ≥corpus bucket bound silently fails
    // for it and its candidates can go quadratic; an EMPTY bands array
    // would make sequence(0,-1) emit spurious descending keys. Both
    // are now diagnostics when widening engages (w > 1 needs >65536
    // rows at 16-bit bands; 3 bands % w=2 ≠ 0).
    import org.apache.spark.sql.functions._
    val odd = spark.range(70000L).select(col("id"),
      array(pmod(col("id"), lit(65536L)),
        (col("id") / 65536L).cast("long"),
        pmod(col("id") * 7919L + 13L, lit(65536L))).as("bands"))
    val e = intercept[IllegalArgumentException](
      BandedLsh.hammingPairs(odd, bandBits = 16, maxHamming = 0).collect())
    assert(e.getMessage.contains("not divisible"), e.getMessage)
    // empty arrays under widening: rejected (band count 0)
    val empty = spark.range(70000L).select(col("id"),
      array().cast("array<long>").as("bands"))
    val e2 = intercept[IllegalArgumentException](
      BandedLsh.hammingPairs(empty, bandBits = 16, maxHamming = 0).collect())
    assert(e2.getMessage.contains("band count"), e2.getMessage)
    // sub-capacity (w=1) keeps the permissive explode path: empty
    // arrays simply contribute no candidates
    val small = spark.range(10L).select(col("id"),
      array().cast("array<long>").as("bands"))
    assert(BandedLsh.hammingPairs(small, bandBits = 16, maxHamming = 0)
      .count() == 0L)
  }

  test("divisor bump: a non-tiling derived width widens to the next " +
      "divisor while >=2 groups remain") {
    // 8×8-bit bands at 70k rows derive w=3 (2^24 first covers 70k) —
    // which does not tile 8 bands; round-18's bump takes w=4 (2 groups
    // of 32-bit keys, capacity 2^32) instead of rejecting, so the
    // declared 8-band queries (mm12/mm17) run at the 120k-doc decade.
    // A planted identical pair must surface through the bumped path.
    import org.apache.spark.sql.functions._
    val base = spark.range(70000L).select(col("id"),
      array(pmod(col("id"), lit(256L)),
        pmod(col("id") * 31L + 1L, lit(256L)),
        pmod(col("id") * 37L + 2L, lit(256L)),
        pmod(col("id") * 41L + 3L, lit(256L)),
        pmod(col("id") * 43L + 5L, lit(256L)),
        pmod(col("id") * 47L + 7L, lit(256L)),
        pmod(col("id") * 53L + 11L, lit(256L)),
        pmod(col("id") * 59L + 13L, lit(256L))).as("bands"))
    val dup = spark.range(70000L, 70001L).select(col("id"),
      array(Seq(1L, 32L, 39L, 44L, 48L, 54L, 64L, 72L).map(v =>
        lit(v % 256L)): _*).as("bands")) // = bands of id 1
    val all = base.union(dup).localCheckpoint()
    val got = BandedLsh.hammingPairs(all, bandBits = 8, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 70000L)),
      s"bumped w=4 path missed the planted identical pair: $got")
    // the 1-group degenerate case still rejects (5 bands, derived w=3
    // at 8-bit: the only larger divisor is w=5, leaving one group)
    val five = spark.range(70000L).select(col("id"),
      array((0 until 5).map(i =>
        pmod(col("id") * (31L + i) + i, lit(256L))): _*).as("bands"))
    val e = intercept[IllegalArgumentException](
      BandedLsh.hammingPairs(five, bandBits = 8, maxHamming = 0).collect())
    assert(e.getMessage.contains("not divisible"), e.getMessage)
  }

  test("second (strided) table recovers pairs the contiguous widening " +
      "loses") {
    // the widening recall cliff in miniature: a planted pair agreeing
    // on bands {0,2} but one bit off in bands {1,3} dirties BOTH
    // contiguous groups (01)(23) — invisible to table 0 — while the
    // strided table's group (0,2) is clean. tables=1 must MISS it
    // (that is the documented price, not a bug), tables=2 must find
    // it at hamming 2.
    import org.apache.spark.sql.functions._
    val base = spark.range(70000L).select(col("id"),
      array(pmod(col("id"), lit(65536L)),
        (col("id") / 65536L).cast("long"),
        pmod(col("id") * 7919L + 13L, lit(65536L)),
        pmod(col("id") * 104729L + 17L, lit(65536L))).as("bands"))
    val b0 = 42L % 65536L; val b1 = 42L / 65536L
    val b2 = (42L * 7919L + 13L) % 65536L
    val b3 = (42L * 104729L + 17L) % 65536L
    val boundary = spark.range(70000L, 70001L).select(col("id"),
      array(lit(b0), lit(b1 ^ 1L), lit(b2), lit(b3 ^ 1L)).as("bands"))
    val all = base.union(boundary).localCheckpoint()
    def pairs(t: Int) = BandedLsh.hammingPairsTables(all, bandBits = 16,
        maxHamming = 2, tables = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    assert(!one.contains((42L, 70000L)),
      s"single-table should miss the straddling pair; got $one")
    val two = pairs(2)
    assert(two.contains((42L, 70000L)), s"two-table missed it: $two")
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
