package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Multimodal, Ppm}

/** Perceptual-hash (dHash) contracts behind mm5 — the SimHash-style
  * Hamming properties the hash gate can't see: identity, perceptual
  * invariance (brightness shift / contrast scale leave the gradient
  * signature untouched), locality (a perturbation confined to one
  * raster row can only touch that row's band — the structural fact
  * the banded-LSH recall argument rests on), and the Hamming metric's
  * triangle inequality over random rasters. */
class DHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val W = 18; private val H = 8

  /** Encode a raster given per-byte values (already in [0, 255]). */
  private def payload(vals: Int => Int): Array[Byte] =
    Ppm.encode(Ppm.Image(W, H, 255,
      Array.tabulate(3 * W * H)(j => vals(j).toByte)))

  private def bandsOf(ps: (Long, Array[Byte])*): Map[Long, Seq[Long]] = {
    import spark.implicits._
    Multimodal.dHashBands(ps.toSeq.toDF("id", "payload"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
  }

  private def ham(a: Seq[Long], b: Seq[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  private def randVals(seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(3 * W * H)(rnd.nextInt(180)) // ≤ 179: +40 shift can't wrap
  }

  test("identical images hash identically; bands are 4 × 16-bit") {
    val v = randVals(1)
    val m = bandsOf(1L -> payload(v), 2L -> payload(v))
    assert(m(1L) == m(2L) && ham(m(1L), m(2L)) == 0)
    assert(m(1L).length == 4 && m(1L).forall(b => b >= 0 && b < 65536))
  }

  test("perceptual invariance: brightness shift and contrast scale") {
    val v = randVals(2)
    val m = bandsOf(
      1L -> payload(v),
      2L -> payload(j => v(j) + 40),      // global brightness
      3L -> payload(j => (v(j) * 5) / 4)) // monotone contrast stretch
    assert(m(2L) == m(1L), "brightness shift must not move a single bit")
    assert(m(3L) == m(1L), "monotone contrast scaling preserves cell order")
  }

  test("locality: a one-row perturbation touches only that row's band") {
    val v = randVals(3)
    for (row <- 0 until H) {
      val m = bandsOf(
        1L -> payload(v),
        2L -> payload { j =>
          val p = j / 3
          if (p / W == row) (v(j) + 97) % 251 else v(j)
        })
      val diff = m(1L).zip(m(2L)).zipWithIndex
        .filter { case ((a, b), _) => a != b }.map(_._2)
      assert(diff.forall(_ == row / 2),
        s"row-$row perturbation leaked into bands $diff")
      // …which guarantees banded-LSH recall: ≥ 3 of 4 bands identical
      assert(m(1L).zip(m(2L)).count { case (a, b) => a == b } >= 3)
    }
  }

  test("Hamming over bands is a metric: triangle inequality, symmetry") {
    val hs = (1 to 6).map(s => bandsOf(s.toLong -> payload(randVals(s)))
      .apply(s.toLong))
    for (a <- hs; b <- hs; c <- hs) {
      assert(ham(a, c) <= ham(a, b) + ham(b, c))
      assert(ham(a, b) == ham(b, a))
    }
  }

  test("grouped generator plants <=2-bit near-dups, distant cross-group") {
    import spark.implicits._
    // two full groups of 8 (ids 0-7 / 8-15): within-group pairs differ
    // in ≤ 2 bits (each doc perturbs one bit-row), cross-group rasters
    // are unrelated md5 noise — far in Hamming (simulated floor ≥ 17;
    // assert a conservative > 6, mm5's keep threshold)
    val bands = Multimodal.dHashBands(Multimodal.synthPpmGroupPayload(
        (0L until 16L).toDF("doc_id"), "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    for (a <- 0L until 8L; b <- (a + 1) until 8L)
      assert(ham(bands(a), bands(b)) <= 2, s"pair ($a,$b) too far")
    for (a <- 0L until 8L; b <- 8L until 16L)
      assert(ham(bands(a), bands(b)) > 6, s"cross pair ($a,$b) too close")
  }

  test("straddle generator: two-table LSH recovers pairs the contiguous " +
      "widening is structurally blind to (mm17's geometry)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, flatten, lit,
      shiftright, transform}
    // 500 docs -> past the 2^8 wall, w=2 derived; doc id dirties only
    // gradient bit 0 of rows {id%4, id%4+4}
    val b16 = Multimodal.dHashBands(Multimodal.synthPpmStraddlePayload(
      (0L until 500L).toDF("doc_id"), "doc_id"))
    val b8 = b16.select(col("id"),
        flatten(transform(col("bands"), b =>
          array(b.bitwiseAND(lit(255L)), shiftright(b, 8)))).as("bands"))
      .localCheckpoint()
    def pairs(tables: Int): Set[(Long, Long)] =
      graft.dedup.BandedLsh.hammingPairsTables(b8, bandBits = 8,
          maxHamming = 4, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    val two = pairs(2)
    // ground truth: every within-group pair is <= 4 bits apart by the
    // generator's construction (4 dirty rows x <= 1 bit) — brute-force
    // it from the full-resolution bands
    val bm = b8.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val truth = (for {
      a <- 0L until 500L; b <- (a + 1) until 500L
      if a / 8 == b / 8 && ham(bm(a).toList, bm(b).toList) <= 4
    } yield (a, b)).toSet
    assert(one.subsetOf(two), "tables=2 must be a superset of tables=1")
    assert((truth -- two).isEmpty,
      s"two-table missed ${(truth -- two).size} planted pairs")
    val gained = (two -- one).filter { case (a, b) => a / 8 == b / 8 }
    assert(gained.nonEmpty,
      "strided table recovered no contiguous-blind pairs — the " +
        "straddle fixture is not exercising the second table")
  }
}
