package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** mm7's audio fingerprint must (1) be computed from REAL decoded
  * samples — the bands equal the closed-form replay of the generator,
  * so any codec bug (mis-walked chunk, wrong offset, endianness)
  * changes them; (2) keep the planted structure the banded-LSH recall
  * argument needs: within-group Hamming small enough that the ≤ 6
  * query threshold keeps every pair, cross-group large enough that it
  * rejects them. */
class AudioNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Closed-form replay of synthWavGroupPayload + the energy-delta
    * fingerprint (the oracle's arithmetic, in Scala). */
  private def expectedBands(id: Long): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val g = id / 8
    val amp = Array.tabulate(128) { f =>
      val dg = md.digest(s"$g:$f".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      (h % 80).toInt + 20 + (if (f == (id % 128).toInt) 17 else 0)
    }
    val e = amp.map(a => 8L * a * a)
    val bands = new Array[Long](8)
    (0 until 127).foreach { f =>
      if (e(f + 1) > e(f)) bands(f / 16) |= 1L << (f % 16)
    }
    bands.toSeq
  }

  private def actualBands(ids: Seq[Long]): Map[Long, Seq[Long]] = {
    val df = ids.toDF("doc_id")
    Multimodal.audioFingerprintBands(
        Multimodal.synthWavGroupPayload(df, "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  test("fingerprint from decoded bytes equals the closed-form replay") {
    val ids = (0L until 32L)
    val actual = actualBands(ids)
    ids.foreach { id =>
      assert(actual(id) == expectedBands(id),
        s"id $id: decode-path bands ${actual(id)} != replay ${expectedBands(id)}")
    }
  }

  test("fingerprint is capped at 127 delta bits: long clips match their " +
      "first-128-frame truncation") {
    // A 200-frame clip must fingerprint identically to its first 128
    // frames (127 deltas) — a 128-bit cap would set delta bit 127 from
    // frame 128, contradicting the documented 127-bit / 8×16-band
    // contract the mm7 oracle replays with f < 127 (round-15 ADVICE fix).
    import graft.multimodal.Wav
    def bands(nFrames: Int): Seq[Long] = {
      val samples = Array.tabulate(nFrames * 8) { i =>
        val f = i / 8
        (20 + (f * f * 31 + f * 7) % 80).toShort // energies vary per frame
      }
      val df = Seq((0L, Wav.encode(Wav.Clip(8000, samples))))
        .toDF("id", "payload")
      Multimodal.audioFingerprintBands(df).collect().head
        .getSeq[Long](1).toSeq
    }
    val long = bands(200)
    assert(long == bands(128),
      "frames past 128 must not contribute delta bits")
    assert((long(7) & (1L << 15)) == 0L,
      "delta bit 127 must never be set (127-bit contract)")
  }

  test("within-group Hamming <= 4; cross-group above the query threshold") {
    val ids = (0L until 32L) // 4 groups of 8
    val bands = actualBands(ids)
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    for (i <- ids; j <- ids if i < j) {
      val h = ham(bands(i), bands(j))
      if (i / 8 == j / 8)
        assert(h <= 4, s"within-group pair ($i,$j) Hamming $h > 4")
      else
        assert(h > 6, s"cross-group pair ($i,$j) Hamming $h within threshold")
    }
  }

  test("a within-group pair always shares at least 6 clean bands") {
    val ids = (0L until 16L)
    val bands = actualBands(ids)
    for (i <- ids; j <- ids if i < j && i / 8 == j / 8) {
      val shared = bands(i).zip(bands(j)).count { case (x, y) => x == y }
      assert(shared >= 6,
        s"pair ($i,$j) shares only $shared bands — candidates would be missed")
    }
  }
}
