package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Wav

/** WAV codec contracts behind mm6: exact round-trip, chunk-WALK
  * correctness (unknown chunks before `data` must be skipped, with
  * RIFF word-alignment padding), rejection of malformed and
  * adversarial payloads (declared sizes are untrusted input — the Ppm
  * ADVICE lesson applied from the start), and the PCM/mono/16-bit
  * contract. */
class WavSpec extends AnyFunSuite {

  private def clip(n: Int, seed: Int = 1): Wav.Clip = {
    val rnd = new scala.util.Random(seed)
    Wav.Clip(8000, Array.fill(n)((rnd.nextInt(65536) - 32768).toShort))
  }

  test("encode/decode round-trips samples and rate exactly") {
    for (n <- Seq(0, 1, 7, 256, 1001)) {
      val c = clip(n, seed = n + 1)
      val d = Wav.decode(Wav.encode(c))
      assert(d.sampleRate == c.sampleRate)
      assert(d.samples.sameElements(c.samples), s"n=$n")
    }
  }

  test("chunk walk skips unknown chunks (with odd-size padding)") {
    val c = clip(16)
    val enc = Wav.encode(c)
    // splice a LIST chunk of ODD size 5 (+1 pad byte) between the fmt
    // and data chunks: offset 36 is the data header in canonical form
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = enc.take(36) ++ extra ++ enc.drop(36)
    val d = Wav.decode(spliced)
    assert(d.samples.sameElements(c.samples),
      "a fixed-offset reader breaks here; the chunk walk must not")
  }

  test("mu-law: decode(encodeUlaw(c)) = expand . compress, and the " +
      "companding is idempotent on bucket midpoints") {
    val c = Wav.Clip(8000, Array[Short](0, 1, -1, 100, -100, 5000, -5000,
      30000, -30000, 32767, -32768, 131, 132, 133))
    val d = Wav.decode(Wav.encodeUlaw(c))
    assert(d.sampleRate == 8000)
    val expected = c.samples.map(s => Wav.ulawExpand(Wav.ulawCompress(s)))
    assert(d.samples.sameElements(expected))
    // lossy: at least one sample moved
    assert(!d.samples.sameElements(c.samples), "companding must be lossy")
    // idempotent: bucket midpoints re-encode to themselves
    val d2 = Wav.decode(Wav.encodeUlaw(Wav.Clip(8000, d.samples)))
    assert(d2.samples.sameElements(d.samples))
    // G.711 reference points: silence is 0xFF, expand is its inverse
    assert(Wav.ulawCompress(0) == 0xff.toByte)
    assert(Wav.ulawExpand(0xff.toByte) == 0)
    // monotone over magnitudes: compress-expand never reorders
    val mags = Seq[Short](3, 50, 700, 9000, 28000)
      .map(s => Wav.ulawExpand(Wav.ulawCompress(s)).toInt)
    assert(mags == mags.sorted)
    // error bound: quantization error < 2^e * 8 + bias slack; assert
    // the coarse spec bound |err| <= 1000 over the full range
    (-32768 to 32767 by 17).foreach { v =>
      val r = Wav.ulawExpand(Wav.ulawCompress(v.toShort)).toInt
      assert(math.abs(r - math.max(math.min(v, 32635), -32635)) <= 1000,
        s"v=$v r=$r")
    }
    // odd sample count gets the RIFF pad byte and still parses
    val odd = Wav.Clip(8000, Array[Short](10, -20, 30))
    assert(Wav.decode(Wav.encodeUlaw(odd)).samples.length == 3)
    // G.711 sign symmetry: negating a sample flips ONLY the sign bit
    // of the companded byte, and expansion is odd-symmetric
    Seq[Short](1, 99, 1234, 20000, 32124).foreach { v =>
      assert(Wav.ulawCompress((-v).toShort) ==
        (Wav.ulawCompress(v) ^ 0x80).toByte, s"v=$v")
    }
    (0 to 127).foreach { b =>
      assert(Wav.ulawExpand((b | 0x80).toByte) ==
        (-Wav.ulawExpand(b.toByte)).toShort, s"byte=$b")
    }
  }

  test("odd-size chunk ending at the payload edge gets the codec's own " +
      "diagnostic (pad byte is optional at end-of-payload)") {
    // RIFF + fmt, then a LIST chunk of ODD size whose last byte IS the
    // last payload byte — no pad byte, no data chunk. The skip must be
    // bounded by the remaining bytes (round-15 ADVICE fix) so decode
    // reaches its own "no data chunk" require instead of tripping
    // ByteBuffer.position's unlabeled bounds check.
    val enc = Wav.encode(clip(4))
    val trailer = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) // odd, unpadded
    val spliced = enc.take(36) ++ trailer
    val e = intercept[IllegalArgumentException](Wav.decode(spliced))
    assert(e.getMessage.contains("no data chunk"),
      s"expected the codec diagnostic, got: ${e.getMessage}")
  }

  test("malformed and adversarial payloads are rejected") {
    val good = Wav.encode(clip(8))
    intercept[IllegalArgumentException](Wav.decode(null))
    intercept[IllegalArgumentException](Wav.decode(good.take(30))) // short
    intercept[IllegalArgumentException](
      Wav.decode("RIFX".getBytes ++ good.drop(4))) // wrong magic
    intercept[IllegalArgumentException](Wav.decode(good.dropRight(3)))
    // adversarial: data chunk declaring far more bytes than exist —
    // the declared size must be bounded by remaining, not trusted
    val lying = good.clone()
    lying(40) = -1; lying(41) = -1; lying(42) = -1; lying(43) = 0x7f
    intercept[IllegalArgumentException](Wav.decode(lying))
    // non-PCM fmt code
    val nonPcm = good.clone(); nonPcm(20) = 3
    intercept[IllegalArgumentException](Wav.decode(nonPcm))
    // stereo
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Wav.decode(stereo))
    // no data chunk at all
    intercept[IllegalArgumentException](Wav.decode(good.take(36)))
  }

  test("spark pipeline: features match hand-computed values for one id") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val out = graft.multimodal.Multimodal.wavFeatures(
        graft.multimodal.Multimodal.synthWavPayload(
          Seq(3L).toDF("doc_id"), "doc_id", nSamples = 8))
      .collect().head
    // v(i) = ((3*7 + 13 i) mod 201) - 100, i = 0..7:
    // 21,34,47,60,73,86,99,112 mod 201 → minus 100:
    val v = (0 until 8).map(i => ((21 + 13 * i) % 201) - 100)
    assert(out.getInt(1) == 8 && out.getInt(2) == 8000)
    assert(math.abs(out.getDouble(3) - v.map(math.abs).sum / 8.0) < 1e-9)
    assert(out.getLong(4) ==
      v.sliding(2).count(p => p(0) * p(1) < 0).toLong)
    assert(out.getInt(5) == v.map(math.abs).max)
    assert(out.getLong(6) == v.map(x => x.toLong * x).sum)
  }
}
