package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Flac

/** Contracts for the dependency-free FLAC codec (RFC 9639 subset).
  * The declared query (mm13_flac_features) hash-gates losslessness AND
  * the compressed size against the DuckDB replay; these specs pin what
  * the hash can't see — round trips across every subframe type and
  * blocking shape, the deterministic Rice-parameter rule, CRC tamper
  * detection, and the adversarial-parse rejections (out-of-subset and
  * malformed streams fail with diagnostics, never mis-decode). */
class FlacSpec extends AnyFunSuite {

  /** Deterministic 16-bit pseudo-random samples (LCG, fixed seed). */
  private def lcgSamples(n: Int, seed: Long = 42L,
                         amp: Int = 30000): Array[Short] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % (2 * amp + 1) - amp).toShort
    }
  }

  /** Smooth compressible waveform: wrapping ramp (small 2nd diffs). */
  private def rampSamples(n: Int): Array[Short] =
    Array.tabulate(n)(i => (((i * 13) % 201) - 100).toShort)

  test("round trip: smooth multi-frame stream, adaptive encoder") {
    val x = rampSamples(1000) // blockSize 256 -> frames 256,256,256,232
    val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 256)
    val dec = Flac.decode(enc)
    assert(dec.sampleRate == 8000)
    assert(dec.samples.toSeq == x.toSeq)
    assert(enc.length < 2 * x.length,
      s"smooth signal did not compress: ${enc.length} vs raw ${2 * x.length}")
  }

  test("round trip: every forced fixed order 0-4") {
    val x = lcgSamples(512, amp = 120) // small-amplitude noise
    (0 to 4).foreach { o =>
      val enc = Flac.encode(Flac.Stream(16000, x),
        blockSize = 256, forceOrder = Some(o))
      val dec = Flac.decode(enc)
      assert(dec.samples.toSeq == x.toSeq, s"order $o round trip failed")
    }
  }

  test("constant block takes the CONSTANT subframe (tiny payload)") {
    val x = Array.fill(4096)(1234.toShort)
    val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 4096)
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
    // stream header 42 + frame header 8 + subframe (1 byte + 16-bit
    // constant) + crc16 = 42 + 8 + 3 + 2 = 55
    assert(enc.length == 55, s"constant frame not minimal: ${enc.length}")
  }

  test("incompressible noise falls back to VERBATIM, never expands past raw") {
    val x = lcgSamples(256) // full-range noise
    val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 256)
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
    // verbatim frame: 42 + 8 + ceil((8 + 256*16)/8) + 2 = 42 + 8 + 513 + 2
    assert(enc.length == 42 + 8 + 513 + 2,
      s"expected verbatim fallback size, got ${enc.length}")
  }

  test("wide-range residuals (order forced on noise) still round trip") {
    // order-4 residuals of full-range noise reach ~16x amplitude; the
    // capped k=14 Rice path must still encode/decode exactly
    val x = lcgSamples(300)
    val enc = Flac.encode(Flac.Stream(8000, x),
      blockSize = 256, forceOrder = Some(4))
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
  }

  test("multi-byte coded frame numbers (>127 frames) round trip") {
    val x = rampSamples(16 * 130) // 130 frames of 16
    val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 16)
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
  }

  test("rice parameter rule: top-set-bit of the mean zigzag, capped 14") {
    assert(Flac.riceParam(0L, 100) == 0)
    assert(Flac.riceParam(99L, 100) == 0) // mean 0
    assert(Flac.riceParam(100L, 100) == 0) // mean 1 -> k=0
    assert(Flac.riceParam(200L, 100) == 1) // mean 2
    assert(Flac.riceParam(300L, 100) == 1) // mean 3
    assert(Flac.riceParam(400L, 100) == 2) // mean 4
    assert(Flac.riceParam(Long.MaxValue / 4, 2) == 14) // capped
  }

  test("riceBits is the exact encoded residual width") {
    val rs = Array(0L, -1L, 1L, -2L, 5L, -100L)
    // zigzag: 0,1,2,3,10,199 ; k=2 -> (zz>>2)+3 each
    val expect = rs.map { r =>
      val zz = (r << 1) ^ (r >> 63)
      (zz >>> 2) + 3
    }.sum
    assert(Flac.riceBits(rs, 2) == expect)
  }

  test("fixed residuals match the polynomial definitions") {
    val x = Array[Short](3, 7, 12, 20, 33)
    assert(Flac.fixedResiduals(x, 0).toSeq == Seq(3L, 7L, 12L, 20L, 33L))
    assert(Flac.fixedResiduals(x, 1).toSeq == Seq(4L, 5L, 8L, 13L))
    assert(Flac.fixedResiduals(x, 2).toSeq == Seq(1L, 3L, 5L))
    assert(Flac.fixedResiduals(x, 3).toSeq == Seq(2L, 2L))
    assert(Flac.fixedResiduals(x, 4).toSeq == Seq(0L))
  }

  // ----------------------------------------------------------------
  // Adversarial parsing: reject, never mis-decode
  // ----------------------------------------------------------------

  private def valid(): Array[Byte] =
    Flac.encode(Flac.Stream(8000, rampSamples(256)), blockSize = 256)

  private def rejects(bytes: Array[Byte], fragment: String): Unit = {
    val e = intercept[IllegalArgumentException](Flac.decode(bytes))
    assert(e.getMessage.contains(fragment),
      s"wrong diagnostic: ${e.getMessage}")
  }

  test("wrong magic rejected") {
    val b = valid(); b(0) = 'g'.toByte
    rejects(b, "not a fLaC stream")
  }

  test("header tamper fails the frame CRC-8") {
    val b = valid()
    // low byte of the 16-bit blocksize-1 (255 -> 254 stays semantically
    // plausible, so the CRC is the check that must catch it)
    b(48) = (b(48) ^ 0x01).toByte
    rejects(b, "CRC-8")
  }

  test("body tamper fails the frame CRC-16") {
    val b = valid()
    b(b.length - 5) = (b(b.length - 5) ^ 0x40).toByte // residual bits
    rejects(b, "CRC-16")
  }

  test("truncated payload rejected") {
    val b = valid()
    rejects(java.util.Arrays.copyOf(b, b.length - 3), "truncated")
  }

  test("metadata block overrunning the payload rejected") {
    val b = valid()
    b(5) = 0x01.toByte // STREAMINFO declared length 34 -> 65570
    rejects(b, "declares")
  }

  test("non-34-byte STREAMINFO rejected") {
    val b = valid()
    b(7) = 0x30.toByte // declared length 48, still inside the payload
    rejects(b, "STREAMINFO length")
  }

  /** Assemble a stream with a handcrafted frame header (correct CRCs)
    * to reach the decoder's out-of-subset diagnostics. `patch` edits
    * the 7 header bytes before the CRC-8 is computed. */
  private def crafted(patch: Array[Byte] => Unit): Array[Byte] = {
    val good = valid()
    val out = java.util.Arrays.copyOf(good, good.length)
    // frame starts at byte 42; header bytes 42..48, crc8 at 49
    patch(out)
    val c8 = Flac.crc8(out, 42, 49)
    out(49) = c8.toByte
    out
  }

  test("stereo channel assignment rejected as out of subset") {
    rejects(crafted(b => b(45) = 0x14.toByte), "mono subset") // ch code 1
  }

  test("non-16-bit sample size rejected as out of subset") {
    rejects(crafted(b => b(45) = 0x02.toByte), "16-bit subset") // 8-bit code
  }

  test("reserved blocksize code 0 rejected") {
    rejects(crafted(b => b(44) = 0x00.toByte), "reserved blocksize")
  }

  test("variable-blocksize strategy rejected as out of subset") {
    rejects(crafted(b => b(43) = (b(43) | 0x01).toByte), "out of subset")
  }

  test("frame numbers must be sequential") {
    rejects(crafted(b => b(46) = 0x05.toByte), "expected 0")
  }

  test("reserved subframe type rejected") {
    val good = valid()
    val out = java.util.Arrays.copyOf(good, good.length)
    out(50) = 0x04.toByte // 0|000010|0 reserved
    val c16 = Flac.crc16(out, 42, out.length - 2)
    out(out.length - 2) = ((c16 >> 8) & 0xff).toByte
    out(out.length - 1) = (c16 & 0xff).toByte
    rejects(out, "reserved subframe type")
  }

  // ----------------------------------------------------------------
  // Quantized LPC (round 18): orders 1..32, precision/shift fields
  // ----------------------------------------------------------------

  test("lpc residuals match the quantized-predictor definition") {
    val x = Array[Short](10, 20, 35, 50, 70)
    // coefs (3, -1), shift 1: pred_t = (3·x_{t−1} − x_{t−2}) >> 1
    val rs = Flac.lpcResiduals(x, Array(3, -1), 1)
    // t=2: (60-10)>>1=25 -> 10 ; t=3: (105-20)>>1=42 -> 8
    // t=4: (150-35)>>1=57 -> 13
    assert(rs.toSeq == Seq(10L, 8L, 13L))
    // shift 0, coef (1): plain first difference
    assert(Flac.lpcResiduals(x, Array(1), 0).toSeq ==
      Seq(10L, 15L, 15L, 20L))
  }

  test("lpc round trip: order sweep with smooth and noisy signals") {
    val smooth = rampSamples(600) // multi-frame at 256
    val noisy = lcgSamples(600, amp = 500)
    val cases = Seq(
      (Array(1), 0, 2), // order 1, trivial
      (Array(2, -1), 0, 3), // the FIXED order-2 predictor as LPC
      (Array(3, -1), 1, 4), // genuine shifted predictor
      (Array(5, -3, 1), 2, 5), // order 3
      (Array(7, -5, 2, -1), 3, 5), // order 4
      (Array.fill(8)(1), 3, 4), // order 8 moving-average-ish
      (Array.tabulate(32)(j => if (j == 0) 9 else -1), 3, 6)) // order 32
    cases.foreach { case (coefs, shift, prec) =>
      Seq(smooth, noisy).foreach { x =>
        val enc = Flac.encodeLpc(Flac.Stream(8000, x), blockSize = 256,
          coefs = coefs, shift = shift, precision = prec)
        val dec = Flac.decode(enc)
        assert(dec.samples.toSeq == x.toSeq,
          s"LPC order ${coefs.length} shift $shift round trip failed")
      }
    }
  }

  test("lpc golden: compressed size matches the mm16 closed form") {
    val n = 256
    val x = rampSamples(n)
    val coefs = Array(3, -1)
    val enc = Flac.encodeLpc(Flac.Stream(8000, x), blockSize = n,
      coefs = coefs, shift = 1, precision = 4)
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
    val rs = Flac.lpcResiduals(x, coefs, 1)
    val k = Flac.riceParam(rs.map(r => (r << 1) ^ (r >> 63)).sum, rs.length)
    // body prefix: subframe hdr 8 + warmup 2·16 + precision 4 +
    // shift 5 + coefs 2·4 + method 2 + part order 4 + k 4 = 67 bits
    val bits = 67 + Flac.riceBits(rs, k)
    assert(enc.length == 42 + 8 + (bits + 7) / 8 + 2,
      s"LPC size ${enc.length} != closed form")
  }

  test("lpc encoder rejects out-of-range parameters by name") {
    val x = rampSamples(256)
    val s = Flac.Stream(8000, x)
    assert(intercept[IllegalArgumentException](
      Flac.encodeLpc(s, 256, Array(3, -1), shift = -1, precision = 4))
      .getMessage.contains("shift"))
    assert(intercept[IllegalArgumentException](
      Flac.encodeLpc(s, 256, Array(9, -1), shift = 0, precision = 4))
      .getMessage.contains("overflows signed 4 bits"))
    assert(intercept[IllegalArgumentException](
      Flac.encodeLpc(s, 256, Array.fill(33)(1), shift = 0, precision = 4))
      .getMessage.contains("LPC order"))
    assert(intercept[IllegalArgumentException](
      Flac.encodeLpc(s, 256, Array(3, -1), shift = 0, precision = 16))
      .getMessage.contains("precision"))
  }

  /** A valid single-frame LPC stream (order 2, precision 4, shift 1)
    * with byte 55 = precision(4)+shift[4..1] and byte 56's MSB =
    * shift[0] — the header fields the adversarial patches target. */
  private def validLpc(): Array[Byte] =
    Flac.encodeLpc(Flac.Stream(8000, rampSamples(256)), blockSize = 256,
      coefs = Array(3, -1), shift = 1, precision = 4)

  private def patchLpcBody(edit: Array[Byte] => Unit): Array[Byte] = {
    val v = validLpc()
    val out = java.util.Arrays.copyOf(v, v.length)
    edit(out)
    val c16 = Flac.crc16(out, 42, out.length - 2)
    out(out.length - 2) = ((c16 >> 8) & 0xff).toByte
    out(out.length - 1) = (c16 & 0xff).toByte
    out
  }

  test("lpc coefficient-precision escape (15) rejected") {
    rejects(patchLpcBody(b => b(55) = ((b(55) & 0x0f) | 0xf0).toByte),
      "precision escape")
  }

  test("negative lpc shift rejected") {
    rejects(patchLpcBody { b =>
      b(55) = (b(55) | 0x0f).toByte // shift bits 4..1 -> 1111
      b(56) = (b(56) | 0x80).toByte // shift bit 0 -> 1 => shift = -1
    }, "negative LPC shift")
  }

  test("hybrid encoder: every predictor-family branch fires and " +
      "round-trips (mm18's decision tree)") {
    val n = 256
    def enc(x: Array[Short]): Array[Byte] =
      Flac.encodeHybrid(Flac.Stream(8000, x), blockSize = n,
        coefs = Array(3, -1), shift = 1, precision = 4)
    // CONSTANT
    val const = Array.fill(n)(42.toShort)
    assert(enc(const).length == 55)
    assert(Flac.decode(enc(const)).samples.toSeq == const.toSeq)
    // decaying exponential: LPC (3,-1)>>1 solves it -> LPC subframe,
    // size = mm16's 67-bit-prefix closed form
    val decay = Array.tabulate(n)(t =>
      (100 + (12800 >> math.min(t, 30))).toShort)
    val eDecay = enc(decay)
    assert(Flac.decode(eDecay).samples.toSeq == decay.toSeq)
    val rsL = Flac.lpcResiduals(decay, Array(3, -1), 1)
    val kL = Flac.riceParam(rsL.map(r => (r << 1) ^ (r >> 63)).sum, rsL.length)
    assert(eDecay.length == 42 + 8 + (67 + Flac.riceBits(rsL, kL) + 7) / 8 + 2,
      s"decay family did not take the LPC branch: ${eDecay.length}")
    // the LPC residual sum must strictly beat every fixed order here
    val sums = (0 to 4).map(o =>
      Flac.fixedResiduals(decay, o).map(math.abs).sum)
    assert(rsL.map(math.abs).sum < sums.min,
      s"LPC ${rsL.map(math.abs).sum} not below fixed ${sums.min}")
    // wrapping ramp: a FIXED order wins (LPC under-predicts a line)
    val ramp = rampSamples(n)
    val eRamp = enc(ramp)
    assert(Flac.decode(eRamp).samples.toSeq == ramp.toSeq)
    val bestO = (0 to 4).minBy(o =>
      (Flac.fixedResiduals(ramp, o).map(math.abs).sum, o))
    val rsF = Flac.fixedResiduals(ramp, bestO)
    val kF = Flac.riceParam(rsF.map(r => (r << 1) ^ (r >> 63)).sum, rsF.length)
    assert(eRamp.length ==
      42 + 8 + (8 + 16 * bestO + 10 + Flac.riceBits(rsF, kF) + 7) / 8 + 2,
      s"ramp family did not take the FIXED($bestO) branch: ${eRamp.length}")
    // full-range noise: VERBATIM fallback
    val noise = lcgSamples(n)
    assert(enc(noise).length == 42 + 8 + 513 + 2)
    assert(Flac.decode(enc(noise)).samples.toSeq == noise.toSeq)
  }

  test("hybrid encoder: one stream mixing subframe types across frames " +
      "(the wild-FLAC shape) round-trips") {
    // three 256-sample blocks of different character -> three different
    // subframe types in ONE stream: CONSTANT, LPC, VERBATIM
    val x = Array.fill(256)(7.toShort) ++
      Array.tabulate(256)(t => (100 + (12800 >> math.min(t, 30))).toShort) ++
      lcgSamples(256)
    val enc = Flac.encodeHybrid(Flac.Stream(8000, x), blockSize = 256,
      coefs = Array(3, -1), shift = 1, precision = 4)
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
    // the mixed stream is smaller than three VERBATIM frames but larger
    // than three CONSTANT ones — a loose shape check that all three
    // branches actually fired
    assert(enc.length > 55 + 2 * 13 && enc.length < 3 * 523 + 42,
      s"unexpected mixed-stream size ${enc.length}")
  }

  // ----------------------------------------------------------------
  // Stereo: the four channel assignments
  // ----------------------------------------------------------------

  /** Correlated stereo pair: R = L − d with a small difference signal
    * (the shape inter-channel decorrelation exists for). */
  private def stereo(n: Int): Flac.StereoStream = {
    val l = rampSamples(n)
    val r = Array.tabulate(n)(i => (l(i) - (((i * 3) % 41) - 20)).toShort)
    Flac.StereoStream(8000, l, r)
  }

  test("stereo round trip: every channel assignment") {
    val st = stereo(1000) // multi-frame at blockSize 256
    Seq("independent", "left-side", "right-side", "mid-side", "adaptive")
      .foreach { mode =>
        val enc = Flac.encodeStereo(st, blockSize = 256, mode = mode)
        val dec = Flac.decodeStereo(enc)
        assert(dec.sampleRate == 8000, mode)
        assert(dec.left.toSeq == st.left.toSeq, s"$mode left")
        assert(dec.right.toSeq == st.right.toSeq, s"$mode right")
      }
  }

  test("adaptive picks decorrelation for correlated channels") {
    val st = stereo(512)
    val adaptive = Flac.encodeStereo(st, blockSize = 256).length
    val indep = Flac.encodeStereo(st, blockSize = 256,
      mode = "independent").length
    assert(adaptive < indep,
      s"adaptive ($adaptive B) did not beat independent ($indep B)")
  }

  test("mid-side floors odd negative sums correctly") {
    // l + r odd and negative: (l+r)>>1 floors, the dropped LSB rides
    // the side channel's parity — exactness here is the whole trick
    val pairs = Array((-3, 0), (-5, 2), (7, -2), (-32768, 32767),
      (32767, -32768), (0, -1), (-1, 0), (1, 2),
      (-101, 100), (99, -100), (-32768, -32767), (32767, 32766),
      (-1, -2), (3, -4), (-7, 8), (15, -16))
    val st = Flac.StereoStream(8000,
      pairs.map(_._1.toShort), pairs.map(_._2.toShort))
    val enc = Flac.encodeStereo(st, blockSize = 16, mode = "mid-side")
    val dec = Flac.decodeStereo(enc)
    assert(dec.left.toSeq == st.left.toSeq)
    assert(dec.right.toSeq == st.right.toSeq)
  }

  test("17-bit side channel: extreme difference round trips") {
    val l = Array.fill(64)(32767.toShort)
    val r = Array.fill(64)((-32768).toShort)
    Seq("left-side", "right-side", "mid-side").foreach { mode =>
      val st = Flac.StereoStream(8000, l, r)
      val dec = Flac.decodeStereo(
        Flac.encodeStereo(st, blockSize = 64, mode = mode))
      assert(dec.left.toSeq == l.toSeq && dec.right.toSeq == r.toSeq, mode)
    }
  }

  test("uncorrelated noise channels round trip (verbatim path)") {
    val st = Flac.StereoStream(8000, lcgSamples(256, seed = 1),
      lcgSamples(256, seed = 2))
    val dec = Flac.decodeStereo(Flac.encodeStereo(st, blockSize = 256))
    assert(dec.left.toSeq == st.left.toSeq)
    assert(dec.right.toSeq == st.right.toSeq)
  }

  test("mono/stereo entry points reject the other layout by name") {
    val mono = valid()
    val st = Flac.encodeStereo(stereo(256), blockSize = 256)
    assert(intercept[IllegalArgumentException](Flac.decodeStereo(mono))
      .getMessage.contains("use decode"))
    assert(intercept[IllegalArgumentException](Flac.decode(st))
      .getMessage.contains("use decodeStereo"))
  }

  test("stereo golden: mm14 mid-side size matches the closed form") {
    val n = 256
    val st = stereo(n)
    val enc = Flac.encodeStereo(st, blockSize = n, mode = "mid-side",
      forceOrder = Some(2))
    assert(Flac.decodeStereo(enc).left.toSeq == st.left.toSeq)
    val m = Array.tabulate(n)(i => (st.left(i) + st.right(i)) >> 1)
    val s = Array.tabulate(n)(i => st.left(i) - st.right(i))
    def rbits(x: Array[Int]): Long = {
      val rs = Flac.fixedResiduals(x.map(_.toShort), 2)
      // mid/side fit in Short here; fixedResiduals is width-agnostic
      val k = Flac.riceParam(rs.map(r => (r << 1) ^ (r >> 63)).sum, rs.length)
      Flac.riceBits(rs, k)
    }
    val bits = 50 + rbits(m) + 52 + rbits(s)
    assert(enc.length == 42 + 8 + (bits + 7) / 8 + 2,
      s"stereo size ${enc.length} != closed form")
  }

  test("golden byte layout: container constants of the mm13 shape") {
    val enc = Flac.encode(Flac.Stream(8000, rampSamples(256)),
      blockSize = 256, forceOrder = Some(2))
    assert(new String(enc, 0, 4, "US-ASCII") == "fLaC")
    assert((enc(4) & 0xff) == 0x80 && enc(7) == 34) // last-block STREAMINFO
    // frame sync at 42: 0xFF 0xF8 (14-bit sync + 0 + 0)
    assert((enc(42) & 0xff) == 0xff && (enc(43) & 0xff) == 0xf8)
    assert((enc(44) & 0xff) == 0x70) // blocksize code 7, rate from SI
    assert((enc(45) & 0xff) == 0x08) // mono, 16-bit
    assert((enc(46) & 0xff) == 0x00) // frame number 0
    // 16-bit blocksize-1 = 255
    assert((enc(47) & 0xff) == 0x00 && (enc(48) & 0xff) == 0xff)
    // the closed-form size the mm13 oracle recomputes:
    // 42 + 8 + ceil((8+32+10+riceBits)/8) + 2
    val rs = Flac.fixedResiduals(rampSamples(256), 2)
    val k = Flac.riceParam(rs.map(r => (r << 1) ^ (r >> 63)).sum, rs.length)
    val bits = 8 + 32 + 10 + Flac.riceBits(rs, k)
    assert(enc.length == 42 + 8 + (bits + 7) / 8 + 2)
  }

  /** Odd-base ramp scaled by 2^w — common trailing-zero count exactly
    * w (the mm19 planted family). */
  private def wastedSamples(n: Int, w: Int): Array[Short] =
    Array.tabulate(n)(i =>
      ((2 * (((i * 13) % 101) - 50) + 1) << w).toShort)

  test("wasted bits: detect/strip/shift round trips, multi-frame, k 0-3") {
    (0 to 3).foreach { w =>
      val x = wastedSamples(600, w) // frames 256,256,88
      val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 256,
        forceOrder = Some(2), detectWasted = true)
      assert(Flac.decode(enc).samples.toSeq == x.toSeq,
        s"wasted round trip failed at w=$w")
      // the shift must actually shrink the payload: coding at 16−w
      // bits saves ≥ w bits per residual minus the w-bit header
      if (w > 0) {
        val plain = Flac.encode(Flac.Stream(8000, x), blockSize = 256,
          forceOrder = Some(2))
        assert(Flac.decode(plain).samples.toSeq == x.toSeq)
        assert(enc.length < plain.length,
          s"w=$w: wasted coding did not shrink (${enc.length} vs ${plain.length})")
      }
    }
  }

  test("wasted bits golden: the mm19 closed-form size (net −w delta)") {
    (0 to 2).foreach { w =>
      val x = wastedSamples(256, w)
      val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 256,
        forceOrder = Some(2), detectWasted = true)
      // residuals run on the STRIPPED base; header pays 8+w bits
      // (pad+type+flag+unary) while the 2-sample warmup drops to
      // 2·(16−w) — the 50−w constant the mm19 oracle replays
      val base = x.map(v => (v >> w).toShort)
      val rs = Flac.fixedResiduals(base, 2)
      val k = Flac.riceParam(rs.map(r => (r << 1) ^ (r >> 63)).sum, rs.length)
      val bits = 50 - w + Flac.riceBits(rs, k)
      assert(enc.length == 42 + 8 + (bits + 7) / 8 + 2,
        s"w=$w: size ${enc.length} != closed form")
    }
  }

  test("wasted bits: constant and adaptive (unforced) blocks round trip") {
    val c = Array.fill(300)(48.toShort) // trailing zeros 4, CONSTANT
    val encC = Flac.encode(Flac.Stream(8000, c), blockSize = 256,
      detectWasted = true)
    assert(Flac.decode(encC).samples.toSeq == c.toSeq)
    val noisy = lcgSamples(512, amp = 2000)
      .map(v => ((2 * v + 1) << 3).toShort) // odd base × 8
    val encN = Flac.encode(Flac.Stream(8000, noisy), blockSize = 256,
      detectWasted = true)
    assert(Flac.decode(encN).samples.toSeq == noisy.toSeq)
  }

  test("wasted bits: k is capped so the coded width stays >= 1") {
    // all samples = -32768 (trailing zeros 15): cap at bps-1 = 15 and
    // the CONSTANT path still round-trips
    val x = Array.fill(256)(Short.MinValue)
    val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 256,
      detectWasted = true)
    assert(Flac.decode(enc).samples.toSeq == x.toSeq)
  }
}
