package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Images, Jpeg, Png, Ppm}

/** Baseline-JPEG codec contracts behind mm9: the EXACTNESS property
  * the oracle relies on (block-constant rasters with offsets divisible
  * by 4 survive the lossy round trip bit-identically), bounded error
  * on smooth content, magic dispatch across the now four-codec image
  * family, byte stuffing actually exercised, and rejection of
  * malformed / adversarial / out-of-profile payloads. */
class JpegSpec extends AnyFunSuite {

  /** md5-derived raster (the repo's portable-noise idiom). */
  private def noise(n: Int, seed: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n) { i =>
      md.reset()
      val h = md.digest(s"$seed:$i".getBytes)
      h(0)
    }
  }

  test("block-constant rasters with 4-divisible offsets round-trip EXACTLY") {
    // the mm9 oracle contract: per-8x8-block constant value 128+4t
    // (t in -12..12) -> all AC quantize to 0, DC/16 integral -> the
    // decoded pixel equals the source pixel bit-exactly despite the
    // lossy pipeline. Checked across every t and a multi-block layout.
    for (t <- -12 to 12) {
      val c = (128 + 4 * t).toByte
      val px = Array.fill(64)(c)
      val dec = Jpeg.decode(Jpeg.encode(8, 8, px))
      assert(dec.format == "JPEG" && dec.width == 8 && dec.height == 8 &&
        dec.channels == 1)
      assert(dec.data.sameElements(px), s"constant $c not exact")
    }
    // 4x2 blocks, distinct constants per block
    val w = 32; val h = 16
    val px = Array.tabulate(w * h) { i =>
      val b = (i / w / 8) * 4 + (i % w) / 8
      (128 + 4 * ((b * 7) % 25 - 12)).toByte
    }
    val dec = Jpeg.decode(Jpeg.encode(w, h, px))
    assert(dec.data.sameElements(px), "multi-block constants not exact")
  }

  test("smooth content round-trips with small bounded error") {
    // a horizontal ramp is low-frequency: the Annex-K table keeps the
    // error within a few levels (high-frequency noise would not be —
    // that is what LOSSY means, and why mm9 plants constants instead)
    val w = 24; val h = 16
    val px = Array.tabulate(w * h)(i => (40 + 7 * (i % w)).toByte)
    val dec = Jpeg.decode(Jpeg.encode(w, h, px))
    val maxErr = px.indices.map(i =>
      math.abs((px(i) & 0xff) - (dec.data(i) & 0xff))).max
    assert(maxErr <= 12, s"ramp max error $maxErr")
  }

  test("noise content survives the pipeline structurally (50 payloads)") {
    // md5 noise is the DCT worst case: values differ, but dimensions,
    // marker structure, Huffman stream and EOI must all hold — and
    // across 50 payloads the entropy stream statistically contains
    // 0xFF bytes, so the stuffing path (FF 00) runs in both directions
    var stuffed = 0
    for (seed <- 0 until 50) {
      val px = noise(15 * 9, seed) // non-8-aligned: edge replication path
      val enc = Jpeg.encode(15, 9, px)
      // count FF 00 sequences strictly inside the entropy segment
      val sos = {
        var i = 2
        while (!(enc(i) == 0xff.toByte && enc(i + 1) == 0xda.toByte)) i += 1
        i + 2 + (((enc(i + 2) & 0xff) << 8) | (enc(i + 3) & 0xff))
      }
      var i = sos
      while (i + 1 < enc.length - 2) {
        if (enc(i) == 0xff.toByte && enc(i + 1) == 0x00.toByte) stuffed += 1
        i += 1
      }
      val dec = Jpeg.decode(enc)
      assert(dec.width == 15 && dec.height == 9 &&
        dec.data.length == 15 * 9, s"seed $seed")
    }
    assert(stuffed > 0, "no payload exercised byte stuffing")
  }

  test("COLOR: gray-constant RGB blocks round-trip EXACTLY through YCbCr") {
    // the mm10 oracle contract: R=G=B=c per block (c−128 divisible by
    // 4) → Y≈c, Cb=Cr≈128 within an ulp → chroma quantizes to zero →
    // decoded RGB bit-identical despite the lossy color pipeline
    val w = 16; val h = 8
    for (id <- 0L until 50L) {
      val rgb = new Array[Byte](3 * w * h)
      var i = 0
      while (i < w * h) {
        val b = (i % w) / 8
        val c = (128 + 4 * ((id * 7 + b * 13) % 25 - 12)).toByte
        rgb(3 * i) = c; rgb(3 * i + 1) = c; rgb(3 * i + 2) = c
        i += 1
      }
      val dec = Jpeg.decode(Jpeg.encodeColor(w, h, rgb))
      assert(dec.format == "JPEG" && dec.channels == 3 &&
        dec.width == w && dec.height == h, s"id $id meta")
      assert(dec.data.sameElements(rgb), s"id $id not exact")
    }
  }

  test("COLOR: smooth content bounded error; noise survives structurally") {
    val rw = 24; val rh = 16
    val rgb = Array.tabulate(3 * rw * rh) { j =>
      val i = j / 3; val ch = j % 3
      ((40 + 5 * (i % rw) + 20 * ch) & 0xff).toByte
    }
    val dec = Jpeg.decode(Jpeg.encodeColor(rw, rh, rgb))
    val maxErr = rgb.indices.map(i =>
      math.abs((rgb(i) & 0xff) - (dec.data(i) & 0xff))).max
    assert(maxErr <= 12, s"color gradient max error $maxErr")
    // md5 noise through the interleaved-MCU path, non-8-aligned dims
    for (seed <- 0 until 10) {
      val px = noise(3 * 15 * 9, 1000 + seed)
      val d2 = Jpeg.decode(Jpeg.encodeColor(15, 9, px))
      assert(d2.channels == 3 && d2.data.length == 3 * 15 * 9, s"seed $seed")
    }
    // encode-side geometry guard
    intercept[IllegalArgumentException](
      Jpeg.encodeColor(4, 4, new Array[Byte](47)))
  }

  test("COLOR: NONZERO-chroma YCbCr constants round-trip to the exact " +
      "closed-form RGB (mm11 contract)") {
    // the round-17 chroma exactness subspace: block-constant planes
    // with Y on the ×4 luma lattice and Cb/Cr offsets multiples of
    // the K.2 chroma DC quant step (17) reconstruct bit-exactly, so
    // the decoded RGB is floor(x + 0.5) of the BT.601 inverse of the
    // planted constants — the formula the mm11 oracle replays.
    val w = 16; val h = 8
    for (id <- 0L until 50L) {
      val n = w * h
      val y = new Array[Byte](n); val cb = new Array[Byte](n)
      val cr = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val b = (i % w) / 8
        y(i) = (128 + 4 * ((id * 7 + b * 13) % 25 - 12)).toByte
        cb(i) = (128 + 17 * ((id * 3 + b * 2) % 5 - 2)).toByte
        cr(i) = (128 + 17 * ((id * 11 + b * 3) % 5 - 2)).toByte
        i += 1
      }
      val dec = Jpeg.decode(Jpeg.encodeColorYcc(w, h, y, cb, cr))
      assert(dec.channels == 3 && dec.width == w && dec.height == h)
      def clamp(v: Double): Int =
        math.max(0, math.min(255, math.round(v).toInt))
      var p = 0
      var sawColor = false
      while (p < n) {
        val yv = (y(p) & 0xff).toDouble
        val cbv = (cb(p) & 0xff) - 128.0
        val crv = (cr(p) & 0xff) - 128.0
        val r = clamp(yv + 1.402 * crv)
        val g = clamp(yv - 0.344136 * cbv - 0.714136 * crv)
        val bb = clamp(yv + 1.772 * cbv)
        assert((dec.data(3 * p) & 0xff) == r &&
          (dec.data(3 * p + 1) & 0xff) == g &&
          (dec.data(3 * p + 2) & 0xff) == bb, s"id $id pixel $p")
        if (r != g || g != bb) sawColor = true
        p += 1
      }
      // the point of mm11: the decode must SYNTHESIZE color, not just
      // pass gray through. The two blocks' δCb differ by 2 (mod 5), so
      // no id can be chroma-free in BOTH blocks — color is guaranteed.
      assert(sawColor, s"id $id decoded all-gray")
    }
  }

  test("reordered scan components and non-baseline scan tails are " +
      "rejected, not mis-decoded") {
    val n = 16 * 8
    val gray = Array.fill(n)(132.toByte)
    val color = Jpeg.encodeColorYcc(16, 8, gray, gray, gray)
    def sosAt(b: Array[Byte]): Int = {
      var i = 2
      while (!(b(i) == 0xff.toByte && b(i + 1) == 0xda.toByte)) i += 1
      i + 4 // skip FF DA len(2) → scan body (ns byte)
    }
    // swap the first two scan component ids (1,2,3 → 2,1,3): the SOF
    // routing is positional, so this MUST be a diagnostic
    val reordered = color.clone()
    val at = sosAt(reordered)
    val tmp = reordered(at + 1) // comp-id of scan slot 0
    reordered(at + 1) = reordered(at + 3)
    reordered(at + 3) = tmp
    val eR = intercept[IllegalArgumentException](Jpeg.decode(reordered))
    assert(eR.getMessage.contains("reordered"), eR.getMessage)
    // non-baseline spectral selection (Ss=1): a partial scan this
    // decoder would route wrongly — reject by profile
    val partial = color.clone()
    partial(sosAt(partial) + 1 + 2 * 3) = 1.toByte
    val eS = intercept[IllegalArgumentException](Jpeg.decode(partial))
    assert(eS.getMessage.contains("scan tail"), eS.getMessage)
  }

  test("an entropy stream whose ZRL run overflows the block is rejected") {
    // hand-built entropy data: DC category 0 ('00' under the Annex-K
    // DC table) followed by five ZRLs ('11111111001' under the K.3.2
    // AC table). k walks 1→17→33→49→65: the fourth ZRL passes 64 and
    // must fail parse — the pre-round-17 loop exited silently and
    // accepted the truncated block.
    val good = Jpeg.encode(8, 8, Array.fill(64)(132.toByte))
    var i = 2
    while (!(good(i) == 0xff.toByte && good(i + 1) == 0xda.toByte)) i += 1
    val entStart = i + 2 + ((good(i + 2) & 0xff) << 8 | (good(i + 3) & 0xff))
    val bits = "00" + "11111111001" * 5
    val padded = bits + "1" * ((8 - bits.length % 8) % 8)
    val ent = new java.io.ByteArrayOutputStream()
    padded.grouped(8).foreach { s =>
      val b = Integer.parseInt(s, 2)
      ent.write(b)
      if (b == 0xff) ent.write(0x00) // byte stuffing
    }
    val forged = good.take(entStart) ++ ent.toByteArray ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val e = intercept[IllegalArgumentException](Jpeg.decode(forged))
    assert(e.getMessage.contains("ZRL"), e.getMessage)
  }

  test("Images.decodeAuto dispatches JPEG next to PNG / P6 / P5") {
    val px = Array.fill(64)(132.toByte)
    val jp = Images.decodeAuto(Jpeg.encode(8, 8, px))
    assert(jp.format == "JPEG" && jp.channels == 1 && jp.data.sameElements(px))
    val png = Images.decodeAuto(Png.encode(8, 8, 1, px))
    assert(png.format == "PNG" && png.data.sameElements(px))
    val p5 = Images.decodeAuto(Ppm.encodePgm(8, 8, 255, px))
    assert(p5.format == "P5" && p5.data.sameElements(px))
  }

  test("malformed, adversarial and out-of-profile payloads are rejected") {
    val good = Jpeg.encode(16, 8, noise(128, 99))
    intercept[IllegalArgumentException](Jpeg.decode(null))
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3)))
    // truncated mid-segment and mid-entropy
    intercept[IllegalArgumentException](Jpeg.decode(good.take(8)))
    intercept[IllegalArgumentException](Jpeg.decode(good.dropRight(6)))
    // a segment declaring more bytes than remain
    val overrun = good.clone()
    // DQT is the first segment after APP0 (2 + 2+16+2): its length field
    // sits right after the FF DB marker — find it and inflate it
    val dqtAt = {
      var i = 2
      while (!(overrun(i) == 0xff.toByte && overrun(i + 1) == 0xdb.toByte))
        i += 1
      i + 2
    }
    overrun(dqtAt) = 0x7f.toByte // 0x7fxx bytes: far past the payload end
    intercept[IllegalArgumentException](Jpeg.decode(overrun))
    // progressive (SOF2) is rejected by profile, not mis-decoded
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!(prog(i) == 0xff.toByte && prog(i + 1) == 0xc0.toByte)) i += 1
      i + 1
    }
    prog(sofAt) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e.getMessage.contains("SOF"), e.getMessage)
    // EOI must terminate the stream where the geometry says
    intercept[IllegalArgumentException](
      Jpeg.decode(good.dropRight(2) ++ Array[Byte](0, 0)))
    // adversarial SOS table selectors (4-bit fields admit 0..15 but
    // baseline slots are 0..3) must be a diagnostic, not an
    // ArrayIndexOutOfBounds on the table lookup
    val badSel = good.clone()
    val selAt = {
      var i = 2
      while (!(badSel(i) == 0xff.toByte && badSel(i + 1) == 0xda.toByte))
        i += 1
      i + 6 // FF DA len(2) ns comp-id TABLES
    }
    badSel(selAt) = 0x77.toByte
    val eSel = intercept[IllegalArgumentException](Jpeg.decode(badSel))
    assert(eSel.getMessage.contains("slots"), eSel.getMessage)
    // encode-side geometry guards
    intercept[IllegalArgumentException](Jpeg.encode(0, 8, Array.empty))
    intercept[IllegalArgumentException](Jpeg.encode(4, 4, new Array[Byte](15)))
  }
}
