package graft.multimodal

/** Dependency-free baseline JPEG codec in plain Scala (round-16,
  * VERDICT item 7) — the last stubbed IMAGE format made real, closing
  * the codec tier: [[Multimodal.decodeStub]] now stands in for
  * compressed AUDIO (MP3) only.
  *
  * Scope is the baseline sequential profile (ITU-T T.81: SOF0, 8-bit
  * precision, Huffman entropy coding, no restart intervals) in TWO
  * layouts — GRAYSCALE (one component) and COLOR (YCbCr 4:4:4, three
  * components in interleaved MCUs, per-component DC predictors,
  * BT.601 full-range JFIF transform) — with the exact machinery every
  * baseline JPEG uses: 8×8 FDCT/IDCT (Annex A), the Annex-K
  * luminance + chrominance quantization tables, zigzag ordering,
  * differential DC, run-length AC with ZRL/EOB, byte stuffing
  * (FF→FF 00). Chroma subsampling (4:2:0), progressive (SOF2),
  * arithmetic coding and restart markers are REJECTED with the
  * codec's own diagnostic, never mis-decoded. The decoder builds its
  * Huffman tables from the stream's OWN DHT segments (spec F.2.2.3
  * MINCODE/MAXCODE/VALPTR), so it decodes third-party baseline
  * 4:4:4/grayscale JPEGs, not just this encoder's output.
  *
  * Cross-engine replay despite lossiness: JPEG has no CRC and its DCT
  * is lossy, so unlike PNG the raster can't be hash-checked from
  * arbitrary bytes. But the loss is EXACTLY characterized: a
  * per-block-CONSTANT raster has all AC coefficients quantize to zero
  * (the cosine sums are mathematically zero; FP residue ~1e-14 is
  * crushed by round(·/q)), and a DC of 8·(c−128) survives the
  * quantize→dequantize→IDCT round trip bit-exactly whenever c−128 is
  * a multiple of 4 (DC/16 lands on an integer, never a rounding
  * boundary). The mm9 production query plants exactly such rasters,
  * so DuckDB replays the decoded pixels closed-form and the WHOLE
  * Huffman + dequant + IDCT pipeline is hash-checked — the Png.scala
  * discipline carried to a lossy codec.
  *
  * Adversarial parsing (the Png/Wav lessons applied from the start):
  * segment lengths are unsigned-bounded against the remaining payload
  * before any use, dimensions are bounded before allocation, Huffman
  * decode rejects codes outside every table and runs that overflow
  * the 64-coefficient block, and the entropy reader treats any
  * non-stuffed marker mid-scan as corruption.
  *
  * Scale shape: encode/decode run inside the batched per-partition
  * transform (the mapInPandas shape) — narrow, no shuffle, bytes
  * never leave the partition that read them.
  */
object Jpeg {

  /** True iff `bytes` starts with the SOI marker — the magic-dispatch
    * predicate [[Images.decodeAuto]] keys on. */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 &&
      bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte

  /** Annex K.1 luminance quantization table, natural (row-major) order. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table, natural order. */
  private val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag position → natural (row-major) index (spec Figure A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3 DC luminance table: code counts per length 1..16 and
    * the size-category values in code order. */
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.5 AC luminance table. */
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman ENCODE table from (BITS, HUFFVAL) — spec C.2:
    * codes assigned in increasing length, listed-value order. Returns
    * value → (code, length). */
  private def encodeTable(bits: Array[Int],
                          vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Bit-category ("size") of a DC diff / AC level: bits in |v|. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** MSB-first bit accumulator with JPEG byte stuffing (FF → FF 00). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (n > 0) {
      val pad = 8 - n
      put((1 << pad) - 1, pad)
    }
  }

  /** Encode one LEVEL-SHIFTED 8×8 block against quant table `q`
    * through the shared Huffman tables; returns the new DC predictor
    * (spec F.1.2: differential DC category + magnitude, run-length AC
    * with ZRL for 16-zero runs, EOB tail). */
  private def encodeBlock(block: Array[Double], q: Array[Int], prevDc: Int,
                          dcT: Map[Int, (Int, Int)],
                          acT: Map[Int, (Int, Int)],
                          bw: BitWriter): Int = {
    fdct(block)
    val coef = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val nat = Zigzag(i)
      coef(i) = math.round(block(nat) / q(nat)).toInt
      i += 1
    }
    val diff = coef(0) - prevDc
    val ds = category(diff)
    val (dc, dl) = dcT(ds)
    bw.put(dc, dl)
    if (ds > 0) bw.put(if (diff >= 0) diff else diff + (1 << ds) - 1, ds)
    var last = 63
    while (last > 0 && coef(last) == 0) last -= 1
    var k = 1
    var run = 0
    while (k <= last) {
      if (coef(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acT(0xf0); bw.put(zc, zl); run -= 16
        }
        val s = category(coef(k))
        val (c, l) = acT((run << 4) | s)
        bw.put(c, l)
        bw.put(if (coef(k) >= 0) coef(k) else coef(k) + (1 << s) - 1, s)
        run = 0
      }
      k += 1
    }
    if (last < 63) { val (ec, el) = acT(0x00); bw.put(ec, el) }
    coef(0)
  }

  /** Copy the edge-replicated level-shifted 8×8 block at (bx, by) of
    * `plane` (width×height doubles) into `block`. */
  private def loadBlock(plane: Array[Double], width: Int, height: Int,
                        bx: Int, by: Int, block: Array[Double]): Unit = {
    var i = 0
    while (i < 64) {
      val y = math.min(by * 8 + i / 8, height - 1)
      val x = math.min(bx * 8 + i % 8, width - 1)
      block(i) = plane(y * width + x)
      i += 1
    }
  }

  private def writeSegments(out: java.io.ByteArrayOutputStream,
                            width: Int, height: Int, color: Boolean): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    segment(0xe0, "JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      ++ Array[Byte](0, 1, 1, // APP0 v1.1
        0, 0, 1, 0, 1, 0, 0)) // no density units, no thumbnail
    segment(0xdb, (Array(0) ++ Zigzag.map(QLum)).map(_.toByte)) // DQT id 0
    if (color)
      segment(0xdb, (Array(1) ++ Zigzag.map(QChrom)).map(_.toByte)) // DQT id 1
    val comps: Array[Byte] =
      if (color) Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
      else Array[Byte](1, 1, 0x11, 0) // 4:4:4 throughout; Y→q0, chroma→q1
    segment(0xc0, Array[Byte](8, // SOF0: precision
      (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte) ++ comps)
    segment(0xc4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte)) // DHT DC 0
    segment(0xc4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte)) // DHT AC 0
    // SOS: every component reads the shared table pair 0/0 — legal
    // per the spec (tables are per-scan-component references) and it
    // keeps the encoder to the two Annex-K luminance tables
    val scan: Array[Byte] =
      if (color) Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)
      else Array[Byte](1, 1, 0x00, 0, 63, 0)
    segment(0xda, scan)
  }

  /** Serialize an 8-bit grayscale raster as a baseline JFIF payload.
    * Width/height need not be block-aligned: partial edge blocks are
    * edge-replicated (the standard convention; the decoder crops back
    * to the declared dimensions). */
  def encode(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= (1 << 13) &&
      height <= (1 << 13), s"bad dimensions ${width}x$height")
    require(data.length.toLong == width.toLong * height,
      s"raster ${data.length} != $width*$height")
    val dcT = encodeTable(DcBits, DcVals)
    val acT = encodeTable(AcBits, AcVals)
    val plane = new Array[Double](width * height)
    var i = 0
    while (i < plane.length) { plane(i) = (data(i) & 0xff) - 128.0; i += 1 }
    val entropy = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(entropy)
    val block = new Array[Double](64)
    var prevDc = 0
    var by = 0
    while (by < (height + 7) / 8) {
      var bx = 0
      while (bx < (width + 7) / 8) {
        loadBlock(plane, width, height, bx, by, block)
        prevDc = encodeBlock(block, QLum, prevDc, dcT, acT, bw)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    val out = new java.io.ByteArrayOutputStream()
    writeSegments(out, width, height, color = false)
    val eb = entropy.toByteArray
    out.write(eb, 0, eb.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Serialize three 8-bit YCbCr planes DIRECTLY as a baseline COLOR
    * JFIF payload (round-17, VERDICT item 3): [[encodeColor]] minus
    * the forward BT.601 step, so a caller can plant EXACT integer
    * Y/Cb/Cr constants — the route to a hash-checkable decode with
    * NONZERO chroma. The chroma exactness subspace: a per-8×8-block
    * CONSTANT Cb (or Cr) plane whose offset from 128 is a multiple of
    * the chroma DC quant step (K.2 q00 = 17, so Δ ∈ {0, ±17, ±34})
    * has all-zero ACs and a DC of 8Δ that survives /17 integrally, so
    * the decoder reconstructs the plane bit-exactly and the BT.601
    * INVERSE then synthesizes genuinely nonzero color that replays
    * closed-form (floor(x + 0.5) per channel) in the oracle. */
  def encodeColorYcc(width: Int, height: Int, y: Array[Byte],
                     cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= (1 << 13) &&
      height <= (1 << 13), s"bad dimensions ${width}x$height")
    val n = width * height
    require(y.length == n && cb.length == n && cr.length == n,
      s"planes ${y.length}/${cb.length}/${cr.length} != $width*$height")
    val dcT = encodeTable(DcBits, DcVals)
    val acT = encodeTable(AcBits, AcVals)
    val py = new Array[Double](n)
    val pcb = new Array[Double](n)
    val pcr = new Array[Double](n)
    var i = 0
    while (i < n) {
      py(i) = (y(i) & 0xff) - 128.0
      pcb(i) = (cb(i) & 0xff) - 128.0
      pcr(i) = (cr(i) & 0xff) - 128.0
      i += 1
    }
    val entropy = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(entropy)
    val block = new Array[Double](64)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var by = 0
    while (by < (height + 7) / 8) {
      var bx = 0
      while (bx < (width + 7) / 8) {
        loadBlock(py, width, height, bx, by, block)
        dcY = encodeBlock(block, QLum, dcY, dcT, acT, bw)
        loadBlock(pcb, width, height, bx, by, block)
        dcCb = encodeBlock(block, QChrom, dcCb, dcT, acT, bw)
        loadBlock(pcr, width, height, bx, by, block)
        dcCr = encodeBlock(block, QChrom, dcCr, dcT, acT, bw)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    val out = new java.io.ByteArrayOutputStream()
    writeSegments(out, width, height, color = true)
    val eb = entropy.toByteArray
    out.write(eb, 0, eb.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Serialize an 8-bit interleaved-RGB raster as a baseline COLOR
    * JFIF payload (round-16b): YCbCr 4:4:4, no subsampling —
    * interleaved MCUs of one Y + one Cb + one Cr block, each
    * component with its own DC predictor, Y against the K.1 luminance
    * quant table and chroma against K.2. The BT.601 full-range JFIF
    * transform runs in doubles with no intermediate rounding, which
    * is what preserves the exactness subspace the mm10 oracle uses:
    * a GRAY-constant RGB block (R=G=B=c, c−128 divisible by 4) maps
    * to Y ≈ c (±1 ulp) and Cb=Cr ≈ 128 (±1 ulp), the chroma blocks
    * quantize to all-zero, the Y DC survives /16 integrally, and the
    * inverse transform adds exactly 0 chroma back — so the decoded
    * RGB equals the source bit-for-bit through a LOSSY color
    * pipeline. */
  def encodeColor(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= (1 << 13) &&
      height <= (1 << 13), s"bad dimensions ${width}x$height")
    require(data.length.toLong == 3L * width * height,
      s"raster ${data.length} != 3*$width*$height")
    val dcT = encodeTable(DcBits, DcVals)
    val acT = encodeTable(AcBits, AcVals)
    val n = width * height
    val py = new Array[Double](n)
    val pcb = new Array[Double](n)
    val pcr = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = data(3 * i) & 0xff
      val g = data(3 * i + 1) & 0xff
      val b = data(3 * i + 2) & 0xff
      // JFIF full-range BT.601, level-shifted (Y−128, Cb−128, Cr−128)
      py(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
      pcb(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
      pcr(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val entropy = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(entropy)
    val block = new Array[Double](64)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var by = 0
    while (by < (height + 7) / 8) {
      var bx = 0
      while (bx < (width + 7) / 8) {
        loadBlock(py, width, height, bx, by, block)
        dcY = encodeBlock(block, QLum, dcY, dcT, acT, bw)
        loadBlock(pcb, width, height, bx, by, block)
        dcCb = encodeBlock(block, QChrom, dcCb, dcT, acT, bw)
        loadBlock(pcr, width, height, bx, by, block)
        dcCr = encodeBlock(block, QChrom, dcCr, dcT, acT, bw)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    val out = new java.io.ByteArrayOutputStream()
    writeSegments(out, width, height, color = true)
    val eb = entropy.toByteArray
    out.write(eb, 0, eb.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** cos((2x+1)·u·π/16) memoized — the DCT basis evaluated once per
    * JVM instead of 8192 `math.cos` calls per block (measured ~4× on
    * the mm9 decode path). Same IEEE values, same summation order, so
    * the bit-exactness argument is unchanged. */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Sqrt05 = math.sqrt(0.5)

  /** Forward 8×8 DCT, in place (Annex A.3.3, direct O(64²) form —
    * blocks are small; fixed summation order keeps the FP result
    * deterministic). */
  private def fdct(b: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += b(y * 8 + x) * CosT(x)(v) * CosT(y)(u)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) Sqrt05 else 1.0
        val cv = if (v == 0) Sqrt05 else 1.0
        tmp(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    System.arraycopy(tmp, 0, b, 0, 64)
  }

  /** Inverse 8×8 DCT, in place (same direct form as [[fdct]]). */
  private def idct(b: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) Sqrt05 else 1.0
            val cv = if (v == 0) Sqrt05 else 1.0
            s += cu * cv * b(u * 8 + v) * CosT(x)(v) * CosT(y)(u)
            v += 1
          }
          u += 1
        }
        tmp(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    System.arraycopy(tmp, 0, b, 0, 64)
  }

  /** Canonical Huffman DECODE table (spec F.2.2.3): per code length
    * the smallest/largest code and the index of its first value. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader: un-stuffs FF 00, treats any other
    * marker mid-scan as corruption, bounds every read. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "truncated entropy stream")
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated entropy stream at FF")
          val m = bytes(pos) & 0xff
          require(m == 0x00,
            f"unexpected marker FF$m%02x inside entropy data")
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def huff(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      require(len <= 16, "invalid Huffman code (no table entry)")
      t.value(len, code)
    }
  }

  /** Extend a `size`-bit magnitude to its signed value (spec F.12). */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  /** Parse a baseline grayscale JFIF payload into the shared
    * [[Ppm.Raster]] shape (format "JPEG", channels 1). Throws
    * IllegalArgumentException on anything outside the supported
    * profile or malformed/adversarial input: wrong magic, truncated
    * or over-long segments, progressive/arithmetic/multi-component
    * scans, 16-bit quantization tables, restart intervals, invalid
    * Huffman codes, coefficient-run overflow. */
  def decode(bytes: Array[Byte]): Ppm.Raster = {
    require(isJpeg(bytes), "not a JPEG payload")
    var pos = 2
    var width = -1; var height = -1
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var nComp = -1
    var compQ: Array[Int] = null // per component: quant / DC / AC slots
    var compId: Array[Int] = null // SOF component ids (Ci) in frame order
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var sosAt = -1
    def u16(p: Int): Int = {
      require(p + 1 < bytes.length, "truncated segment header")
      ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    }
    while (sosAt < 0) {
      require(pos + 1 < bytes.length, "truncated marker list")
      require((bytes(pos) & 0xff) == 0xff, s"expected marker at $pos")
      // fill bytes: any number of FFs may pad before a marker code
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
        pos += 1
      require(pos + 1 < bytes.length, "truncated marker list")
      val m = bytes(pos + 1) & 0xff
      require(m != 0xd9, "EOI before SOS: no image data")
      require(m != 0xd8, "duplicate SOI")
      require(m != 0x01 && !(m >= 0xd0 && m <= 0xd7),
        f"standalone marker FF$m%02x outside entropy data")
      pos += 2
      val len = u16(pos)
      require(len >= 2 && pos + len <= bytes.length,
        f"segment FF$m%02x declares $len of ${bytes.length - pos} bytes")
      val body = pos + 2
      val bodyLen = len - 2
      m match {
        case 0xdb => // DQT — possibly several tables per segment
          var p = body
          while (p < body + bodyLen) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "16-bit quantization tables not supported")
            require(tq < 4 && p + 65 <= body + bodyLen, s"bad DQT $tq")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(Zigzag(i)) = bytes(p + 1 + i) & 0xff
              i += 1
            }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT — possibly several tables per segment
          var p = body
          while (p < body + bodyLen) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            require(tc <= 1 && th < 4, s"bad DHT class/slot $tc/$th")
            require(p + 17 <= body + bodyLen, "truncated DHT")
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val nv = bits.sum
            require(nv <= 256 && p + 17 + nv <= body + bodyLen,
              s"DHT declares $nv values")
            val vals = Array.tabulate(nv)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + nv
          }
        case 0xc0 => // SOF0 baseline
          require(bodyLen >= 8, "truncated SOF0")
          require((bytes(body) & 0xff) == 8, "only 8-bit precision supported")
          val h = u16(body + 1); val w = u16(body + 3)
          val nc = bytes(body + 5) & 0xff
          require(nc == 1 || nc == 3,
            s"$nc components: baseline grayscale or YCbCr 4:4:4 only")
          require(w > 0 && h > 0 && nc.toLong * w * h <= (1L << 26),
            s"bad dimensions ${w}x$h ($nc components)")
          require(bodyLen >= 6 + 3 * nc, "truncated SOF0 component list")
          compQ = new Array[Int](nc)
          compId = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            compId(c) = bytes(body + 6 + 3 * c) & 0xff
            require((bytes(body + 7 + 3 * c) & 0xff) == 0x11,
              "subsampling not supported (4:4:4 only)")
            compQ(c) = bytes(body + 8 + 3 * c) & 0xff
            c += 1
          }
          nComp = nc
          width = w; height = h
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"SOF FF$m%02x: only baseline sequential (SOF0) supported")
        case 0xdd =>
          throw new IllegalArgumentException("restart intervals not supported")
        case 0xcc =>
          throw new IllegalArgumentException("arithmetic coding not supported")
        case 0xda => // SOS — one interleaved scan over all components
          require(width > 0, "SOS before SOF0")
          require(bodyLen >= 1 + 2 * nComp + 3 &&
            (bytes(body) & 0xff) == nComp,
            s"scan must cover exactly the $nComp SOF components")
          compDc = new Array[Int](nComp)
          compAc = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            // the scan's Csj must name the SOF component at the same
            // index: the decode loop below routes quant/Huffman tables
            // and DC predictors POSITIONALLY, so a reordered scan would
            // otherwise be silently mis-decoded instead of rejected
            require((bytes(body + 1 + 2 * c) & 0xff) == compId(c),
              s"scan component $c selects id ${bytes(body + 1 + 2 * c) & 0xff}" +
                s" but SOF declares id ${compId(c)} at that position " +
                "(reordered scans not supported)")
            compDc(c) = (bytes(body + 2 + 2 * c) & 0xff) >> 4
            compAc(c) = bytes(body + 2 + 2 * c) & 0x0f
            // 4-bit selectors admit 0..15 but baseline allows slots
            // 0..3 — bound HERE so an adversarial selector is a codec
            // diagnostic, not an ArrayIndexOutOfBounds on the lookup
            require(compDc(c) < 4 && compAc(c) < 4,
              s"scan component $c selects tables dc=${compDc(c)} " +
                s"ac=${compAc(c)} outside the baseline 0..3 slots")
            c += 1
          }
          // baseline sequential fixes the spectral-selection tail
          // (T.81 Table B.3): Ss=0, Se=63, Ah=Al=0. Anything else is a
          // progressive/partial scan this decoder would mis-route.
          val ss = bytes(body + 1 + 2 * nComp) & 0xff
          val se = bytes(body + 2 + 2 * nComp) & 0xff
          val ahal = bytes(body + 3 + 2 * nComp) & 0xff
          require(ss == 0 && se == 63 && ahal == 0,
            s"non-baseline scan tail Ss=$ss Se=$se AhAl=$ahal " +
              "(expected 0/63/0)")
          sosAt = body + bodyLen
        case _ => // APPn / COM / others: length-skipped
      }
      pos += len
    }
    var c0 = 0
    while (c0 < nComp) {
      require(compQ(c0) < 4 && quant(compQ(c0)) != null,
        s"missing quant table ${compQ(c0)} (component $c0)")
      require(dcTabs(compDc(c0)) != null && acTabs(compAc(c0)) != null,
        s"missing Huffman tables dc=${compDc(c0)} ac=${compAc(c0)}")
      c0 += 1
    }
    val br = new BitReader(bytes, sosAt)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    // one byte plane per component (4:4:4 — plane dims = image dims);
    // interleaved MCUs: Y, Cb, Cr blocks in SOF order, each component
    // with its own DC predictor (spec A.2.3)
    val planes = Array.fill(nComp)(new Array[Byte](width * height))
    val prevDc = new Array[Int](nComp)
    val blk = new Array[Double](64)
    var by = 0
    while (by < mcusY) {
      var bx = 0
      while (bx < mcusX) {
        var c = 0
        while (c < nComp) {
          val q = quant(compQ(c))
          val dcT = dcTabs(compDc(c)); val acT = acTabs(compAc(c))
          java.util.Arrays.fill(blk, 0.0)
          val ds = br.huff(dcT)
          require(ds <= 11, s"DC category $ds out of range")
          prevDc(c) += extend(br.bits(ds), ds)
          blk(0) = prevDc(c).toDouble * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = br.huff(acT)
            val run = rs >> 4; val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) { // ZRL: 16 zeros; may legally land k AT 64
                k += 16       // (block full) but never past it
                require(k <= 64, s"ZRL overflows the block at $k")
              } else eob = true
            } else {
              k += run
              require(k < 64, s"AC run overflows the block at $k")
              val nat = Zigzag(k)
              blk(nat) = extend(br.bits(size), size).toDouble * q(nat)
              k += 1
            }
          }
          idct(blk)
          // level shift, clamp, crop partial edge blocks
          val plane = planes(c)
          var i = 0
          while (i < 64) {
            val y = by * 8 + i / 8
            val x = bx * 8 + i % 8
            if (y < height && x < width) {
              val v = math.round(blk(i) + 128.0).toInt
              plane(y * width + x) = math.max(0, math.min(255, v)).toByte
            }
            i += 1
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    // grayscale: the Y plane IS the raster. Color: full-range BT.601
    // inverse per pixel (the exact inverse of encodeColor's forward) —
    // a zero chroma plane (the mm10 exactness subspace) contributes
    // exactly 0.0, so gray-constant content survives bit-for-bit.
    val px =
      if (nComp == 1) planes(0)
      else {
        val out = new Array[Byte](3 * width * height)
        var i = 0
        while (i < width * height) {
          val y = (planes(0)(i) & 0xff).toDouble
          val cb = (planes(1)(i) & 0xff) - 128.0
          val cr = (planes(2)(i) & 0xff) - 128.0
          def clamp(v: Double): Byte = {
            val r = math.round(v).toInt
            math.max(0, math.min(255, r)).toByte
          }
          out(3 * i) = clamp(y + 1.402 * cr)
          out(3 * i + 1) = clamp(y - 0.344136 * cb - 0.714136 * cr)
          out(3 * i + 2) = clamp(y + 1.772 * cb)
          i += 1
        }
        out
      }
    // the stream must END where the geometry says it does: the next
    // marker after the entropy data (FF fills allowed) is EOI — a
    // wrong MCU count or trailing garbage fails parse, not features
    var p = br.pos
    while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
        (bytes(p + 1) & 0xff) == 0xff) p += 1
    require(p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0xd9, "missing EOI after entropy data")
    Ppm.Raster("JPEG", width, height, nComp, 255, px)
  }
}
