package graft.multimodal

/** Dependency-free binary Netpbm codec in plain Scala — PPM (P6,
  * color) since round-13 and PGM (P5, grayscale) since round-14 — the
  * REAL decode path behind the multimodal tier.
  *
  * The container ships no image/audio libraries, so earlier rounds
  * stubbed ALL media decoding ([[Multimodal.decodeStub]]). Netpbm
  * needs no library: the format is an ASCII header (magic, width,
  * height, maxval, `#` comments allowed between tokens) followed by
  * the raw raster — width·height RGB byte triples for P6,
  * width·height single-byte samples for P5 (Netpbm spec, maxval < 256
  * → 1 byte per sample). Both formats share ONE header tokenizer and
  * dispatch on the magic bytes ([[decodeAuto]]), which is the point
  * of the second codec: the decode boundary is an interface keyed on
  * the payload, not a P6 one-off. The family has since grown PNG
  * ([[Png]], round-15) and baseline JPEG ([[Jpeg]], round-16);
  * [[Multimodal.decodeStub]] remains the honestly-documented stand-in
  * only for perceptual-transform audio (MP3/AAC).
  *
  * Scale shape: encode/decode run inside the batched per-partition
  * transform ([[Multimodal.extractFeatures]]'s mapInPandas shape) —
  * narrow, no shuffle, bytes never leave the partition that read them.
  */
object Ppm {

  /** Decoded raster: `data` is width·height RGB triples, row-major,
    * 3 bytes per pixel (maxVal < 256 enforced at decode). */
  final case class Image(width: Int, height: Int, maxVal: Int,
                         data: Array[Byte])

  /** Format-tagged decoded raster from [[decodeAuto]]: `channels` is
    * 3 (P6) or 1 (P5); `data` is width·height·channels bytes,
    * row-major, channel-interleaved. */
  final case class Raster(format: String, width: Int, height: Int,
                          channels: Int, maxVal: Int, data: Array[Byte])

  /** Serialize as binary PPM: ASCII header + raw raster. */
  def encode(img: Image): Array[Byte] = {
    require(img.data.length == 3 * img.width * img.height,
      s"raster ${img.data.length} != 3*${img.width}*${img.height}")
    require(img.maxVal > 0 && img.maxVal < 256, s"maxVal ${img.maxVal}")
    val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.data.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.data, 0, out, header.length, img.data.length)
    out
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' ||
      b == 0x0b

  /** Serialize as binary PGM (P5): ASCII header + raw grayscale
    * raster (width·height single-byte samples). */
  def encodePgm(width: Int, height: Int, maxVal: Int,
                data: Array[Byte]): Array[Byte] = {
    require(data.length == width * height,
      s"raster ${data.length} != ${width}*$height")
    require(maxVal > 0 && maxVal < 256, s"maxVal $maxVal")
    val header = s"P5\n$width $height\n$maxVal\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + data.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(data, 0, out, header.length, data.length)
    out
  }

  /** Parse binary PPM. Throws IllegalArgumentException on malformed
    * input (wrong magic, non-numeric token, truncated raster,
    * maxval ≥ 256 — the 2-byte-per-sample variant is out of scope). */
  def decode(bytes: Array[Byte]): Image = {
    val r = decodeRaster(bytes, '6', channels = 3)
    Image(r.width, r.height, r.maxVal, r.data)
  }

  /** Parse binary PGM (P5, grayscale) — same header grammar, 1-byte
    * samples. */
  def decodePgm(bytes: Array[Byte]): Raster =
    decodeRaster(bytes, '5', channels = 1)

  /** Magic-byte dispatch over the supported Netpbm family: `P6` →
    * color, `P5` → grayscale; anything else is rejected. This is the
    * decode-boundary INTERFACE the multimodal tier calls when the
    * payload format is data-dependent (mm3c mixes both in one
    * column). */
  def decodeAuto(bytes: Array[Byte]): Raster = {
    require(bytes != null && bytes.length >= 2 && bytes(0) == 'P',
      "not a Netpbm payload")
    bytes(1) match {
      case '6' => decodeRaster(bytes, '6', channels = 3)
      case '5' => decodeRaster(bytes, '5', channels = 1)
      case m => throw new IllegalArgumentException(
        s"unsupported Netpbm magic P${m.toChar}")
    }
  }

  /** Shared Netpbm parse: `P<magic>` header (tokenizer below) + a
    * width·height·channels raw raster. */
  private def decodeRaster(bytes: Array[Byte], magic: Char,
                           channels: Int): Raster = {
    require(bytes != null && bytes.length >= 2 &&
      bytes(0) == 'P' && bytes(1) == magic, s"not a P$magic payload")
    var i = 2
    // read the next ASCII unsigned int, skipping whitespace and
    // `#`-to-end-of-line comments (legal anywhere between header tokens)
    def nextInt(): Int = {
      var inComment = false
      while (i < bytes.length &&
          (inComment || isSpace(bytes(i)) || bytes(i) == '#')) {
        if (inComment) { if (bytes(i) == '\n' || bytes(i) == '\r') inComment = false }
        else if (bytes(i) == '#') inComment = true
        i += 1
      }
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"expected header integer at byte $i")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        require(v <= (1 << 26), "header value out of range")
        i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val mv = nextInt()
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    // per-dimension bounds alone don't protect the raster-size product:
    // channels·w·h in Int arithmetic overflows for adversarial headers
    // whose dimensions each pass the token bound (round-14 ADVICE
    // fix), so the size is computed in Long and required to fit BEFORE
    // any use
    val n64 = channels.toLong * w * h
    require(n64 <= (1L << 26),
      s"raster ${w}x$h out of range (${n64} bytes)")
    val n = n64.toInt
    require(mv > 0 && mv < 256, s"unsupported maxval $mv")
    // exactly ONE whitespace byte separates maxval from the raster
    // (spec); a comment is not legal here
    require(i < bytes.length && isSpace(bytes(i)), "missing raster separator")
    i += 1
    require(bytes.length - i >= n,
      s"truncated raster: ${bytes.length - i} of $n bytes")
    Raster(s"P$magic", w, h, channels, mv,
      java.util.Arrays.copyOfRange(bytes, i, i + n))
  }
}
