package graft.multimodal

/** Dependency-free PNG codec in plain Scala (round-15) — the web's
  * most common image format made REAL behind the multimodal tier.
  * (Since round-16 baseline JPEG is real too — [[Jpeg]] — leaving
  * [[Multimodal.decodeStub]] only for perceptual-transform audio.)
  *
  * The container ships no image libraries, but PNG's compression is
  * zlib — and zlib inflate ships IN the JDK (`java.util.zip.Inflater`).
  * What remains is exactly the chunk-list discipline [[Wav.decode]]
  * already demonstrates (signature, length-typed chunks, CRC32 — also
  * in the JDK) plus per-scanline UN-FILTERING: each decompressed row
  * is prefixed by a filter-type byte and stores deltas against the
  * bytes to the left / above (None, Sub, Up, Average, Paeth — PNG
  * spec §9). Scope is the still-dominant simple profile: 8-bit
  * grayscale (color type 0) and 8-bit RGB (color type 2),
  * non-interlaced; palette / alpha / 16-bit / Adam7 are REJECTED with
  * the codec's own diagnostic, not mis-decoded.
  *
  * Every declared length is ADVERSARIAL input: chunk lengths are read
  * unsigned into Long and bounded by the remaining payload before any
  * use, raster sizes are computed in Long and bounded before
  * allocation (the Ppm round-14 ADVICE lesson applied from the
  * start), chunk CRCs are VERIFIED (a flipped raster byte must fail
  * parse, not silently change features), and the inflated byte count
  * must equal the geometry's expectation exactly.
  *
  * Scale shape: encode/decode run inside the batched per-partition
  * transform (the mapInPandas shape) — narrow, no shuffle, bytes
  * never leave the partition that read them.
  */
object Png {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10)

  /** True iff `bytes` starts with the 8-byte PNG signature — the
    * magic-dispatch predicate [[Images.decodeAuto]] keys on. */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      (0 until 8).forall(i => bytes(i) == SIG(i))

  /** Serialize a raster as PNG: 8-bit gray (channels=1, color type 0)
    * or 8-bit RGB (channels=3, color type 2), one IDAT, non-interlaced.
    * `filter` (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) selects the
    * per-scanline forward filter — encode with each type round-trips
    * through the same decoder, which is what proves the un-filter
    * paths against their forward definitions rather than against a
    * second implementation of themselves. */
  def encode(width: Int, height: Int, channels: Int, data: Array[Byte],
             filter: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(data.length.toLong == channels.toLong * width * height,
      s"raster ${data.length} != $channels*$width*$height")
    require(filter >= 0 && filter <= 4, s"filter $filter")
    val bpp = channels
    val stride = width * channels
    // forward-filter into the scanline stream: 1 filter byte + stride.
    // Sized in Long first: data.length alone passes the raster require
    // near 2 GiB, where the Int sum data.length + height wraps negative
    // and would throw NegativeArraySizeException instead of a codec
    // diagnostic (round-15 ADVICE).
    val rawLen = height.toLong * (1L + stride.toLong)
    require(rawLen <= Int.MaxValue,
      s"scanline stream $rawLen bytes exceeds the 2 GiB array ceiling")
    val raw = new Array[Byte](rawLen.toInt)
    var y = 0
    while (y < height) {
      raw(y * (1 + stride)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = data(y * stride + x) & 0xff
        val left = if (x >= bpp) data(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) data((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) data((y - 1) * stride + x - bpp) & 0xff
                 else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put((if (channels == 3) 2 else 0).toByte) // color type
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(SIG, 0, SIG.length)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zbuf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    out.write(bb.array(), 0, bb.capacity())
  }

  /** PNG spec §9.4 Paeth predictor (all args 0..255). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse a PNG payload into the shared [[Ppm.Raster]] shape
    * (format "PNG", channels 1 or 3, row-major channel-interleaved
    * bytes). Throws IllegalArgumentException on anything outside the
    * supported profile or malformed/adversarial input: wrong
    * signature, out-of-bounds or CRC-failing chunks, palette / alpha /
    * 16-bit / interlaced images, truncated or over-long zlib streams,
    * unknown filter types. */
  def decode(bytes: Array[Byte]): Ppm.Raster = {
    require(isPng(bytes), "not a PNG payload")
    val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    var width = -1; var height = -1; var channels = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(bb.remaining() >= 12, "truncated chunk list")
      // declared length is ADVERSARIAL: unsigned into Long, bounded by
      // what actually remains minus the 8 bytes the type + CRC fields
      // still need, before any use
      val len = bb.getInt.toLong & 0xffffffffL
      require(len <= bb.remaining() - 8,
        s"chunk declares $len of ${bb.remaining() - 8} bytes")
      val n = len.toInt
      val tb = new Array[Byte](4); bb.get(tb)
      val typ = new String(tb, java.nio.charset.StandardCharsets.US_ASCII)
      val data = new Array[Byte](n); bb.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      require(crc.getValue.toInt == bb.getInt,
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(n == 13, s"IHDR length $n")
          val ib = java.nio.ByteBuffer.wrap(data)
          val w64 = ib.getInt.toLong & 0xffffffffL
          val h64 = ib.getInt.toLong & 0xffffffffL
          require(w64 > 0 && w64 <= (1 << 26) && h64 > 0 && h64 <= (1 << 26),
            s"bad dimensions ${w64}x$h64")
          val depth = ib.get(); val color = ib.get()
          val comp = ib.get(); val filt = ib.get(); val inter = ib.get()
          require(depth == 8, s"unsupported bit depth $depth (8 only)")
          require(color == 0 || color == 2,
            s"unsupported color type $color (gray=0 / RGB=2 only)")
          require(comp == 0 && filt == 0, "nonstandard compression/filter")
          require(inter == 0, "interlaced (Adam7) not supported")
          channels = if (color == 2) 3 else 1
          // raster-size product bounded in Long BEFORE allocation
          val n64 = channels.toLong * w64 * h64
          require(n64 <= (1L << 26), s"raster ${w64}x$h64 out of range")
          width = w64.toInt; height = h64.toInt
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(data, 0, n)
        case "IEND" => seenIend = true
        case _ => // ancillary chunks (tEXt, pHYs, …) — CRC-checked, skipped
          require(seenIhdr, s"$typ before IHDR")
      }
    }
    require(seenIhdr, "missing IHDR")
    val stride = width * channels
    val rawLen = height * (1 + stride) // fits: raster bounded above
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < rawLen && !inf.finished()) {
        val k = inf.inflate(raw, got, rawLen - got)
        if (k == 0) {
          require(!inf.needsInput() && !inf.needsDictionary(),
            s"truncated zlib stream: $got of $rawLen bytes")
        }
        got += k
      }
      require(got == rawLen, s"zlib stream yields $got of $rawLen bytes")
      // a compliant stream ends exactly at the geometry's byte count —
      // trailing plaintext means the stream disagrees with IHDR
      val extra = inf.inflate(new Array[Byte](1))
      require(extra == 0 && inf.finished(),
        "zlib stream longer than the declared raster")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}")
    } finally inf.end()
    // un-filter scanlines in place into the output raster
    val px = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"unknown filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val v = raw(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff
                 else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        px(y * stride + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Ppm.Raster("PNG", width, height, channels, 255, px)
  }
}

/** Magic-byte dispatch across ALL the real image codecs — the decode
  * boundary the multimodal queries call when one binary column mixes
  * formats (mm3c Netpbm family; mm3d + mm5 add PNG; mm9 adds baseline
  * JPEG). Adding a codec means adding a magic branch here; callers
  * never change. */
object Images {
  def decodeAuto(bytes: Array[Byte]): Ppm.Raster =
    if (Png.isPng(bytes)) Png.decode(bytes)
    else if (Jpeg.isJpeg(bytes)) Jpeg.decode(bytes)
    else Ppm.decodeAuto(bytes)
}
