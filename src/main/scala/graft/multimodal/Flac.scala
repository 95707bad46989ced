package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Dependency-free FLAC codec (RFC 9639 subset) in plain Scala — the
  * LOSSLESS-COMPRESSION member of the audio tier, next to [[Wav]]'s
  * PCM (uncompressed) and G.711 μ-law (lossy companding). This is the
  * real bitstream: `fLaC` marker, STREAMINFO metadata block, fixed-
  * blocksize frames with CRC-8-guarded headers and CRC-16-guarded
  * bodies, UTF-8-style coded frame numbers, subframes of type
  * CONSTANT, VERBATIM, FIXED (polynomial predictor orders 0–4) and —
  * since round 18 — quantized LPC (orders 1–32, header-declared
  * coefficient precision and shift, RFC 9639 §9.2.4) with Rice-coded
  * residuals, and all four two-channel assignments (independent,
  * left-side, right-side, mid-side inter-channel decorrelation, the
  * side channel carried at 17 bits as the spec requires). That covers
  * every subframe type RFC 9639 §9 defines for one and two channels —
  * wild FLAC is predominantly LPC, so the decode path now accepts
  * real-world mono/stereo 16-bit streams; 3+ channels and non-16-bit
  * depths remain outside this codec's scope and are REJECTED with
  * diagnostics, not mis-decoded.
  *
  * Why this closes a tier: WAV PCM is lossless but uncompressed and
  * μ-law compresses but lossily; FLAC is the standard that does both —
  * lossless AND compressed — so with it the audio boundary of
  * [[Multimodal.decodeStub]] shrinks to perceptual-transform codecs
  * only (MP3/AAC, which have no closed-form oracle by construction).
  *
  * Oracle strategy (mm13 mono, mm14 stereo): losslessness means the
  * decoded samples ARE the planted closed form — no exactness
  * subspace needed (the JPEG trick) — and the ENCODER is
  * deterministic enough to replay the compressed size itself in SQL:
  *
  *  - fixed predictor residuals are pure integer differences
  *    (order 2: `r_i = x_i − 2x_{i−1} + x_{i−2}`), expressible with
  *    `lag()`; the mid/side decorrelation is integer too
  *    (`m = (l+r) >> 1` = floor((l+r)/2), `s = l − r`);
  *  - the Rice parameter is chosen by an integer-only rule — k =
  *    ⌊log2(Σ zigzag / n_res)⌋ (position of the mean's top set bit),
  *    capped at 14 — a CASE ladder in SQL, no float in sight;
  *  - the Rice bit count is `Σ (zz_i >> k) + n_res·(k+1)`, and every
  *    container field above it is a constant — so `encoded_bytes` is
  *    a closed-form integer the oracle recomputes from the samples,
  *    per channel.
  *
  * Scale shape: encode/decode run inside the batched per-partition
  * transform (the [[Wav]] argument) — narrow, no shuffle, bytes never
  * leave the partition that read them. FlacSpec pins multi-frame
  * round trips over all subframe types and channel assignments, the
  * golden byte layout, CRC tamper detection and the adversarial-parse
  * rejections.
  */
object Flac {

  /** Decoded mono stream: 16-bit signed samples at `sampleRate` Hz. */
  final case class Stream(sampleRate: Int, samples: Array[Short])

  /** Decoded stereo stream: per-channel 16-bit signed samples. */
  final case class StereoStream(sampleRate: Int, left: Array[Short],
                                right: Array[Short])

  // ---------------------------------------------------------------
  // CRCs (RFC 9639 §9.1.1 / §9.3: both initialized to 0, MSB-first)
  // ---------------------------------------------------------------

  /** CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), over frame headers. */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), over frames. */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------------
  // Bit I/O
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val out = new ArrayBuffer[Byte]()
    private var acc = 0L
    private var nAcc = 0
    def writeBits(value: Long, n: Int): Unit = {
      require(n >= 0 && n <= 56, s"writeBits width $n")
      require(n == 56 || (value >> n) == 0, s"value $value overflows $n bits")
      acc = (acc << n) | value
      nAcc += n
      while (nAcc >= 8) {
        out += ((acc >> (nAcc - 8)) & 0xff).toByte
        nAcc -= 8
      }
    }
    /** q zero bits followed by a one bit (RFC 9639 unary). */
    def writeUnary(q: Int): Unit = {
      var r = q
      while (r >= 32) { writeBits(0L, 32); r -= 32 }
      writeBits(1L, r + 1)
    }
    def alignByte(): Unit = if (nAcc > 0) writeBits(0L, 8 - nAcc)
    def bytes: Array[Byte] = { require(nAcc == 0, "unaligned"); out.toArray }
  }

  private final class BitReader(val bytes: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nAcc = 0
    def remainingBits: Long = nAcc.toLong + 8L * (bytes.length - pos)
    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 56, s"readBits width $n")
      while (nAcc < n) {
        require(pos < bytes.length, "truncated payload")
        acc = (acc << 8) | (bytes(pos) & 0xffL)
        pos += 1
        nAcc += 8
      }
      val v = (acc >> (nAcc - n)) & (if (n == 56) -1L >>> 8 else (1L << n) - 1)
      nAcc -= n
      v
    }
    def readSigned(n: Int): Int = {
      val u = readBits(n)
      ((u << (64 - n)) >> (64 - n)).toInt
    }
    def readUnary(maxQ: Int): Int = {
      var q = 0
      while (readBits(1) == 0L) {
        q += 1
        require(q <= maxQ, s"unary run exceeds $maxQ (corrupt Rice stream)")
      }
      q
    }
    def alignByte(): Unit = if (nAcc % 8 != 0) { readBits(nAcc % 8); () }
    /** Byte offset of the next unread byte (only valid when aligned). */
    def byteOffset: Int = { require(nAcc % 8 == 0, "unaligned"); pos - nAcc / 8 }
  }

  // ---------------------------------------------------------------
  // Fixed predictors (RFC 9639 §9.2.2)
  // ---------------------------------------------------------------

  private def fixedResidualsI(x: Array[Int], o: Int): Array[Long] = {
    val n = x.length
    val r = new Array[Long](n - o)
    var i = o
    while (i < n) {
      r(i - o) = o match {
        case 0 => x(i).toLong
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case 4 => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) -
          4L * x(i - 3) + x(i - 4)
      }
      i += 1
    }
    r
  }

  /** Residuals of fixed polynomial order `o` over `x` (length n − o). */
  def fixedResiduals(x: Array[Short], o: Int): Array[Long] =
    fixedResidualsI(x.map(_.toInt), o)

  private def zigzag(r: Long): Long = (r << 1) ^ (r >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** The deterministic Rice parameter: top-set-bit position of the
    * mean zigzag residual (integer division), capped at 14 so the
    * 4-bit parameter field never needs the escape code. Replayable as
    * a SQL CASE ladder — the property the mm13/mm14 size oracles rest
    * on. */
  def riceParam(sumZz: Long, nRes: Int): Int = {
    if (nRes == 0) return 0
    val mean = sumZz / nRes
    if (mean < 1) 0
    else math.min(63 - java.lang.Long.numberOfLeadingZeros(mean), 14)
  }

  /** Exact bit cost of Rice-coding `rs` with parameter k. */
  def riceBits(rs: Array[Long], k: Int): Long =
    rs.foldLeft(0L)((acc, r) => acc + (zigzag(r) >>> k) + 1 + k)

  private def lpcResidualsI(x: Array[Int], coefs: Array[Int],
                            shift: Int): Array[Long] = {
    val order = coefs.length
    val n = x.length
    val r = new Array[Long](n - order)
    var t = order
    while (t < n) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j).toLong * x(t - 1 - j); j += 1 }
      r(t - order) = x(t).toLong - (acc >> shift)
      t += 1
    }
    r
  }

  /** Quantized-LPC residuals (RFC 9639 §9.2.4):
    * `r_t = x_t − ((Σ coefs(j)·x_{t−1−j}) >> shift)` — coefficient j
    * multiplies the sample j+1 steps back, the wire order. Public so
    * specs and the mm16 closed-form oracle derivation can replay the
    * exact integer chain. */
  def lpcResiduals(x: Array[Short], coefs: Array[Int],
                   shift: Int): Array[Long] =
    lpcResidualsI(x.map(_.toInt), coefs, shift)

  /** Fixed order minimizing Σ|residual|, ties to the lower order. */
  private def pickOrderI(x: Array[Int]): Int = {
    val maxO = math.min(4, x.length - 1)
    var best = 0
    var bestSum = Long.MaxValue
    var o = 0
    while (o <= maxO) {
      val s = fixedResidualsI(x, o).foldLeft(0L)((a, r) => a + math.abs(r))
      if (s < bestSum) { bestSum = s; best = o }
      o += 1
    }
    best
  }

  /** Σ|residual| at the best fixed order — the deterministic cost
    * proxy the adaptive stereo-mode choice ranks on. */
  private def bestCost(x: Array[Int]): Long = {
    val o = pickOrderI(x)
    fixedResidualsI(x, o).foldLeft(0L)((a, r) => a + math.abs(r))
  }

  // ---------------------------------------------------------------
  // Encoder
  // ---------------------------------------------------------------

  /** The wasted-bits header field (RFC 9639 §9.2.2): flag 0, or flag 1
    * followed by k−1 unary-coded. */
  private def writeWastedField(body: BitWriter, wasted: Int): Unit =
    if (wasted == 0) body.writeBits(0L, 1)
    else { body.writeBits(1L, 1); body.writeUnary(wasted - 1) }

  /** Common trailing-zero count across a block (the wasted-bits shift
    * an encoder may factor out), capped so the coded width stays ≥ 1;
    * an all-zero block reports 0 (CONSTANT handles it outright). */
  def wastedBits(x: Array[Int], bps: Int): Int = {
    var k = bps - 1
    var any = false
    var i = 0
    while (i < x.length) {
      if (x(i) != 0) {
        any = true
        val tz = java.lang.Integer.numberOfTrailingZeros(x(i))
        if (tz < k) k = tz
      }
      i += 1
    }
    if (any) k else 0
  }

  private def writeVerbatim(body: BitWriter, x: Array[Int], bps: Int,
                            wasted: Int = 0): Unit = {
    val mask = (1L << bps) - 1
    body.writeBits(0L, 1) // subframe pad bit
    body.writeBits(1L, 6) // VERBATIM
    writeWastedField(body, wasted)
    x.foreach(s => body.writeBits(s.toLong & mask, bps))
  }

  private def writeFixed(body: BitWriter, x: Array[Int], bps: Int,
                         order: Int, rs: Array[Long], k: Int,
                         wasted: Int = 0): Unit = {
    val mask = (1L << bps) - 1
    body.writeBits(0L, 1) // subframe pad bit
    body.writeBits(8L | order, 6) // FIXED, order 0-4
    writeWastedField(body, wasted)
    (0 until order).foreach(i => body.writeBits(x(i).toLong & mask, bps))
    body.writeBits(0L, 2) // residual method: 4-bit Rice
    body.writeBits(0L, 4) // partition order 0
    body.writeBits(k.toLong, 4)
    rs.foreach { r =>
      val zz = zigzag(r)
      body.writeUnary((zz >>> k).toInt)
      if (k > 0) body.writeBits(zz & ((1L << k) - 1), k)
    }
  }

  /** One subframe at `bps` bits/sample: CONSTANT for flat blocks (when
    * not order-forced), else the fixed order minimizing Σ|residual|
    * with Rice partition order 0 and the deterministic k, falling back
    * to VERBATIM when Rice would not beat raw. `forceOrder` pins FIXED
    * order o unconditionally (the oracle-replayable configuration). */
  private def writeSubframe(body: BitWriter, x: Array[Int], bps: Int,
                            forceOrder: Option[Int],
                            wasted: Int = 0): Unit = {
    val mask = (1L << bps) - 1
    // a short last frame can undercut a forced order; clamp so the
    // warmup never swallows the whole block
    val order = math.min(forceOrder.getOrElse(pickOrderI(x)), x.length - 1)
    if (forceOrder.isEmpty && x.forall(_ == x(0))) {
      body.writeBits(0L, 1) // subframe pad bit
      body.writeBits(0L, 6) // CONSTANT
      writeWastedField(body, wasted)
      body.writeBits(x(0).toLong & mask, bps)
    } else {
      val rs = fixedResidualsI(x, order)
      val k = riceParam(rs.foldLeft(0L)(_ + zigzag(_)), rs.length)
      val riceCost = 6L + 4 + riceBits(rs, k) // res header + param + codes
      if (forceOrder.isEmpty &&
        riceCost + bps.toLong * order >= bps.toLong * x.length)
        writeVerbatim(body, x, bps, wasted)
      else writeFixed(body, x, bps, order, rs, k, wasted)
    }
  }

  /** [[writeSubframe]] with the wasted-bits factor detected and
    * stripped first (RFC 9639 §9.2.2): k = the block's common
    * trailing-zero count; samples are coded at bps−k and the header
    * carries k unary — the standard encoder move for low-amplitude
    * audio padded into a 16-bit container. k = 0 degenerates to the
    * plain writer bit for bit. */
  private def writeSubframeWasted(body: BitWriter, x: Array[Int], bps: Int,
                                  forceOrder: Option[Int]): Unit = {
    val k = wastedBits(x, bps)
    if (k == 0) writeSubframe(body, x, bps, forceOrder)
    else writeSubframe(body, x.map(_ >> k), bps - k, forceOrder, k)
  }

  /** The HYBRID adaptive subframe (round-18, mm18): the candidate set
    * is the five fixed orders PLUS one caller-pinned quantized-LPC
    * predictor, argmin over Σ|residual| with ties in candidate order
    * (fixed 0–4 first, then LPC — a tie keeps the cheaper-header
    * family). CONSTANT still short-circuits flat blocks; the chosen
    * candidate still falls back to VERBATIM when its Rice stream plus
    * its header fields would not beat raw. This is the real encoder
    * decision libFLAC makes (search predictor families, emit the
    * cheapest), reduced to a deterministic integer rule the mm18
    * oracle replays branch by branch. */
  private def writeHybridSubframe(body: BitWriter, x: Array[Int], bps: Int,
                                  coefs: Array[Int], shift: Int,
                                  prec: Int): Unit = {
    val mask = (1L << bps) - 1
    if (x.forall(_ == x(0))) {
      body.writeBits(0L, 1)
      body.writeBits(0L, 6) // CONSTANT
      body.writeBits(0L, 1)
      body.writeBits(x(0).toLong & mask, bps)
      return
    }
    val maxO = math.min(4, x.length - 1)
    val fixedSums = (0 to maxO).map(o =>
      fixedResidualsI(x, o).foldLeft(0L)((a, r) => a + math.abs(r)))
    val lpcOk = coefs.length < x.length
    val lpcSum =
      if (lpcOk)
        lpcResidualsI(x, coefs, shift).foldLeft(0L)((a, r) => a + math.abs(r))
      else Long.MaxValue
    val sums = fixedSums ++ (if (lpcOk) Seq(lpcSum) else Nil)
    val best = sums.zipWithIndex.minBy { case (s, i) => (s, i) }._2
    if (best <= maxO) {
      val rs = fixedResidualsI(x, best)
      val k = riceParam(rs.foldLeft(0L)(_ + zigzag(_)), rs.length)
      val riceCost = 6L + 4 + riceBits(rs, k)
      if (riceCost + bps.toLong * best >= bps.toLong * x.length)
        writeVerbatim(body, x, bps)
      else writeFixed(body, x, bps, best, rs, k)
    } else {
      val o = coefs.length
      val rs = lpcResidualsI(x, coefs, shift)
      val k = riceParam(rs.foldLeft(0L)(_ + zigzag(_)), rs.length)
      // the LPC header fields (precision 4 + shift 5 + coefs) ride the
      // Rice-vs-raw comparison: a predictor must pay for its own header
      val riceCost = 6L + 4 + riceBits(rs, k) + 4 + 5 + prec.toLong * o
      if (riceCost + bps.toLong * o >= bps.toLong * x.length)
        writeVerbatim(body, x, bps)
      else writeLpcSubframe(body, x, bps, coefs, shift, prec)
    }
  }

  /** Encode mono 16-bit with the HYBRID fixed-vs-LPC candidate search
    * per block (see [[writeHybridSubframe]]) — the adaptive encoder
    * whose whole predictor-FAMILY decision tree mm18 puts under hash:
    * CONSTANT / FIXED(argmin order) / the pinned LPC predictor /
    * VERBATIM, every branch replayed closed-form by the oracle. */
  def encodeHybrid(stream: Stream, blockSize: Int, coefs: Array[Int],
                   shift: Int, precision: Int): Array[Byte] = {
    val n = stream.samples.length
    require(n > 0, "empty stream")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    require(stream.sampleRate > 0 && stream.sampleRate < (1 << 20),
      s"sampleRate ${stream.sampleRate}")
    val order = coefs.length
    require(order >= 1 && order <= 32, s"LPC order $order")
    require(precision >= 2 && precision <= 15, s"precision $precision")
    require(shift >= 0 && shift <= 15, s"shift $shift")
    coefs.foreach(c => require(
      c >= -(1 << (precision - 1)) && c < (1 << (precision - 1)),
      s"coefficient $c overflows signed $precision bits"))
    val out = new ArrayBuffer[Byte]()
    streamHeader(out, stream.sampleRate, 1, blockSize, n)
    var frameNo = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val block = new Array[Int](bs)
      var i = 0
      while (i < bs) { block(i) = stream.samples(off + i).toInt; i += 1 }
      out ++= buildFrame(0, Seq((block, 16)), bs, frameNo,
        (b, x, bps) => writeHybridSubframe(b, x, bps, coefs, shift, precision))
      frameNo += 1
      off += bs
    }
    out.toArray
  }

  /** One frame: header (sync, codes, coded frame number, 16-bit
    * blocksize, CRC-8), `subframes` as (samples, bps) pairs in channel
    * order written by `writeSf`, byte-align, CRC-16. */
  private def buildFrame(chCode: Int, subframes: Seq[(Array[Int], Int)],
                         bs: Int, frameNo: Long,
                         writeSf: (BitWriter, Array[Int], Int) => Unit)
  : Array[Byte] = {
    val h = new BitWriter
    h.writeBits(0x3ffeL, 14) // sync
    h.writeBits(0L, 1) // reserved
    h.writeBits(0L, 1) // fixed blocksize strategy
    h.writeBits(7L, 4) // blocksize: 16-bit (value - 1) at header end
    h.writeBits(0L, 4) // sample rate: from STREAMINFO
    h.writeBits(chCode.toLong, 4)
    h.writeBits(4L, 3) // sample size: 16-bit
    h.writeBits(0L, 1) // reserved
    codedNumber(h, frameNo)
    h.writeBits((bs - 1).toLong, 16)
    val head = h.bytes
    val body = new BitWriter
    subframes.foreach { case (x, bps) => writeSf(body, x, bps) }
    body.alignByte()
    val frame = new ArrayBuffer[Byte]()
    frame ++= head
    frame += crc8(head, 0, head.length).toByte
    frame ++= body.bytes
    val fa = frame.toArray
    val c16 = crc16(fa, 0, fa.length)
    (frame += ((c16 >> 8) & 0xff).toByte += (c16 & 0xff).toByte).toArray
  }

  private def streamHeader(out: ArrayBuffer[Byte], sampleRate: Int,
                           channels: Int, blockSize: Int, n: Int): Unit = {
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO: last-block flag set, type 0, length 34
    out += 0x80.toByte; out += 0; out += 0; out += 34
    // RFC 9639 §8.2: the minimum-blocksize field EXCLUDES the last
    // (possibly short) block, so min == max == blockSize is spec-valid
    // for EVERY n — in a single-frame stream the lone block is the last
    // block and there is nothing left for the field to describe.
    // Writing min = n for short single-frame streams (the round-18
    // behavior) was also spec-legal but made min != max, and min == max
    // is the conventional marker of a fixed-blocksize stream (which
    // these frames are: fixed blocking strategy, frame numbers) that
    // strict decoders key on (round-18 ADVICE).
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16) // min blocksize (== max; see above)
    si.writeBits(blockSize.toLong, 16) // max blocksize
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15L, 5) // bits per sample - 1
    si.writeBits(n.toLong, 36)
    (0 until 16).foreach(_ => si.writeBits(0L, 8)) // md5 unknown (spec-legal)
    out ++= si.bytes
  }

  /** Encode as a single-channel 16-bit FLAC stream, fixed `blockSize`
    * frames (last frame may be short). `forceOrder` pins every
    * subframe to FIXED order o (the oracle-replayable configuration
    * mm13 uses); when None the encoder picks per block: CONSTANT for
    * flat blocks, else the fixed order 0–4 minimizing Σ|residual|
    * (ties to the lower order), falling back to VERBATIM when Rice
    * would not beat raw — the standard fixed-predictor search.
    * `detectWasted` factors the block's common trailing-zero count
    * out first (RFC 9639 §9.2.2; [[writeSubframeWasted]]) — opt-in so
    * the mm13/mm15 size oracles written against the plain writer stay
    * byte-exact. */
  def encode(stream: Stream, blockSize: Int = 4096,
             forceOrder: Option[Int] = None,
             detectWasted: Boolean = false): Array[Byte] = {
    val n = stream.samples.length
    require(n > 0, "empty stream")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    require(stream.sampleRate > 0 && stream.sampleRate < (1 << 20),
      s"sampleRate ${stream.sampleRate}")
    forceOrder.foreach(o => require(o >= 0 && o <= 4, s"order $o"))
    val out = new ArrayBuffer[Byte]()
    streamHeader(out, stream.sampleRate, 1, blockSize, n)
    var frameNo = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val block = new Array[Int](bs)
      var i = 0
      while (i < bs) { block(i) = stream.samples(off + i).toInt; i += 1 }
      out ++= buildFrame(0, Seq((block, 16)), bs, frameNo,
        (b, x, bps) =>
          if (detectWasted) writeSubframeWasted(b, x, bps, forceOrder)
          else writeSubframe(b, x, bps, forceOrder))
      frameNo += 1
      off += bs
    }
    out.toArray
  }

  /** One LPC subframe with a CALLER-SUPPLIED quantized predictor:
    * warmup, precision/shift/coefficient header fields, Rice partition
    * order 0 with the deterministic k — the oracle-replayable LPC
    * configuration (mm16). Unlike [[writeSubframe]] there is no
    * CONSTANT/VERBATIM fallback: the caller pinned the predictor, so
    * the subframe type is pinned too. */
  private def writeLpcSubframe(body: BitWriter, x: Array[Int], bps: Int,
                               coefs: Array[Int], shift: Int,
                               prec: Int): Unit = {
    val order = coefs.length
    val mask = (1L << bps) - 1
    body.writeBits(0L, 1) // subframe pad bit
    body.writeBits((0x20 | (order - 1)).toLong, 6) // LPC, order 1..32
    body.writeBits(0L, 1) // no wasted bits
    (0 until order).foreach(i => body.writeBits(x(i).toLong & mask, bps))
    body.writeBits((prec - 1).toLong, 4)
    body.writeBits(shift.toLong & 0x1f, 5)
    coefs.foreach(c => body.writeBits(c.toLong & ((1L << prec) - 1), prec))
    val rs = lpcResidualsI(x, coefs, shift)
    val k = riceParam(rs.foldLeft(0L)(_ + zigzag(_)), rs.length)
    body.writeBits(0L, 2) // residual method: 4-bit Rice
    body.writeBits(0L, 4) // partition order 0
    body.writeBits(k.toLong, 4)
    rs.foreach { r =>
      val zz = zigzag(r)
      body.writeUnary((zz >>> k).toInt)
      if (k > 0) body.writeBits(zz & ((1L << k) - 1), k)
    }
  }

  /** Encode mono 16-bit with a PINNED quantized-LPC predictor on every
    * subframe (RFC 9639 §9.2.4): `coefs(j)` multiplies the sample j+1
    * back, prediction is `(Σ coefs(j)·x_{t−1−j}) >> shift`. This is
    * the codec-tier answer to "wild FLAC is mostly LPC": the decoder
    * accepts ANY in-range LPC subframe; this encoder emits the
    * deterministic configuration whose residual chain, Rice parameter
    * and compressed size DuckDB replays closed-form (mm16). Every coef
    * must fit signed `precision` bits; shift is the wire field's
    * non-negative range 0..15. */
  def encodeLpc(stream: Stream, blockSize: Int, coefs: Array[Int],
                shift: Int, precision: Int): Array[Byte] = {
    val n = stream.samples.length
    require(n > 0, "empty stream")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    require(stream.sampleRate > 0 && stream.sampleRate < (1 << 20),
      s"sampleRate ${stream.sampleRate}")
    val order = coefs.length
    require(order >= 1 && order <= 32, s"LPC order $order")
    require(precision >= 2 && precision <= 15, s"precision $precision")
    require(shift >= 0 && shift <= 15, s"shift $shift")
    coefs.foreach(c => require(
      c >= -(1 << (precision - 1)) && c < (1 << (precision - 1)),
      s"coefficient $c overflows signed $precision bits"))
    val lastBs = if (n % blockSize == 0) blockSize else n % blockSize
    require(order < lastBs,
      s"LPC order $order >= last frame blocksize $lastBs")
    val out = new ArrayBuffer[Byte]()
    streamHeader(out, stream.sampleRate, 1, blockSize, n)
    var frameNo = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val block = new Array[Int](bs)
      var i = 0
      while (i < bs) { block(i) = stream.samples(off + i).toInt; i += 1 }
      out ++= buildFrame(0, Seq((block, 16)), bs, frameNo,
        (b, x, bps) => writeLpcSubframe(b, x, bps, coefs, shift, precision))
      frameNo += 1
      off += bs
    }
    out.toArray
  }

  /** Stereo channel-assignment modes (RFC 9639 §9.1.3): `independent`
    * (L, R), `left-side` (L, S=L−R), `right-side` (S, R), `mid-side`
    * (M=(L+R)>>1, S) — the side channel carried at 17 bits — or
    * `adaptive`, which ranks the four by the Σ|residual|-at-best-order
    * proxy per channel (deterministic, ties in the order listed). */
  def encodeStereo(st: StereoStream, blockSize: Int = 4096,
                   mode: String = "adaptive",
                   forceOrder: Option[Int] = None): Array[Byte] = {
    val n = st.left.length
    require(n > 0, "empty stream")
    require(st.right.length == n,
      s"channel length mismatch: ${st.left.length} vs ${st.right.length}")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    require(st.sampleRate > 0 && st.sampleRate < (1 << 20),
      s"sampleRate ${st.sampleRate}")
    forceOrder.foreach(o => require(o >= 0 && o <= 4, s"order $o"))
    val modes = Seq("independent", "left-side", "right-side", "mid-side")
    require(mode == "adaptive" || modes.contains(mode), s"mode $mode")
    val out = new ArrayBuffer[Byte]()
    streamHeader(out, st.sampleRate, 2, blockSize, n)
    var frameNo = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val l = new Array[Int](bs)
      val r = new Array[Int](bs)
      val s = new Array[Int](bs)
      val m = new Array[Int](bs)
      var i = 0
      while (i < bs) {
        l(i) = st.left(off + i).toInt
        r(i) = st.right(off + i).toInt
        s(i) = l(i) - r(i)
        m(i) = (l(i) + r(i)) >> 1
        i += 1
      }
      val chosen = if (mode == "adaptive") {
        val costs = Seq(
          "independent" -> (bestCost(l) + bestCost(r)),
          "left-side" -> (bestCost(l) + bestCost(s)),
          "right-side" -> (bestCost(s) + bestCost(r)),
          "mid-side" -> (bestCost(m) + bestCost(s)))
        costs.minBy(_._2)._1 // Seq.minBy keeps the first minimum: the
        // documented tie order
      } else mode
      val (chCode, subframes) = chosen match {
        case "independent" => (1, Seq((l, 16), (r, 16)))
        case "left-side" => (8, Seq((l, 16), (s, 17)))
        case "right-side" => (9, Seq((s, 17), (r, 16)))
        case "mid-side" => (10, Seq((m, 16), (s, 17)))
      }
      out ++= buildFrame(chCode, subframes, bs, frameNo,
        (b, x, bps) => writeSubframe(b, x, bps, forceOrder))
      frameNo += 1
      off += bs
    }
    out.toArray
  }

  /** UTF-8-style coded number (RFC 9639 §9.1.5), up to 31 bits. */
  private def codedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 31), s"coded number $v")
    if (v < 0x80) w.writeBits(v, 8)
    else {
      val nBytes =
        if (v < 0x800) 2 else if (v < 0x10000) 3
        else if (v < 0x200000) 4 else if (v < 0x4000000) 5 else 6
      val lead = (0xff << (8 - nBytes)) & 0xff
      w.writeBits((lead | (v >> (6 * (nBytes - 1)))) & 0xffL, 8)
      var i = nBytes - 2
      while (i >= 0) {
        w.writeBits(0x80L | ((v >> (6 * i)) & 0x3f), 8)
        i -= 1
      }
    }
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  /** Parse a mono FLAC payload of this subset. Verifies the
    * frame-header CRC-8 and the frame CRC-16; throws
    * IllegalArgumentException with a diagnostic on anything malformed,
    * truncated, out of subset (3+ channels, non-16-bit), or
    * CRC-corrupt — adversarial input is rejected, never mis-decoded. */
  def decode(bytes: Array[Byte]): Stream = {
    val (rate, chs) = decodeChannels(bytes)
    require(chs.length == 1,
      s"${chs.length}-channel stream — use decodeStereo")
    Stream(rate, chs(0).map(_.toShort))
  }

  /** Parse a stereo FLAC payload of this subset — all four channel
    * assignments (independent / left-side / right-side / mid-side)
    * decoded and de-correlated back to L/R. Same adversarial
    * contract as [[decode]]. */
  def decodeStereo(bytes: Array[Byte]): StereoStream = {
    val (rate, chs) = decodeChannels(bytes)
    require(chs.length == 2,
      s"${chs.length}-channel stream — use decode")
    StereoStream(rate, chs(0).map(_.toShort), chs(1).map(_.toShort))
  }

  private def decodeChannels(bytes: Array[Byte]): (Int, Array[Array[Int]]) = {
    require(bytes != null && bytes.length >= 4 + 4 + 34, "payload too short")
    require(new String(bytes, 0, 4, "US-ASCII") == "fLaC", "not a fLaC stream")
    var pos = 4
    // metadata blocks: STREAMINFO first (spec-mandatory), skip others
    var last = false
    var haveSi = false
    var sampleRate = -1
    var maxBlock = -1
    var nChannels = -1
    var totalSamples = -1L
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated metadata header")
      val flags = bytes(pos) & 0xff
      last = (flags & 0x80) != 0
      val btype = flags & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      require(len <= bytes.length - pos,
        s"metadata block declares $len of ${bytes.length - pos} bytes")
      require(btype != 0x7f, "invalid metadata block type 127")
      if (!haveSi) {
        require(btype == 0, s"first metadata block must be STREAMINFO, got $btype")
        require(len == 34, s"STREAMINFO length $len != 34")
        val r = new BitReader(bytes, pos)
        r.readBits(16) // min blocksize
        maxBlock = r.readBits(16).toInt
        r.readBits(24); r.readBits(24) // frame sizes
        sampleRate = r.readBits(20).toInt
        nChannels = r.readBits(3).toInt + 1
        val bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        require(nChannels <= 2,
          s"mono/stereo subset (got $nChannels channels)")
        require(bps == 16, s"16-bit subset (got $bps)")
        require(sampleRate > 0, s"bad sample rate $sampleRate")
        require(maxBlock >= 16, s"bad max blocksize $maxBlock")
        require(totalSamples > 0, "zero total samples")
        haveSi = true
      }
      pos += len
    }
    require(haveSi, "no STREAMINFO")
    // resource-exhaustion guard: STREAMINFO's 36-bit total-samples
    // field is attacker-controlled, so bound it against what the
    // payload could physically carry BEFORE the sample buffers are
    // allocated (a ~60-byte payload claiming 2^31 samples would
    // otherwise demand gigabytes). A frame yields at most maxBlock
    // samples and costs at least ~10 bytes (6-byte minimum header +
    // CRC-8 + 2-byte minimum subframe + CRC-16) — a bound a CONSTANT
    // frame's extreme compression still satisfies, unlike a naive
    // bits-per-sample floor.
    require(totalSamples <= maxBlock.toLong * (bytes.length / 10 + 1),
      s"STREAMINFO claims $totalSamples samples in a ${bytes.length}-byte payload")
    val nTotal = math.toIntExact(totalSamples)
    val out = Array.ofDim[Int](nChannels, nTotal)
    var got = 0
    var expectFrame = 0L
    while (got < totalSamples) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      require(r.readBits(14) == 0x3ffeL, "bad frame sync")
      require(r.readBits(1) == 0L, "reserved bit set in frame header")
      require(r.readBits(1) == 0L, "variable-blocksize strategy out of subset")
      val bsCode = r.readBits(4).toInt
      require(bsCode != 0, "reserved blocksize code 0")
      val srCode = r.readBits(4).toInt
      require(srCode != 15, "invalid sample-rate code 15")
      val chCode = r.readBits(4).toInt
      if (nChannels == 1) require(chCode == 0,
        s"channel code $chCode on a 1-channel stream (mono subset frame)")
      else require(chCode == 1 || (chCode >= 8 && chCode <= 10),
        if (chCode >= 2 && chCode <= 7)
          s"${chCode + 1}-channel assignment out of the mono/stereo subset"
        else if (chCode == 0)
          "mono frame in a 2-channel stream"
        else s"reserved channel assignment $chCode")
      val ssCode = r.readBits(3).toInt
      require(ssCode == 4, s"16-bit subset (sample-size code $ssCode)")
      require(r.readBits(1) == 0L, "reserved bit set in frame header")
      val frameNo = readCodedNumber(r)
      require(frameNo == expectFrame,
        s"frame number $frameNo, expected $expectFrame")
      val bs = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      if (srCode == 12) r.readBits(8)
      else if (srCode == 13 || srCode == 14) r.readBits(16)
      require(bs <= maxBlock, s"frame blocksize $bs > STREAMINFO max $maxBlock")
      require(bs <= totalSamples - got,
        s"frame blocksize $bs overruns remaining ${totalSamples - got}")
      val headEnd = r.byteOffset
      val declaredCrc8 = r.readBits(8).toInt
      require(declaredCrc8 == crc8(bytes, frameStart, headEnd),
        "frame header CRC-8 mismatch")
      // subframes: the side channel of assignments 8/9/10 carries one
      // extra bit (RFC 9639 §9.2: the difference of two n-bit values
      // needs n+1)
      val chans: Array[Array[Int]] =
        if (nChannels == 1) Array(parseSubframe(r, bs, 16))
        else chCode match {
          case 1 =>
            Array(parseSubframe(r, bs, 16), parseSubframe(r, bs, 16))
          case 8 => // left-side: L, S -> R = L - S
            val l = parseSubframe(r, bs, 16)
            val s = parseSubframe(r, bs, 17)
            Array(l, Array.tabulate(bs)(i => l(i) - s(i)))
          case 9 => // right-side: S, R -> L = S + R
            val s = parseSubframe(r, bs, 17)
            val rr = parseSubframe(r, bs, 16)
            Array(Array.tabulate(bs)(i => s(i) + rr(i)), rr)
          case 10 => // mid-side: M, S -> shift the dropped LSB back in
            val m = parseSubframe(r, bs, 16)
            val s = parseSubframe(r, bs, 17)
            val l = new Array[Int](bs)
            val rr = new Array[Int](bs)
            var i = 0
            while (i < bs) {
              val mm = (m(i) << 1) | (s(i) & 1)
              l(i) = (mm + s(i)) >> 1
              rr(i) = (mm - s(i)) >> 1
              i += 1
            }
            Array(l, rr)
        }
      var c = 0
      while (c < chans.length) {
        var i = 0
        val ch = chans(c)
        while (i < bs) {
          require(ch(i) >= Short.MinValue && ch(i) <= Short.MaxValue,
            s"decorrelated sample ${ch(i)} overflows 16 bits (corrupt stream)")
          i += 1
        }
        c += 1
      }
      r.alignByte()
      val bodyEnd = r.byteOffset
      val declaredCrc16 = r.readBits(16).toInt
      require(declaredCrc16 == crc16(bytes, frameStart, bodyEnd),
        "frame CRC-16 mismatch")
      var cc = 0
      while (cc < nChannels) {
        System.arraycopy(chans(cc), 0, out(cc), got, bs)
        cc += 1
      }
      got += bs
      expectFrame += 1
      pos = r.byteOffset
    }
    (sampleRate, out)
  }

  /** One subframe at `bps` bits/sample: CONSTANT / VERBATIM / FIXED /
    * quantized LPC with Rice method 0 or 1, any partition order,
    * escape partitions included, wasted-bits shift (RFC 9639 §9.2.2:
    * flag 1 → k−1 unary-coded; the subframe is coded at bps−k and
    * every sample shifts left by k on output — wild FLAC uses this
    * routinely for low-bit-depth audio padded into 16/24-bit
    * containers). Reserved types are rejected by name. */
  private def parseSubframe(r: BitReader, bs: Int, bpsRaw: Int): Array[Int] = {
    require(r.readBits(1) == 0L, "subframe padding bit set")
    val sfType = r.readBits(6).toInt
    val wasted =
      if (r.readBits(1) == 0L) 0
      else r.readUnary(bpsRaw - 2) + 1 // k ≥ 1; coded width bps−k ≥ 1
    val bps = bpsRaw - wasted
    val lo = -(1L << (bps - 1))
    val hi = (1L << (bps - 1)) - 1
    val x = new Array[Int](bs)
    if (sfType == 0) { // CONSTANT
      java.util.Arrays.fill(x, r.readSigned(bps))
    } else if (sfType == 1) { // VERBATIM
      var i = 0
      while (i < bs) { x(i) = r.readSigned(bps); i += 1 }
    } else if ((sfType & 0x38) == 8 && (sfType & 0x07) <= 4) { // FIXED
      val order = sfType & 0x07
      require(order < bs, s"predictor order $order >= blocksize $bs")
      var i = 0
      while (i < order) { x(i) = r.readSigned(bps); i += 1 }
      val res = readResiduals(r, bs, order)
      // reconstruct through the predictor
      var t = order
      while (t < bs) {
        val pred = order match {
          case 0 => 0L
          case 1 => x(t - 1).toLong
          case 2 => 2L * x(t - 1) - x(t - 2)
          case 3 => 3L * x(t - 1) - 3L * x(t - 2) + x(t - 3)
          case 4 => 4L * x(t - 1) - 6L * x(t - 2) + 4L * x(t - 3) -
            x(t - 4)
        }
        val v = pred + res(t - order)
        require(v >= lo && v <= hi,
          s"reconstructed sample $v overflows $bps bits (corrupt stream)")
        x(t) = v.toInt
        t += 1
      }
    } else if ((sfType & 0x20) != 0) { // LPC, order 1..32 (RFC 9639 §9.2.4)
      val order = (sfType & 0x1f) + 1
      require(order < bs, s"LPC order $order >= blocksize $bs")
      var i = 0
      while (i < order) { x(i) = r.readSigned(bps); i += 1 }
      val precM1 = r.readBits(4).toInt
      require(precM1 != 15, "invalid LPC coefficient precision escape (15)")
      val prec = precM1 + 1
      val shift = r.readSigned(5)
      // the field is signed 5-bit on the wire but RFC 9639 §9.2.4
      // forbids negative shifts in valid streams
      require(shift >= 0, s"negative LPC shift $shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(prec); i += 1 }
      val res = readResiduals(r, bs, order)
      // quantized-LPC reconstruction: pred = (Σ coef_j · x_{t−1−j}) >> shift,
      // pure 64-bit-safe integer arithmetic (order ≤ 32, |coef| < 2^15,
      // |x| < 2^17 → |Σ| < 2^37)
      var t = order
      while (t < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * x(t - 1 - j); j += 1 }
        val v = (acc >> shift) + res(t - order)
        require(v >= lo && v <= hi,
          s"reconstructed sample $v overflows $bps bits (corrupt stream)")
        x(t) = v.toInt
        t += 1
      }
    } else {
      throw new IllegalArgumentException(s"reserved subframe type $sfType")
    }
    if (wasted > 0) {
      // samples were coded at bps−k; the left shift restores the raw
      // width and cannot overflow it (v within bps−k bits by the
      // range checks above → v·2^k within bps bits)
      var i = 0
      while (i < bs) { x(i) = x(i) << wasted; i += 1 }
    }
    x
  }

  /** The coded-residual section shared by FIXED and LPC subframes
    * (RFC 9639 §9.2.7): 2-bit method (4- or 5-bit Rice parameters),
    * 4-bit partition order, per-partition parameter with the
    * all-ones escape to raw `rawBits`-wide residuals. The partition
    * constraint `bs / 2^po > order` is enforced UNCONDITIONALLY (the
    * RFC requires it for every partition order, not just 0 — with
    * po > 0 and order ≥ bs/2^po a crafted stream would otherwise
    * drive the first partition's count negative and overflow `res`
    * with an undeclared ArrayIndexOutOfBoundsException). */
  private def readResiduals(r: BitReader, bs: Int, order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4).toInt
    val nParts = 1 << po
    require(bs % nParts == 0, s"blocksize $bs not divisible into $nParts")
    require(bs / nParts > order,
      s"partition order $po leaves no samples after warmup (order $order)")
    val res = new Array[Long](bs - order)
    var ri = 0
    var p = 0
    while (p < nParts) {
      val cnt = bs / nParts - (if (p == 0) order else 0)
      val k = r.readBits(pBits).toInt
      if (k == escape) {
        val rawBits = r.readBits(5).toInt
        var j = 0
        while (j < cnt) {
          res(ri) = if (rawBits == 0) 0L else r.readSigned(rawBits).toLong
          ri += 1; j += 1
        }
      } else {
        var j = 0
        while (j < cnt) {
          // quotient bounded by the bits that can remain: a corrupt
          // stream cannot spin past the payload
          val q = r.readUnary(
            math.toIntExact(math.min(r.remainingBits, Int.MaxValue.toLong)))
          val zz = (q.toLong << k) |
            (if (k > 0) r.readBits(k) else 0L)
          res(ri) = unzigzag(zz)
          ri += 1; j += 1
        }
      }
      p += 1
    }
    res
  }

  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
    require(nCont >= 1 && nCont <= 6, s"malformed coded number lead $b0")
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val c = r.readBits(8).toInt
      require((c & 0xc0) == 0x80, s"malformed coded-number continuation $c")
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }
}
