package graft.multimodal

/** Dependency-free WAV (RIFF/WAVE) codec in plain Scala — the REAL
  * audio decode path behind the multimodal tier (round-14), the audio
  * analogue of the [[Ppm]] image codec. Two formats:
  *
  *  - **PCM 16-bit mono** (fmt code 1) — lossless canonical WAV;
  *  - **G.711 μ-law mono** (fmt code 7, round-15) — the telephony
  *    standard's LOSSY 8-bit companded PCM: each 16-bit sample is
  *    compressed to a sign + 3-bit exponent + 4-bit mantissa byte
  *    (logarithmic quantization) and expanded back on decode. Pure
  *    integer bit-twiddling from the G.711 spec, so the round trip —
  *    including the quantization loss — replays closed-form in the
  *    oracle. This makes "lossy audio" REAL; with baseline JPEG also
  *    real since round-16, decodeStub stands in ONLY for
  *    perceptual-transform audio (MP3/AAC) — closed permanently out
  *    of the dependency-free scope (see Multimodal's scaladoc).
  *
  * The container ships no audio libraries, but neither format needs
  * one: a RIFF container header, a `fmt ` chunk declaring the layout,
  * and a `data` chunk of samples. The decoder WALKS the chunk list
  * (skipping unknown chunks such as `LIST`, as the spec requires — a
  * fixed-44-byte-offset reader breaks on real files), validates the
  * format contract, and bounds every size in Long BEFORE use (the
  * lesson of the round-14 Ppm ADVICE fix applied from the start:
  * declared chunk sizes are adversarial input).
  *
  * Scale shape: encode/decode run inside the batched per-partition
  * transform (the mapInPandas shape) — narrow, no shuffle, bytes
  * never leave the partition that read them.
  */
object Wav {

  /** G.711 μ-law compress: 16-bit signed sample → companded byte.
    * Spec algorithm: clamp to ±32635, add the 0x84 bias, find the
    * exponent (position of the top set bit among bits 7..14), take
    * the 4 mantissa bits below it, pack sign|exp|mantissa and invert
    * (μ-law bytes are transmitted complemented). */
  def ulawCompress(sample: Short): Byte = {
    val sign = if (sample < 0) 0x80 else 0x00
    var x = math.min(math.abs(sample.toInt), 32635) + 0x84
    var e = 7
    while (e > 0 && x < (1 << (e + 7))) e -= 1
    val mantissa = (x >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | mantissa)).toByte
  }

  /** G.711 μ-law expand: companded byte → 16-bit signed sample (the
    * quantization-bucket midpoint — decode(encode(x)) ≠ x in general,
    * which is the lossy part). */
  def ulawExpand(b: Byte): Short = {
    val u = (~b) & 0xff
    val e = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val mag = (((mantissa << 3) + 0x84) << e) - 0x84
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** Decoded clip: 16-bit signed mono samples at `sampleRate` Hz. */
  final case class Clip(sampleRate: Int, samples: Array[Short])

  private val HDR = 44 // canonical PCM header: RIFF(12) + fmt(24) + data(8)

  /** Serialize as canonical PCM WAV (mono, 16-bit). */
  def encode(clip: Clip): Array[Byte] = {
    require(clip.sampleRate > 0, s"sampleRate ${clip.sampleRate}")
    val n = clip.samples.length
    val out = java.nio.ByteBuffer.allocate(HDR + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(clip.sampleRate)
      .putInt(clip.sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(2 * n)
    clip.samples.foreach(out.putShort)
    out.array()
  }

  /** Serialize as G.711 μ-law WAV (fmt code 7, mono, 8 bits/sample):
    * each 16-bit sample is COMPANDED to one byte — a real lossy
    * encode; [[decode]] expands back to quantization-bucket
    * midpoints. Odd-length data gets the RIFF pad byte. */
  def encodeUlaw(clip: Clip): Array[Byte] = {
    require(clip.sampleRate > 0, s"sampleRate ${clip.sampleRate}")
    val n = clip.samples.length
    val pad = n & 1
    val out = java.nio.ByteBuffer.allocate(HDR + n + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n + pad)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7) // G.711 μ-law
      .putShort(1) // mono
      .putInt(clip.sampleRate)
      .putInt(clip.sampleRate) // byte rate: 1 byte/sample
      .putShort(1) // block align
      .putShort(8) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(n)
    clip.samples.foreach(s => out.put(ulawCompress(s)))
    out.array()
  }

  /** Parse a WAV payload — PCM 16-bit (fmt 1) or G.711 μ-law (fmt 7,
    * expanded to 16-bit samples). Walks the chunk list; throws
    * IllegalArgumentException on malformed input (wrong magic,
    * unsupported fmt/stereo/bit-depth, missing or truncated chunks,
    * adversarial sizes). */
  def decode(bytes: Array[Byte]): Clip = {
    require(bytes != null && bytes.length >= HDR, "payload too short")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF payload")
    bb.getInt // declared RIFF size — untrusted, real bound is the array
    require(tag() == "WAVE", "not a WAVE form")
    var rate = -1
    var fmt = -1
    while (bb.remaining() >= 8) {
      val id = tag()
      // declared size is ADVERSARIAL: read unsigned into Long, bound by
      // the actual remaining bytes before any use
      val sz = bb.getInt.toLong & 0xffffffffL
      require(sz <= bb.remaining(),
        s"chunk $id declares $sz of ${bb.remaining()} bytes")
      val n = sz.toInt
      id match {
        case "fmt " =>
          require(n >= 16, s"fmt chunk too short: $n")
          val fmtCode = bb.getShort
          val channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align — derived
          val bits = bb.getShort
          require(fmtCode == 1 || fmtCode == 7,
            s"unsupported fmt $fmtCode (PCM=1 / mu-law=7 only)")
          require(channels == 1, s"mono only (got $channels)")
          require(bits == (if (fmtCode == 7) 8 else 16),
            s"fmt $fmtCode needs ${if (fmtCode == 7) 8 else 16}-bit, got $bits")
          require(rate > 0, s"bad sample rate $rate")
          fmt = fmtCode
          // the RIFF pad byte after an odd-size chunk is OPTIONAL at
          // end-of-payload: bound the skip by what actually remains so
          // a chunk ending exactly at the buffer edge stays inside the
          // codec's own diagnostics (round-15 ADVICE fix)
          bb.position(bb.position() +
            math.min((n - 16) + (n & 1), bb.remaining()))
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          if (fmt == 7) { // μ-law: 1 byte/sample, expand on read
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = ulawExpand(bb.get()); i += 1 }
            return Clip(rate, samples)
          }
          require(n % 2 == 0, s"odd data size $n for 16-bit samples")
          val samples = new Array[Short](n / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          return Clip(rate, samples)
        case _ => // LIST, fact, cue … — skip (sizes are word-aligned;
          // pad byte bounded by remaining: optional at end-of-payload)
          bb.position(bb.position() + math.min(n + (n & 1), bb.remaining()))
      }
    }
    throw new IllegalArgumentException("no data chunk")
  }
}
