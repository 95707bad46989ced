package graft.multimodal

/** Dependency-free WAV (RIFF/WAVE, PCM 16-bit mono) codec in plain
  * Scala — the REAL audio decode path behind the multimodal tier
  * (round-14), the audio analogue of the [[Ppm]] image codec.
  *
  * The container ships no audio libraries, but canonical PCM WAV needs
  * none: a RIFF container header, a `fmt ` chunk declaring PCM layout,
  * and a `data` chunk of little-endian 16-bit samples. The decoder
  * WALKS the chunk list (skipping unknown chunks such as `LIST`, as
  * the spec requires — a fixed-44-byte-offset reader breaks on real
  * files), validates the PCM/mono/16-bit contract, and bounds every
  * size in Long BEFORE use (the lesson of the round-14 Ppm ADVICE
  * fix applied from the start: declared chunk sizes are adversarial
  * input). decodeStub now stands in only for compressed formats
  * (JPEG/PNG images, lossy audio).
  *
  * Scale shape: encode/decode run inside the batched per-partition
  * transform (the mapInPandas shape) — narrow, no shuffle, bytes
  * never leave the partition that read them.
  */
object Wav {

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

  /** Parse a PCM WAV payload. Walks the chunk list; throws
    * IllegalArgumentException on malformed input (wrong magic,
    * non-PCM/stereo/≠16-bit fmt, missing or truncated chunks,
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
          require(fmtCode == 1, s"not PCM (fmt $fmtCode)")
          require(channels == 1, s"mono only (got $channels)")
          require(bits == 16, s"16-bit only (got $bits)")
          require(rate > 0, s"bad sample rate $rate")
          // the RIFF pad byte after an odd-size chunk is OPTIONAL at
          // end-of-payload: bound the skip by what actually remains so
          // a chunk ending exactly at the buffer edge stays inside the
          // codec's own diagnostics (round-15 ADVICE fix)
          bb.position(bb.position() +
            math.min((n - 16) + (n & 1), bb.remaining()))
        case "data" =>
          require(rate > 0, "data chunk before fmt")
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
