package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Flac

/** Exhaustive single-corruption fuzz of the FLAC frame region: for a
  * valid mono and stereo payload, EVERY byte of every frame is flipped
  * (low bit and high bit separately) and the decoder must throw — the
  * CRC-8/CRC-16 pair detects all single-byte corruptions, and every
  * structural check that fires before the CRCs throws too, so there is
  * NO single-byte frame corruption that silently yields wrong samples.
  * (Metadata bytes are excluded: STREAMINFO carries no CRC in the
  * format itself — a flipped sample-rate bit legitimately decodes to a
  * different declared rate. The audio path is what the contract
  * guards.)
  *
  * This is the property the adversarial one-off tests in FlacSpec
  * sample; here it is swept wholesale — ~2×2×(payload−42) decodes per
  * layout, milliseconds each. */
class FlacFuzzSpec extends AnyFunSuite {

  private def ramp(n: Int): Array[Short] =
    Array.tabulate(n)(i => (((i * 13) % 201) - 100).toShort)

  private def sweep(payload: Array[Byte], decode: Array[Byte] => Any,
                    label: String): Unit = {
    var silent = 0
    val notes = new scala.collection.mutable.ArrayBuffer[String]()
    (42 until payload.length).foreach { off =>
      Seq(0x01, 0x80).foreach { bit =>
        val b = java.util.Arrays.copyOf(payload, payload.length)
        b(off) = (b(off) ^ bit).toByte
        try {
          decode(b)
          silent += 1
          if (notes.size < 5) notes += s"offset $off bit $bit"
        } catch {
          case _: IllegalArgumentException => // rejected: the contract
          case _: ArithmeticException => // toIntExact on absurd sizes: rejected
        }
      }
    }
    assert(silent == 0,
      s"$label: $silent single-byte corruptions decoded silently " +
        s"(first: ${notes.mkString(", ")})")
  }

  test("mono: every single-byte frame corruption is rejected") {
    val enc = Flac.encode(Flac.Stream(8000, ramp(600)), blockSize = 256)
    sweep(enc, Flac.decode, "mono")
  }

  test("wasted-bits mono: every single-byte frame corruption is rejected") {
    // odd base × 4 → every subframe declares k=2 wasted bits; a flip
    // in the flag/unary region reshapes the whole parse and must land
    // on a structural check or the CRC-16, never silent samples
    val x = Array.tabulate(600)(i =>
      ((2 * (((i * 13) % 101) - 50) + 1) << 2).toShort)
    val enc = Flac.encode(Flac.Stream(8000, x), blockSize = 256,
      detectWasted = true)
    sweep(enc, Flac.decode, "wasted mono")
  }

  test("stereo mid-side: every single-byte frame corruption is rejected") {
    val l = ramp(600)
    val r = Array.tabulate(600)(i => (l(i) - (((i * 3) % 41) - 20)).toShort)
    val enc = Flac.encodeStereo(Flac.StereoStream(8000, l, r),
      blockSize = 256, mode = "mid-side")
    sweep(enc, Flac.decodeStereo, "stereo")
  }

  test("lpc: every single-byte frame corruption is rejected") {
    val enc = Flac.encodeLpc(Flac.Stream(8000, ramp(600)), blockSize = 256,
      coefs = Array(3, -1), shift = 1, precision = 4)
    sweep(enc, Flac.decode, "lpc")
  }

  test("stereo independent: every single-byte frame corruption is rejected") {
    val l = ramp(300)
    val r = Array.tabulate(300)(i => (l(i) - (((i * 3) % 41) - 20)).toShort)
    val enc = Flac.encodeStereo(Flac.StereoStream(8000, l, r),
      blockSize = 256, mode = "independent")
    sweep(enc, Flac.decodeStereo, "stereo-independent")
  }
}
