package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Multimodal, Ppm}

/** The dependency-free PPM codec (mm3b's real decode path): round-trip
  * identity, spec-legal header variants (comments, arbitrary
  * whitespace), malformed-input rejection, and the Spark plumbing's
  * feature/resize arithmetic against hand-computed values. */
class PpmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def img(w: Int, h: Int)(f: Int => Int): Ppm.Image =
    Ppm.Image(w, h, 255,
      Array.tabulate(3 * w * h)(j => f(j).toByte))

  test("encode/decode round-trips the raster exactly") {
    val i0 = img(5, 3)(j => (j * 11 + 4) % 256)
    val i1 = Ppm.decode(Ppm.encode(i0))
    assert(i1.width == 5 && i1.height == 3 && i1.maxVal == 255)
    assert(java.util.Arrays.equals(i0.data, i1.data))
  }

  test("header tokenizer: comments and mixed whitespace are legal") {
    val raster = Array.tabulate(3 * 2 * 2)(j => (j * 3).toByte)
    val header = "P6 # a comment\n# another full-line comment\n 2\t2 #w h\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ raster
    val i = Ppm.decode(bytes)
    assert(i.width == 2 && i.height == 2)
    assert(java.util.Arrays.equals(i.data, raster))
  }

  test("raster starts exactly one whitespace after maxval") {
    // a raster whose FIRST byte is '\n' (0x0a): a parser that skips all
    // whitespace after maxval (instead of exactly one) eats it and
    // shifts every later pixel — the classic PPM off-by-one
    val raster = Array[Byte](0x0a, 1, 2, 3, 4, 5)
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ raster
    assert(java.util.Arrays.equals(Ppm.decode(bytes).data, raster))
  }

  test("property: round-trip identity across sizes and byte patterns") {
    val rnd = new scala.util.Random(77)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val data = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val back = Ppm.decode(Ppm.encode(Ppm.Image(w, h, 255, data)))
      assert(back.width == w && back.height == h)
      assert(java.util.Arrays.equals(back.data, data), s"raster drift at ${w}x$h")
    }
  }

  test("malformed inputs are rejected, not mis-decoded") {
    val good = Ppm.encode(img(2, 2)(identity))
    intercept[IllegalArgumentException](Ppm.decode("P5\n1 1\n255\n ".getBytes ++ Array[Byte](0)))
    intercept[IllegalArgumentException](Ppm.decode(good.dropRight(1))) // truncated raster
    intercept[IllegalArgumentException](Ppm.decode("P6\n2 2\n".getBytes)) // missing maxval
    intercept[IllegalArgumentException](Ppm.decode("P6\n0 2\n255\n".getBytes)) // zero dim
    intercept[IllegalArgumentException](Ppm.decode(null))
    // adversarial header: each dimension passes the per-token bound but
    // 3·w·h overflows Int — must be REJECTED, not "decoded" against a
    // truncated raster (round-14 ADVICE fix: size computed in Long)
    intercept[IllegalArgumentException](
      Ppm.decode(s"P6\n${1 << 26} ${1 << 26}\n255\n ".getBytes ++
        Array[Byte](1, 2, 3)))
    // and a merely-too-large (non-overflowing) raster is rejected too
    intercept[IllegalArgumentException](
      Ppm.decode(s"P6\n8192 8192\n255\n ".getBytes ++ Array[Byte](1)))
  }

  test("PGM (P5) round-trips; decodeAuto dispatches on magic bytes") {
    val gray = Array.tabulate(12)(i => (i * 19 % 251).toByte)
    val p5 = Ppm.encodePgm(4, 3, 255, gray)
    val r = Ppm.decodePgm(p5)
    assert(r.format == "P5" && r.width == 4 && r.height == 3 &&
      r.channels == 1 && r.data.sameElements(gray))
    // the dispatch: same payloads through the format-keyed interface
    val p6 = Ppm.encode(img(2, 2)(identity))
    assert(Ppm.decodeAuto(p5).format == "P5")
    val a6 = Ppm.decodeAuto(p6)
    assert(a6.format == "P6" && a6.channels == 3 &&
      a6.data.length == 3 * 2 * 2)
    // P5 raster is w·h bytes, NOT 3·w·h: a P5 header on a P6-sized
    // payload still decodes w·h (prefix), while the reverse truncates
    intercept[IllegalArgumentException](
      Ppm.decodeAuto("P4\n2 2\n".getBytes)) // unsupported family member
    intercept[IllegalArgumentException](Ppm.decodePgm(p6)) // wrong magic
  }

  test("spark pipeline: features match hand-computed values for one id") {
    import spark.implicits._
    val df = Seq((7L, "x")).toDF("doc_id", "text")
    val out = Multimodal.ppmFeatures(
        Multimodal.synthPpmPayload(df, "doc_id"))
      .head()
    // raster byte j = (7*31 + 7j) % 251 = (217 + 7j) % 251
    def v(j: Int): Int = (217 + 7 * j) % 251
    val n = 16 * 8
    def mean(c: Int): Double =
      (0 until 3 * n).filter(_ % 3 == c).map(v).sum.toDouble / n
    var ck = 0L
    for (j <- 0 until 3 * n) {
      val p = j / 3; val c = j % 3
      ck += v(j).toLong * (1 + (p % 16) / 4 + 4 * (p / 64) + 8 * c)
    }
    assert(out.getLong(0) == 7L)
    assert(out.getInt(1) == 16 && out.getInt(2) == 8)
    assert(math.abs(out.getDouble(3) - mean(0)) < 1e-12)
    assert(math.abs(out.getDouble(4) - mean(1)) < 1e-12)
    assert(math.abs(out.getDouble(5) - mean(2)) < 1e-12)
    assert(out.getLong(6) == ck)
  }
}
