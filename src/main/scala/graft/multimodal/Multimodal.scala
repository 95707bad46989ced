package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json scale extensions).
  *
  * Images / audio / video ride through the engine as opaque `binary`
  * payload columns plus a typed metadata struct; decode / feature
  * extraction runs as a BATCHED per-partition transform (the Scala
  * analogue of `mapInPandas`: one iterator pass per partition, vectorized
  * batch shape, no per-row UDF dispatch).
  *
  * Decoding is REAL for the whole image tier and uncompressed/companded
  * audio: Netpbm ([[Ppm]]), PNG ([[Png]]), baseline JPEG ([[Jpeg]],
  * round-16) and WAV PCM + G.711 μ-law ([[Wav]]) are dependency-free
  * codecs exercised end to end by production queries. `decodeStub`
  * stands in ONLY for perceptual-transform compressed audio (MP3/AAC),
  * which is CLOSED out of the dependency-free scope permanently: a
  * conforming decoder needs polyphase filterbanks + psychoacoustic
  * tables whose outputs no closed-form oracle can replay, so it would
  * be untestable here by construction — the Spark-side plumbing
  * (schema, partitioning, batch signature, deterministic feature
  * contract) is real and tested either way, and swapping in a real
  * decoder on a cluster with codec libraries means replacing ONLY the
  * byte→feature function.
  */
object Multimodal {

  /** Metadata struct type carried next to every payload. */
  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("source", StringType)))

  /** Wrap a text column as a binary payload + metadata — the test-data
    * stand-in for real media blobs. */
  def asPayload(df: DataFrame, idCol: String, textCol: String,
                sourceCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("utf8-text").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** === STUB (permanent, MP3/AAC only) ===
    * Deterministic fake "decode" for perceptual-transform compressed
    * AUDIO — the one boundary deliberately left outside the
    * dependency-free codec tier (see the object scaladoc; images and
    * PCM/μ-law audio all decode for real). Real deployments replace
    * this with a codec-library call (mel spectrogram, frame sampling).
    * Signature contract: bytes in → fixed-width feature vector out.
    * Kept pure + deterministic so the plumbing is testable. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null) return Array(0.0, 0.0, 0.0, 0.0)
    var sum = 0L; var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    Array(
      payload.length.toDouble,                       // "resolution"
      (payload.length / 64).toDouble,                // "frame count"
      sum.toDouble / math.max(payload.length, 1),    // mean byte ("brightness")
      (sum % 251).toDouble)                          // checksum-ish feature
  }

  /** Frame sampling / resize over an opaque payload, decode-free: the
    * payload is split into fixed `frameBytes` frames; every `stride`-th
    * frame is kept, truncated to the first `maxFrames` frames ("resize").
    * Works on the hex projection of the binary so the whole operator is
    * pure codegen'd Column algebra — one row per sampled frame with the
    * frame id, its byte length (last frame may be short) and a head
    * preview. At scale this is a narrow explode (no shuffle): frame rows
    * stay on the partition that read the payload. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int = 64, stride: Int = 2,
                  maxFrames: Int = 7): DataFrame = {
    val hexChars = frameBytes * 2
    val nBytes = length(col(payloadCol)) // byte length for binary input
    df.filter(nBytes > 0)
      .select(col(idCol), hex(col(payloadCol)).as("__hx"),
        explode(sequence(lit(0),
          least(floor((nBytes - lit(1)) / lit(frameBytes)).cast("int"),
            lit(maxFrames - 1)))).as("frame_id"))
      .filter(col("frame_id") % stride === 0)
      .withColumn("__fhx",
        col("__hx").substr(col("frame_id") * hexChars + 1, lit(hexChars)))
      .select(col(idCol), col("frame_id"),
        (length(col("__fhx")) / 2).cast("int").as("frame_bytes"),
        substring(col("__fhx"), 1, 8).as("head_hex"))
  }

  /** Pooled resize of a dense feature/embedding vector: average-pool
    * `vecCol` (length divisible into `bins` equal slices) down to a
    * `bins`-element vector — the "image resize / embedding downsample"
    * step as pure codegen'd Column algebra (slice + left-fold sum per
    * bin), no UDF, no shuffle. Elements are summed left-to-right so the
    * result is bit-reproducible across engines. */
  def poolResize(df: DataFrame, vecCol: String, bins: Int,
                 outCol: String = "pooled"): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate, array, lit, size, slice}
    val v = col(vecCol)
    val binWidth = (size(v) / bins).cast("int")
    val pooled = array((0 until bins).map { b =>
      aggregate(slice(v, binWidth * b + 1, binWidth), lit(0.0),
        (acc, x) => acc + x) / binWidth
    }: _*)
    df.withColumn(outCol, pooled)
  }

  /** Deterministic synthetic raster encoded as a REAL binary PPM
    * payload (round-13): byte j of the width×height RGB raster for key
    * `id` is `(id·31 + j·7) mod 251` — pure integer arithmetic a second
    * engine replays exactly, so the real encode→decode round trip
    * ([[Ppm]]) is hash-checkable cross-engine, not just spec-tested.
    * Runs in the batched per-partition transform (narrow, no shuffle);
    * emits `(id, payload binary)`. */
  def synthPpmPayload(df: DataFrame, idCol: String,
                      width: Int = 16, height: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val data = new Array[Byte](3 * width * height)
        var j = 0
        while (j < data.length) {
          data(j) = ((id * 31 + j * 7) % 251).toByte
          j += 1
        }
        Row(id, Ppm.encode(Ppm.Image(width, height, 255, data)))
      }
    }(Encoders.row(schema))
  }

  /** REAL image decode + resize over a binary PPM payload column: parse
    * with [[Ppm.decode]] (header tokenizer, raster offset — a parsing
    * bug here changes every output), then per image the per-channel
    * means and the 4×4 box-sum "resize" checksum: the raster is box-
    * downsampled in 4×4 blocks per channel (integer block sums — exact
    * on any engine, no float pooling) and the blocks combined as
    * Σ blocksum · (1 + bx + 4·by + 8·c). Narrow batched pass; emits
    * `(id, width, height, mean_r, mean_g, mean_b, resize_cksum)`. */
  def ppmFeatures(df: DataFrame, idCol: String = "id",
                  payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("resize_cksum", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val img = Ppm.decode(r.getAs[Array[Byte]](pIdx))
        val sums = new Array[Long](3)
        var cksum = 0L
        var i = 0
        while (i < img.data.length) {
          val v = img.data(i) & 0xff
          val p = i / 3; val c = i % 3
          val bx = (p % img.width) / 4; val by = (p / img.width) / 4
          sums(c) += v
          cksum += v.toLong * (1 + bx + 4 * by + 8 * c)
          i += 1
        }
        val n = (img.width * img.height).toDouble
        Row(r.getLong(idIdx), img.width, img.height,
          sums(0) / n, sums(1) / n, sums(2) / n, cksum)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic MIXED-FORMAT payload (round-14): even ids encode as
    * P6 color rasters (byte j = `(id·31 + j·7) mod 251`, the mm3b
    * formula over 3·w·h bytes), odd ids as P5 GRAYSCALE rasters (same
    * formula over w·h bytes) — so one binary column carries two real
    * formats and the decode side must dispatch on magic bytes
    * ([[Ppm.decodeAuto]]), proving the codec boundary is an interface.
    * Emits `(id, payload binary)`. */
  def synthNetpbmPayload(df: DataFrame, idCol: String,
                         width: Int = 16, height: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val n = if (id % 2 == 0) 3 * width * height else width * height
        val data = new Array[Byte](n)
        var j = 0
        while (j < n) { data(j) = ((id * 31 + j * 7) % 251).toByte; j += 1 }
        val payload =
          if (id % 2 == 0) Ppm.encode(Ppm.Image(width, height, 255, data))
          else Ppm.encodePgm(width, height, 255, data)
        Row(id, payload)
      }
    }(Encoders.row(schema))
  }

  /** Format-dispatched decode + features over a mixed image payload
    * column: [[Images.decodeAuto]] picks the codec from the magic
    * bytes (P6 / P5 since round-14; PNG since round-15 — a REAL
    * zlib-inflate + un-filter decode, so for PNG rows the closed-form
    * oracle checks the whole compressed round trip); per image the
    * format tag, dimensions, channel count, mean sample value and a
    * position-weighted checksum `Σ v·(1 + j mod 16)` — all
    * integer/closed-form so a second engine replays them from the
    * generator formula without decoding a byte. Narrow batched pass;
    * emits `(id, format, width, height, channels, mean_v, cksum)`. */
  def netpbmFeatures(df: DataFrame, idCol: String = "id",
                     payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("format", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("mean_v", DoubleType), StructField("cksum", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val ras = Images.decodeAuto(r.getAs[Array[Byte]](pIdx))
        var sum = 0L; var cksum = 0L; var j = 0
        while (j < ras.data.length) {
          val v = ras.data(j) & 0xff
          sum += v
          cksum += v.toLong * (1 + j % 16)
          j += 1
        }
        Row(r.getLong(idIdx), ras.format, ras.width, ras.height,
          ras.channels, sum.toDouble / ras.data.length, cksum)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic THREE-FORMAT payload (round-15): ids ≡ 0 (mod 3)
    * encode as P6 color rasters, ≡ 1 as P5 grayscale, ≡ 2 as REAL
    * PNG (8-bit RGB, zlib-deflated scanlines — [[Png.encode]]), all
    * over the same closed-form bytes `(id·31 + j·7) mod 251` (3·w·h
    * bytes for the color formats, w·h for grayscale). PNG rows cycle
    * the forward filter type (None/Sub/Up/Average/Paeth, by id mod 5)
    * so every un-filter path runs in the PRODUCTION query, not just
    * the spec. The payload bytes are compressed and engine-specific,
    * but the decoded PIXELS replay the formula exactly — which is the
    * point: the oracle hash-checks the whole inflate + un-filter round
    * trip. Emits `(id, payload binary)`. */
  def synthMixedImagePayload(df: DataFrame, idCol: String,
                             width: Int = 16, height: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val n = if (id % 3 == 1) width * height else 3 * width * height
        val data = new Array[Byte](n)
        var j = 0
        while (j < n) { data(j) = ((id * 31 + j * 7) % 251).toByte; j += 1 }
        val payload = (id % 3) match {
          case 0 => Ppm.encode(Ppm.Image(width, height, 255, data))
          case 1 => Ppm.encodePgm(width, height, 255, data)
          case _ => Png.encode(width, height, 3, data,
            filter = (id % 5).toInt)
        }
        Row(id, payload)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic per-block-constant GRAYSCALE raster encoded as a
    * REAL baseline JPEG payload (round-16): 8×8 block b of doc id
    * holds the constant `128 + 4·((id·7 + b·13) mod 25 − 12)` —
    * exactly the profile [[Jpeg]]'s lossy pipeline reproduces
    * BIT-EXACTLY (every AC coefficient quantizes to zero on a
    * constant block; a DC that is a multiple of 64 survives the
    * /16 quantizer and the IDCT round integrally — see the Jpeg
    * scaladoc). So the decoded pixels replay closed-form in the
    * DuckDB oracle and the whole Huffman + dequant + IDCT round trip
    * is hash-checked, the first time for a lossy image codec here.
    * Emits `(id, payload binary)`; narrow batched pass. */
  def synthJpegPayload(df: DataFrame, idCol: String,
                       width: Int = 16, height: Int = 8): DataFrame = {
    require(width % 8 == 0 && height % 8 == 0,
      s"block-aligned dims only: ${width}x$height")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val data = new Array[Byte](width * height)
        var j = 0
        while (j < data.length) {
          val b = (j / width / 8) * (width / 8) + (j % width) / 8
          data(j) = (128 + 4 * ((id * 7 + b * 13) % 25 - 12)).toByte
          j += 1
        }
        Row(id, Jpeg.encode(width, height, data))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic MIXED gray/color JPEG payload (round-16b): even
    * ids encode as grayscale baseline JPEG (the [[synthJpegPayload]]
    * per-block-constant formula), odd ids as COLOR (YCbCr 4:4:4)
    * baseline JPEG whose RGB raster is GRAY-CONSTANT per block
    * (R=G=B=c, same formula) — the color pipeline's exactness
    * subspace: chroma blocks quantize to all-zero and the BT.601
    * round trip returns the RGB bit-for-bit (see [[Jpeg.encodeColor]]).
    * One binary column, two SOF layouts, every stage of the
    * interleaved-MCU color path (3 DC predictors, chroma quant table,
    * inverse color transform) exercised in a hash-checked production
    * query. Emits `(id, payload binary)`. */
  def synthJpegMixedPayload(df: DataFrame, idCol: String,
                            width: Int = 16, height: Int = 8): DataFrame = {
    require(width % 8 == 0 && height % 8 == 0,
      s"block-aligned dims only: ${width}x$height")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        def cAt(j: Int): Byte = {
          val b = (j / width / 8) * (width / 8) + (j % width) / 8
          (128 + 4 * ((id * 7 + b * 13) % 25 - 12)).toByte
        }
        val payload =
          if (id % 2 == 0) {
            val data = Array.tabulate(width * height)(cAt)
            Jpeg.encode(width, height, data)
          } else {
            val rgb = new Array[Byte](3 * width * height)
            var i = 0
            while (i < width * height) {
              val c = cAt(i)
              rgb(3 * i) = c; rgb(3 * i + 1) = c; rgb(3 * i + 2) = c
              i += 1
            }
            Jpeg.encodeColor(width, height, rgb)
          }
        Row(id, payload)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic NONZERO-CHROMA color JPEG payload (round-17,
    * VERDICT item 3): each 8×8 block of doc id carries EXACT integer
    * YCbCr constants planted via [[Jpeg.encodeColorYcc]] —
    * Y = 128 + 4·((id·7 + b·13) mod 25 − 12) (the mm9 luma subspace,
    * DC multiple of the K.1 q00 = 16) and Cb/Cr = 128 + 17·δ with
    * δ ∈ {−2..2} (multiples of the K.2 chroma DC quant step q00 = 17,
    * so the chroma DC of 8·17δ survives /17 integrally and the ACs
    * quantize to zero). Unlike mm10's gray-constant subspace the
    * chroma planes here are NONZERO, so the decode exercises the
    * chroma dequant, the chroma IDCT and the BT.601 inverse actually
    * reconstructing color — and every output pixel is still the
    * closed form floor(x + 0.5) of a linear combination of the three
    * block constants, replayable in SQL. Emits `(id, payload)`. */
  def synthJpegChromaPayload(df: DataFrame, idCol: String,
                             width: Int = 16, height: Int = 8): DataFrame = {
    require(width % 8 == 0 && height % 8 == 0,
      s"block-aligned dims only: ${width}x$height")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val n = width * height
        val y = new Array[Byte](n)
        val cb = new Array[Byte](n)
        val cr = new Array[Byte](n)
        var j = 0
        while (j < n) {
          val b = (j / width / 8) * (width / 8) + (j % width) / 8
          y(j) = (128 + 4 * ((id * 7 + b * 13) % 25 - 12)).toByte
          // block multipliers coprime to the mod-5 range so the chroma
          // constants VARY block to block — the chroma DC differential
          // predictor must carry nonzero deltas, not a chain of zeros
          cb(j) = (128 + 17 * ((id * 3 + b * 2) % 5 - 2)).toByte
          cr(j) = (128 + 17 * ((id * 11 + b * 3) % 5 - 2)).toByte
          j += 1
        }
        Row(id, Jpeg.encodeColorYcc(width, height, y, cb, cr))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic GROUPED raster payload for the perceptual-hash
    * near-dup tier (round-14): docs in the same group of `groupSize`
    * share one base image — byte j of the width×height P6 raster is
    * `md5("g:j")[0..3] mod 251` with `g = id / groupSize` (the repo's
    * portable-md5 idiom: a REAL hash, because any polynomial
    * generator leaves cross-group gradient structure that dHash — a
    * gradient signature — reads as similarity; measured: polynomial
    * bases gave cross-group Hamming as low as 1, the md5 base ≥ 17)
    * — and each doc perturbs ONLY the two leftmost pixels of its own
    * row `y = id mod height` (all three channels, `+97 mod 251`). So
    * within a group the images are near-duplicates whose dHash
    * differs in ≤ 2 bits confined to one hash row, while different
    * groups are unrelated rasters — the ground-truth layout the
    * banded-LSH recall argument needs, replayed exactly by the
    * oracle's md5.
    *
    * FORMAT MIX (round-15): odd ids encode the same raster as REAL
    * PNG ([[Png.encode]], RGB, filter cycling by id mod 5) instead of
    * P6 — the pixels (and so the dHash, the oracle and every query
    * hash) are IDENTICAL, but the decode side must dispatch on magic
    * bytes and run the zlib inflate + un-filter path on half the
    * corpus. A near-dup pair now usually spans the two codecs, so a
    * pixel-level disagreement between them would break the planted
    * recall, not just one row's features. */
  def synthPpmGroupPayload(df: DataFrame, idCol: String,
                           width: Int = 18, height: Int = 8,
                           groupSize: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      // group-local memo: members of a group usually sit adjacently in
      // an id-ordered partition, so the 432 base digests compute once
      // per GROUP, not once per doc
      var lastG = -1L
      var base: Array[Int] = null
      it.map { r =>
        val id = r.getLong(idIdx)
        val g = id / groupSize
        if (g != lastG || base == null) {
          base = Array.tabulate(3 * width * height) { j =>
            val dg = md.digest(s"$g:$j".getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
              ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
            (h % 251).toInt
          }
          lastG = g
        }
        val yd = (id % height).toInt
        val data = new Array[Byte](3 * width * height)
        var j = 0
        while (j < data.length) {
          val p = j / 3
          val perturb = if (p / width == yd && p % width < 2) 97 else 0
          data(j) = ((base(j) + perturb) % 251).toByte
          j += 1
        }
        val payload =
          if (id % 2 == 0) Ppm.encode(Ppm.Image(width, height, 255, data))
          else Png.encode(width, height, 3, data, filter = (id % 5).toInt)
        Row(id, payload)
      }
    }(Encoders.row(schema))
  }

  /** [[synthPpmGroupPayload]] with a GROUP-STRADDLING perturbation
    * (round-18, mm17): doc `id` bumps the two leftmost pixels of BOTH
    * rows `y ≡ id mod 4 (mod 4)` — i.e. rows r and r+4 with
    * r = id mod 4 — instead of one row. Each bump moves only cell 0
    * of its row, so a doc dirties at most gradient bit x=0 of exactly
    * rows {r, r+4}, and a within-group pair (r_a ≠ r_b) differs in
    * ≤ 4 bits spread over 4 DIFFERENT hash rows. The geometry is the
    * point: under the widened w=2 8-bit banding, the pair's dirty
    * rows hit contiguous groups {⌊r_a/2⌋, ⌊r_a/2⌋+2, ⌊r_b/2⌋,
    * ⌊r_b/2⌋+2} — ALL FOUR groups whenever one r is in {0,1} and the
    * other in {2,3}, so the single-table contiguous composition is
    * structurally BLIND to those pairs — while the strided
    * composition's group g = rows {g, g+4} is dirty only at
    * {r_a, r_b}, leaving ≥ 2 clean strided keys per pair. The
    * two-table path must therefore recover pairs the one-table path
    * cannot, making the strided concat load-bearing in the mm17
    * hash, not a no-op rider. Same md5 base, group size and PPM/PNG
    * format mix as the parent generator. */
  def synthPpmStraddlePayload(df: DataFrame, idCol: String,
                              width: Int = 18, height: Int = 8,
                              groupSize: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      var lastG = -1L
      var base: Array[Int] = null
      it.map { r =>
        val id = r.getLong(idIdx)
        val g = id / groupSize
        if (g != lastG || base == null) {
          base = Array.tabulate(3 * width * height) { j =>
            val dg = md.digest(s"$g:$j".getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
              ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
            (h % 251).toInt
          }
          lastG = g
        }
        val rd = (id % 4).toInt // dirty rows rd and rd + 4
        val data = new Array[Byte](3 * width * height)
        var j = 0
        while (j < data.length) {
          val p = j / 3
          val perturb =
            if ((p / width) % 4 == rd && p % width < 2) 97 else 0
          data(j) = ((base(j) + perturb) % 251).toByte
          j += 1
        }
        val payload =
          if (id % 2 == 0) Ppm.encode(Ppm.Image(width, height, 255, data))
          else Png.encode(width, height, 3, data, filter = (id % 5).toInt)
        Row(id, payload)
      }
    }(Encoders.row(schema))
  }

  /** dHash (difference hash) over REAL decoded pixels — the standard
    * perceptual fingerprint for image near-dup detection: decode the
    * payload (magic-dispatched [[Images.decodeAuto]] — P6 or PNG;
    * 3-channel rasters required), reduce to grayscale (per-pixel
    * channel sum — integer, no float pooling), box-downsample each row
    * pairwise to `width/2 = 9` cells, then bit (x, y) = 1 iff
    * cell x+1 > cell x — an 8×8 = 64-bit gradient signature that is
    * invariant to global brightness and contrast scaling. The 64 bits
    * are emitted as FOUR 16-bit bands (rows 2k and 2k+1 packed into
    * band k) ready for the d2/d3 banded-LSH join: near-dups agree on
    * most bands, so candidates surface from band-bucket equality and
    * only candidates ever pay a Hamming comparison. Narrow batched
    * pass; emits `(id, bands array<long>)` with 4 elements in
    * [0, 65536). Expects even `width` and even `height` with
    * `height = 8` semantics baked into the 4-band packing. */
  def dHashBands(df: DataFrame, idCol: String = "id",
                 payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("bands", ArrayType(LongType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val img = Images.decodeAuto(r.getAs[Array[Byte]](pIdx))
        require(img.channels == 3,
          s"dHash expects 3-channel rasters, got ${img.channels} (${img.format})")
        val w = img.width; val h = img.height
        val cw = w / 2 // pooled cells per row; bits per row = cw - 1
        val cells = new Array[Long](cw * h)
        var i = 0
        while (i < img.data.length) {
          val p = i / 3
          cells((p / w) * cw + (p % w) / 2) += img.data(i) & 0xff
          i += 1
        }
        val bands = new Array[Long](h / 2)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < cw - 1) {
            if (cells(y * cw + x + 1) > cells(y * cw + x))
              bands(y / 2) |= 1L << (x + (cw - 1) * (y % 2))
            x += 1
          }
          y += 1
        }
        Row(r.getLong(idIdx), bands.toSeq)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic PCM clip encoded as a REAL WAV payload (round-14):
    * sample i of key `id` is `((id·7 + i·13) mod 201) − 100` — a
    * signed integer waveform a second engine replays exactly — packed
    * by [[Wav.encode]] into a canonical RIFF container at 8 kHz.
    * Narrow batched pass; emits `(id, payload binary)`. */
  def synthWavPayload(df: DataFrame, idCol: String,
                      nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val samples = Array.tabulate(nSamples)(i =>
          (((id * 7 + i * 13) % 201) - 100).toShort)
        Row(id, Wav.encode(Wav.Clip(8000, samples)))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic wide-range PCM clip encoded as a REAL G.711 μ-law
    * WAV payload (round-15): sample i of key `id` is
    * `((id·131 + i·263) mod 60001) − 30000` — a signed waveform
    * spanning nearly the full 16-bit range, so the companding
    * exercises every exponent band and both signs — compressed by
    * [[Wav.encodeUlaw]] into a fmt-7 RIFF container at 8 kHz. The
    * encode is LOSSY (8-bit log quantization); the oracle replays the
    * compress→expand round trip closed-form, so any bit of the
    * companding tables being wrong hash-fails the features. Narrow
    * batched pass; emits `(id, payload binary)`. */
  def synthUlawPayload(df: DataFrame, idCol: String,
                       nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val samples = Array.tabulate(nSamples)(i =>
          (((id * 131 + i * 263) % 60001) - 30000).toShort)
        Row(id, Wav.encodeUlaw(Wav.Clip(8000, samples)))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic GROUPED WAV payload for the audio near-dup tier
    * (round-14, mm7): docs in the same group of `groupSize` share one
    * base waveform — the clip is 128 frames of 8 samples, every sample
    * of frame f holding the amplitude `md5("g:f")[0..3] mod 80 + 20`
    * (the portable-md5 idiom of [[synthPpmGroupPayload]]: a real hash,
    * because the fingerprint below is an energy-GRADIENT signature and
    * any closed-form amplitude curve leaves cross-group gradient
    * structure) — and each doc bumps ONLY its own frame `id mod 128`
    * by +17, which can flip at most the two energy-delta bits adjacent
    * to that frame. So within a group the fingerprints differ in ≤ 4
    * bits while different groups are unrelated bit strings — the
    * planted ground truth the banded-LSH recall argument needs,
    * replayed exactly by the oracle's md5. Payload is a REAL RIFF/WAVE
    * blob via [[Wav.encode]]. */
  def synthWavGroupPayload(df: DataFrame, idCol: String,
                           nFrames: Int = 128, frameLen: Int = 8,
                           groupSize: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      var lastG = -1L
      var base: Array[Int] = null
      it.map { r =>
        val id = r.getLong(idIdx)
        val g = id / groupSize
        if (g != lastG || base == null) {
          base = Array.tabulate(nFrames) { f =>
            val dg = md.digest(s"$g:$f".getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
              ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
            (h % 80).toInt + 20
          }
          lastG = g
        }
        val p = (id % nFrames).toInt
        val samples = Array.tabulate(nFrames * frameLen) { i =>
          val f = i / frameLen
          (base(f) + (if (f == p) 17 else 0)).toShort
        }
        Row(id, Wav.encode(Wav.Clip(8000, samples)))
      }
    }(Encoders.row(schema))
  }

  /** Audio fingerprint over REAL decoded samples — the energy-delta
    * signature (the Shazam/Chromaprint family reduced to its portable
    * core): decode the WAV ([[Wav.decode]]), integer frame energies
    * E_f = Σ v² over 8-sample frames, bit f = 1 iff E_{f+1} > E_f — a
    * 127-bit gradient string invariant to global gain scaling, emitted
    * as EIGHT 16-bit bands for the d2/d3 banded-LSH join (a ≤2-bit
    * adjacent perturbation touches at most 2 bands, so ≥ 6 bands stay
    * clean and candidates always surface from band equality; 16-bit
    * bands are the [[dHashBands]] width — 65536 buckets keep band
    * buckets group-sized as the corpus grows, the measured fix for
    * the quadratic bucket blow-up 8-bit bands showed at the sf1x
    * 50k-doc spot check). Narrow batched pass; emits
    * `(id, bands array<long>)` with 8 elements in [0, 65536). */
  def audioFingerprintBands(df: DataFrame, idCol: String = "id",
                            payloadCol: String = "payload",
                            frameLen: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("bands", ArrayType(LongType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val clip = Wav.decode(r.getAs[Array[Byte]](pIdx))
        val nFrames = clip.samples.length / frameLen
        val energy = new Array[Long](nFrames)
        var i = 0
        while (i < nFrames * frameLen) {
          val v = clip.samples(i).toLong
          energy(i / frameLen) += v * v
          i += 1
        }
        val bands = new Array[Long](8)
        // 8 bands × 16 bits = 127 delta bits max: longer clips
        // contribute only their first 128 frames (127 deltas) to the
        // signature — the fixed-length fingerprint contract; a cap of
        // 128 would set a 128th bit (index 127 in band 7's 16-bit
        // window is fine, but bit 127 of the DELTA string contradicts
        // the documented 127-bit / 8×16-band contract the oracle
        // replays with f < 127). Round-15 ADVICE fix.
        val nBits = math.min(nFrames - 1, 127)
        var f = 0
        while (f < nBits) {
          if (energy(f + 1) > energy(f))
            bands(f / 16) |= 1L << (f % 16)
          f += 1
        }
        Row(r.getLong(idIdx), bands.toSeq)
      }
    }(Encoders.row(schema))
  }

  /** REAL audio decode + signal features over a WAV payload column:
    * parse with [[Wav.decode]] (RIFF chunk walk — a parsing bug
    * changes every output), then per clip the sample count, rate,
    * mean |amplitude|, ZERO CROSSINGS (strict sign flips between
    * consecutive samples — the classic cheap pitch/noisiness proxy),
    * peak amplitude and the integer energy Σ v² — all closed-form in
    * the generator so the oracle replays them without touching a
    * byte. Narrow batched pass; emits `(id, n_samples, sample_rate,
    * mean_abs, zero_crossings, peak, energy)`. */
  def wavFeatures(df: DataFrame, idCol: String = "id",
                  payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_samples", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("mean_abs", DoubleType),
      StructField("zero_crossings", LongType),
      StructField("peak", IntegerType),
      StructField("energy", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val clip = Wav.decode(r.getAs[Array[Byte]](pIdx))
        var absSum = 0L; var zc = 0L; var peak = 0; var energy = 0L
        var i = 0
        while (i < clip.samples.length) {
          val v = clip.samples(i).toInt
          absSum += math.abs(v)
          energy += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && clip.samples(i - 1).toInt * v < 0) zc += 1
          i += 1
        }
        Row(r.getLong(idIdx), clip.samples.length, clip.sampleRate,
          absSum.toDouble / math.max(clip.samples.length, 1), zc, peak,
          energy)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic PCM clip compressed into a REAL FLAC payload
    * (round-17): sample i of key `id` is
    * `((id·7 + i·(13 + id mod 5)) mod 201) − 100` — the mm6 wrapping
    * ramp with an id-dependent slope, so every doc compresses to a
    * DIFFERENT size (slope moves the wrap count, hence the Rice
    * parameter and residual mass) — encoded by [[Flac.encode]] with
    * the oracle-replayable configuration: one 256-sample frame, FIXED
    * order 2, partition order 0, the deterministic Rice-k rule
    * ([[Flac.riceParam]]). Lossless, so the oracle replays the
    * DECODED samples as the closed form directly, and the encoder's
    * determinism lets it replay the COMPRESSED SIZE too. Narrow
    * batched pass; emits `(id, payload binary)`. */
  def synthFlacPayload(df: DataFrame, idCol: String,
                       nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val slope = 13 + (id % 5)
        val samples = Array.tabulate(nSamples)(i =>
          (((id * 7 + i * slope) % 201) - 100).toShort)
        Row(id, Flac.encode(Flac.Stream(8000, samples),
          blockSize = nSamples, forceOrder = Some(2)))
      }
    }(Encoders.row(schema))
  }

  /** Three signal families through the ADAPTIVE FLAC encoder
    * (round-17, mm15): family = id mod 3 —
    *
    *  - '''0: constant''' `c = (id mod 201) − 100` → the encoder must
    *    take the CONSTANT subframe (55-byte stream);
    *  - '''1: ramp''' (the mm13 waveform) → FIXED at the
    *    Σ|residual|-argmin order with the deterministic Rice k;
    *  - '''2: md5 noise''' `(md5("id:i")[0..7] mod 60001) − 30000`
    *    (full-range, incompressible — a REAL hash, portable to SQL
    *    like synthWavGroupPayload's) → Rice cannot beat raw and the
    *    encoder must fall back to VERBATIM (565 bytes).
    *
    * No forceOrder: this payload exists so the declared query puts the
    * encoder's whole DECISION TREE under hash — the oracle replays the
    * constant check, all five residual sums, the argmin (ties to the
    * lower order), the Rice-vs-raw comparison, and the three size
    * formulas as mutually exclusive CASE branches (the d14 idiom). */
  def synthFlacAdaptivePayload(df: DataFrame, idCol: String,
                               nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(idIdx)
        val samples = (id % 3).toInt match {
          case 0 =>
            Array.fill(nSamples)(((id % 201) - 100).toShort)
          case 1 =>
            val slope = 13 + (id % 5)
            Array.tabulate(nSamples)(i =>
              (((id * 7 + i * slope) % 201) - 100).toShort)
          case _ =>
            Array.tabulate(nSamples) { i =>
              val dg = md.digest(s"$id:$i".getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
              val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
                ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
              ((h % 60001) - 30000).toShort
            }
        }
        Row(id, Flac.encode(Flac.Stream(8000, samples),
          blockSize = nSamples))
      }
    }(Encoders.row(schema))
  }

  /** The mm13 waveform compressed through the QUANTIZED-LPC path
    * (round 18, mm16): [[Flac.encodeLpc]] with the pinned predictor
    * `pred_t = (3·x_{t−1} − x_{t−2}) >> shift`, coefficient precision
    * 4, and an ID-DEPENDENT shift `1 + id mod 2` — so both wire
    * shifts run and the oracle must replay the shift selection, the
    * floor-division prediction, the residual chain, the Rice-k ladder
    * and the 67-bit LPC header prefix to land the same
    * `encoded_bytes`. Wild FLAC is predominantly LPC; this payload
    * puts that decode path under the hash gate. Lossless, so decoded
    * samples remain the planted closed form. Narrow batched pass;
    * emits `(id, payload binary)`. */
  def synthFlacLpcPayload(df: DataFrame, idCol: String,
                          nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val slope = 13 + (id % 5)
        val samples = Array.tabulate(nSamples)(i =>
          (((id * 7 + i * slope) % 201) - 100).toShort)
        Row(id, Flac.encodeLpc(Flac.Stream(8000, samples),
          blockSize = nSamples, coefs = Array(3, -1),
          shift = 1 + (id % 2).toInt, precision = 4))
      }
    }(Encoders.row(schema))
  }

  /** Four signal families through the HYBRID fixed-vs-LPC encoder
    * (round-18, mm18): family = id mod 4 —
    *
    *  - '''0: constant''' → the CONSTANT subframe (55 bytes);
    *  - '''1: decaying exponential''' `100 + (b >> min(t,30))` with
    *    `b = 512·(25 + id mod 37)` — the recurrence
    *    x_t = (3x_{t−1} − x_{t−2}) >> 1 solves it (roots 1 and ½), so
    *    the pinned LPC predictor is near-exact and must WIN the
    *    argmin over all five fixed orders;
    *  - '''2: the mm13 wrapping ramp''' → a FIXED order wins (LPC's
    *    1.5x₁ − 0.5x₂ under-predicts a linear ramp by d/2 per step);
    *  - '''3: md5 noise''' → nothing compresses; VERBATIM (565 B).
    *
    * Every doc runs the UNPINNED hybrid search, so the declared query
    * puts the predictor-FAMILY decision under hash — the oracle
    * replays all six candidate residual sums, the fixed-first tie
    * rule, the chosen family's Rice chain, the LPC header surcharge
    * in the Rice-vs-raw fallback, and four mutually exclusive size
    * formulas. */
  def synthFlacHybridPayload(df: DataFrame, idCol: String,
                             nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(idIdx)
        val samples = (id % 4).toInt match {
          case 0 =>
            Array.fill(nSamples)(((id % 201) - 100).toShort)
          case 1 =>
            val b = 512 * (25 + (id % 37).toInt)
            Array.tabulate(nSamples)(t =>
              (100 + (b >> math.min(t, 30))).toShort)
          case 2 =>
            val slope = 13 + (id % 5)
            Array.tabulate(nSamples)(i =>
              (((id * 7 + i * slope) % 201) - 100).toShort)
          case _ =>
            Array.tabulate(nSamples) { i =>
              val dg = md.digest(s"$id:$i".getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
              val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
                ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
              ((h % 60001) - 30000).toShort
            }
        }
        Row(id, Flac.encodeHybrid(Flac.Stream(8000, samples),
          blockSize = nSamples, coefs = Array(3, -1), shift = 1,
          precision = 4))
      }
    }(Encoders.row(schema))
  }

  /** Low-amplitude waveforms padded into the 16-bit container — the
    * WASTED-BITS shape (round-19, mm19; RFC 9639 §9.2.2). Family
    * w = id mod 3 plants samples `(2·u_i + 1)·2^w` with
    * `u_i = ((id·7 + i·(13 + id mod 5)) mod 101) − 50`: every base
    * sample is ODD, so the block's common trailing-zero count is
    * EXACTLY w and the encoder (`detectWasted = true`) must strip it,
    * code the subframe at 16−w bits and declare k = w unary in the
    * header — the k = 0 family keeps the no-wasted branch
    * load-bearing. FIXED order 2 is pinned (mm13's oracle-replayable
    * configuration): the new thing under hash is the wasted-bits
    * detect/encode/decode and its size accounting (header grows by w
    * bits while the 2-sample warmup shrinks by 2w — net −w), not the
    * order search. Lossless, so decoded samples remain the planted
    * closed form. */
  def synthFlacWastedPayload(df: DataFrame, idCol: String,
                             nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val w = (id % 3).toInt
        val slope = 13 + (id % 5)
        val samples = Array.tabulate(nSamples) { i =>
          val u = ((id * 7 + i * slope) % 101) - 50
          ((2 * u + 1) << w).toShort
        }
        Row(id, Flac.encode(Flac.Stream(8000, samples),
          blockSize = nSamples, forceOrder = Some(2), detectWasted = true))
      }
    }(Encoders.row(schema))
  }

  /** [[wavFeatures]] for FLAC payloads, plus the compression columns:
    * parse with [[Flac.decode]] (CRC-verified Rice/fixed-predictor
    * decode — a single wrong bit anywhere changes every output), then
    * per stream the `encoded_bytes` (payload size — deterministic,
    * closed-form replayable: Flac scaladoc) and `ratio` vs raw 16-bit
    * PCM, and the waveform features over the DECODED samples — which
    * losslessness makes the planted closed form, so the oracle checks
    * the whole codec without touching a byte. Narrow batched pass. */
  def flacFeatures(df: DataFrame, idCol: String = "id",
                   payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_samples", IntegerType),
      StructField("encoded_bytes", IntegerType),
      StructField("ratio", DoubleType),
      StructField("mean_abs", DoubleType),
      StructField("peak", IntegerType),
      StructField("energy", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val s = Flac.decode(bytes)
        var absSum = 0L; var peak = 0; var energy = 0L
        var i = 0
        while (i < s.samples.length) {
          val v = s.samples(i).toInt
          absSum += math.abs(v)
          energy += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          i += 1
        }
        val n = s.samples.length
        Row(r.getLong(idIdx), n, bytes.length,
          bytes.length.toDouble / (2.0 * n),
          absSum.toDouble / math.max(n, 1), peak, energy)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic correlated STEREO clip compressed into a REAL
    * mid-side FLAC payload (round-17): left channel is the mm13 ramp
    * `L = ((id·7 + i·(13 + id mod 5)) mod 201) − 100`, right channel
    * is `L − d` with the small difference signal
    * `d = ((id·11 + i·3) mod 41) − 20` — exactly the inter-channel
    * correlation mid-side decorrelation exists for (the side channel
    * IS d, tiny; the mid channel rides the ramp). Encoded by
    * [[Flac.encodeStereo]] in the oracle-replayable configuration:
    * one 256-sample frame, mid-side assignment, FIXED order 2 on both
    * subframes, deterministic Rice k per channel. Emits
    * `(id, payload binary)`. */
  def synthFlacStereoPayload(df: DataFrame, idCol: String,
                             nSamples: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val slope = 13 + (id % 5)
        val left = Array.tabulate(nSamples)(i =>
          (((id * 7 + i * slope) % 201) - 100).toShort)
        val right = Array.tabulate(nSamples)(i =>
          (left(i) - (((id * 11 + i * 3) % 41) - 20)).toShort)
        Row(id, Flac.encodeStereo(Flac.StereoStream(8000, left, right),
          blockSize = nSamples, mode = "mid-side", forceOrder = Some(2)))
      }
    }(Encoders.row(schema))
  }

  /** [[flacFeatures]] for stereo payloads: full CRC-verified mid-side
    * decode back to L/R, per-channel waveform features plus the
    * compression columns — `encoded_bytes` again closed-form
    * replayable (two subframes, two Rice parameters; Flac scaladoc),
    * `ratio` vs raw interleaved 16-bit PCM (4 bytes per sample
    * frame). Narrow batched pass. */
  def flacStereoFeatures(df: DataFrame, idCol: String = "id",
                         payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_samples", IntegerType),
      StructField("encoded_bytes", IntegerType),
      StructField("ratio", DoubleType),
      StructField("mean_abs_l", DoubleType),
      StructField("mean_abs_r", DoubleType),
      StructField("energy_l", LongType),
      StructField("energy_r", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val st = Flac.decodeStereo(bytes)
        var absL = 0L; var absR = 0L; var enL = 0L; var enR = 0L
        var i = 0
        val n = st.left.length
        while (i < n) {
          val l = st.left(i).toInt
          val rr = st.right(i).toInt
          absL += math.abs(l); absR += math.abs(rr)
          enL += l.toLong * l; enR += rr.toLong * rr
          i += 1
        }
        Row(r.getLong(idIdx), n, bytes.length,
          bytes.length.toDouble / (4.0 * n),
          absL.toDouble / math.max(n, 1), absR.toDouble / math.max(n, 1),
          enL, enR)
      }
    }(Encoders.row(schema))
  }

  /** Batched feature extraction: one partition = one batch, iterator in /
    * iterator out (the mapInPandas shape). Appends `features
    * array<double>`. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val schema = df.schema.add("features", ArrayType(DoubleType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null
                    else r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeStub(bytes).toSeq)
      }
    }(Encoders.row(schema))
  }
}
