package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.plans.Checkpoints.SweepSyntax

/** Multimodal-column handling (SURVEY.md §2C): media as opaque `binary`
  * columns + typed metadata, with decode/feature-extraction as partition-wise
  * batch functions.
  *
  * Every decode path (`mm_decode_features`, `mm_resize`, `mm_frame_sample`)
  * runs a REAL pure-JVM image codec: `javax.imageio` BMP encode + decode
  * ([[MultimodalOps.BmpCodec]]) — only the pixel CONTENT is synthesized
  * (the container ships no media files; dims + fill color derive from the
  * payload hash, which is what lets a SQL oracle replay the expected pixel
  * statistics). Everything else — the binary column, the metadata struct
  * schema, the `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas`: one iterator in, one iterator out, schema declared up
  * front), the real raster scans/resampling, and the partitioning story —
  * is genuine and is exactly what a production pipeline points at its own
  * binary column, swapping only the BMP reader for a JNI/FFI video/audio
  * decoder.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Mod-prime polynomial over the payload bytes (unsigned), the same fold
    * as [[graft.functions.PolyHash]] — h is non-negative and < 2^31, so the
    * hash-derived synthesis arithmetic (dims, fill colors) is plain
    * positive-range div/mod that a DuckDB oracle replays exactly (shifts
    * stay below 31 bits). For ASCII payloads (the documents fixture is pure
    * ASCII, max codepoint 121) the byte fold equals PolyHash's codepoint
    * fold, so the oracle hashes the text column directly. */
  def contentHash(payload: Array[Byte]): Long = {
    val P = graft.functions.PolyHash.P
    val B = graft.functions.PolyHash.B
    var h = 0L
    var i = 0
    while (i < payload.length) { h = (h * B + (payload(i) & 0xff)) % P; i += 1 }
    h
  }

  /** Binary payload + metadata projection, no decode: the pure column-level
    * layer (what the reference's BYTEA/BLOB passthrough class becomes in
    * Spark). Oracle-checkable: byte length must equal DuckDB's octet_length
    * of the same utf-8 payload. */
  val mmMeta: Q = (s, d) =>
    Tables.load(s, d, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"), col("lang"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        struct(col("source"), col("lang")).as("meta"))
      .select(col("doc_id"), col("n_bytes"),
        col("meta.source").as("source"), col("meta.lang").as("lang"))
      .orderBy(col("doc_id"))

  /** REAL pure-JVM image codec behind the batch plumbing: BMP encode/decode
    * through `javax.imageio` (the JDK's built-in BMPImageReader — actual
    * header parsing + raster decode, not arithmetic on the payload hash).
    * The fixture carries no media, so the image BYTES are synthesized
    * deterministically (dims + fill color from the content hash — the one
    * permitted fake is the pixel CONTENT); everything after that is a
    * genuine bytes→pixels decode that a production pipeline points at its
    * real binary column unchanged. `setUseCache(false)` keeps ImageIO off
    * its disk-backed stream cache (a temp file per image would dominate). */
  object BmpCodec {
    import java.awt.image.BufferedImage
    def encode(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }
    /** Encode an 8×8-block-painted grayscale BMP: pixel (x, y) belongs to
      * block j = (y·8 DIV height)·8 + (x·8 DIV width) and carries gray
      * `vals(j)` on all three channels. The phash synthesis path: block
      * VALUES are the permitted fake (hash-derived), the raster is real. */
    def encodeBlocks(width: Int, height: Int, vals: Array[Int]): Array[Byte] = {
      require(width >= 8 && height >= 8 && vals.length == 64)
      val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        val by = y * 8 / height
        var x = 0
        while (x < width) {
          val v = vals(by * 8 + x * 8 / width) & 0xFF
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }

    /** Decode + full raster scan: per-channel sums and min/max over every
      * pixel. Returns (width, height, meanR, meanG, meanB, uniform). */
    def decodeStats(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Boolean) = {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var (mn, mx) = (0xFFFFFF, 0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y) & 0xFFFFFF
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          if (p < mn) mn = p
          if (p > mx) mx = p
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ((w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, mn == mx))
    }

    /** Full decode to an RGB raster: row-major packed 0xRRGGBB ints. */
    def decodeRaster(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xFFFFFF; x += 1 }
        y += 1
      }
      (w, h, px)
    }

    /** Real area-average downsample: output pixel (x, y) is the per-channel
      * integer mean of the input block [⌊x·w/ow⌋, ⌊(x+1)·w/ow⌋) ×
      * [⌊y·h/oh⌋, ⌊(y+1)·h/oh⌋) — the standard box filter. Integer mean of
      * identical values is that value, which is what lets a SQL oracle
      * predict the resized raster of a synthesized uniform fill exactly
      * while the engine still earns it by visiting every input pixel. */
    def resizeArea(w: Int, h: Int, px: Array[Int], ow: Int, oh: Int): Array[Int] = {
      val out = new Array[Int](ow * oh)
      var y = 0
      while (y < oh) {
        val y0 = y * h / oh
        val y1 = math.max(y0 + 1, (y + 1) * h / oh)
        var x = 0
        while (x < ow) {
          val x0 = x * w / ow
          val x1 = math.max(x0 + 1, (x + 1) * w / ow)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              val p = px(yy * w + xx)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              xx += 1
            }
            yy += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0)
          out(y * ow + x) =
            (((sr / n).toInt & 0xFF) << 16) | (((sg / n).toInt & 0xFF) << 8) |
              ((sb / n).toInt & 0xFF)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL pure-JVM audio codec behind the batch plumbing: canonical PCM
    * WAV encode + `javax.sound.sampled` decode (actual RIFF header parse +
    * frame extraction through the JDK's AudioSystem, not arithmetic on the
    * payload bytes) — the audio mirror of [[BmpCodec]]'s encode→decode
    * round trip. The fixture carries no media, so the SAMPLES are the
    * payload bytes (8-bit unsigned mono — the one permitted fake is the
    * sample content); everything after that is a genuine bytes→samples
    * decode a production pipeline points at its real audio column. */
  object WavCodec {
    val sampleRate = 16000f

    /** Wrap raw 8-bit unsigned mono samples in a canonical 44-byte
      * PCM RIFF/WAVE container. */
    def encode(samples: Array[Byte]): Array[Byte] = {
      val n = samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(sampleRate.toInt)          // sample rate
        .putInt(sampleRate.toInt)          // byte rate (1 byte/frame)
        .putShort(1)                       // block align
        .putShort(8)                       // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(n)
        .put(samples)
      bb.array()
    }

    /** The WAV `AudioFileReader` SPI provider, resolved ONCE per JVM.
      * `AudioSystem.getAudioInputStream` re-enters a global synchronized
      * provider lookup (JDK13Services) on EVERY call — measured: 50k docs
      * × 32 threads ran essentially serialized (7.5 s wall at sf1, 150 µs
      * per ~350-byte clip vs 64 µs uncontended). The provider instance
      * itself is stateless and thread-safe; calling it directly keeps the
      * identical real header parse + frame read without the lock. */
    private lazy val reader: javax.sound.sampled.spi.AudioFileReader = {
      import scala.jdk.CollectionConverters._
      val probe = encode(Array[Byte](1, 2, 3, 4))
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.find { r =>
          try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
          catch { case _: Exception => false }
        }.getOrElse(throw new IllegalStateException("no WAV AudioFileReader on this JVM"))
    }

    /** Decode through the real WAV reader: header parse, format check,
      * frame read. Returns the 8-bit unsigned samples. */
    def decode(wav: Array[Byte]): Array[Byte] = {
      val ais = reader.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          s"unexpected decoded format: $fmt")
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var r = ais.read(buf)
        while (r > 0) { out.write(buf, 0, r); r = ais.read(buf) }
        out.toByteArray
      } finally ais.close()
    }
  }

  /** Hash-derived synthesis parameters shared by every decode-path query:
    * dims 8–31 px, fill color from three hash bytes — the ONE permitted
    * fake (pixel content), identical to the [[mmDecodeFeatures]] scaladoc's
    * contract and replayed verbatim by each oracle's `dims` CTE. */
  private def synthBmp(payload: Array[Byte]): Array[Byte] = {
    val h = contentHash(payload)
    BmpCodec.encode(
      8 + (h % 24).toInt, 8 + ((h >> 5) % 24).toInt,
      (h % 256).toInt, ((h >> 8) % 256).toInt, ((h >> 16) % 256).toInt)
  }

  /** Block-painted synthesis for the phash path: same hash-derived dims as
    * [[synthBmp]], but each of the 8×8 grid blocks carries its OWN gray
    * level `v_j = ((h · (48271 + 2j)) mod P) mod 256` — a distinct odd
    * multiplier per block (an additive-j spelling makes adjacent values
    * deterministic complements). The block values are the permitted fake;
    * the raster, and the blockhash computed from it, are real. */
  private[operators] def synthBlockBmp(payload: Array[Byte]): Array[Byte] = {
    val h = contentHash(payload)
    val P = graft.functions.PolyHash.P
    val vals = Array.tabulate(64)(j => (((h * (48271L + 2 * j)) % P) % 256).toInt)
    BmpCodec.encodeBlocks(8 + (h % 24).toInt, 8 + ((h >> 5) % 24).toInt, vals)
  }

  /** Partition-wise batch decode + feature extraction over a binary image
    * column: the mapInPandas-shaped path, now through the REAL
    * [[BmpCodec]]. Stage 1 synthesizes the BMP payload (hash-derived dims
    * 8–31 px and fill color — bounded bytes/row); stage 2 ImageIO-decodes
    * every payload and reduces the raster to per-channel means + a
    * uniformity proof (min pixel == max pixel — true only if the decoder
    * actually visited every pixel of a correctly-parsed raster). Schema
    * declared up front; no collect, no per-row driver hops; at 100 TB this
    * is embarrassingly parallel and bounded by decode CPU. The synthesis
    * arithmetic is mod-prime on the content hash, so the DuckDB oracle
    * derives the same dims/colors and the expected feature norm in SQL —
    * the decode path is hash-gated end-to-end. The feature vector (channel
    * means / 255) stays an array inside the pipeline; the query surface
    * reduces it to dim + L2 norm because result comparison is column-wise
    * and cannot sort array cells. */
  val mmDecodeFeatures: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val imgSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("img", BinaryType, nullable = false)))
    val imgEnc = RowEncoder.encoderFor(imgSchema)
    val images = in.mapPartitions { rows =>
      rows.map { r => Row(r.getLong(0), synthBmp(r.getAs[Array[Byte]](1))) }
    }(imgEnc)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false),
      StructField("uniform", BooleanType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    images.mapPartitions { rows =>
      rows.map { r =>
        val (w, ht, mr, mg, mb, uni) = BmpCodec.decodeStats(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, ht, 3,
          Seq(mr.toFloat / 255f, mg.toFloat / 255f, mb.toFloat / 255f), uni)
      }
    }(enc)
      .select(col("doc_id"), col("width"), col("height"), col("n_channels"),
        size(col("feature")).as("feature_dim"),
        round(sqrt(aggregate(col("feature"), lit(0.0d),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))), 6)
          .as("feature_norm"),
        col("uniform"))
      .orderBy(col("doc_id"))
  }

  /** The resize box: fit each decoded image inside [[resizeBox]]² preserving
    * aspect ratio (synthesized dims are 8–31 px, so the box both passes
    * small rasters through and genuinely downsamples large ones). */
  val resizeBox = 16

  /** Batch resize through the REAL codec: ImageIO-decode the BMP payload,
    * box-filter downsample ([[BmpCodec.resizeArea]] — every input pixel
    * visited, per-channel integer means), then reduce the RESIZED raster to
    * its channel means, a Σ(r+g+b) checksum and a uniformity proof — the
    * statistics a SQL oracle can predict from the synthesis arithmetic, and
    * that the engine can only reproduce by actually decoding + resampling
    * real pixels (integer mean of a uniform fill is the fill, so any
    * decode/index bug in the resample breaks the hash). Same partition-wise
    * batch shape as [[mmDecodeFeatures]]; a production pipeline emits the
    * resized bytes as a binary column instead of the audit scalars. */
  val mmResize: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("out_mean_r", IntegerType, nullable = false),
      StructField("out_mean_g", IntegerType, nullable = false),
      StructField("out_mean_b", IntegerType, nullable = false),
      StructField("out_checksum", LongType, nullable = false),
      StructField("uniform", BooleanType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodeRaster(synthBmp(r.getAs[Array[Byte]](1)))
        val scale = math.min(1.0, resizeBox.toDouble / math.max(w, h))
        val ow = math.max(1, math.floor(w * scale).toInt)
        val oh = math.max(1, math.floor(h * scale).toInt)
        val out = BmpCodec.resizeArea(w, h, px, ow, oh)
        var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
        var mn = 0xFFFFFF; var mx = 0
        var i = 0
        while (i < out.length) {
          val p = out(i)
          val pr = (p >> 16) & 0xFF; val pg = (p >> 8) & 0xFF; val pb = p & 0xFF
          sr += pr; sg += pg; sb += pb; ck += pr + pg + pb
          if (p < mn) mn = p
          if (p > mx) mx = p
          i += 1
        }
        val n = out.length.toLong
        Row(r.getLong(0), w, h, ow, oh,
          (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, ck, mn == mx)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Sample every [[frameStride]]th frame of each decoded "clip". */
  val frameStride = 4

  /** Frame sampling through the REAL codec: decode the BMP raster, treat
    * each pixel ROW as one frame of a clip (nFrames = height — the
    * sub-raster-stride stand-in for a video container's frame table), take
    * every [[frameStride]]th frame and reduce each SAMPLED frame to its
    * real pixel sum Σ(r+g+b) over that row — computed by scanning the
    * decoded pixels, predicted by the oracle from the synthesis arithmetic.
    * The iterator-flatMap explode shape of a real frame sampler (rows out ≠
    * rows in, still fully partition-parallel, no driver hop); unsampled
    * frames are never scanned, which is the point of stride sampling. */
  val mmFrameSample: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, px) = BmpCodec.decodeRaster(synthBmp(r.getAs[Array[Byte]](1)))
        (0 until h by frameStride).iterator.map { f =>
          var sum = 0L
          var x = 0
          while (x < w) {
            val p = px(f * w + x)
            sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
            x += 1
          }
          Row(r.getLong(0), f, sum)
        }
      }
    }(enc).orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Audio analysis frame geometry: 400-sample windows every 160 samples —
    * the 25 ms / 10 ms convention at 16 kHz that speech front-ends
    * (MFCC/fbank, VAD) use. Only full windows count. */
  val audioFrameLen = 400
  val audioHop = 160

  /** Audio framing + energy through the REAL codec: the payload bytes are
    * wrapped in a canonical PCM WAV container and decoded back through
    * `javax.sound.sampled` ([[WavCodec]] — actual RIFF header parse +
    * AudioSystem frame read, the audio mirror of the BMP encode→decode
    * round trip; the sample CONTENT is the one permitted fake), then
    * everything downstream is the genuine speech-pipeline front half:
    * overlapping [[audioFrameLen]]/[[audioHop]] windows, per-frame energy
    * Σ (s−128)² in exact int64 (so partial order can't perturb it), and
    * per document the sample/frame counts, total and peak frame energy,
    * and the FIRST peak frame index (the VAD/diagnostics shape). One
    * map-side pass, one row out per row in, no shuffle before the final
    * order. Docs shorter than one window emit 0 frames with NULL peaks. */
  val mmAudioEnergy: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("energy_sum", LongType, nullable = false),
      StructField("energy_max", LongType, nullable = true),
      StructField("max_frame", IntegerType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        // real codec round trip: samples come back from the WAV decoder,
        // not straight off the payload — a header/format bug breaks the hash
        val b = WavCodec.decode(WavCodec.encode(r.getAs[Array[Byte]](1)))
        val n = b.length
        val nf = if (n >= audioFrameLen) (n - audioFrameLen) / audioHop + 1 else 0
        var total = 0L; var mx = -1L; var mi = -1
        var f = 0
        while (f < nf) {
          var e = 0L
          var i = f * audioHop
          val end = i + audioFrameLen
          while (i < end) {
            val sAmp = (b(i) & 0xff) - 128
            e += sAmp.toLong * sAmp
            i += 1
          }
          total += e
          if (e > mx) { mx = e; mi = f } // strict: FIRST peak frame wins
          f += 1
        }
        if (nf == 0) Row(r.getLong(0), n.toLong, 0L, 0L, null, null)
        else Row(r.getLong(0), n.toLong, nf.toLong, total, mx, mi)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** 64-bit blockhash of a DECODED raster — the standard average-hash
    * family: partition the image into the 8×8 block grid (block j =
    * by·8 + bx, bx = x·8 DIV w), per-block integer mean gray over the
    * actual pixels, bit j set iff 64·mean_j exceeds the sum of all 64
    * block means (i.e. mean_j > the average block mean, compared exactly
    * in integers — no float threshold). Every pixel is visited; a decode,
    * block-indexing or mean bug flips bits and breaks the driver hash.
    * On the [[synthBlockBmp]] fixture each block is uniform so mean_j
    * replays in the oracle as the synthesis value v_j — but only an
    * engine that really decodes and averages the raster reproduces it. */
  def blockhash64(w: Int, h: Int, px: Array[Int]): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        // gray raster: exact integer luma (r+g+b)/3 == the painted value
        sums(by * 8 + x * 8 / w) += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
        counts(by * 8 + x * 8 / w) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(j => sums(j) / counts(j))
    val total = means.sum
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (means(j) * 64 > total) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Perceptual-hash image dedup — the near-duplicate-image removal stage
    * of a multimodal curation pipeline (screenshot re-crops, re-encodes,
    * thumbnails). Pipeline: binary payload → block-painted BMP synthesis →
    * partition-wise REAL ImageIO decode → 64-bit [[blockhash64]] over the
    * pixel raster → the SAME banded-LSH machinery as text simhash
    * (16-bit chunk pigeonhole buckets → bounded candidate expansion →
    * exact hamming ≤ 3 verify). Per doc the stream carries one 8-byte
    * signature; no shuffle before the chunk-bucket exchange. The painted
    * raster varies only with payload CONTENT, so at fixture level the
    * detected class is exact payload copies — and the LSH plumbing
    * (banding, overflow anchor-stars, pair expansion, verify joins) plus
    * the decode→block-mean→bit path are exactly what a production
    * pipeline keeps. */
  val mmDedupPhash: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val sigSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(sigSchema)
    val sigs = in.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodeRaster(synthBlockBmp(r.getAs[Array[Byte]](1)))
        Row(r.getLong(0), blockhash64(w, h, px))
      }
    }(enc).sweepPin() // feeds banding + both verify joins
    val chunked = sigs.select(col("doc_id"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("phash"), c * 16).bitwiseAND(lit(65535L))): _*))
          .as(Seq("chunk", "h")))
      .select(struct(col("chunk"), col("h")).as("bucket"), col("doc_id"))
    val pairs = DedupOps.candidatePairs(chunked,
      DedupOps.anchorsSmall(s, d, "documents", keysPerDoc = 4))
    val sa = sigs.select(col("doc_id").as("a"), col("phash").as("pa"))
    val sb = sigs.select(col("doc_id").as("b"), col("phash").as("pb"))
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("a"), col("b"))
  }

  /** Scene-cut threshold on the |Δ raster-sum| between consecutive
    * frames — calibrated to the synthesized 8–31 px fill rasters, where
    * any real content change moves the sum by far more than this. */
  val sceneCutThreshold = 100000L

  /** Scene-cut detection over a per-source frame stream: each source's
    * documents, in doc_id order, stand in for the frames of one clip;
    * every frame is REALLY decoded (ImageIO BMP, the
    * [[mmDecodeFeatures]] path) and reduced to its exact int64 RGB
    * raster sum; a cut is a |Δsum| > [[sceneCutThreshold]] jump between
    * consecutive frames — the shot-boundary heuristic every video
    * curation pipeline runs before frame dedup (cuts decide which
    * frames are worth keeping). Output per source: frame count, cut
    * count, the largest jump and the cut rate (one float division).
    *
    * 100 TB shape: the decode+sum is one map-side `mapPartitions` batch
    * pass (a row per frame, no pixel data past the map side); the
    * consecutive-frame delta is ONE lag window keyed by source; the
    * aggregate is sources-bounded. */
  val mmSceneCut: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("raster_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val sums = in.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodeRaster(synthBmp(r.getAs[Array[Byte]](2)))
        var sum = 0L
        var i = 0
        while (i < w * h) {
          val p = px(i)
          sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
          i += 1
        }
        Row(r.getLong(0), r.getString(1), sum)
      }
    }(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    sums
      .withColumn("delta", abs(col("raster_sum") - lag(col("raster_sum"), 1).over(w)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > sceneCutThreshold, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(max(col("delta")), lit(0L)).as("max_delta"))
      .select(col("source"), col("n_frames"), col("n_cuts"), col("max_delta"),
        round(col("n_cuts").cast(DoubleType) /
          col("n_frames").cast(DoubleType), 6).as("cut_rate"))
      .orderBy(col("source"))
  }

  /** Corpus-wide luminance histogram over the REAL decoded rasters: every
    * image decodes through [[BmpCodec]], every pixel contributes its
    * BT.601 integer luma ((299·r + 587·g + 114·b) DIV 1000 — exact int64
    * arithmetic both engines), and each image lands in one of 8 luma
    * octaves (bucket = luma DIV 32) — the exposure-distribution audit a
    * vision-data pipeline runs before training (a spike in bucket 0 or 7
    * means crushed blacks / blown highlights). The per-image luma is the
    * full-raster pixel scan's min AND max (asserted equal — the uniform
    * proof that gates a genuine decode of every pixel, same contract as
    * [[mmDecodeFeatures]]); the histogram then aggregates images and
    * pixel volumes per bucket.
    *
    * 100 TB shape: embarrassingly parallel decode (mapPartitions batch
    * shape, schema up front), collapsed map-side to ≤8 bucket rows —
    * decode CPU is the only cost, nothing shuffles but the 8-row
    * aggregate. */
  val mmLumaHist: Q = (s, d) => {
    val in = Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("luma", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodeRaster(synthBmp(r.getAs[Array[Byte]](1)))
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val l = (299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) +
            114L * (p & 0xFF)) / 1000L
          if (l < mn) mn = l
          if (l > mx) mx = l
          i += 1
        }
        require(mn == mx, s"non-uniform raster for doc ${r.getLong(0)}")
        Row(r.getLong(0), mn, w.toLong * h)
      }
    }(enc)
      .groupBy(expr("luma DIV 32").as("bucket"))
      .agg(count(lit(1)).as("n_images"), sum(col("n_pixels")).as("n_pixels"),
        min(col("luma")).as("min_luma"), max(col("luma")).as("max_luma"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, Q] = Map(
    "mm_luma_hist" -> mmLumaHist,
    "mm_scene_cut" -> mmSceneCut,
    "mm_dedup_phash" -> mmDedupPhash,
    "mm_meta" -> mmMeta,
    "mm_decode_features" -> mmDecodeFeatures,
    "mm_resize" -> mmResize,
    "mm_frame_sample" -> mmFrameSample,
    "mm_audio_energy" -> mmAudioEnergy,
  )

  // The stub decoder is pure mod-prime arithmetic on the payload hash, and
  // the payload is the UTF-8 of `text` (pure-ASCII fixture), so each oracle
  // recomputes contentHash via the PolyHash DuckDB replay and derives the
  // same dims/frames/features in SQL.
  private def hashCte: String =
    s"WITH h AS (SELECT doc_id, ${graft.functions.PolyHash.duckSql("text")} AS h FROM documents)"

  val oracle: Map[String, String] = Map(
    "mm_scene_cut" ->
      s"""$hashCte,
         dims AS (SELECT doc_id, 8 + h % 24 AS w, 8 + (h >> 5) % 24 AS ht,
                    h % 256 AS r, (h >> 8) % 256 AS g, (h >> 16) % 256 AS b
                  FROM h),
         sums AS (SELECT d.doc_id, doc.source,
                    CAST(w * ht * (r + g + b) AS BIGINT) AS raster_sum
                  FROM dims d JOIN documents doc ON doc.doc_id = d.doc_id),
         dl AS (SELECT source, raster_sum,
                  abs(raster_sum - LAG(raster_sum, 1) OVER (
                    PARTITION BY source ORDER BY doc_id)) AS delta
                FROM sums)
         SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(*) FILTER (WHERE delta > $sceneCutThreshold)
             AS BIGINT) AS n_cuts,
           CAST(COALESCE(MAX(delta), 0) AS BIGINT) AS max_delta,
           round(CAST(COUNT(*) FILTER (WHERE delta > $sceneCutThreshold)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS cut_rate
         FROM dl GROUP BY source ORDER BY source""",
    "mm_dedup_phash" -> {
      val P = graft.functions.PolyHash.P
      val mb = DedupOps.maxBucket
      s"""$hashCte,
         -- block j's painted gray v_j; the engine's decoded per-block mean
         -- equals it (uniform block), and the blockhash bit is the exact
         -- integer compare 64*v_j > sum of all block means
         vals AS (SELECT doc_id, j, ((h * (48271 + 2 * j)) % $P) % 256 AS v
                  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS j) bitsrc),
         bits AS (SELECT doc_id, j,
                    CASE WHEN 64 * v > SUM(v) OVER (PARTITION BY doc_id)
                         THEN 1 ELSE 0 END AS bit
                  FROM vals),
         chunks AS (SELECT doc_id, j // 16 AS chunk,
                      (SUM(bit << (j % 16)))::BIGINT AS ch
                    FROM bits GROUP BY doc_id, j // 16),
         docsig AS (SELECT doc_id,
                      MAX(CASE WHEN chunk = 0 THEN ch END) AS c0,
                      MAX(CASE WHEN chunk = 1 THEN ch END) AS c1,
                      MAX(CASE WHEN chunk = 2 THEN ch END) AS c2,
                      MAX(CASE WHEN chunk = 3 THEN ch END) AS c3
                    FROM chunks GROUP BY doc_id),
         bsize AS (SELECT chunk, ch, COUNT(*) AS n, MIN(doc_id) AS anchor
                   FROM chunks GROUP BY chunk, ch),
         cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                  FROM chunks x JOIN chunks y
                    ON x.chunk = y.chunk AND x.ch = y.ch AND x.doc_id < y.doc_id
                  JOIN bsize s ON s.chunk = x.chunk AND s.ch = x.ch
                  WHERE s.n BETWEEN 2 AND $mb
                  UNION
                  SELECT s.anchor AS a, m.doc_id AS b
                  FROM chunks m JOIN bsize s ON s.chunk = m.chunk AND s.ch = m.ch
                  WHERE s.n > $mb AND m.doc_id <> s.anchor),
         ham AS (SELECT c.a, c.b,
                   (bit_count(xor(xa.c0, xb.c0)) + bit_count(xor(xa.c1, xb.c1)) +
                    bit_count(xor(xa.c2, xb.c2)) + bit_count(xor(xa.c3, xb.c3)))::BIGINT
                     AS hamming
                 FROM cand c JOIN docsig xa ON xa.doc_id = c.a
                             JOIN docsig xb ON xb.doc_id = c.b)
         SELECT a, b, hamming FROM ham WHERE hamming <= 3 ORDER BY a, b"""
    },
    "mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         source, lang
         FROM documents ORDER BY doc_id""",
    // Replays the payload SYNTHESIS arithmetic (dims + fill color from the
    // content hash) and the expected feature norm; the Spark side only gets
    // there by actually encoding the BMP and ImageIO-decoding it back, with
    // `uniform` pinning a full-raster scan — so a decode bug breaks the hash.
    // Replays the synthesis arithmetic for the fill color's BT.601 integer
    // luma; the Spark side only gets there by decoding every raster and
    // scanning every pixel (min==max gate inside the operator).
    "mm_luma_hist" ->
      s"""$hashCte,
         img AS (
           SELECT doc_id,
             (299 * (h % 256) + 587 * ((h >> 8) % 256)
               + 114 * ((h >> 16) % 256)) // 1000 AS luma,
             CAST((8 + h % 24) * (8 + (h >> 5) % 24) AS BIGINT) AS n_pixels
           FROM h)
         SELECT luma // 32 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(n_pixels) AS BIGINT) AS n_pixels,
           CAST(MIN(luma) AS BIGINT) AS min_luma,
           CAST(MAX(luma) AS BIGINT) AS max_luma
         FROM img GROUP BY 1 ORDER BY bucket""",
    "mm_decode_features" ->
      s"""$hashCte
         SELECT doc_id,
           CAST(8 + h % 24 AS INT) AS width,
           CAST(8 + (h >> 5) % 24 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(3 AS INT) AS feature_dim,
           ROUND(SQRT(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             [CAST(CAST(h % 256 AS FLOAT) / CAST(255 AS FLOAT) AS DOUBLE),
              CAST(CAST((h >> 8) % 256 AS FLOAT) / CAST(255 AS FLOAT) AS DOUBLE),
              CAST(CAST((h >> 16) % 256 AS FLOAT) / CAST(255 AS FLOAT) AS DOUBLE)]),
             (a, x) -> a + x * x)), 6) AS feature_norm,
           true AS uniform
         FROM h ORDER BY doc_id""",
    // Replays the synthesis arithmetic (dims + fill color) and predicts the
    // RESIZED raster's statistics — integer box-filter mean of a uniform
    // fill is the fill, so the channel means/checksum/uniform columns gate
    // a real decode + full resample on the engine side. The ow/oh float
    // arithmetic is the identical op sequence (one divide, one multiply,
    // floor) so IEEE doubles agree bit-for-bit.
    "mm_resize" ->
      s"""$hashCte,
         dims AS (SELECT doc_id, 8 + h % 24 AS w, 8 + (h >> 5) % 24 AS ht,
                    h % 256 AS r, (h >> 8) % 256 AS g, (h >> 16) % 256 AS b
                  FROM h),
         sc AS (SELECT doc_id, w, ht, r, g, b,
                  LEAST(CAST(1 AS DOUBLE),
                        CAST($resizeBox AS DOUBLE) / GREATEST(w, ht)) AS scale
                FROM dims),
         rz AS (SELECT doc_id, w, ht, r, g, b,
                  GREATEST(1, CAST(FLOOR(w * scale) AS BIGINT)) AS ow,
                  GREATEST(1, CAST(FLOOR(ht * scale) AS BIGINT)) AS oh
                FROM sc)
         SELECT doc_id, CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
           CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
           CAST(r AS INT) AS out_mean_r, CAST(g AS INT) AS out_mean_g,
           CAST(b AS INT) AS out_mean_b,
           CAST(ow * oh * (r + g + b) AS BIGINT) AS out_checksum,
           true AS uniform
         FROM rz ORDER BY doc_id""",
    // One frame per raster row, every frameStride-th sampled; the frame sum
    // of a uniform row is width · (r+g+b) — the engine earns it by scanning
    // the decoded row's pixels.
    "mm_frame_sample" ->
      s"""$hashCte,
         dims AS (SELECT doc_id, 8 + h % 24 AS w, 8 + (h >> 5) % 24 AS ht,
                    h % 256 AS r, (h >> 8) % 256 AS g, (h >> 16) % 256 AS b
                  FROM h),
         f AS (SELECT doc_id, w, r, g, b,
                 unnest(range(0, ht, $frameStride)) AS i
               FROM dims)
         SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(w * (r + g + b) AS BIGINT) AS frame_sum
         FROM f ORDER BY doc_id, frame_idx""",
    // payload bytes = ASCII codepoints, so the framing replays from text
    "mm_audio_energy" ->
      s"""WITH sm AS (
           SELECT doc_id, len(text) AS n,
             [unicode(text[i]) - 128 FOR i IN range(1, len(text) + 1)] AS v,
             CASE WHEN len(text) >= $audioFrameLen
                  THEN (len(text) - $audioFrameLen) // $audioHop + 1
                  ELSE 0 END AS nf
           FROM documents),
         fr AS (
           SELECT doc_id, unnest(range(0, nf)) AS f, v FROM sm),
         en AS (
           SELECT doc_id, f,
             list_sum([v[i] * v[i]
               FOR i IN range(f * $audioHop + 1,
                              f * $audioHop + $audioFrameLen + 1)]) AS e
           FROM fr),
         en2 AS (
           SELECT doc_id, f, e, MAX(e) OVER (PARTITION BY doc_id) AS me
           FROM en)
         SELECT sm.doc_id, CAST(sm.n AS BIGINT) AS n_samples,
           CAST(sm.nf AS BIGINT) AS n_frames,
           CAST(COALESCE(SUM(en2.e), 0) AS BIGINT) AS energy_sum,
           CAST(MAX(en2.e) AS BIGINT) AS energy_max,
           CAST(MIN(CASE WHEN en2.e = en2.me THEN en2.f END) AS INT) AS max_frame
         FROM sm LEFT JOIN en2 ON en2.doc_id = sm.doc_id
         GROUP BY sm.doc_id, sm.n, sm.nf
         ORDER BY sm.doc_id""",
  )
}
