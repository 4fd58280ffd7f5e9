package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media travel as
  * opaque `binary` columns with typed metadata alongside — the layout
  * a 100 TB training-data pipeline uses (blob + metadata in parquet,
  * column pruning keeps metadata-only queries from ever touching the
  * bytes).
  *
  * The Spark-side plumbing here is real and tested: schemas, typed
  * mapPartitions batching, native header/frame expressions that stay
  * in whole-stage codegen. ALL THREE codecs are real JDK codecs
  * (round 14 — FakeCodec retired): PNG via `javax.imageio`
  * ([[JdkImageCodec]]), RIFF/WAVE via `javax.sound.sampled`
  * ([[JdkAudioCodec]]), and VIDEO as the [[JdkGifCodec]] animated
  * GIF89a, written AND parsed by `javax.imageio` — a real public
  * container format (round 15; the bespoke length-prefixed layout is
  * gone), and q_multimodal_video / q_video_shots oracle-check the
  * full encode→decode roundtrip against the pixel formula.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  case class DecodedMeta(media_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, checksum: Long)
  case class MediaFeatures(media_id: Long, histogram: Array[Long])

  /** Real JDK image codec — PNG encode/decode via `javax.imageio`
    * (ships in the JDK, no extra jars) plus a `Graphics2D` resize.
    * Pixels are losslessly round-trippable through PNG, so decoded
    * values can be oracled against the generator formula exactly.
    * Everything here is executor-side and headless-safe
    * ([[java.awt.image.BufferedImage]] needs no display toolkit). */
  object JdkImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Deterministic grayscale test image: pixel (x, y) of image `id`
      * has value (id·31 + x·7 + y·13) mod 256 in all three channels. */
    def encodePng(id: Long, width: Int, height: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Nearest-neighbor thumbnail resize over the DECODED raster —
      * the sample index is pure integer center-point math
      * (sx = (2·tx+1)·w div 2·tw), NOT Graphics2D interpolation, so
      * the thumbnail is engine-portable and SQL-replayable from the
      * pixel formula. Returns (Σ pixel, Σ pixel·position) over the
      * tw×th thumbnail — the two exact sums that pin content and
      * layout. */
    def resizeNearest(png: Array[Byte], tw: Int, th: Int): (Long, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var wsum = 0L
      var ty = 0
      while (ty < th) {
        val sy = (2 * ty + 1) * h / (2 * th)
        var tx = 0
        while (tx < tw) {
          val sx = (2 * tx + 1) * w / (2 * tw)
          val v = (img.getRGB(sx, sy) & 0xff).toLong
          sum += v
          wsum += v * (ty * tw + tx + 1)
          tx += 1
        }
        ty += 1
      }
      (sum, wsum)
    }

    /** Decode → (width, height, sum of blue-channel pixel values). */
    def decode(png: Array[Byte]): (Int, Int, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += (img.getRGB(x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      (img.getWidth, img.getHeight, sum)
    }

    /** Block-mean perceptual hash (aHash) over the decoded pixels:
      * the image is partitioned into an 8×8 grid by integer index
      * math (bx = x·8 div w), and bit b is set when block b's mean
      * exceeds the global mean — compared CROSS-MULTIPLIED
      * (blockSum·totalCount > totalSum·blockCount) so the whole hash
      * is exact integer arithmetic: engine-portable, replayable in
      * SQL from the pixel formula, and robust to the ±1-pixel noise
      * that breaks exact/byte hashes (the image near-dup key). */
    def aHash64(png: Array[Byte]): Long = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val w = img.getWidth
      val h = img.getHeight
      val bs = new Array[Long](64)
      val bc = new Array[Long](64)
      var ts = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (img.getRGB(x, y) & 0xff).toLong
          val b = (y * 8 / h) * 8 + (x * 8 / w)
          bs(b) += v
          bc(b) += 1
          ts += v
          x += 1
        }
        y += 1
      }
      val tc = w.toLong * h
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (bs(b) * tc > ts * bc(b)) hash |= (1L << b)
        b += 1
      }
      hash
    }

    /** Difference hash (dHash) from the decoded PNG: the image is
      * partitioned into a 9-wide × 8-tall grid, and bit r·8+c is set
      * when block (r,c)'s mean exceeds its RIGHT neighbor's —
      * gradient-based, so it survives the global brightness shifts
      * that flip every [[aHash64]] bit at once. Means compare
      * CROSS-MULTIPLIED (sumL·cntR > sumR·cntL): exact integer
      * arithmetic end-to-end, replayable in SQL from the pixel
      * formula. */
    def dHash64(png: Array[Byte]): Long = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val w = img.getWidth
      val h = img.getHeight
      val bs = Array.ofDim[Long](8, 9)
      val bc = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (img.getRGB(x, y) & 0xff).toLong
          val r = y * 8 / h
          val c = x * 9 / w
          bs(r)(c) += v
          bc(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (bs(r)(c) * bc(r)(c + 1) > bs(r)(c + 1) * bc(r)(c))
            hash |= (1L << (r * 8 + c))
          c += 1
        }
        r += 1
      }
      hash
    }

    /** Single-component (luma-only) baseline JPEG of the deterministic
      * grayscale test image (VERDICT r15 #7 — the one dominant public
      * image format the tier lacked, and the LOSSY decode a real
      * crawl-corpus near-dup miner must tolerate). Built straight on a
      * TYPE_BYTE_GRAY raster via `setSample` — `setRGB` would route
      * through the linear-gray↔sRGB colorspace conversion and the
      * encoder input would no longer be the generator formula. Quality
      * pinned EXPLICITLY at 0.90 (default-quality drift across JDK
      * builds would silently move the noise envelope the stability
      * contract is calibrated against). MemoryCacheImageOutputStream:
      * ImageIO's default stream cache is a temp FILE per call (the
      * r15 GIF lesson — 4.7× on encode sweeps). */
    def encodeJpeg(id: Long, width: Int, height: Int): Array[Byte] = {
      val img = new BufferedImage(width, height,
        BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          r.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val w = ImageIO.getImageWritersByFormatName("jpg").next()
      try {
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.90f)
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { w.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Decode a baseline JPEG and compute, over the RASTER samples
      * (band 0 — `getRGB` on a gray raster would colorspace-convert),
      * the decoded dims, both perceptual hashes, and Σ|decoded −
      * expected| against the generator formula. Dims survive the
      * lossy codec exactly (oracle-replayable); the hashes and the
      * luma error feed the STABILITY contract — JPEG's DCT noise
      * (≤ 2 flipped aHash bits, ≤ 1 dHash bit, MAE < 3 at q=0.90
      * across the full 2304-image fixture cycle, probed r16) must
      * stay inside the pinned tolerances or the hash gate breaks. */
    def decodeJpegStats(id: Long, jpeg: Array[Byte])
        : (Int, Int, Long, Long, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(jpeg))
      val w = img.getWidth
      val h = img.getHeight
      val r = img.getRaster
      val bs = new Array[Long](64)
      val bc = new Array[Long](64)
      val ds = Array.ofDim[Long](8, 9)
      val dc = Array.ofDim[Long](8, 9)
      var ts = 0L
      var err = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = r.getSample(x, y, 0).toLong
          err += math.abs(v - (id * 31 + x * 7 + y * 13) % 256)
          val b = (y * 8 / h) * 8 + (x * 8 / w)
          bs(b) += v; bc(b) += 1; ts += v
          ds(y * 8 / h)(x * 9 / w) += v
          dc(y * 8 / h)(x * 9 / w) += 1
          x += 1
        }
        y += 1
      }
      val tc = w.toLong * h
      var ah = 0L
      var b = 0
      while (b < 64) {
        if (bs(b) * tc > ts * bc(b)) ah |= (1L << b)
        b += 1
      }
      var dh = 0L
      var rr = 0
      while (rr < 8) {
        var c = 0
        while (c < 8) {
          if (ds(rr)(c) * dc(rr)(c + 1) > ds(rr)(c + 1) * dc(rr)(c))
            dh |= (1L << (rr * 8 + c))
          c += 1
        }
        rr += 1
      }
      (w, h, ah, dh, err)
    }

    /** Real image resize (area-averaging scale), re-encoded as PNG. */
    def resize(png: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1)
      val src = ImageIO.read(new ByteArrayInputStream(png))
      val w2 = math.max(1, src.getWidth / factor)
      val h2 = math.max(1, src.getHeight / factor)
      val dst = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(
        src.getScaledInstance(w2, h2, java.awt.Image.SCALE_AREA_AVERAGING),
        0, 0, null)
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Real JDK audio codec — PCM WAV encode/decode via
    * `javax.sound.sampled` (ships in the JDK, no extra jars,
    * headless-safe). 16-bit mono little-endian PCM round-trips
    * losslessly through the canonical 44-byte RIFF/WAVE container, so
    * decoded samples can be oracled against the generator formula
    * exactly — the same contract as [[JdkImageCodec]] for PNG. */
  object JdkAudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Deterministic test signal: sample i of clip `id` is
      * (((id·31 + i·7) mod 2003) − 1001) · 16 — full 16-bit range,
      * sign-alternating, reproducible in SQL. */
    def sampleAt(id: Long, i: Int): Int =
      ((((id * 31 + i * 7) % 2003) - 1001) * 16).toInt

    def encodeWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = sampleAt(id, i)
        pcm(2 * i) = (s & 0xff).toByte        // little-endian
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
        /*signed=*/ true, /*bigEndian=*/ false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Amplitude-envelope fingerprint over the decoded samples — the
      * audio sibling of [[JdkImageCodec.aHash64]]: samples split into
      * 32 windows by integer index math (wi = i·32 div n), bit w set
      * when window w's mean |amplitude| exceeds the clip mean,
      * compared cross-multiplied so the hash is exact integer
      * arithmetic — robust to per-sample dither, SQL-replayable. */
    def envHash32(wav: Array[Byte]): Long = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val ws = new Array[Long](32)
      val wc = new Array[Long](32)
      var ts = 0L
      var i = 0
      while (i < n) {
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        val a = math.abs(s.toLong)
        val w = i * 32 / n
        ws(w) += a
        wc(w) += 1
        ts += a
        i += 1
      }
      var hash = 0L
      var w = 0
      while (w < 32) {
        if (ws(w) * n > ts * wc(w)) hash |= (1L << w)
        w += 1
      }
      hash
    }

    /** VAD-style voiced-segment stats over the DECODED samples: fixed
      * 25-sample windows, a window is "voiced" when its mean
      * |amplitude| exceeds the clip mean — compared cross-multiplied
      * (windowSum·n > totalSum·windowCount, the same exact-integer
      * form as [[envHash32]]), so the segmentation is SQL-replayable.
      * Returns (nWindows, nVoiced, longest consecutive voiced run) —
      * the speech-detection accounting an audio curation pipeline
      * runs before keeping a clip. */
    def voicedSegments(wav: Array[Byte],
        windowLen: Int = 25): (Long, Long, Long) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val nW = (n + windowLen - 1) / windowLen
      val ws = new Array[Long](nW)
      val wc = new Array[Long](nW)
      var ts = 0L
      var i = 0
      while (i < n) {
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        val a = math.abs(s.toLong)
        val w = i / windowLen
        ws(w) += a; wc(w) += 1; ts += a
        i += 1
      }
      var voiced = 0L
      var longest = 0L
      var run = 0L
      var w = 0
      while (w < nW) {
        if (ws(w) * n > ts * wc(w)) {
          voiced += 1; run += 1
          if (run > longest) longest = run
        } else run = 0
        w += 1
      }
      (nW.toLong, voiced, longest)
    }

    /** Decode → (sampleRate, nSamples, Σ|sample|). */
    def decodeWav(wav: Array[Byte]): (Int, Long, Long) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      val n = ais.getFrameLength
      val bytes = ais.readAllBytes()
      var sum = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
        sum += math.abs(s.toLong)
        i += 2
      }
      (fmt.getSampleRate.toInt, n, sum)
    }
  }

  /** Multi-frame VIDEO through a real PUBLIC container format
    * (VERDICT r14 #6 — the bespoke SyntheticVideo length-prefixed
    * layout is deleted): animated GIF89a written and read by
    * `javax.imageio`, zero new dependencies. The container walk is
    * now a public-format parser — signature, logical screen
    * descriptor, per-frame image descriptors, LZW rasters — not our
    * own framing. Frames are TYPE_BYTE_GRAY: a 256-entry GIF palette
    * holds every gray level, so the encode→decode roundtrip is
    * pixel-lossless (MultimodalSpec asserts it), which is what lets
    * the oracles recompute exact pixel sums from the generator
    * formula. Frame f of video `id` keeps the r14 formula — pixel p
    * value (id·131 + f·17 + p·7) mod 256 — so q_multimodal_video's
    * oracle is unchanged across the container swap. */
  object JdkGifCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    /** The r14 generator formula (p = y·width + x). */
    def defaultPixel(id: Long, f: Int, p: Int): Int =
      ((id * 131 + f * 17 + p * 7) % 256).toInt

    def frameImage(id: Long, f: Int, width: Int, height: Int,
        pixel: (Long, Int, Int) => Int = defaultPixel): BufferedImage = {
      val img = new BufferedImage(width, height,
        BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.getRaster.setSample(x, y, 0, pixel(id, f, y * width + x))
          x += 1
        }
        y += 1
      }
      img
    }

    /** Animated-GIF encode of arbitrary frames (one writer sequence,
      * full-size frames — no partial-rect optimization, so every
      * `read(i)` returns a complete raster). */
    def encodeImages(frames: Seq[BufferedImage]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      // memory-cached stream: ImageIO.createImageOutputStream defaults
      // to a TEMP-FILE cache — one disk file per video turned the
      // sf0.1 encode sweep into I/O (6.7 s vs 1.4 s in-memory)
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img =>
        writer.writeToSequence(new IIOImage(img, null, null), null))
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      bos.toByteArray
    }

    def encode(id: Long, width: Int, height: Int, nFrames: Int,
        pixel: (Long, Int, Int) => Int = defaultPixel): Array[Byte] =
      encodeImages((0 until nFrames)
        .map(frameImage(id, _, width, height, pixel)))

    /** REAL codec decode: `ImageReader` over the GIF sequence. */
    def decodeImages(b: Array[Byte]): Seq[BufferedImage] = {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput( // memory-cached for the same reason as encode
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(b)))
      try (0 until reader.getNumImages(true)).map(reader.read)
      finally reader.dispose()
    }

    /** Per-frame (frame_idx, width, height, pixel sum). */
    def decodeFrames(b: Array[Byte]): Seq[(Int, Int, Int, Long)] =
      decodeImages(b).zipWithIndex.map { case (img, f) =>
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += (img.getRGB(x, y) & 0xff)
            x += 1
          }
          y += 1
        }
        (f, img.getWidth, img.getHeight, sum)
      }
  }

  /** Audio header/meta conventions for [[synthetic]]/[[decodeMeta]]:
    * the 8-byte header's (width, height) slots carry
    * (n_samples, sampleRate/1000) for WAV rows, so [[headerMeta]]'s
    * native parse stays kind-agnostic and cross-checkable against the
    * real decoder. */
  val AudioRateKhz = 8

  private def be32Of(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def withHeader(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    def put32(o: Int, v: Int): Unit = {
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
    }
    put32(0, w); put32(4, h)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** Deterministic synthetic media table (generator for tests/demos):
    * 8-byte dims header + a REAL payload per kind — a `javax.imageio`
    * PNG, a `javax.sound` WAV, or a [[JdkGifCodec]] animated-GIF
    * container — so every downstream decode is a real codec. */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val width = 16 + (id % 16).toInt
      val height = 9 + (id % 9).toInt
      id % 3 match {
        case 0 => MediaRow(id, "image",
          withHeader(width, height, JdkImageCodec.encodePng(id, width, height)))
        case 1 =>
          val nSamples = 120 + (id % 50).toInt
          MediaRow(id, "audio", withHeader(nSamples, AudioRateKhz,
            JdkAudioCodec.encodeWav(id, nSamples, AudioRateKhz * 1000)))
        case _ =>
          val nf = 2 + (id % 3).toInt
          MediaRow(id, "video",
            JdkGifCodec.encode(id, width, height, nf))
      }
    }
  }

  /** Decode via the REAL codec for each kind (`javax.imageio` for
    * image and per-frame video, `javax.sound` for audio), batched per
    * partition (the shape a real vectorized decoder wants: one codec
    * init per partition, streamed rows — the Scala analogue of a
    * pandas-batch UDF). width/height carry (n_samples, kHz) for
    * audio; checksum is the decoded-content sum (pixels, |samples|,
    * or per-frame pixel sums) — a CODEC-path fingerprint, not a byte
    * CRC. */
  def decodeMeta(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen here, once per partition
      it.map { row =>
        val b = row.media
        row.kind match {
          case "image" =>
            val (w, h, sum) = JdkImageCodec.decode(b.drop(8))
            DecodedMeta(row.media_id, row.kind, w, h, b.length.toLong, sum)
          case "audio" =>
            val (rate, nSamples, sumAbs) = JdkAudioCodec.decodeWav(b.drop(8))
            DecodedMeta(row.media_id, row.kind, nSamples.toInt,
              rate / 1000, b.length.toLong, sumAbs)
          case _ =>
            val frames = JdkGifCodec.decodeFrames(b)
            DecodedMeta(row.media_id, row.kind,
              frames.head._2, frames.head._3, b.length.toLong,
              frames.map(_._4).sum)
        }
      }
    }
  }

  /** Byte-histogram features (16 buckets) — stand-in for an embedding
    * extractor; same per-partition batching. */
  def byteHistogram(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val hist = new Array[Long](16)
        var i = 8
        while (i < row.media.length) {
          hist((row.media(i) & 0xff) >>> 4) += 1
          i += 1
        }
        MediaFeatures(row.media_id, hist)
      }
    }
  }

  /** Header metadata WITHOUT decoding — pure native expressions
    * (substring/hex/conv on the binary column stay in codegen and let
    * Catalyst prune the blob for metadata-only queries downstream).
    * Video rows carry a raw GIF, so their dims come from the PUBLIC
    * container layout: the logical screen descriptor's
    * LITTLE-endian uint16 pair right after the 6-byte "GIF89a"
    * signature (bytes 7-8 width, 9-10 height, 1-indexed) — a real
    * format parse, not our own framing. */
  def headerMeta(media: DataFrame): DataFrame = {
    def be32(off: Int) =
      conv(hex(substring(col("media"), off, 4)), 16, 10).cast("int")
    def le16(off: Int) =
      (conv(hex(substring(col("media"), off + 1, 1)), 16, 10) * 256 +
        conv(hex(substring(col("media"), off, 1)), 16, 10)).cast("int")
    media.select(
      col("media_id"), col("kind"),
      when(col("kind") === "video", le16(7)).otherwise(be32(1))
        .as("width"),
      when(col("kind") === "video", le16(9)).otherwise(be32(5))
        .as("height"),
      length(col("media")).cast("long").as("n_bytes"))
  }

  /** REAL media resize (round 14 — the byte-downsampling stub is
    * gone): images go through [[JdkImageCodec.resize]]'s Graphics2D
    * area-average + PNG re-encode, audio decimates the DECODED PCM
    * samples (every factor-th) and re-encodes the WAV, video resizes
    * every PNG frame through the image codec and rebuilds the
    * container. The header is rewritten from the ACTUAL re-decoded
    * result, so metadata can never drift from the bytes. */
  def resize(spark: SparkSession, media: Dataset[MediaRow],
      factor: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(factor >= 1)
    media.mapPartitions { it =>
      it.map { row =>
        val b = row.media
        row.kind match {
          case "image" =>
            val png2 = JdkImageCodec.resize(b.drop(8), factor)
            val (w2, h2, _) = JdkImageCodec.decode(png2)
            MediaRow(row.media_id, row.kind, withHeader(w2, h2, png2))
          case "audio" =>
            val (rate, _, _) = JdkAudioCodec.decodeWav(b.drop(8))
            val pcm = javax.sound.sampled.AudioSystem
              .getAudioInputStream(
                new java.io.ByteArrayInputStream(b.drop(8)))
              .readAllBytes()
            val n = pcm.length / 2
            val keptIdx = 0 until n by factor
            val out = new Array[Byte](keptIdx.length * 2)
            keptIdx.zipWithIndex.foreach { case (i, j) =>
              out(2 * j) = pcm(2 * i); out(2 * j + 1) = pcm(2 * i + 1)
            }
            val fmt = new javax.sound.sampled.AudioFormat(
              rate.toFloat, 16, 1, true, false)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(out), fmt,
                keptIdx.length.toLong),
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            MediaRow(row.media_id, row.kind,
              withHeader(keptIdx.length, rate / 1000, bos.toByteArray))
          case _ =>
            // per-frame area-average downscale, re-encoded as a real
            // animated GIF (TYPE_BYTE_GRAY targets keep the rebuilt
            // palette lossless for the re-decode)
            val resized = JdkGifCodec.decodeImages(b).map { src =>
              val w2 = math.max(1, src.getWidth / factor)
              val h2 = math.max(1, src.getHeight / factor)
              val dst = new java.awt.image.BufferedImage(w2, h2,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val g = dst.createGraphics()
              try g.drawImage(src.getScaledInstance(w2, h2,
                java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
              finally g.dispose()
              dst
            }
            MediaRow(row.media_id, row.kind,
              JdkGifCodec.encodeImages(resized))
        }
      }
    }
  }

  /** Frame sampling as a native expression: every `stride`-th
    * `frameLen`-byte slice of the payload, exploded to one row per
    * frame. No JVM closure — array/substring expressions only. */
  def sampleFrames(media: DataFrame, frameLen: Int = 32,
      stride: Int = 64): DataFrame = {
    val nFrames = floor((length(col("media")) - lit(8)).cast("double") /
      lit(stride)).cast("int")
    // generator INLINE with the blob column — the original
    // explode-then-self-join shape shuffled the payload twice and
    // measured 21× at the 100× probe (round 13); one Generate node
    // over the scan is the linear plan
    media.select(col("media_id"), col("media"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0))))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        substring_index_binary(col("media"), col("frame_idx"),
          frameLen, stride).as("frame"))
  }

  /** substring on binary with a computed offset (substring() needs
    * literal pos in the Column API; expr() takes the computed form). */
  private def substring_index_binary(media: org.apache.spark.sql.Column,
      idx: org.apache.spark.sql.Column, frameLen: Int,
      stride: Int): org.apache.spark.sql.Column =
    expr(s"substring(media, 9 + frame_idx * $stride, $frameLen)")

  // ---- catalog query: driver-oracled header extraction ----

  /** Blob column built IN the plan from `documents` — 8-byte
    * big-endian (width, height) header via hex/unhex expressions, then
    * a UTF-8 payload (first 64 chars of text cast to binary). Fully
    * deterministic, so DuckDB can check the header PARSE by inverting
    * the construction arithmetically. */
  private def mediaFromDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val width = (lit(16) + id % 16).cast("int")
    val height = (lit(9) + id % 9).cast("int")
    val header = unhex(concat(
      lpad(hex(width), 8, "0"), lpad(hex(height), 8, "0")))
    Tables.documents(s, d).select(
      id.as("media_id"),
      when(id % 3 === 0, "image").otherwise("audio").as("kind"),
      concat(header, substring(col("text"), 1, 64).cast("binary"))
        .as("media"))
  }

  private def headerQ(s: SparkSession, d: String): DataFrame =
    headerMeta(mediaFromDocs(s, d))

  /** Frame-sampling accounting per media: number of sampled frames and
    * total frame bytes. Exercises the native frame-slice expressions
    * end-to-end; the oracle recomputes both from the payload length
    * alone (stride 64, frame 32: full frames when payload ≥ stride,
    * else one truncated frame — exactly sampleFrames' emit rule). */
  private def framesQ(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaFromDocs(s, d))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame")).cast("long")).as("frame_bytes"))

  /** Shot-boundary luma-delta threshold for [[byteShotsQ]]. */
  val ShotThreshold = 100L

  /** Shot-boundary threshold for the GIF-decode [[videoShotsQ]]:
    * within-scene luma drift is ≤ ~300 (the +5/frame shift cancels
    * exactly over each 64-residue cycle since gcd(7, 64) = 1, leaving
    * only a ≤ 63-pixel partial cycle), while a scene step is
    * ≥ 48·w·h − 300 ≥ 6600 at the smallest 16×9 frame — so 2000
    * separates them with ≥ 3× margin on both sides. */
  val ShotGifThreshold = 2000L

  /** Scene-structured generator pixel for [[videoShotsQ]]: base
    * texture in [0, 64) plus a 48-gray scene pedestal that steps
    * every 3 frames — values stay < 256 (GIF palette range). */
  def shotScenePixel(id: Long, f: Int, p: Int): Int =
    ((id * 131 + f * 5 + p * 7) % 64 + (f / 3) * 48).toInt

  /** Shot-boundary detection over the REAL GIF container (round 15,
    * VERDICT r14 #6): each document's animated GIF is decoded
    * frame-by-frame with `javax.imageio` and per-frame luma is summed
    * from the DECODED raster — not from header math or byte slices —
    * then a boundary is a luma jump > [[ShotGifThreshold]] between
    * consecutive frames. The oracle replays the exact per-frame sums
    * from [[shotScenePixel]], so a codec, palette, or frame-order bug
    * anywhere in the GIF roundtrip breaks the hash. Scale shape:
    * mapPartitions scan stage; frames fold to three scalars per media
    * INSIDE the decode loop (frames arrive in presentation order), so
    * there is no window and no shuffle at all — vs [[byteShotsQ]],
    * which keeps the per-media window form for arbitrary blobs. */
  private def videoShotsQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          val nf = 4 + (id % 5).toInt
          val gif = JdkGifCodec.encode(id, w, h, nf, shotScenePixel)
          val lumas = JdkGifCodec.decodeFrames(gif).map(_._4)
          val bounds = lumas.sliding(2).count {
            case Seq(a, b) => math.abs(b - a) > ShotGifThreshold
            case _ => false
          }.toLong
          (id, lumas.size.toLong, bounds, bounds + 1L)
        }
      }.toDF("media_id", "n_frames", "n_boundaries", "n_shots")
  }

  /** Payload bytes per media in the shot-detection stream — long
    * enough that most documents yield SEVERAL frames (the 64-byte
    * [[framesQ]] payload always yields exactly one). */
  val ShotPayload = 512

  /** CODEC-AGNOSTIC shot detection over a byte-stride frame stream —
    * the [[sampleFrames]] consumer for blobs no installed codec can
    * decode (the real-decoder path is [[videoShotsQ]] over GIF): a
    * boundary is a frame whose "luma" (byte sum of the frame slice,
    * the [[graft.ext.ByteSumExpr]] codegen kernel)
    * jumps more than [[ShotThreshold]] from the
    * previous frame; shots = boundaries + 1. Frames come from the
    * same native substring slicing as [[sampleFrames]] (stride 64,
    * frame 32) over a [[ShotPayload]]-byte payload. Shape: scan-local
    * frame explode (∝ corpus bytes / stride), per-media window
    * bounded by frames-per-media, one rollup — linear end to end. */
  private def byteShotsQ(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val media = Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      concat(unhex(lit("0000000000000000")),
        substring(col("text"), 1, ShotPayload).cast("binary"))
        .as("media"))
    sampleFrames(media)
      .select(col("media_id"), col("frame_idx"),
        // luma = sum of the frame's BYTES, not of UTF-8-decoded
        // codepoints: byte slicing can split a multibyte character
        // mid-frame, and only byte arithmetic stays engine-identical
        // on non-ASCII corpora. Fused codegen kernel (the interpreted
        // aggregate-over-hex-pairs form materialized the hex string
        // per frame; PropertySpec pins byte-for-byte parity).
        graft.ext.ByteSumExpr.byteSum(col("frame")).as("luma"))
      .withColumn("prev", lag(col("luma"), 1).over(W))
      .withColumn("boundary",
        when(col("prev").isNotNull &&
          abs(col("luma") - col("prev")) > ShotThreshold, 1L)
          .otherwise(0L))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("boundary")).as("n_boundaries"),
        (sum(col("boundary")) + 1L).as("n_shots"))
  }

  /** Real-codec round trip, driver-oracled: encode an actual PNG per
    * document (pixels from the generator formula), parse the IHDR
    * width/height straight off the bytes with native expressions
    * (PNG layout: 8-byte signature + 4-byte length + "IHDR", so width
    * is big-endian at byte offset 16, height at 20), then DECODE the
    * PNG and sum the pixel values. PNG is lossless, so DuckDB can
    * recompute the exact pixel sum from the formula alone — a codec
    * bug on either the encode or decode side breaks the hash. */
  private def pngQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // one codec context per partition; rows stream through
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          (id, JdkImageCodec.encodePng(id, w, h))
        }
      }.toDF("media_id", "media")
    val parsed = media.select(
      col("media_id"),
      conv(hex(substring(col("media"), 17, 4)), 16, 10).cast("int")
        .as("png_width"),
      conv(hex(substring(col("media"), 21, 4)), 16, 10).cast("int")
        .as("png_height"),
      col("media"))
    parsed.as[(Long, Int, Int, Array[Byte])].mapPartitions { it =>
      it.map { case (id, w, h, png) =>
        val (dw, dh, pixelSum) = JdkImageCodec.decode(png)
        (id, w, h, dw, dh, pixelSum)
      }
    }.toDF("media_id", "png_width", "png_height",
      "dec_width", "dec_height", "pixel_sum")
  }

  /** Image perceptual-hash extraction through the REAL codec path:
    * encode an actual PNG per document, decode it back, and compute
    * the integer block-mean aHash ([[JdkImageCodec.aHash64]]) — the
    * near-dup key for image dedup (equal hashes bucket together; a
    * Hamming-ball probe reuses the SimHash banding machinery). The
    * hash ships as two unsigned 32-bit halves so the oracle never
    * touches the sign bit. PNG is lossless and the hash is pure
    * integer math, so DuckDB replays it exactly from the pixel
    * formula — through a real encode/decode on the Spark side.
    * Scale shape: scan-stage mapPartitions, no shuffle at all. */
  private def ahashQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          val hash = JdkImageCodec.aHash64(
            JdkImageCodec.encodePng(id, w, h))
          (id, hash >>> 32, hash & 0xffffffffL)
        }
      }.toDF("media_id", "ahash_hi", "ahash_lo")
  }

  /** Perceptual dHash per synthetic PNG — the scan-stage codec shape
    * of [[ahashQ]] (mapPartitions over the id column, real PNG
    * encode→decode per row, no shuffle) with the gradient-based hash:
    * [[JdkImageCodec.dHash64]]. Emitted as two uint32 halves like
    * ahash so the oracle's bit sums replay it exactly. */
  private def dhashQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          val hash = JdkImageCodec.dHash64(
            JdkImageCodec.encodePng(id, w, h))
          (id, hash >>> 32, hash & 0xffffffffL)
        }
      }.toDF("media_id", "dhash_hi", "dhash_lo")
  }

  /** Pinned JPEG-noise tolerances for [[jpegQ]]'s stability contract,
    * calibrated against the full 2304-image fixture cycle at the
    * codec's explicit q=0.90 (probed r16: max 2 flipped aHash bits,
    * 1 dHash bit, MAE 2.87) with ~2× headroom. A codec change that
    * blows past these is a REAL contract break for hash-keyed image
    * dedup, not noise — the point of pinning. */
  val JpegAHashTol = 4L
  val JpegDHashTol = 3L
  val JpegMaeTol   = 4L

  /** JPEG decode across the PNG→JPEG boundary (VERDICT r15 #7): per
    * document, the lossless PNG pipeline's perceptual hashes (the
    * [[ahashQ]]/[[dhashQ]] values — formula-replayable in SQL) are
    * compared against the same hashes computed from a REAL
    * encode→decode round trip through baseline JPEG at q=0.90.
    * JPEG's lossy DCT is exactly what aHash/dHash-keyed near-dup
    * mining must tolerate in a crawl corpus, so the emitted contract
    * is the STABILITY invariant: decoded dims equal the formula dims
    * (dims survive the codec exactly — replayable), and the Hamming
    * drift / mean-abs luma error stay inside the pinned tolerances
    * (booleans the oracle states TRUE; MultimodalSpec replays the
    * JVM side and asserts the raw distances, so the tolerance can't
    * silently loosen). Scale shape: scan-stage mapPartitions, one
    * codec init per partition, no shuffle, no blob ever leaves the
    * map stage. */
  private def jpegQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          val png = JdkImageCodec.encodePng(id, w, h)
          val aPng = JdkImageCodec.aHash64(png)
          val dPng = JdkImageCodec.dHash64(png)
          val (jw, jh, aJpg, dJpg, err) =
            JdkImageCodec.decodeJpegStats(id, JdkImageCodec.encodeJpeg(id, w, h))
          (id, jw.toLong, jh.toLong,
            aPng >>> 32, aPng & 0xffffffffL,
            dPng >>> 32, dPng & 0xffffffffL,
            java.lang.Long.bitCount(aPng ^ aJpg).toLong <= JpegAHashTol,
            java.lang.Long.bitCount(dPng ^ dJpg).toLong <= JpegDHashTol,
            err <= JpegMaeTol * jw * jh)
        }
      }.toDF("media_id", "jpeg_w", "jpeg_h", "ahash_hi", "ahash_lo",
        "dhash_hi", "dhash_lo", "ahash_stable", "dhash_stable",
        "luma_mae_in_tol")
  }

  /** Bucket cap for one (band, value) posting list in
    * [[imageNearDup]] — degenerate band values (e.g. an all-zero
    * 16-bit band from flat images) otherwise fan O(w²) candidate
    * pairs; dropping over-cap buckets costs only recall on pairs
    * whose EVERY clean band is degenerate, the quantified loss the
    * dedup family's caps all take. */
  val ImgBandCap = 100L

  /** Hamming threshold for a confirmed image near-duplicate. 4 bands
    * × 16 bits with max 3 mismatched bits pigeonhole-guarantee at
    * least one untouched band, so banding loses NO pair under this
    * threshold (modulo the bucket cap). */
  val ImgHamMax = 3L

  /** Image near-duplicate pairs — the DEDUP step the per-image
    * hashes ([[ahashQ]]/[[dhashQ]]) exist to feed, closing the
    * multimodal pipeline the same way q_dedup_simhash_pairs closes
    * the text one: band each 64-bit dHash into 4×16-bit keys,
    * bucket-join only within (band, value) postings (never all
    * pairs), cap hot buckets at [[ImgBandCap]], and confirm
    * candidates with the exact Hamming distance ≤ [[ImgHamMax]].
    * The pigeonhole banding is recall-complete at this threshold;
    * shuffle volume is images × 4 band keys, and the candidate join
    * is bounded by cap² per bucket. The hash table comes from the
    * real PNG codec once (registry-cached — the banding, counting,
    * and confirm passes share one materialization). */
  private def imageNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h = graft.GraftCaches.getOrPersist(s, s"multimodal.dhash:$d") {
      dhashQ(s, d)
    }
    val bands = h.select($"media_id",
      posexplode(array(
        expr("dhash_lo & 65535"),
        expr("shiftright(dhash_lo, 16) & 65535"),
        expr("dhash_hi & 65535"),
        expr("shiftright(dhash_hi, 16) & 65535")))
        .as(Seq("band_i", "bv")))
    val counts = bands.groupBy($"band_i", $"bv")
      .agg(count(lit(1)).as("bn"))
    val capped = bands.join(counts, Seq("band_i", "bv"))
      .filter($"bn" <= ImgBandCap)
    val cand = capped.as("a").join(capped.as("b"),
        col("a.band_i") === col("b.band_i") &&
          col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"),
        col("b.media_id").as("id_b"))
      .distinct()
    cand
      .join(h.select($"media_id".as("id_a"), $"dhash_hi".as("hi_a"),
        $"dhash_lo".as("lo_a")), "id_a")
      .join(h.select($"media_id".as("id_b"), $"dhash_hi".as("hi_b"),
        $"dhash_lo".as("lo_b")), "id_b")
      // Spark SQL ^ is bitwise xor (DuckDB's is power — its oracle
      // uses xor())
      .select($"id_a", $"id_b",
        expr("cast(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)" +
          " as bigint)").as("hamming"))
      .filter($"hamming" <= ImgHamMax)
  }

  /** Thumbnail/resize feature extraction through the REAL image codec
    * — encode an actual PNG per document, decode it, and downsample
    * to an 8×6 thumbnail with integer nearest-neighbor indexing
    * ([[JdkImageCodec.resizeNearest]]): the resize stage of a
    * multimodal curation pipeline (thumbnails feed dedup, NSFW
    * scoring, and embedding models at a fraction of full-res cost).
    * The oracle replays the sampled pixel positions and both content
    * sums straight from the pixel formula — a codec, indexing, or
    * channel bug on either side breaks the hash. Scan-stage
    * mapPartitions, no shuffle. */
  private def imageResizeQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          val (sum, wsum) = JdkImageCodec.resizeNearest(
            JdkImageCodec.encodePng(id, w, h), 8, 6)
          (id, sum, wsum)
        }
      }.toDF("media_id", "thumb_sum", "thumb_wsum")
  }

  /** Audio envelope fingerprint through the REAL codec path — encode
    * an actual WAV per document, decode it, hash the amplitude
    * envelope ([[JdkAudioCodec.envHash32]]). Near-dup key for audio
    * dedup, fully DuckDB-replayable from the sample formula since PCM
    * is lossless and the hash is integer-exact. Scan-stage only. */
  private def envHashQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 100 + (id % 50).toInt
          val rate = 8000 + (id % 4).toInt * 4000
          (id, JdkAudioCodec.envHash32(
            JdkAudioCodec.encodeWav(id, n, rate)))
        }
      }.toDF("media_id", "env_hash")
  }

  /** Real-audio-codec round trip, same contract as [[pngQ]]: encode an
    * actual RIFF/WAVE clip per document (samples from the generator
    * formula), parse the sample rate natively off the container bytes
    * (PCM WAV: little-endian u32 at byte offset 24 — note the LE byte
    * reversal in the `conv(hex(...))` chain), then DECODE the clip and
    * sum |sample|. PCM is lossless, so DuckDB recomputes the exact
    * amplitude sum from the formula alone — a codec bug on either side
    * breaks the hash. */
  private def wavQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 100 + (id % 50).toInt
          val rate = 8000 + (id % 4).toInt * 4000
          (id, JdkAudioCodec.encodeWav(id, n, rate))
        }
      }.toDF("media_id", "media")
    def byteHex(off: Int) = hex(substring(col("media"), off, 1))
    val parsed = media.select(
      col("media_id"),
      conv(concat(byteHex(28), byteHex(27), byteHex(26), byteHex(25)),
        16, 10).cast("int").as("hdr_rate"),
      col("media"))
    parsed.as[(Long, Int, Array[Byte])].mapPartitions { it =>
      it.map { case (id, hdrRate, wav) =>
        val (decRate, nSamples, ampSum) = JdkAudioCodec.decodeWav(wav)
        (id, hdrRate, decRate, nSamples, ampSum)
      }
    }.toDF("media_id", "hdr_rate", "dec_rate", "n_samples", "amp_sum")
  }

  /** Voiced-segment accounting through the REAL WAV codec — encode an
    * actual PCM clip per document, decode it, run the integer
    * segmentation ([[JdkAudioCodec.voicedSegments]]). The oracle
    * replays windows, the cross-multiplied voiced test, and the
    * longest run (gaps-and-islands) from the sample formula — a codec
    * or windowing bug on either side breaks the hash. Scan-stage
    * mapPartitions, no shuffle. */
  private def audioSegQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nSamp = 100 + (id % 50).toInt
          val rate = 8000 + (id % 4).toInt * 4000
          val (nw, nv, lr) = JdkAudioCodec.voicedSegments(
            JdkAudioCodec.encodeWav(id, nSamp, rate))
          (id, nw, nv, lr)
        }
      }.toDF("media_id", "n_windows", "n_voiced", "longest_voiced")
  }

  /** Video frame extraction through the REAL codec (round 14 —
    * FakeCodec retired; r15 — real GIF container): one animated GIF
    * per document is decoded frame-by-frame with `javax.imageio`, and
    * the oracle recomputes each frame's width, height, and pixel sum
    * from the generator formula — so the whole PNG encode→container
    * walk→PNG decode roundtrip is hash-checked per frame (a framing
    * offset, a codec lossy-ness, or a channel-order bug anywhere
    * breaks the match). Scale shape: mapPartitions = one codec init
    * per partition; frames collapse to four scalars IN the map stage,
    * so no blob byte ever shuffles (frames-per-video-bounded fan). */
  private def videoQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val w = 16 + (id % 16).toInt
          val h = 9 + (id % 9).toInt
          val nf = 4 + (id % 5).toInt
          val container = JdkGifCodec.encode(id, w, h, nf)
          JdkGifCodec.decodeFrames(container).map {
            case (f, fw, fh, sum) =>
              (id, f.toLong, fw.toLong, fh.toLong, sum)
          }
        }
      }.toDF("media_id", "frame_idx", "f_width", "f_height", "pixel_sum")
  }

  /** The oracles recompute expected values from the generator formula —
    * Spark must PARSE the same numbers back out of the binary it
    * built, so a byte-order or offset bug on either the build or parse
    * side breaks the hash match. */
  val queries: Seq[Q] = Seq(
    Q("q_multimodal_header", headerQ, Some("""
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'audio' END
               AS kind,
             CAST(16 + doc_id % 16 AS INT) AS width,
             CAST(9 + doc_id % 9 AS INT) AS height,
             8 + octet_length(encode(substring(text, 1, 64))) AS n_bytes
      FROM documents""")),

    Q("q_multimodal_png", pngQ, Some("""
      WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(16 + doc_id % 16 AS INT) AS w,
               CAST(9 + doc_id % 9 AS INT) AS h
        FROM documents)
      SELECT d.media_id,
             d.w AS png_width, d.h AS png_height,
             d.w AS dec_width, d.h AS dec_height,
             CAST(sum((d.media_id * 31 + x.x * 7 + y.y * 13) % 256)
                  AS BIGINT) AS pixel_sum
      FROM dims d
      JOIN generate_series(0, 31) AS x(x) ON x.x < d.w
      JOIN generate_series(0, 17) AS y(y) ON y.y < d.h
      GROUP BY 1, 2, 3""")),

    Q("q_image_ahash", ahashQ, Some("""
      WITH dims AS (SELECT doc_id AS media_id,
                           CAST(16 + doc_id % 16 AS INT) AS w,
                           CAST(9 + doc_id % 9 AS INT) AS h
                    FROM documents),
      px AS (SELECT d.media_id,
                    (y.y * 8 // d.h) * 8 + (x.x * 8 // d.w) AS b,
                    (d.media_id * 31 + x.x * 7 + y.y * 13) % 256 AS v
             FROM dims d
             JOIN generate_series(0, 31) AS x(x) ON x.x < d.w
             JOIN generate_series(0, 17) AS y(y) ON y.y < d.h),
      blk AS (SELECT media_id, b, sum(v) AS bs, count(*) AS bc
              FROM px GROUP BY 1, 2),
      tot AS (SELECT media_id, sum(bs) AS ts, sum(bc) AS tc
              FROM blk GROUP BY 1)
      SELECT blk.media_id,
             CAST(sum(CASE WHEN blk.b >= 32
                            AND blk.bs * tot.tc > tot.ts * blk.bc
                           THEN CAST(1 AS BIGINT) << CAST(blk.b - 32 AS INT)
                           ELSE 0 END) AS BIGINT) AS ahash_hi,
             CAST(sum(CASE WHEN blk.b < 32
                            AND blk.bs * tot.tc > tot.ts * blk.bc
                           THEN CAST(1 AS BIGINT) << CAST(blk.b AS INT)
                           ELSE 0 END) AS BIGINT) AS ahash_lo
      FROM blk JOIN tot USING (media_id)
      GROUP BY 1""")),

    Q("q_image_dhash", dhashQ, Some("""
      WITH dims AS (SELECT doc_id AS media_id,
                           CAST(16 + doc_id % 16 AS INT) AS w,
                           CAST(9 + doc_id % 9 AS INT) AS h
                    FROM documents),
      px AS (SELECT d.media_id,
                    y.y * 8 // d.h AS r, x.x * 9 // d.w AS c,
                    (d.media_id * 31 + x.x * 7 + y.y * 13) % 256 AS v
             FROM dims d
             JOIN generate_series(0, 31) AS x(x) ON x.x < d.w
             JOIN generate_series(0, 17) AS y(y) ON y.y < d.h),
      blk AS (SELECT media_id, r, c, sum(v) AS bs, count(*) AS bc
              FROM px GROUP BY 1, 2, 3),
      bits AS (SELECT l.media_id,
                      CAST(l.r * 8 + l.c AS INT) AS b
               FROM blk l JOIN blk rt
                 ON l.media_id = rt.media_id AND l.r = rt.r
                AND rt.c = l.c + 1
               WHERE l.bs * rt.bc > rt.bs * l.bc),
      allm AS (SELECT media_id FROM dims)
      SELECT allm.media_id,
             CAST(coalesce(sum(CASE WHEN b >= 32
                 THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END), 0)
               AS BIGINT) AS dhash_hi,
             CAST(coalesce(sum(CASE WHEN b < 32
                 THEN CAST(1 AS BIGINT) << b ELSE 0 END), 0)
               AS BIGINT) AS dhash_lo
      FROM allm LEFT JOIN bits USING (media_id)
      GROUP BY 1""")),

    Q("q_image_jpeg", jpegQ, Some("""
      WITH dims AS (SELECT doc_id AS media_id,
                           CAST(16 + doc_id % 16 AS INT) AS w,
                           CAST(9 + doc_id % 9 AS INT) AS h
                    FROM documents),
      px AS (SELECT d.media_id,
                    (y.y * 8 // d.h) * 8 + (x.x * 8 // d.w) AS ab,
                    y.y * 8 // d.h AS r, x.x * 9 // d.w AS c,
                    (d.media_id * 31 + x.x * 7 + y.y * 13) % 256 AS v
             FROM dims d
             JOIN generate_series(0, 31) AS x(x) ON x.x < d.w
             JOIN generate_series(0, 17) AS y(y) ON y.y < d.h),
      ablk AS (SELECT media_id, ab, sum(v) AS bs, count(*) AS bc
               FROM px GROUP BY 1, 2),
      atot AS (SELECT media_id, sum(bs) AS ts, sum(bc) AS tc
               FROM ablk GROUP BY 1),
      ah AS (SELECT ablk.media_id,
                    CAST(sum(CASE WHEN ab >= 32
                              AND ablk.bs * atot.tc > atot.ts * ablk.bc
                             THEN CAST(1 AS BIGINT) << CAST(ab - 32 AS INT)
                             ELSE 0 END) AS BIGINT) AS ahash_hi,
                    CAST(sum(CASE WHEN ab < 32
                              AND ablk.bs * atot.tc > atot.ts * ablk.bc
                             THEN CAST(1 AS BIGINT) << CAST(ab AS INT)
                             ELSE 0 END) AS BIGINT) AS ahash_lo
             FROM ablk JOIN atot USING (media_id) GROUP BY 1),
      dblk AS (SELECT media_id, r, c, sum(v) AS bs, count(*) AS bc
               FROM px GROUP BY 1, 2, 3),
      dbits AS (SELECT l.media_id, CAST(l.r * 8 + l.c AS INT) AS b
                FROM dblk l JOIN dblk rt
                  ON l.media_id = rt.media_id AND l.r = rt.r
                 AND rt.c = l.c + 1
                WHERE l.bs * rt.bc > rt.bs * l.bc),
      dh AS (SELECT dims.media_id,
                    CAST(coalesce(sum(CASE WHEN b >= 32
                        THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END), 0)
                      AS BIGINT) AS dhash_hi,
                    CAST(coalesce(sum(CASE WHEN b < 32
                        THEN CAST(1 AS BIGINT) << b ELSE 0 END), 0)
                      AS BIGINT) AS dhash_lo
             FROM dims LEFT JOIN dbits USING (media_id) GROUP BY 1)
      SELECT d.media_id, CAST(d.w AS BIGINT) AS jpeg_w,
             CAST(d.h AS BIGINT) AS jpeg_h,
             ah.ahash_hi, ah.ahash_lo, dh.dhash_hi, dh.dhash_lo,
             TRUE AS ahash_stable, TRUE AS dhash_stable,
             TRUE AS luma_mae_in_tol
      FROM dims d JOIN ah USING (media_id) JOIN dh USING (media_id)""")),

    Q("q_image_neardup", imageNearDup, Some(s"""
      WITH dims AS (SELECT doc_id AS media_id,
                           CAST(16 + doc_id % 16 AS INT) AS w,
                           CAST(9 + doc_id % 9 AS INT) AS h
                    FROM documents),
      px AS (SELECT d.media_id,
                    y.y * 8 // d.h AS r, x.x * 9 // d.w AS c,
                    (d.media_id * 31 + x.x * 7 + y.y * 13) % 256 AS v
             FROM dims d
             JOIN generate_series(0, 31) AS x(x) ON x.x < d.w
             JOIN generate_series(0, 17) AS y(y) ON y.y < d.h),
      blk AS (SELECT media_id, r, c, sum(v) AS bs, count(*) AS bc
              FROM px GROUP BY 1, 2, 3),
      bits AS (SELECT l.media_id,
                      CAST(l.r * 8 + l.c AS INT) AS b
               FROM blk l JOIN blk rt
                 ON l.media_id = rt.media_id AND l.r = rt.r
                AND rt.c = l.c + 1
               WHERE l.bs * rt.bc > rt.bs * l.bc),
      allm AS (SELECT media_id FROM dims),
      hsh AS (SELECT allm.media_id,
                     CAST(coalesce(sum(CASE WHEN b >= 32
                         THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END),
                       0) AS BIGINT) AS hi,
                     CAST(coalesce(sum(CASE WHEN b < 32
                         THEN CAST(1 AS BIGINT) << b ELSE 0 END), 0)
                       AS BIGINT) AS lo
              FROM allm LEFT JOIN bits USING (media_id)
              GROUP BY 1),
      bands AS (SELECT media_id, i AS band_i,
                       CASE i WHEN 0 THEN lo & 65535
                              WHEN 1 THEN (lo >> 16) & 65535
                              WHEN 2 THEN hi & 65535
                              ELSE (hi >> 16) & 65535 END AS bv
                FROM hsh, generate_series(0, 3) s(i)),
      capped AS (SELECT media_id, band_i, bv FROM (
                   SELECT *, count(*) OVER (PARTITION BY band_i, bv)
                     AS bn
                   FROM bands) t
                 WHERE bn <= $ImgBandCap),
      cand AS (SELECT DISTINCT a.media_id AS id_a,
                               b.media_id AS id_b
               FROM capped a JOIN capped b
                 ON a.band_i = b.band_i AND a.bv = b.bv
                AND a.media_id < b.media_id),
      pairs AS (SELECT id_a, id_b,
                       bit_count(xor(ha.hi, hb.hi))
                         + bit_count(xor(ha.lo, hb.lo)) AS hamming
                FROM cand
                JOIN hsh ha ON ha.media_id = id_a
                JOIN hsh hb ON hb.media_id = id_b)
      SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
      FROM pairs WHERE hamming <= $ImgHamMax""")),

    Q("q_audio_envhash", envHashQ, Some("""
      WITH clips AS (SELECT doc_id AS media_id, 100 + doc_id % 50 AS n
                     FROM documents),
      smp AS (SELECT c.media_id, c.n,
                     i.i * 32 // c.n AS w,
                     abs((((c.media_id * 31 + i.i * 7) % 2003) - 1001)
                         * 16) AS a
              FROM clips c
              JOIN generate_series(0, 149) AS i(i) ON i.i < c.n),
      win AS (SELECT media_id, n, w, sum(a) AS ws, count(*) AS wc
              FROM smp GROUP BY 1, 2, 3),
      tot AS (SELECT media_id, sum(ws) AS ts FROM win GROUP BY 1)
      SELECT win.media_id,
             CAST(sum(CASE WHEN win.ws * win.n > tot.ts * win.wc
                           THEN CAST(1 AS BIGINT) << CAST(win.w AS INT)
                           ELSE 0 END) AS BIGINT) AS env_hash
      FROM win JOIN tot USING (media_id)
      GROUP BY 1""")),

    Q("q_multimodal_wav", wavQ, Some("""
      WITH clips AS (SELECT doc_id AS media_id,
                            100 + doc_id % 50 AS n,
                            CAST(8000 + (doc_id % 4) * 4000 AS INT) AS rate
                     FROM documents)
      SELECT c.media_id,
             c.rate AS hdr_rate, c.rate AS dec_rate,
             CAST(c.n AS BIGINT) AS n_samples,
             CAST(sum(abs((((c.media_id * 31 + i.i * 7) % 2003) - 1001)
                          * 16)) AS BIGINT) AS amp_sum
      FROM clips c
      JOIN generate_series(0, 149) AS i(i) ON i.i < c.n
      GROUP BY 1, 2, 3, 4""")),

    Q("q_image_resize", imageResizeQ, Some("""
      WITH img AS (SELECT doc_id AS media_id,
                          16 + doc_id % 16 AS w, 9 + doc_id % 9 AS h
                   FROM documents),
      grid AS (SELECT x.i AS tx, y.i AS ty
               FROM generate_series(0, 7) AS x(i)
               CROSS JOIN generate_series(0, 5) AS y(i)),
      px AS (SELECT i.media_id,
                    (i.media_id * 31
                     + (((2 * g.tx + 1) * i.w) // 16) * 7
                     + (((2 * g.ty + 1) * i.h) // 12) * 13) % 256 AS v,
                    g.ty * 8 + g.tx + 1 AS pos
             FROM img i CROSS JOIN grid g)
      SELECT media_id, CAST(sum(v) AS BIGINT) AS thumb_sum,
             CAST(sum(v * pos) AS BIGINT) AS thumb_wsum
      FROM px GROUP BY 1""")),

    Q("q_audio_segments", audioSegQ, Some("""
      WITH clips AS (SELECT doc_id AS media_id, 100 + doc_id % 50 AS n
                     FROM documents),
      smp AS (SELECT c.media_id, c.n, i.i // 25 AS w,
                     abs((((c.media_id * 31 + i.i * 7) % 2003) - 1001)
                         * 16) AS a
              FROM clips c
              JOIN generate_series(0, 149) AS i(i) ON i.i < c.n),
      win AS (SELECT media_id, n, w, sum(a) AS ws, count(*) AS wc
              FROM smp GROUP BY 1, 2, 3),
      tot AS (SELECT media_id, sum(ws) AS ts FROM win GROUP BY 1),
      flags AS (SELECT win.media_id, win.w,
                       CASE WHEN win.ws * win.n > tot.ts * win.wc
                            THEN 1 ELSE 0 END AS v
                FROM win JOIN tot USING (media_id)),
      runs AS (SELECT media_id, w, v,
                      w - row_number() OVER (PARTITION BY media_id, v
                                             ORDER BY w) AS grp
               FROM flags),
      runlen AS (SELECT media_id, count(*) AS len
                 FROM runs WHERE v = 1 GROUP BY media_id, grp),
      agg AS (SELECT media_id, count(*) AS n_windows, sum(v) AS n_voiced
              FROM flags GROUP BY 1),
      lr AS (SELECT media_id, max(len) AS longest FROM runlen GROUP BY 1)
      SELECT a.media_id,
             CAST(a.n_windows AS BIGINT) AS n_windows,
             CAST(a.n_voiced AS BIGINT) AS n_voiced,
             CAST(coalesce(l.longest, 0) AS BIGINT) AS longest_voiced
      FROM agg a LEFT JOIN lr l USING (media_id)""")),

    Q("q_multimodal_video", videoQ, Some("""
      WITH v AS (SELECT doc_id AS media_id,
                        CAST(16 + doc_id % 16 AS BIGINT) AS w,
                        CAST(9 + doc_id % 9 AS BIGINT) AS h,
                        4 + doc_id % 5 AS nf
                 FROM documents),
      fr AS (SELECT v.media_id, v.w, v.h, f.f AS frame_idx
             FROM v JOIN generate_series(0, 8) AS f(f) ON f.f < v.nf),
      px AS (SELECT media_id, frame_idx, w, h,
                    sum((media_id * 131 + frame_idx * 17 + p.p * 7)
                        % 256) AS ps
             FROM fr JOIN generate_series(0, 526) AS p(p)
               ON p.p < w * h
             GROUP BY 1, 2, 3, 4)
      SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             w AS f_width, h AS f_height,
             CAST(ps AS BIGINT) AS pixel_sum
      FROM px""")),

    Q("q_multimodal_frames", framesQ, Some("""
      WITH m AS (SELECT doc_id AS media_id,
                        octet_length(encode(substring(text, 1, 64)))
                          AS payload
                 FROM documents)
      SELECT media_id,
             CAST(greatest(payload // 64, 1) AS BIGINT) AS n_frames,
             CAST(CASE WHEN payload // 64 = 0 THEN least(payload, 32)
                       ELSE (payload // 64) * 32 END AS BIGINT)
               AS frame_bytes
      FROM m""")),

    Q("q_video_shots", videoShotsQ, Some(s"""
      WITH v AS (SELECT doc_id AS media_id,
                        CAST(16 + doc_id % 16 AS BIGINT) AS w,
                        CAST(9 + doc_id % 9 AS BIGINT) AS h,
                        4 + doc_id % 5 AS nf
                 FROM documents),
      fr AS (SELECT media_id, w, h, f.f AS fi
             FROM v JOIN generate_series(0, 8) AS f(f) ON f.f < nf),
      lum AS (SELECT media_id, fi,
                     sum((media_id * 131 + fi * 5 + p.p * 7) % 64
                         + (fi // 3) * 48) AS luma
              FROM fr JOIN generate_series(0, 526) AS p(p)
                ON p.p < w * h
              GROUP BY 1, 2),
      wd AS (SELECT media_id, luma,
                    lag(luma) OVER (PARTITION BY media_id
                                    ORDER BY fi) AS prev
             FROM lum),
      bb AS (SELECT media_id,
                    CASE WHEN prev IS NOT NULL
                           AND abs(luma - prev) > $ShotGifThreshold
                         THEN 1 ELSE 0 END AS boundary
             FROM wd)
      SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(boundary) AS BIGINT) AS n_boundaries,
             CAST(sum(boundary) + 1 AS BIGINT) AS n_shots
      FROM bb GROUP BY 1""")),

    Q("q_byte_shots", byteShotsQ, Some(s"""
      WITH m AS (SELECT doc_id AS media_id,
                        hex(encode(substring(text, 1, $ShotPayload)))
                          AS hx
                 FROM documents),
      f AS (SELECT media_id, hx,
                   unnest(range(0,
                     greatest(CAST((length(hx) // 2) // 64 AS BIGINT)
                       - 1, 0) + 1)) AS frame_idx
            FROM m),
      fh AS (SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                    substring(hx, 1 + frame_idx * 128, 64) AS h
             FROM f),
      l AS (SELECT media_id, frame_idx,
                   CAST(coalesce(list_sum(list_transform(
                     range(0, CAST(length(h) // 2 AS BIGINT)),
                     i -> (strpos('0123456789ABCDEF',
                             substring(h, 1 + 2 * i, 1)) - 1) * 16
                          + strpos('0123456789ABCDEF',
                             substring(h, 2 + 2 * i, 1)) - 1)), 0)
                     AS BIGINT) AS luma
            FROM fh),
      w AS (SELECT media_id, frame_idx, luma,
                   lag(luma) OVER (PARTITION BY media_id
                                   ORDER BY frame_idx) AS prev
            FROM l),
      b AS (SELECT media_id,
                   CASE WHEN prev IS NOT NULL
                          AND abs(luma - prev) > $ShotThreshold
                        THEN 1 ELSE 0 END AS boundary
            FROM w)
      SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(boundary) AS BIGINT) AS n_boundaries,
             CAST(sum(boundary) + 1 AS BIGINT) AS n_shots
      FROM b GROUP BY 1"""))
  )
}
