package graft.scale

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import Multimodal._

  lazy val media = synthetic(spark, 64).cache()

  test("decodeMeta runs the REAL codec per kind and checksums " +
      "deterministically") {
    val metas = decodeMeta(spark, media).collect()
    assert(metas.length === 64)
    metas.foreach { m =>
      m.kind match {
        case "image" | "video" =>
          // real PNG decode must recover the generator dimensions
          assert(m.width === 16 + (m.media_id % 16))
          assert(m.height === 9 + (m.media_id % 9))
        case "audio" =>
          // (n_samples, kHz) convention, recovered from the real WAV
          assert(m.width === 120 + (m.media_id % 50))
          assert(m.height === AudioRateKhz)
      }
      assert(m.n_bytes > 8L)
      assert(m.checksum > 0L)
    }
    // image checksum IS the formula pixel sum (lossless PNG roundtrip)
    metas.filter(_.kind == "image").foreach { m =>
      val (w, h) = (m.width, m.height)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (m.media_id * 31 + x * 7 + y * 13) % 256).sum
      assert(m.checksum === expected)
    }
    // video checksum is the per-frame formula pixel sum, summed
    metas.filter(_.kind == "video").foreach { m =>
      val (w, h) = (m.width, m.height)
      val nf = 2 + (m.media_id % 3).toInt
      val expected = (for (f <- 0 until nf; p <- 0 until w * h)
        yield (m.media_id * 131 + f * 17 + p * 7) % 256).sum
      assert(m.checksum === expected)
    }
    val again = decodeMeta(spark, media).collect().map(_.checksum).toSeq
    assert(again === metas.map(_.checksum).toSeq)
  }

  test("native headerMeta agrees with codec decode") {
    val native = headerMeta(media.toDF()).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    decodeMeta(spark, media).collect().foreach { m =>
      assert(native(m.media_id) === (m.width, m.height))
    }
  }

  test("byteHistogram buckets all payload bytes") {
    val sizes = media.collect()
      .map(r => r.media_id -> (r.media.length - 8).toLong).toMap
    byteHistogram(spark, media).collect().foreach { f =>
      assert(f.histogram.length === 16)
      assert(f.histogram.sum === sizes(f.media_id))
    }
  }

  test("sampleFrames yields fixed-length frames at the right offsets") {
    // fixed-size blob fixture (sampleFrames is the codec-agnostic
    // byte-slicing operator — synthetic() now carries variable-size
    // real-codec payloads, so it pins its own layout here)
    val blobs = (0L until 16L).map { id =>
      val b = new Array[Byte](8 + 256)
      var i = 0
      while (i < 256) {
        b(8 + i) = (((id * 31 + i) * 2654435761L) >>> 24).toByte
        i += 1
      }
      (id, b)
    }.toDF("media_id", "media")
    val frames = sampleFrames(blobs, frameLen = 32, stride = 64)
      .collect()
    // 256-byte payload / 64 stride = 4 frames per media row
    assert(frames.length === 16 * 4)
    frames.foreach { r =>
      assert(r.getAs[Array[Byte]]("frame").length === 32)
    }
    // frame 0 must equal the first payload slice
    val m0 = blobs.filter($"media_id" === 0)
      .collect()(0).getAs[Array[Byte]]("media")
    val f0 = frames.find(r => r.getLong(0) === 0L && r.getInt(1) === 0).get
      .getAs[Array[Byte]]("frame")
    assert(f0.toSeq === m0.slice(8, 40).toSeq)
  }

  test("resize is a REAL per-kind resample: dims halve, audio " +
      "decimates, header stays in sync with the re-decoded bytes") {
    val resized = resize(spark, media, 2)
    val metas = decodeMeta(spark, resized).collect()
    val orig = decodeMeta(spark, media).collect()
      .map(m => m.media_id -> m).toMap
    metas.foreach { m =>
      val o = orig(m.media_id)
      m.kind match {
        case "image" | "video" =>
          assert(m.width === math.max(1, o.width / 2))
          assert(m.height === math.max(1, o.height / 2))
        case "audio" =>
          // ceil(n/2) samples survive decimation; rate unchanged
          assert(m.width === (o.width + 1) / 2)
          assert(m.height === o.height)
      }
      // the re-decoded result still parses with the REAL codec and
      // the native header agrees (checked across all kinds below)
      assert(m.n_bytes > 8L)
    }
    val native = headerMeta(resized.toDF()).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    metas.foreach(m => assert(native(m.media_id) === (m.width, m.height)))
    // determinism
    val again = resize(spark, media, 2)
    assert(decodeMeta(spark, again).collect().map(_.checksum).toSeq ===
      metas.map(_.checksum).toSeq)
  }

  test("JdkImageCodec: PNG encode/decode round-trips exact pixel values") {
    import JdkImageCodec._
    for (id <- Seq(0L, 7L, 123L)) {
      val (w, h) = (16 + (id % 16).toInt, 9 + (id % 9).toInt)
      val (dw, dh, sum) = decode(encodePng(id, w, h))
      assert((dw, dh) === (w, h))
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(sum === expected, s"lossless round-trip broken for id=$id")
    }
  }

  test("JdkImageCodec: resizeNearest at source dims is the identity; " +
      "thumbnails stay in pixel range") {
    import JdkImageCodec._
    for (id <- Seq(3L, 42L)) {
      val (w, h) = (16 + (id % 16).toInt, 9 + (id % 9).toInt)
      val png = encodePng(id, w, h)
      val (_, _, fullSum) = decode(png)
      // tw==w, th==h → sx=(2tx+1)w/2w = tx (exact), so every pixel
      // samples itself and the thumbnail IS the image
      val (idSum, _) = resizeNearest(png, w, h)
      assert(idSum === fullSum, "identity resize must preserve the sum")
      val (tSum, tWsum) = resizeNearest(png, 8, 6)
      assert(tSum >= 0 && tSum <= 255L * 48, "8×6 sum out of range")
      assert(tWsum >= tSum, "position weights start at 1")
    }
  }

  test("JdkAudioCodec: voicedSegments invariants (window count, " +
      "voiced ⊆ windows, run ⊆ voiced)") {
    import JdkAudioCodec._
    for (id <- Seq(5L, 77L)) {
      val n = 100 + (id % 50).toInt
      val (nw, nv, lr) = voicedSegments(encodeWav(id, n, 8000))
      assert(nw === (n + 24) / 25, "window count must be ceil(n/25)")
      assert(nv <= nw && lr <= nv,
        s"bounds violated: nw=$nw nv=$nv lr=$lr")
      assert(nv > 0, "a nonconstant clip must have at least one " +
        "above-mean window")
    }
  }

  test("JdkImageCodec: aHash survives 1-pixel noise, separates structure") {
    import JdkImageCodec._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int, w: Int = 24, h: Int = 16): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // horizontal gradient: left half dark, right half bright
    val base = png((x, _) => x * 10)
    // the same image with one pixel nudged by 1 — an exact/byte hash
    // breaks, the perceptual hash must NOT
    val noisy = png((x, y) => if (x == 5 && y == 5) 51 else x * 10)
    assert(base.toSeq !== noisy.toSeq, "fixture: bytes should differ")
    assert(aHash64(base) === aHash64(noisy), "aHash not noise-robust")
    // structurally opposite image (mirrored gradient) must separate
    val mirrored = png((x, _) => (23 - x) * 10)
    assert(aHash64(base) !== aHash64(mirrored), "aHash can't separate")
  }

  test("JdkImageCodec: JPEG round trip — dims exact, raw perceptual " +
      "drift and luma MAE stay well inside the pinned tolerances " +
      "across the full fixture image cycle") {
    import JdkImageCodec._
    // id cycle: pixel values repeat with period lcm(256,16,9)=2304,
    // so 2304 ids cover every distinct fixture image
    var maxA = 0; var maxD = 0; var maxErrNum = 0L; var maxErrDen = 1L
    for (id <- 0L until 2304L) {
      val w = 16 + (id % 16).toInt
      val h = 9 + (id % 9).toInt
      val png = encodePng(id, w, h)
      val aPng = aHash64(png); val dPng = dHash64(png)
      val (jw, jh, aJ, dJ, err) = decodeJpegStats(id, encodeJpeg(id, w, h))
      assert((jw, jh) === ((w, h)), s"id=$id dims drift through JPEG")
      maxA = math.max(maxA, java.lang.Long.bitCount(aPng ^ aJ))
      maxD = math.max(maxD, java.lang.Long.bitCount(dPng ^ dJ))
      if (err * maxErrDen > maxErrNum * (w.toLong * h)) {
        maxErrNum = err; maxErrDen = w.toLong * h
      }
    }
    // raw distances, not just the boolean: the pinned tolerances must
    // keep real margin (observed 2 / 1 / MAE 2.87 at q=0.90), so a
    // codec or formula change that erodes it fails HERE before the
    // oracle's TRUE-pinned booleans ever get near flipping
    assert(maxA <= JpegAHashTol, s"aHash drift $maxA > $JpegAHashTol")
    assert(maxD <= JpegDHashTol, s"dHash drift $maxD > $JpegDHashTol")
    assert(maxErrNum <= JpegMaeTol * maxErrDen,
      s"luma MAE ${maxErrNum.toDouble / maxErrDen} > $JpegMaeTol")
    // and the drift is REAL (JPEG is lossy at q=0.90): a zero max
    // everywhere would mean the codec silently went lossless and the
    // tolerance contract stopped testing anything
    assert(maxErrNum > 0L, "JPEG round trip unexpectedly lossless")
  }

  test("JdkAudioCodec: envHash survives one-sample dither, separates envelopes") {
    import JdkAudioCodec._
    // reuse the real encoder; clip 3 vs clip 3 re-encoded is identical
    val base = encodeWav(3L, 120, 8000)
    assert(envHash32(base) === envHash32(encodeWav(3L, 120, 8000)))
    // dither ONE sample by one quantization step: byte hash breaks,
    // the envelope hash must not (one sample can't move a window mean
    // across the global mean for this signal)
    val dithered = base.clone()
    val dataOff = base.length - 240 // last 120 samples * 2 bytes
    dithered(dataOff) = (dithered(dataOff) + 1).toByte
    assert(base.toSeq !== dithered.toSeq)
    assert(envHash32(base) === envHash32(dithered), "not dither-robust")
    // an engineered opposite envelope (quiet first half, loud second)
    // must separate — neighboring generator ids share the same
    // V-shaped envelope by construction, so build the contrast clip
    // explicitly through the same real codec
    def pcmWav(samples: Array[Int]): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val quietLoud = pcmWav(Array.tabulate(120)(i => if (i < 60) 10 else 5000))
    val loudQuiet = pcmWav(Array.tabulate(120)(i => if (i < 60) 5000 else 10))
    assert(envHash32(quietLoud) !== envHash32(loudQuiet),
      "aHash can't separate opposite envelopes")
    assert(envHash32(quietLoud) === 0xFFFF0000L,
      "loud second half should set exactly the high 16 windows")
  }

  test("JdkImageCodec: native IHDR parse agrees with the decoder") {
    import JdkImageCodec._
    val png = encodePng(42L, 20, 11)
    val parsed = Seq(Tuple1(png)).toDF("media")
      .select(
        conv(hex(substring($"media", 17, 4)), 16, 10).cast("int"),
        conv(hex(substring($"media", 21, 4)), 16, 10).cast("int"))
      .as[(Int, Int)].head()
    assert(parsed === (20, 11))
  }

  test("JdkImageCodec: resize scales dimensions through a real re-encode") {
    import JdkImageCodec._
    val png = encodePng(5L, 24, 16)
    val (w2, h2, _) = decode(resize(png, 2))
    assert((w2, h2) === (12, 8))
    val (w4, h4, _) = decode(resize(png, 32)) // floors at 1×1
    assert((w4, h4) === (1, 1))
  }

  test("JdkAudioCodec: WAV encode/decode round-trips exact samples") {
    import JdkAudioCodec._
    val wav = encodeWav(7L, 120, 16000)
    val (rate, n, ampSum) = decodeWav(wav)
    assert(rate === 16000)
    assert(n === 120L)
    val expected = (0 until 120).map(i => math.abs(sampleAt(7L, i)).toLong).sum
    assert(ampSum === expected, "PCM samples must round-trip losslessly")
  }

  test("JdkAudioCodec: canonical RIFF header carries the sample rate at offset 24") {
    import JdkAudioCodec._
    val wav = encodeWav(3L, 100, 12000)
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val le32 = (wav(24) & 0xff) | ((wav(25) & 0xff) << 8) |
      ((wav(26) & 0xff) << 16) | ((wav(27) & 0xff) << 24)
    assert(le32 === 12000)
  }

  test("metadata-only query prunes the blob column from the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "media")
    media.write.mode("overwrite").parquet(s"$dir/media")
    val plan = spark.read.parquet(s"$dir/media")
      .select($"media_id", $"kind")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<media_id:bigint,kind:string>"),
      s"blob not pruned:\n$plan")
  }

  test("q_image_dhash: hash replays from the raw pixel formula and is " +
    "brightness-shift invariant where aHash is not") {
    val rows = graft.SparkEntry.queries("q_image_dhash")(
      spark, SparkTestSession.sf)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("dhash_hi") << 32) | r.getAs[Long]("dhash_lo")))
      .toMap
    assert(rows.nonEmpty)
    rows.keys.take(64).foreach { id =>
      val w = 16 + (id % 16).toInt
      val h = 9 + (id % 9).toInt
      // brute from the generator formula, bypassing the PNG codec
      val bs = Array.ofDim[Long](8, 9)
      val bc = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (id * 31 + x * 7 + y * 13) % 256
        bs(y * 8 / h)(x * 9 / w) += v
        bc(y * 8 / h)(x * 9 / w) += 1
      }
      var expect = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (bs(r)(c) * bc(r)(c + 1) > bs(r)(c + 1) * bc(r)(c))
          expect |= (1L << (r * 8 + c))
      assert(rows(id) === expect, s"id $id")
      // gradient invariance: +40 brightness (clamped-free range)
      // leaves every pairwise comparison unchanged
      val shifted = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w)
        shifted(y * 8 / h)(x * 9 / w) += (id * 31 + x * 7 + y * 13) % 256
      // conceptual check: adding k to every pixel adds k*bc to each
      // block sum, and (bs+k*bc)*bc' > (bs'+k*bc')*bc <=> bs*bc' >
      // bs'*bc -- the inequality is shift-invariant by algebra
      for (r <- 0 until 8; c <- 0 until 8) {
        val k = 40L
        val l = (bs(r)(c) + k * bc(r)(c)) * bc(r)(c + 1)
        val rr = (bs(r)(c + 1) + k * bc(r)(c + 1)) * bc(r)(c)
        assert((l > rr) === (bs(r)(c) * bc(r)(c + 1) >
          bs(r)(c + 1) * bc(r)(c)), s"id $id shift variance")
      }
    }
  }

  test("q_image_neardup: pairs replay from a brute banded scan, " +
      "banding is recall-complete at the Hamming threshold, and " +
      "every emitted pair is a genuine near-dup") {
    import graft.SparkEntry
    val sf = SparkTestSession.sf
    val got = SparkEntry.queries("q_image_neardup")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    // brute: dHash every doc through the same codec
    val hashes = graft.Tables
      .documents(spark, sf).select($"doc_id").as[Long].collect()
      .map { id =>
        val w = 16 + (id % 16).toInt
        val h = 9 + (id % 9).toInt
        id -> Multimodal.JdkImageCodec.dHash64(
          Multimodal.JdkImageCodec.encodePng(id, w, h))
      }.toMap
    def bandsOf(h: Long): Seq[(Int, Long)] =
      (0 to 3).map(i => i -> ((h >>> (16 * i)) & 0xffffL))
    val postings = hashes.toSeq.flatMap { case (id, h) =>
      bandsOf(h).map { case (i, v) => (i, v) -> id }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = postings.valuesIterator
      .filter(_.size <= Multimodal.ImgBandCap)
      .flatMap(ids => for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSet
      .flatMap { p: (Long, Long) =>
        val ham = java.lang.Long.bitCount(hashes(p._1) ^ hashes(p._2))
        if (ham <= Multimodal.ImgHamMax) Some(p -> ham.toLong) else None
      }.toMap
    assert(got === want)
    assert(got.nonEmpty, "no near-dup pairs on this data — spec inert")
    // recall-completeness of the pigeonhole banding (cap aside):
    // every all-pairs near-dup whose bands are all under cap is found
    val underCap = postings.filter(_._2.size <= Multimodal.ImgBandCap)
      .values.flatten.toSet
    for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && underCap(a) && underCap(b)
      ham = java.lang.Long.bitCount(ha ^ hb)
      if ham <= Multimodal.ImgHamMax
    } assert(got.contains((a, b)) ||
        // pair survives only via a SHARED under-cap band
        !bandsOf(ha).zip(bandsOf(hb)).exists { case ((i, va), (_, vb)) =>
          va == vb && postings((i, va)).size <= Multimodal.ImgBandCap },
      s"missed near-dup ($a,$b) at hamming $ham")
  }

  test("JdkGifCodec: animated GIF round-trips every gray pixel " +
      "losslessly through the real javax.imageio writer/reader") {
    for (id <- Seq(0L, 7L, 123L)) {
      val (w, h, nf) = (16 + (id % 16).toInt, 9 + (id % 9).toInt,
        2 + (id % 4).toInt)
      val frames = JdkGifCodec.decodeFrames(JdkGifCodec.encode(id, w, h, nf))
      assert(frames.length === nf)
      frames.foreach { case (f, fw, fh, sum) =>
        assert((fw, fh) === ((w, h)))
        val want = (0 until w * h)
          .map(p => JdkGifCodec.defaultPixel(id, f, p).toLong).sum
        assert(sum === want, s"gif frame $f of video $id not lossless")
      }
    }
  }

  test("q_video_shots: GIF-decoded lumas replay the scene formula; " +
      "boundaries land exactly on the every-3-frames scene steps") {
    val sf = SparkTestSession.sf
    val rows = graft.SparkEntry.queries("q_video_shots")(spark, sf)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_boundaries"),
          r.getAs[Long]("n_shots"))).toMap
    rows.foreach { case (id, (nf, nb, ns)) =>
      assert(nf === 4 + id % 5)
      // scenes step at frames 3 and 6: nf in 4..6 → 1 boundary,
      // 7..8 → 2; the decoded-luma detector must find exactly those
      val wantB = if (nf <= 6) 1L else 2L
      assert(nb === wantB, s"media $id: boundaries $nb != $wantB")
      assert(ns === nb + 1)
    }
    assert(rows.values.exists(_._3 > 2)) // multi-scene media exist
  }

  test("q_byte_shots: luma deltas replay from the raw text payload; " +
      "shots = boundaries + 1; frame counts match the stride rule") {
    val sf = SparkTestSession.sf
    val rows = graft.SparkEntry.queries("q_byte_shots")(spark, sf)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_boundaries"),
          r.getAs[Long]("n_shots"))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
    assert(docs.length === rows.size)
    docs.foreach { d =>
      val t = d.getString(1).take(Multimodal.ShotPayload)
      val nFrames = math.max(t.length / 64, 1)
      val lumas = (0 until nFrames).map { i =>
        t.slice(i * 64, i * 64 + 32).map(_.toLong).sum
      }
      val boundaries = lumas.sliding(2).count {
        case Seq(a, b) => math.abs(b - a) > Multimodal.ShotThreshold
        case _ => false
      }.toLong
      val (gf, gb, gs) = rows(d.getLong(0))
      assert(gf === nFrames.toLong, s"media ${d.getLong(0)} frames")
      assert(gb === boundaries, s"media ${d.getLong(0)} boundaries")
      assert(gs === boundaries + 1)
    }
    // non-vacuity: multi-shot media exist on this corpus
    assert(rows.values.exists(_._3 > 1))
  }
}
