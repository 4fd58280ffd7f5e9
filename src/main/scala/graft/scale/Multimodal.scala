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
  * in whole-stage codegen. The CODEC itself is a clearly-marked
  * deterministic fake — this container has no image/audio libraries —
  * see [[FakeCodec.decode]]; swapping in a real decoder changes one
  * function.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  case class DecodedMeta(media_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, checksum: Long)
  case class MediaFeatures(media_id: Long, histogram: Array[Long])

  /** STUB — deterministic fake codec. A real implementation would
    * dispatch to an image/audio library per `kind`; the container has
    * none, so "decode" parses our synthetic 8-byte header
    * (big-endian width, height) and checksums the payload. The
    * signature and batch shape are what a real codec plugs into. */
  object FakeCodec {
    def decode(row: MediaRow): DecodedMeta = {
      val b = row.media
      def be32(o: Int): Int =
        ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
          ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      var sum = 0L
      var i = 8
      while (i < b.length) { sum = sum * 31 + (b(i) & 0xff); i += 1 }
      DecodedMeta(row.media_id, row.kind, be32(0), be32(4),
        b.length.toLong, sum)
    }
  }

  /** Deterministic synthetic media table (generator for tests/demos):
    * header = (width, height), payload bytes are a function of
    * (media_id, offset) only. */
  def synthetic(spark: SparkSession, n: Int,
      payloadBytes: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val width = 16 + (id % 16).toInt
      val height = 9 + (id % 9).toInt
      val b = new Array[Byte](8 + payloadBytes)
      def put32(o: Int, v: Int): Unit = {
        b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
        b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
      }
      put32(0, width); put32(4, height)
      var i = 0
      while (i < payloadBytes) {
        b(8 + i) = (((id * 31 + i) * 2654435761L) >>> 24).toByte
        i += 1
      }
      MediaRow(id, if (id % 3 == 0) "image" else "audio", b)
    }
  }

  /** Decode via the codec, batched per partition (the shape a real
    * vectorized decoder wants: one codec init per partition, streamed
    * rows — the Scala analogue of a pandas-batch UDF). */
  def decodeMeta(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen here, once per partition
      it.map(FakeCodec.decode)
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
    * Catalyst prune the blob for metadata-only queries downstream). */
  def headerMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      conv(hex(substring(col("media"), 1, 4)), 16, 10).cast("int")
        .as("width"),
      conv(hex(substring(col("media"), 5, 4)), 16, 10).cast("int")
        .as("height"),
      length(col("media")).cast("long").as("n_bytes"))

  /** "Resize": downsample the payload by `factor` (every factor-th
    * byte) and rewrite the header to the scaled dimensions. STUB —
    * a real implementation would be a codec call; the pipeline shape
    * (binary → binary, metadata kept in sync) is the tested part. */
  def resize(spark: SparkSession, media: Dataset[MediaRow],
      factor: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(factor >= 1)
    media.mapPartitions { it =>
      it.map { row =>
        val b = row.media
        def be32(o: Int): Int =
          ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
            ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        val w2 = math.max(1, be32(0) / factor)
        val h2 = math.max(1, be32(4) / factor)
        val payload = (8 until b.length by factor).map(b(_)).toArray
        val out = new Array[Byte](8 + payload.length)
        def put32(o: Int, v: Int): Unit = {
          out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
          out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
        }
        put32(0, w2); put32(4, h2)
        System.arraycopy(payload, 0, out, 8, payload.length)
        MediaRow(row.media_id, row.kind, out)
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
    media.select(col("media_id"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0))))
          .as("frame_idx"))
      .join(media.select(col("media_id"), col("media")), "media_id")
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
      FROM m"""))
  )
}
