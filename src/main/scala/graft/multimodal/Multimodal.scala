package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition decode / feature-extraction.
  *
  * The decode kernels are STUBBED with a deterministic fake (no image/audio
  * codecs exist in this container) — clearly marked below. Everything
  * Spark-side is real and tested: the schema, the binary column handling,
  * the partition-wise batch processing shape (`mapPartitions` over an
  * iterator, the Scala analog of a pandas-batch UDF), and the feature
  * output contract (fixed-dim float vector + typed metadata struct).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the multimodal analog of
    * the collection point (id, payload, vectors).
    */
  final case class MediaRow(
      id: String, media: Array[Byte], format: String,
      width: Int, height: Int, durationMs: Long)

  final case class MediaFeatures(
      id: String, format: String, nBytes: Int, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("durationMs", LongType, nullable = true)))

  /** Synthesize a deterministic media table from `documents`: the UTF-8
    * bytes of the text play the role of an encoded image payload. Real
    * pipelines replace this with `spark.read.format("binaryFile")`.
    */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").cast(StringType).as("id"),
      encode(col("text"), "UTF-8").as("media"),
      concat(lit("fake/"), col("source")).as("format"),
      (col("n_chars") % 640).cast(IntegerType).as("width"),
      (col("n_chars") % 480).cast(IntegerType).as("height"),
      (col("n_chars") * 10L).as("durationMs"))
  }

  /** Pluggable decode kernel: a codec implementation (JPEG decode, audio
    * PCM, JNI bridge) drops in here without touching the tested Spark
    * plumbing — instances ship to executors inside the `mapPartitions`
    * closure, hence `Serializable`. The container has no media codecs, so
    * the shipped instances are [[FakeDecoder]] (deterministic stub, the
    * gate/oracle instance) and [[Utf8HistogramDecoder]] (a trivial but
    * REAL payload interpretation, proving the seam works).
    */
  trait Decoder extends Serializable {
    /** `dim` feature floats from one encoded payload (`bytes` never null). */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decode kernel: a deterministic fake embedding derived from the
    * raw bytes — exercises the partition-wise plumbing and the output
    * contract without any codec.
    */
  object FakeDecoder extends Decoder {
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31L * h + bytes(i)
        out(i % dim) += ((h % 1000L) / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** Trivial REAL decoder: interprets the payload as UTF-8 text (which the
    * synthetic media table's payloads are) and emits a character histogram
    * folded to `dim` — an actual decode step, not byte hashing, run
    * through the exact same extraction path as the stub.
    */
  object Utf8HistogramDecoder extends Decoder {
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < s.length) {
        out(s.charAt(i) % dim) += 1.0f
        i += 1
      }
      out
    }
  }

  /** Partition-wise feature extraction: iterator-in/iterator-out over each
    * partition (constant memory per executor; batch shape preserved). The
    * decode step is the injected [[Decoder]]; the Spark-side contract
    * (typed Dataset in, typed Dataset out, no shuffle) is the deliverable.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
                      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.media == null) Array.emptyByteArray else row.media
        MediaFeatures(row.id, row.format, bytes.length,
          decoder.decodeFeatures(bytes, dim))
      }
    }
  }

  /** End-to-end: synthetic table -> typed rows -> features DataFrame. */
  def featuresOf(spark: SparkSession, sfDir: String, dim: Int = 16,
                 decoder: Decoder = FakeDecoder): DataFrame = {
    import spark.implicits._
    extractFeatures(syntheticMediaTable(spark, sfDir).as[MediaRow], dim, decoder)
      .toDF()
  }

  /** One sampled frame of a media row (1-to-N explode shape). */
  final case class MediaFrame(
      id: String, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Frame sampling: each media row explodes to `min(maxFrames,
    * max(1, durationMs / everyMs))` frames via a partition-wise flatMap —
    * the 1-to-N iterator contract of a video decoder (constant memory,
    * no shuffle). The frame EXTRACTOR is the STUB (deterministic byte
    * slices of length nBytes/nFrames; a real pipeline decodes and seeks);
    * the sampling arithmetic, batch shape, and output schema are real.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L,
                   maxFrames: Int = 8): Dataset[MediaFrame] = {
    require(everyMs > 0 && maxFrames > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = if (row.media == null) Array.emptyByteArray else row.media
        val n = math.min(maxFrames.toLong,
          math.max(1L, row.durationMs / everyMs)).toInt
        val stride = bytes.length / n
        (0 until n).iterator.map { i =>
          MediaFrame(row.id, i, i * everyMs,
            bytes.slice(i * stride, i * stride + stride))
        }
      }
    }
  }

  /** Cross-media FRAME dedup: byte-identical sampled frames collapse to
    * one fingerprint group — the multimodal analog of exact text dedup
    * (re-encoded copies of the same clip share frames even when file
    * containers differ; a near-dup variant would swap this fingerprint
    * for a perceptual hash behind the same [[Decoder]] seam). One
    * rolling-hash pass per frame, one partial-aggregating groupBy on the
    * 64-bit fingerprint — frame BYTES never shuffle, only (fp, id)
    * pairs. Output: (frame_fp, n_frames, keeper = min media id).
    */
  def dedupFrames(frames: Dataset[MediaFrame]): DataFrame =
    frames.toDF()
      .select(col("id"),
        graft.functions.fingerprint64(decode(col("frame"), "UTF-8"))
          .as("frame_fp"))
      .groupBy(col("frame_fp"))
      .agg(count(lit(1)).as("n_frames"), min(col("id")).as("keeper"))

  /** Resize: metadata-true, payload-STUBBED — the output byte length
    * scales with the pixel ratio (a real kernel decodes, resamples, and
    * re-encodes), width/height metadata update for downstream consumers.
    * Partition-wise map, no shuffle.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    require(w > 0 && h > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        val srcPx = r.width.toLong * r.height
        // double arithmetic: len * (w*h) can overflow Long for large
        // upscale targets, which would wrap negative and empty the payload
        val outLen =
          if (srcPx <= 0L) 0
          else math.min(bytes.length.toDouble,
            bytes.length.toDouble * w * h / srcPx).toInt
        r.copy(media = bytes.take(outLen), width = w, height = h)
      }
    }
  }
}
