package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * STUB — `fakeDecode` below is a clearly-marked deterministic stand-in
  * (byte statistics instead of pixel decoding). Everything around it is
  * the real Spark plumbing: binary column + metadata schema, per-batch
  * processing via `mapPartitions` (the Scala analogue of `mapInPandas`
  * batches — one decoder init per partition, not per row), and
  * partition sizing controlled upstream by `repartition`.
  */
object MediaOps {

  case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String,
                         width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, byte_len: Int, mean_byte: Double,
                           checksum: Long, n_frames: Int, frame_checksums: Array[Long])

  /** Wrap a text table into an opaque-binary "media" table: bytes +
    * typed metadata (mime/width/height). On a real corpus this column
    * would come straight from parquet binary; the metadata derivation
    * here is deterministic filler — in PLAIN integer arithmetic
    * (round 10, was xxhash64: an engine-local hash made the resize
    * metadata un-oracleable; a Weyl-style multiply-add-mod any engine
    * replays bit-for-bit keeps the same spread and lets
    * `media_resize` grade its metadata chain end-to-end).
    */
  def attachMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/fake").as("mime"),
      (pmod(col("doc_id") * 40503L + 17L, lit(1280L)) + 64L)
        .cast("int").as("width"),
      (pmod(col("doc_id") * 69069L + 5L, lit(720L)) + 64L)
        .cast("int").as("height"))

  /** STUB DECODER — deterministic fake standing in for e.g. JPEG/PCM
    * decoding (real codecs are not in this container). Consumes the
    * byte buffer exactly like a real decoder would (bounded memory,
    * per-record) and emits numeric features.
    */
  private def fakeDecode(media: Array[Byte]): (Double, Long) = {
    var sum = 0L; var i = 0
    while (i < media.length) { sum += media(i) & 0xFF; i += 1 }
    (if (media.length == 0) 0.0 else sum.toDouble / media.length, sum)
  }

  /** STUB RESIZE — deterministic stand-in for an image/video resize
    * (no codecs in this container): scales the byte buffer to the
    * target pixel budget by stride sampling and rewrites the typed
    * metadata. The Spark-side shape is the real contract: binary in →
    * binary out with consistent metadata, per-partition batch
    * processing, output size proportional to target dims (the
    * downsample-before-shuffle pattern that makes 100 TB media
    * pipelines movable).
    */
  def resizeMedia(spark: SparkSession, media: DataFrame,
                  targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    val resized = media
      .select("doc_id", "media", "mime", "width", "height")
      .as[MediaRecord]
      .mapPartitions { it =>
        // real decoder/encoder init would go here (once per partition)
        it.map { r =>
          // empty/null media: emit an empty payload with the target
          // metadata (indexing math below would read media(-1))
          if (r.media == null || r.media.isEmpty)
            MediaRecord(r.doc_id, Array.emptyByteArray, r.mime, targetW, targetH)
          else {
            val inPixels = math.max(1L, r.width.toLong * r.height.toLong)
            val outPixels = targetW.toLong * targetH
            // fake "resample": keep bytes proportional to the pixel ratio
            // via stride sampling — deterministic, bounded output
            val outLen = math.max(1, (r.media.length.toLong * outPixels / inPixels)
              .min(r.media.length).toInt)
            val stride = math.max(1, r.media.length / outLen)
            val out = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) {
              out(i) = r.media(math.min(r.media.length - 1, i * stride))
              i += 1
            }
            MediaRecord(r.doc_id, out, r.mime, targetW, targetH)
          }
        }
      }
    resized.toDF()
  }

  /** Feature extraction + frame sampling over binary media columns.
    * `mapPartitions` so any expensive decoder state is initialized once
    * per partition (the mapInPandas batching idiom, Scala-side).
    * Frame sampling = fixed-stride 64-byte "frames", `frameEvery`-th
    * frame checksummed.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      frameEvery: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would go here (once per partition)
        it.map { case (id, bytes) =>
          val (meanB, checksum) = fakeDecode(bytes)
          val frameSize = 64
          val nFrames = bytes.length / frameSize
          val sampled = (0 until nFrames by frameEvery).map { f =>
            var s = 0L; var i = f * frameSize
            val end = i + frameSize
            while (i < end) { s = s * 31 + (bytes(i) & 0xFF); i += 1 }
            s
          }.toArray
          MediaFeatures(id, bytes.length, meanB, checksum, nFrames, sampled)
        }
      }
  }
}
