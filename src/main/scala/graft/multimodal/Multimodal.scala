package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed by per-partition batch decoders.
  *
  * The Spark-side plumbing (schema, partition sizing, batch iteration,
  * typed output) is real; the actual media decode is STUBBED behind
  * [[MediaDecoder]] because no image/audio libraries ship in this
  * container — swap [[FakeDecoder]] for a real implementation (JavaCV,
  * TwelveMonkeys, ...) without touching the pipeline.
  *
  * Scale notes: binary payloads dominate row size, so
  * spark.sql.files.maxPartitionBytes should be sized for ~hundreds of
  * records per partition; decode runs in mapPartitions so any native
  * decoder is initialized once per partition, not per record.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("source", StringType, nullable = true)))

  final case class MediaRecord(media_id: Long, media_type: String,
                               payload: Array[Byte], mime: String, source: String)

  final case class MediaFeatures(media_id: Long, media_type: String,
                                 width: Int, height: Int, n_frames: Int,
                                 duration_ms: Long, feature: Array[Float])

  /** Decoder contract: one instance per partition, batch-iterates records. */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Resizer contract: one instance per partition (native scalers init
    * once), record-in record-out so resize chains before decode/write. */
  trait MediaResizer extends Serializable {
    def resize(r: MediaRecord, width: Int, height: Int): MediaRecord
  }

  /** STUB decoder — deterministic fake features derived from the payload
    * byte LENGTH, so the decode contract is a documented pure function any
    * engine can recompute (this is what makes the q30 oracle possible).
    * Records tagged by [[FakeResizer]] report the tag's target dims.
    * Replace with a real decoder for production; the Spark-side plumbing
    * (schema, partitioning, per-partition decoder init) is unchanged. */
  final class FakeDecoder(featureDim: Int = 8) extends MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = Option(r.payload).map(_.length).getOrElse(0)
      val (w, h) = Option(r.mime)
        .filter(_.startsWith("resized/"))
        .map(_.stripPrefix("resized/").split('x'))
        .collect { case Array(a, b) => (a.toInt, b.toInt) }
        .getOrElse((len % 1024 + 16, (len / 7) % 1024 + 16))
      MediaFeatures(r.media_id, r.media_type,
        width = w,
        height = h,
        n_frames = if (r.media_type == "video") len % 300 + 1 else 1,
        duration_ms = if (r.media_type != "image") (len.toLong * 31L) % 60000L else 0L,
        feature = Array.tabulate(featureDim)(i => ((len * (i + 1)) % 997).toFloat / 997f))
    }
  }

  /** STUB resizer — pure and deterministic: the payload passes through and
    * the target dims ride the mime tag (`resized/WxH`), which the stub
    * decoder honors. A real implementation rescales the payload bytes;
    * the pipeline contract (schema, chaining, per-partition init) is
    * identical. */
  final class FakeResizer extends MediaResizer {
    def resize(r: MediaRecord, width: Int, height: Int): MediaRecord =
      r.copy(mime = s"resized/${width}x$height")
  }

  /** Decode/feature-extract: typed mapPartitions over the media table. */
  def extractFeatures(media: DataFrame,
                      decoder: MediaDecoder = new FakeDecoder()): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it => it.map(decoder.decode) }
  }

  /** Resize images to a uniform target (the standard pre-embedding
    * normalization pass): typed mapPartitions, one resizer per partition;
    * non-image records pass through untouched. */
  def resizeImages(media: DataFrame, width: Int, height: Int,
                   resizer: MediaResizer = new FakeResizer()): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      if (r.media_type == "image") resizer.resize(r, width, height) else r
    })
  }

  /** Frame sampling plan for video: every nth frame index as rows —
    * pure-relational (explode over a sequence), the decode of each sampled
    * frame happens in the decoder stage. */
  def sampleFrames(features: DataFrame, every: Int): DataFrame =
    features.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(every))))
      .select("media_id", "frame_idx")

  /** Build a synthetic media table from the documents table (testdata has
    * no binary columns; payload = utf8 bytes of the text). */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      col("source"))
}
