package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2 B23): media travels as an opaque
  * `BINARY` payload column next to a typed metadata struct; decode /
  * feature-extract / frame-sample run as partition-local batch operators
  * (`Dataset.mapPartitions` — the Scala analog of `mapInPandas`: one
  * iterator of rows per partition, vectorizable per batch, no shuffle).
  *
  * The actual byte->pixels/samples decode is STUBBED (no media libs in this
  * environment): [[FakeDecoder]] derives deterministic features from the
  * bytes so the schema, partitioning, batch shape, and downstream plumbing
  * are real and testable. Swapping in a real decoder changes ONE function.
  *
  * At 100 TB: payloads stay columnar parquet binary; decode is
  * embarrassingly parallel (no shuffle), so throughput scales linearly with
  * executors; frame explosion multiplies rows BEFORE any wide operation, so
  * repartition-after-explode is the one knob to watch.
  */
object Multimodal {

  /** A decoded media record: fixed-dim feature vector + per-frame count.
    * (What a real image decoder would emit after resize + pooling.)
    */
  final case class MediaFeatures(
      id: Long, n_bytes: Int, n_frames: Int, features: Array[Float])

  /** STUB decoder — deterministic stand-in for an image/audio decode.
    * Real implementation would parse `payload` with an imaging/audio lib;
    * here: 8-dim byte-histogram moments, stable across runs/partitions.
    */
  object FakeDecoder {
    val featureDim = 8
    def decode(id: Long, payload: Array[Byte]): MediaFeatures = {
      val hist = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xFF) % featureDim) += 1
        i += 1
      }
      val n = math.max(payload.length, 1)
      MediaFeatures(id, payload.length, frameCount(payload),
        hist.map(h => h.toFloat / n))
    }
    /** "Frames" = fixed 256-byte chunks (a video decoder's frame count). */
    def frameCount(payload: Array[Byte]): Int =
      math.max((payload.length + 255) / 256, 1)
  }

  /** Media table from documents: the text bytes stand in for a blob, with a
    * typed metadata struct alongside — the storage shape for any modality.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin"),
        col("lang").as("tag")).as("metadata"))

  /** Partition-local batch decode: binary -> feature vectors. No shuffle;
    * the iterator shape lets a real decoder amortize per-batch setup
    * (model load, codec init) exactly like mapInPandas batches.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup would go here (decoder/model init, once)
        rows.map { case (id, payload) => FakeDecoder.decode(id, payload) }
      }
  }

  /** "Resize": deterministic payload decimation — keep every `factor`-th
    * byte (stand-in for an image downscale; a real implementation decodes,
    * scales, re-encodes in the same partition-local batch shape). Output
    * schema mirrors the input so resized media flows through the same
    * downstream operators.
    */
  def resize(media: DataFrame, factor: Int = 4): Dataset[(Long, Array[Byte])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = new Array[Byte]((payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = payload(i * factor); i += 1 }
          (id, out)
        }
      }
  }

  /** Frame sampling: every `stride`-th 256-byte chunk becomes a frame row
    * (id, frame_no, frame_bytes). Row-multiplying, so it runs BEFORE any
    * wide op and the caller controls post-explode partitioning.
    */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / 256)
      .cast("int")
    media.select(col("media_id"), col("payload"),
        greatest(nFrames, lit(1)).as("n_frames"))
      .withColumn("frame_no",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_no"),
        col("payload").substr(col("frame_no") * 256 + 1, lit(256))
          .as("frame_bytes"))
  }
}
