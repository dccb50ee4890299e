package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata,
  * processed by per-partition batch kernels. The Spark-side plumbing
  * — schema, Encoders, partitioning, batch iteration — is real; the
  * decode kernels are DETERMINISTIC STUBS (this container has no
  * image/audio codecs): they derive fake features from the raw bytes
  * so tests pin the dataflow. Swapping in a real codec is a local
  * change to `decodeKernel` only.
  */
object Multimodal {

  /** A media row: opaque payload + declared mime. */
  final case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)

  /** Decoded (stub) features. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      byte_len: Long,
      magic: String,
      width: Int,
      height: Int,
      brightness: Double,
  )

  /** STUB decode kernel — deterministic fake in place of a codec.
    * Real implementation would decode `content` here, one batch per
    * partition, reusing codec state across rows.
    */
  private def decodeKernel(r: MediaRow): MediaFeatures = {
    val b = r.content
    val len = b.length.toLong
    val magic = b.take(4).map(x => f"${x & 0xff}%02x").mkString
    val b0 = if (b.nonEmpty) b(0) & 0xff else 0
    val b1 = if (b.length > 1) b(1) & 0xff else 0
    // deterministic fake dimensions/stats derived from payload bytes
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      byte_len = len,
      magic = magic,
      width = 64 + b0 % 192,
      height = 64 + b1 % 192,
      brightness = (b.map(_ & 0xff).sum % 256) / 255.0,
    )
  }

  /** Wraps documents into media rows with a deterministic fake
    * payload (the UTF-8 text bytes standing in for e.g. JPEG bytes).
    */
  def attachPayload(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        concat(lit("image/fake-"), col("source")).as("mime"),
      )
      .as[MediaRow]
  }

  /** Partition-parallel decode: one kernel invocation per row, with
    * per-partition batch shape (the iterator lets a real codec hold
    * state/buffers across a partition's rows).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.map(decodeKernel))
  }

  /** Resize plumbing: rescales the (stub) decoded dimensions to fit
    * `maxSide`, preserving aspect ratio — the kernel shape a real
    * image resize (decode → scale → re-encode) would use, with the
    * pixel work stubbed.
    */
  def resize(media: Dataset[MediaRow], maxSide: Int = 224): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeFeatures(media).map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, math.round(f.width * scale).toInt),
        height = math.max(1, math.round(f.height * scale).toInt),
      )
    }
  }

  /** Frame sampling plumbing for "video" payloads: emits every
    * `stride`-th frame index up to a stub frame count derived from
    * payload size (real impl: container demux in the kernel).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10): DataFrame = {
    val feat = decodeFeatures(media)
    feat
      .withColumn("n_frames", (col("byte_len") / 16 + 1).cast("int"))
      .withColumn(
        "frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))),
      )
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
  }
}
