package graft.operators

import java.awt.RenderingHints
import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/video) columns: opaque `binary` payloads with
  * typed metadata, processed by REAL pure-JVM kernels — `javax.imageio`
  * ships with every JDK and is headless-safe, so PNG/GIF/JPEG decode,
  * `Graphics2D` resize + re-encode, and multi-frame (animated GIF)
  * sampling need no external codec library.
  *
  * Kernels run per partition via `mapPartitions`/typed `map` so a real
  * pipeline can hold codec state across a partition's rows; ImageIO's
  * disk-backed stream cache is disabled (payloads are in-memory byte
  * arrays — a temp-file per row would dominate the decode cost).
  *
  * Scale shape: decode/resize/sample are scan-speed per-row map work —
  * no shuffle, no state, embarrassingly parallel over whatever
  * partitioning the payload table already has. At 100 TB the only
  * tuning is `spark.sql.files.maxPartitionBytes` vs payload size.
  *
  * The reference (`/root/reference`) has no multimodal surface; this
  * extends the engine for LLM training-data pipelines. Synthesized
  * payloads are REAL encoded bytes (PNG truecolor, animated GIF) with
  * closed-form pixel content, so the DuckDB oracle replays decoded
  * dimensions and channel means exactly from `doc_id` arithmetic.
  */
object Multimodal {

  ImageIO.setUseCache(false)

  /** A media row: opaque payload + declared mime. */
  final case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)

  /** Real decoded image features: dimensions, component count, exact
    * per-channel means over the decoded pixels.
    */
  final case class ImageFeatures(
      doc_id: Long,
      mime: String,
      magic: String,
      width: Int,
      height: Int,
      channels: Int,
      mean_red: Double,
      mean_green: Double,
      mean_blue: Double,
  )

  /** One sampled frame of a multi-frame (animated GIF) payload. */
  final case class FrameSample(
      doc_id: Long,
      frame_idx: Int,
      n_frames: Int,
      width: Int,
      height: Int,
      mean_gray: Double,
  )

  private def hexMagic(b: Array[Byte]): String =
    b.take(4).map(x => f"${x & 0xff}%02x").mkString

  // ---- deterministic synthetic payloads (real encoded bytes) ----

  private[graft] def pngDims(id: Long): (Int, Int) =
    (16 + (id % 17).toInt, 16 + (id % 13).toInt)

  private[graft] def pngColors(id: Long): ((Int, Int, Int), (Int, Int, Int)) = (
    (((id * 31) % 256).toInt, ((id * 57) % 256).toInt, ((id * 91) % 256).toInt),
    (((id * 17) % 256).toInt, ((id * 29) % 256).toInt, ((id * 43) % 256).toInt),
  )

  /** Real PNG bytes: a w×h truecolor image, left half one color and
    * right half another, both derived from the id — PNG is lossless,
    * so the decoded channel means have the closed form the oracle
    * replays.
    */
  private[graft] def synthPng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val ((ra, ga, ba), (rb, gb, bb)) = pngColors(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val pxA = (ra << 16) | (ga << 8) | ba
    val pxB = (rb << 16) | (gb << 8) | bb
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) pxA else pxB)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[graft] def gifParams(id: Long): (Int, Int, Int) =
    (3 + (id % 6).toInt, 8 + (id % 9).toInt, 8 + (id % 7).toInt) // (nFrames, w, h)

  private[graft] def gifFrameGray(id: Long, frame: Int): Int =
    ((id * 13 + frame * 37L) % 256).toInt

  /** Real animated-GIF bytes: nFrames constant-gray frames. Each frame
    * carries an explicit 2-entry palette holding exactly its gray
    * value, so GIF's palettization is lossless and the decoded frame
    * mean replays in closed form.
    */
  private[graft] def synthGif(id: Long): Array[Byte] = {
    val (nFrames, w, h) = gifParams(id)
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var i = 0
      while (i < nFrames) {
        val g = gifFrameGray(id, i).toByte
        val cm = new IndexColorModel(8, 2, Array(g, 0.toByte), Array(g, 0.toByte), Array(g, 0.toByte))
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
        // raster defaults to index 0 = the frame's gray
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Per-doc real PNG payloads (deterministic from doc_id). Codec
    * work is CPU-bound per row — graft.sources.Par.spread guards the
    * stage's parallelism against under-split inputs.
    */
  def synthesizeImages(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Par.spread(docs.select(col(idCol).cast("long")))
      .as[Long]
      .mapPartitions(_.map(id => MediaRow(id, synthPng(id), "image/png")))
  }

  /** Per-doc real animated-GIF payloads (deterministic from doc_id). */
  def synthesizeVideos(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Par.spread(docs.select(col(idCol).cast("long")))
      .as[Long]
      .mapPartitions(_.map(id => MediaRow(id, synthGif(id), "image/gif")))
  }

  /** Opaque payload attach for format-agnostic metadata plumbing: the
    * UTF-8 text bytes as a stand-in binary payload.
    */
  def attachPayload(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        concat(lit("application/octet-"), col("source")).as("mime"),
      )
      .as[MediaRow]
  }

  /** Payload metadata without decoding: byte length + magic prefix —
    * the format-sniffing pass a pipeline runs before routing payloads
    * to per-format decode kernels.
    */
  def metadata(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .map(r => (r.doc_id, r.mime, r.content.length.toLong, hexMagic(r.content)))
      .toDF("doc_id", "mime", "byte_len", "magic")
  }

  /** REAL image decode: `ImageIO.read` over the payload bytes →
    * dimensions, component count, exact per-channel means.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeKernel))
  }

  private def decodeKernel(r: MediaRow): ImageFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(r.content))
    require(img != null, s"undecodable payload for doc ${r.doc_id} (${r.mime})")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        sr += (px >> 16) & 0xff
        sg += (px >> 8) & 0xff
        sb += px & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      magic = hexMagic(r.content),
      width = w,
      height = h,
      channels = img.getColorModel.getNumComponents,
      mean_red = sr.toDouble / n,
      mean_green = sg.toDouble / n,
      mean_blue = sb.toDouble / n,
    )
  }

  /** REAL resize: decode → `Graphics2D` bilinear scale to fit
    * `maxSide` (aspect-preserving, never upscales) → re-encode PNG.
    * Returns media rows so it composes with [[decodeImages]] /
    * downstream sinks.
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int = 224): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.content))
      require(img != null, s"undecodable payload for doc ${r.doc_id} (${r.mime})")
      val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
      val rw = math.max(1, math.round(img.getWidth * scale).toInt)
      val rh = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR,
        )
        g.drawImage(img, 0, 0, rw, rh, null)
      } finally g.dispose()
      MediaRow(r.doc_id, encodePng(out), "image/png")
    })
  }

  /** REAL frame sampling: multi-frame decode (animated GIF via the
    * JDK's GIF `ImageReader`), emitting every `stride`-th frame with
    * its decoded dimensions and gray mean.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameSample] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.content))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val frames = (0 until n by stride).map { i =>
          val img = reader.read(i)
          val w = img.getWidth
          val h = img.getHeight
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          FrameSample(r.doc_id, i, n, w, h, s.toDouble / (w.toLong * h))
        }
        iis.close()
        frames
      }
    }
  }
}
