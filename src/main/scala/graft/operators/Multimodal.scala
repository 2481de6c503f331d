package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column plumbing for the training-data pipeline: media travel
  * as opaque `binary` columns with typed metadata; decode / feature-extract
  * / resize / frame-sample run as batched partition-level functions (the
  * Scala analog of `mapInPandas` — one buffer per partition batch, not one
  * call per row).
  *
  * Images are REAL: payloads are PNG bytes (synthesized deterministically
  * for the fixtures), decoded with the JDK's javax.imageio — no external
  * codec needed. "Videos" are a length-prefixed container of PNG frames
  * (no video codec ships with the JDK), so frame sampling decodes real
  * frames. `decodeStub` remains ONLY for media types with no JDK codec
  * (audio feature extraction etc.) and is clearly marked.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int,
                           features: Array[Float])

  // ---- deterministic synthetic media (fixtures) ---------------------------

  /** Image dims for doc k — closed-form so the DuckDB oracle can re-derive
    * them without decoding. */
  def synthDims(k: Long): (Int, Int) =
    (16 + (k % 17).toInt, 16 + ((k * 7) % 13).toInt)

  /** Channel value at (x, y); `frame` shifts video frames. Closed-form. */
  def synthPixel(k: Long, x: Int, y: Int, c: Int, frame: Int = 0): Int =
    ((k * 31 + y * 13 + x * 7 + c * 11 + frame * 17) % 256).toInt

  /** Deterministic PNG bytes for doc k (ImageIO's PNG writer is
    * deterministic for a given raster). */
  def encodePng(k: Long, frame: Int = 0): Array[Byte] = {
    val (w, h) = synthDims(k)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (synthPixel(k, x, y, 0, frame) << 16) |
          (synthPixel(k, x, y, 1, frame) << 8) | synthPixel(k, x, y, 2, frame))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Video container: 4-byte big-endian length + PNG bytes per frame. */
  def encodeFrameContainer(k: Long, nFrames: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    (0 until nFrames).foreach { f =>
      val png = encodePng(k, f)
      out.writeInt(png.length)
      out.write(png)
    }
    bos.toByteArray
  }

  // ---- real decode --------------------------------------------------------

  /** Decode one image payload with javax.imageio and extract the feature
    * vector: [meanR, meanG, meanB, w/1024, h/1024, 0 × 11] — per-channel
    * means over the DECODED pixels, so a broken decode cannot match the
    * oracle's analytic prediction. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val feats = new Array[Float](16)
    feats(0) = (sr.toDouble / n / 255.0).toFloat
    feats(1) = (sg.toDouble / n / 255.0).toFloat
    feats(2) = (sb.toDouble / n / 255.0).toFloat
    feats(3) = w.toFloat / 1024f
    feats(4) = h.toFloat / 1024f
    (w, h, feats)
  }

  /** Split a frame container into its PNG frame payloads. */
  def splitFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (in.available() >= 4) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      out += buf
    }
    out.toSeq
  }

  /** STUB decode for media types with NO JDK codec (e.g. audio): a real
    * implementation would call an external codec here. Deterministic fake
    * so the batch plumbing stays testable for those types too. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h0 = graft.core.SplitMix64.next(payload.length.toLong ^
      (if (payload.nonEmpty) payload(0).toLong << 8 else 0L))
    val width = 64 + (java.lang.Long.remainderUnsigned(h0, 960L)).toInt
    val height = 64 + (java.lang.Long.remainderUnsigned(graft.core.SplitMix64.next(h0), 960L)).toInt
    val feats = new Array[Float](16)
    var s = h0
    var i = 0
    while (i < feats.length) {
      s = graft.core.SplitMix64.next(s)
      feats(i) = ((s >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    (width, height, 1, feats)
  }

  /** Batched decode + feature extraction: mapPartitions so codec setup
    * amortizes across a partition's rows — the batch-shaped UDF contract of
    * the scale path. PNG payloads decode for real; unsupported types fall
    * back to the labeled stub. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would happen here (codec init, model load)
      rows.map { r =>
        if (r.media_type == "image/png") {
          val (w, h, feats) = decodeImage(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, 1, feats)
        } else {
          val (w, h, f, feats) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, f, feats)
        }
      }
    }
  }

  /** Real resize: decode → area-average scale → re-encode PNG. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "undecodable image payload")
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.drawImage(src.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** Batched resize over the media table. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.media_type == "image/png") r.copy(payload = resizeImage(r.payload, w, h))
      else r
    })
  }

  case class Frame(doc_id: Long, frame_idx: Int, features: Array[Float])

  /** Frame sampling: decode the container, pick `n` evenly spaced frames
    * (source index f·(F−1)/(n−1)), real per-frame features. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = splitFrames(r.payload)
      // empty/truncated container → no frames emitted (corrupt media rows
      // must not kill the job; the row count delta surfaces in metrics)
      if (frames.isEmpty) Iterator.empty
      else {
        val srcIdx =
          if (n == 1 || frames.size == 1) Seq.fill(n)(0)
          else (0 until n).map(f => f * (frames.size - 1) / (n - 1))
        srcIdx.zipWithIndex.iterator.map { case (src, f) =>
          val (_, _, feats) = decodeImage(frames(src))
          Frame(r.doc_id, f, feats)
        }
      }
    }
  }

  /** Real PNG media table from the documents table (deterministic synth —
    * payload bytes are an actual encoded image per doc_id). */
  def imagesFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(k => MediaRow(k, encodePng(k), "image/png"))
  }

  /** Frame-container media table (5 frames per doc). */
  def videosFromDocs(spark: SparkSession, docs: DataFrame,
                     nFrames: Int = 5): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(k => MediaRow(k, encodeFrameContainer(k, nFrames), "video/x-frames"))
  }

  /** Opaque binary media table from the documents table (payload = UTF-8
    * bytes of text — used by the metadata-plumbing query). */
  def mediaFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("image/stub-"), col("source")).as("media_type"))
      .as[MediaRow]
  }
}
