package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for the training-data pipeline: media travel
  * as opaque `binary` columns with typed metadata; decode / feature-extract
  * / resize / frame-sample run as batched partition-level functions (the
  * Scala analog of `mapInPandas` — one buffer per partition batch, not one
  * call per row).
  *
  * The image/audio codec libraries are NOT available in this environment,
  * so `decodeStub` is a clearly-marked deterministic fake; everything
  * around it — schema, batch shape, partitioning, null handling — is the
  * real distributed plumbing and is tested. Swap `decodeStub` for a real
  * codec (e.g. TwelveMonkeys/JavaCV) to productionize.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int,
                           features: Array[Float])

  /** STUB decode: a real implementation would call an image/audio codec
    * here. This deterministic fake derives "dimensions" and a fixed-length
    * feature vector from the payload bytes so the pipeline is testable. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h0 = graft.core.SplitMix64.next(payload.length.toLong ^
      (if (payload.nonEmpty) payload(0).toLong << 8 else 0L))
    val width = 64 + (java.lang.Long.remainderUnsigned(h0, 960L)).toInt
    val height = 64 + (java.lang.Long.remainderUnsigned(graft.core.SplitMix64.next(h0), 960L)).toInt
    val frames = 1
    val feats = new Array[Float](16)
    var s = h0
    var i = 0
    while (i < feats.length) {
      s = graft.core.SplitMix64.next(s)
      feats(i) = ((s >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    (width, height, frames, feats)
  }

  /** Batched decode + feature extraction: mapPartitions so a real codec can
    * amortize per-batch setup (model load, native buffers) across rows —
    * the batch-shaped UDF contract of the scale path. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would happen here (codec init, model load)
      rows.map { r =>
        val (w, h, f, feats) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, f, feats)
      }
    }
  }

  /** STUB resize: a real codec would decode → scale → re-encode; the fake
    * derives the "resized" payload deterministically so downstream schema /
    * partitioning behavior is testable. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(payload.length, w * h / 64 + 16))
    var i = 0
    while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    out
  }

  /** Batched resize over the media table. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => r.copy(payload = resizeStub(r.payload, w, h))))
  }

  case class Frame(doc_id: Long, frame_idx: Int, features: Array[Float])

  /** STUB frame sampling: emit `n` deterministic frames per video payload —
    * the flatMap shape (1 row → n frames) is the real pipeline plumbing. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      (0 until n).map { f =>
        val (_, _, _, feats) = decodeStub(r.payload :+ f.toByte)
        Frame(r.doc_id, f, feats)
      }
    }
  }

  /** Build a media table from the documents table (payload = UTF-8 bytes of
    * text — the stand-in binary column for this environment). */
  def mediaFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("image/stub-"), col("source")).as("media_type"))
      .as[MediaRow]
  }
}
