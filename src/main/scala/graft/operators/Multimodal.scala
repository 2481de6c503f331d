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
  * codec needed. Audio is REAL too: 16-bit PCM WAV decoded with
  * javax.sound.sampled (the JDK's WAV codec). "Videos" are a
  * length-prefixed container of PNG frames (no video codec ships with the
  * JDK), so frame sampling decodes real frames. Media types with no JDK
  * codec at all are handled as opaque bytes: metadata plus real BYTE-level
  * features (mean, printable fraction, Shannon entropy) — honest
  * content-derived statistics, not a fake decode.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every read/write of an
  // in-memory payload creates (and synchronizes on) a temp file. With the
  // decode passes now spread across all cores (QueryCatalog.spreadRead)
  // the per-call temp-file machinery serialized the tasks — 33 s of
  // blocked task time in a 1.1 s stage at sf0.1. Memory-backed caches
  // remove the lock and the disk round-trip; decoded bytes are identical.
  ImageIO.setUseCache(false)

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
    * deterministic for a given raster). `perturbR00` flips the red channel
    * of pixel (0, 0) by +128 (mod 256) — a one-pixel edit used to plant
    * NEAR-duplicate images: it can move at most the one [[dHash60]] bit
    * whose comparison involves grid point (0, 0). */
  def encodePng(k: Long, frame: Int = 0, perturbR00: Boolean = false): Array[Byte] = {
    val (w, h) = synthDims(k)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r =
          if (perturbR00 && x == 0 && y == 0)
            (synthPixel(k, x, y, 0, frame) + 128) % 256
          else synthPixel(k, x, y, 0, frame)
        img.setRGB(x, y, (r << 16) |
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

  /** 60-bit perceptual difference hash (dHash, Krawetz's gradient hash)
    * over the DECODED pixels: grayscale is sampled on an 11×6
    * nearest-neighbor grid (sx = gx·w/11, sy = gy·h/6 — integer division,
    * deterministic, no interpolation kernel to match cross-engine), and
    * bit gy·10+gx is set iff gray(gx+1, gy) > gray(gx, gy) — 10 horizontal
    * gradient comparisons per row × 6 rows = 60 bits, the same width as
    * the token simhash so the quarter-split pair machinery
    * ([[Dedup.hammingPairs]]) applies unchanged. Gray = r+g+b (integer,
    * 0..765 — no luma weights, keeping the oracle's closed-form replay
    * integer-exact). Scale/brightness-shift robustness is the dHash
    * property: gradients survive smooth global changes; a one-pixel edit
    * moves at most the bits whose comparisons sample that pixel. */
  def dHash60(payload: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    val gray = Array.ofDim[Int](6, 11)
    var gy = 0
    while (gy < 6) {
      var gx = 0
      while (gx < 11) {
        val sx = gx * w / 11; val sy = gy * h / 6
        val rgb = img.getRGB(sx, sy)
        gray(gy)(gx) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < 6) {
      var gx = 0
      while (gx < 10) {
        if (gray(gy)(gx + 1) > gray(gy)(gx)) hash |= 1L << (gy * 10 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Planted near-dup image table: doc k's payload is the base image of
    * its group of `groupSize` consecutive ids (k − k % groupSize), so each
    * group holds identical pixels — except the group's LAST member, which
    * carries the one-pixel (0,0) red perturbation (dHash distance ≤ 1 from
    * its group: a realistic re-encoded/retouched near-duplicate). Payloads
    * are real encoded PNGs; the image-dedup pass must DECODE them to see
    * any of this. */
  def nearDupImagesFromDocs(spark: SparkSession, docs: DataFrame,
                            groupSize: Int = 5): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { k =>
      val base = k - k % groupSize
      MediaRow(k, encodePng(base, 0, perturbR00 = k % groupSize == groupSize - 1),
        "image/png")
    }
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

  // ---- real audio (javax.sound.sampled — the JDK's WAV/PCM codec) ---------

  /** Deterministic sample count for doc k's synthetic WAV. */
  def synthAudioLen(k: Long): Int = 200 + (k % 100).toInt

  /** Deterministic 16-bit sample t of doc k: ((k·31 + t·17 + 7) mod 2048)
    * − 1024 — closed-form so the DuckDB oracle re-derives every sample. */
  def synthSample(k: Long, t: Int): Short =
    (((k * 31 + t.toLong * 17 + 7) % 2048) - 1024).toShort

  val AudioSampleRate = 8000f

  /** Deterministic WAV bytes for doc k: 16-bit signed little-endian PCM,
    * mono, 8 kHz, written by the JDK's WAVE writer. `perturbT0` adds 512
    * to sample 0 (wrapping in 16-bit space) — a one-sample edit used to
    * plant NEAR-duplicate audio: it can move at most the one [[aHash60]]
    * bit whose comparison samples position 0. */
  def encodeWav(k: Long, perturbT0: Boolean = false): Array[Byte] = {
    val n = synthAudioLen(k)
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s0 = synthSample(k, t)
      val s = if (perturbT0 && t == 0) ((s0 + 512).toShort) else s0
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    // canonical 44-byte RIFF/WAVE header + PCM, BYTE-IDENTICAL to what
    // AudioSystem.write(…, WAVE, …) emits for this format (pinned by
    // MultimodalSpec against the JDK writer): the JDK write path re-scans
    // the audio provider registry behind a class lock on EVERY call, which
    // serialized the spread-out synthesis tasks (54 s of blocked task time
    // in a 1.8 s stage at sf0.1). The DECODE side stays the real JDK codec
    // ([[decodeWav]]/[[decodeSamples]]) — the fixture writer is not part of
    // the codec-honesty contract, the parser is.
    val dataLen = pcm.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sr = AudioSampleRate.toInt // 8000 Hz, 16-bit mono PCM
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen).put(pcm)
    bb.array()
  }

  /** Integer-exact audio statistics from one decoded WAV payload: the
    * decode is REAL (AudioSystem parses the RIFF header and converts the
    * stream), so a broken codec path cannot reproduce the oracle's
    * closed-form sums. */
  case class AudioStats(sampleRate: Int, nSamples: Int, sumSamples: Long,
                        sumSquares: Long, zeroCrossings: Int)

  /** The JDK's audio file readers, resolved ONCE per JVM:
    * `AudioSystem.getAudioInputStream` re-scans the provider registry
    * behind a class lock on every call, which serialized the spread-out
    * decode tasks (the write-side had the same issue — see [[encodeWav]]).
    * This is the same SPI list AudioSystem consults, tried in the same
    * try-each-provider way; only the per-call registry scan is hoisted
    * (guide-§4.5 discipline: heavyweight lookup once, not per row). */
  @transient private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
  }

  /** Last reader that accepted a payload — tried FIRST on the next call.
    * Readers are stateless parsers and each container format is accepted
    * by exactly one of them (the PCM WAVE fixture only by WaveFileReader;
    * WaveFloat/WaveExtensible reject format-1 PCM), so the memo cannot
    * change which reader wins — it only skips the rejecting probes.
    * Measured: the JDK's SoftMidiAudioFileReader probe (tried before the
    * WAV reader in provider order) serializes 32 decode threads on the
    * MIDI subsystem — 240 ms vs 9 ms for 5000 decodes at 32 threads. */
  @volatile private var lastAudioReader: javax.sound.sampled.spi.AudioFileReader = null

  private def openAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val in = new ByteArrayInputStream(payload)
    val memo = lastAudioReader
    if (memo != null) {
      try return memo.getAudioInputStream(in)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => in.reset() }
    }
    audioReaders.foreach { r =>
      if (r ne memo) {
        try {
          val ais = r.getAudioInputStream(in)
          lastAudioReader = r
          return ais
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => in.reset() }
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed provider accepts this audio payload")
  }

  def decodeWav(payload: Array[Byte]): AudioStats = {
    val ais = openAudio(payload)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected 16-bit mono PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var sum = 0L; var sq = 0L; var zc = 0
    var prev = 0
    var t = 0
    while (t < n) {
      val lo = bytes(2 * t) & 0xff
      val hi = bytes(2 * t + 1).toInt
      val s = if (fmt.isBigEndian) ((bytes(2 * t).toInt << 8) | (bytes(2 * t + 1) & 0xff))
              else ((hi << 8) | lo)
      sum += s; sq += s.toLong * s
      if (t > 0 && prev * s < 0) zc += 1
      prev = s
      t += 1
    }
    AudioStats(fmt.getSampleRate.toInt, n, sum, sq, zc)
  }

  /** Decoded 16-bit samples of one WAV payload (real RIFF parse via
    * javax.sound.sampled — shared decode core with [[decodeWav]]). */
  def decodeSamples(payload: Array[Byte]): Array[Int] = {
    val ais = openAudio(payload)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected 16-bit mono PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var t = 0
    while (t < n) {
      out(t) =
        if (fmt.isBigEndian) (bytes(2 * t).toInt << 8) | (bytes(2 * t + 1) & 0xff)
        else (bytes(2 * t + 1).toInt << 8) | (bytes(2 * t) & 0xff)
      t += 1
    }
    out
  }

  /** 60-bit perceptual audio hash over the DECODED samples — the
    * [[dHash60]] gradient idea in one dimension: 61 nearest-sampled
    * positions p_i = i·n/61 (integer division — no resampling kernel to
    * match cross-engine), bit i set iff s(p_{i+1}) > s(p_i). Gradient
    * signs survive global gain/offset shifts; a one-sample edit moves at
    * most the bits whose comparisons sample that position. Same 60-bit
    * width as the token simhash / image dHash, so [[Dedup.hammingPairs]]
    * applies unchanged. */
  def aHash60(payload: Array[Byte]): Long = {
    val s = decodeSamples(payload)
    val n = s.length
    require(n >= 2, "audio too short to hash")
    var hash = 0L
    var i = 0
    while (i < 60) {
      val a = s(math.min((i.toLong * n / 61).toInt, n - 1))
      val b = s(math.min(((i + 1).toLong * n / 61).toInt, n - 1))
      if (b > a) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Planted near-dup audio table: doc k's payload is the base WAV of its
    * group of `groupSize` consecutive ids; each group's LAST member
    * carries the one-sample t=0 perturbation (aHash distance ≤ 1). */
  def nearDupAudioFromDocs(spark: SparkSession, docs: DataFrame,
                           groupSize: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { k =>
      val base = k - k % groupSize
      MediaRow(k, encodeWav(base, perturbT0 = k % groupSize == groupSize - 1),
        "audio/wav")
    }
  }

  /** Byte-level features for media types with NO JDK codec: mean byte
    * value, printable-ASCII fraction, Shannon entropy — real statistics of
    * the payload (deterministic, content-derived), not a fake decode. */
  def byteFeatures(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](16)
    if (payload.isEmpty) return feats
    val hist = new Array[Long](256)
    var sum = 0L; var printable = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b) += 1
      sum += b
      if (b >= 0x20 && b < 0x7f) printable += 1
      i += 1
    }
    val n = payload.length.toDouble
    var entropy = 0.0
    i = 0
    while (i < 256) {
      if (hist(i) > 0) { val p = hist(i) / n; entropy -= p * math.log(p) / math.log(2.0) }
      i += 1
    }
    feats(0) = (sum / n / 255.0).toFloat
    feats(1) = (printable / n).toFloat
    feats(2) = (entropy / 8.0).toFloat
    feats(3) = (payload.length.toFloat / (1 << 20))
    feats
  }

  /** Batched decode + feature extraction: mapPartitions so codec setup
    * amortizes across a partition's rows — the batch-shaped UDF contract of
    * the scale path. PNG and WAV payloads decode for real; types with no
    * JDK codec get opaque byte-level features (width/height/frames 0). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would happen here (codec init, model load)
      rows.map { r =>
        r.media_type match {
          case "image/png" =>
            val (w, h, feats) = decodeImage(r.payload)
            MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, 1, feats)
          case "audio/wav" =>
            val a = decodeWav(r.payload)
            val feats = new Array[Float](16)
            feats(0) = (math.sqrt(a.sumSquares.toDouble / a.nSamples) / 32768.0).toFloat // rms
            feats(1) = if (a.nSamples > 1) a.zeroCrossings.toFloat / (a.nSamples - 1) else 0f
            feats(2) = a.nSamples.toFloat / a.sampleRate // duration s
            feats(3) = (a.sumSamples.toDouble / a.nSamples / 32768.0).toFloat // DC offset
            MediaFeatures(r.doc_id, r.media_type, r.payload.length, 0, 0, a.nSamples, feats)
          case _ =>
            MediaFeatures(r.doc_id, r.media_type, r.payload.length, 0, 0, 0,
              byteFeatures(r.payload))
        }
      }
    }
  }

  /** Integer-exact audio stats table (the `multimodal_audio` query surface):
    * every column is an exact integer over the DECODED samples, so the
    * DuckDB oracle can predict them from the synth formula with no FP
    * hazard. */
  def decodeAudioStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val a = decodeWav(r.payload)
      (r.doc_id, r.payload.length, a.sampleRate, a.nSamples, a.sumSamples,
        a.sumSquares, a.zeroCrossings)
    }).toDF("doc_id", "n_bytes", "sample_rate", "n_samples", "sum_samples",
      "sum_squares", "zero_crossings")
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

  /** Real WAV media table from the documents table (deterministic synth —
    * payload bytes are an actual RIFF/WAVE file per doc_id). */
  def audioFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(k => MediaRow(k, encodeWav(k), "audio/wav"))
  }

  /** Opaque binary media table from the documents table (payload = UTF-8
    * bytes of text — used by the metadata-plumbing query and the no-codec
    * byte-features path). */
  def mediaFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("application/x-"), col("source")).as("media_type"))
      .as[MediaRow]
  }
}
