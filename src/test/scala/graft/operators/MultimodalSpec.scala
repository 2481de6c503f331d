package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("multimodal plumbing: batched decode produces typed features, deterministic across partitionings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocs(spark, docs)
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length == docs.count())
    assert(out.forall(_.features.length == 16))
    // opaque (no-JDK-codec) types: no decode dims, real byte-level stats —
    // text payloads are overwhelmingly printable ASCII with entropy > 0
    assert(out.forall(f => f.width == 0 && f.height == 0 && f.n_frames == 0))
    assert(out.forall(f => f.n_bytes > 0))
    assert(out.forall(f => f.features(1) > 0.9f && f.features(2) > 0f))
    // repartitioned run yields identical rows (pure function of payload)
    val out2 = Multimodal.decodeFeatures(media.repartition(7)).collect()
    assert(out.map(f => (f.doc_id, f.width, f.features.toSeq)).toSet ==
      out2.map(f => (f.doc_id, f.width, f.features.toSeq)).toSet)
  }

  test("real PNG codec: encode→decode roundtrip recovers dims and exact channel means") {
    // a known synthetic PNG decodes to the encoded pixels (not a stub)
    val k = 123L
    val (w, h) = Multimodal.synthDims(k)
    val (dw, dh, feats) = Multimodal.decodeImage(Multimodal.encodePng(k))
    assert((dw, dh) == (w, h))
    var sr = 0L
    for (y <- 0 until h; x <- 0 until w) sr += Multimodal.synthPixel(k, x, y, 0)
    assert(feats(0) == (sr.toDouble / (w * h) / 255.0).toFloat)
    assert(feats(3) == w.toFloat / 1024f && feats(4) == h.toFloat / 1024f)

    // resize re-encodes a real PNG with the requested dims
    val resized = Multimodal.decodeImage(Multimodal.resizeImage(Multimodal.encodePng(k), 8, 6))
    assert((resized._1, resized._2) == (8, 6))

    // frame container: 5 frames in, 3 evenly spaced out (0, 2, 4)
    import spark.implicits._
    val media = Multimodal.videosFromDocs(spark,
      spark.range(0, 4).select(org.apache.spark.sql.functions.col("id").as("doc_id")))
    val frames = Multimodal.sampleFrames(media, n = 3).collect()
    assert(frames.length == 12 && frames.map(_.frame_idx).distinct.sorted.sameElements(Array(0, 1, 2)))
    // frame 1 samples source frame 2: its red mean differs from frame 0's
    val f0 = frames.find(f => f.doc_id == 1 && f.frame_idx == 0).get
    val f1 = frames.find(f => f.doc_id == 1 && f.frame_idx == 1).get
    assert(f0.features(0) != f1.features(0))
  }

  test("WAV fixture writer is byte-identical to the JDK WAVE writer") {
    // encodeWav writes the canonical RIFF header directly (the JDK write
    // path re-scans the provider registry behind a class lock per call —
    // it serialized the spread decode tasks); this pin keeps the manual
    // bytes exactly what AudioSystem.write would have produced, so the
    // swap is invisible to every consumer (payload lengths included).
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    for (k <- Seq(0L, 1L, 7L, 42L, 99L); pert <- Seq(false, true)) {
      val n = Multimodal.synthAudioLen(k)
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { t =>
        val s0 = Multimodal.synthSample(k, t)
        val s = if (pert && t == 0) (s0 + 512).toShort else s0
        pcm(2 * t) = (s & 0xff).toByte
        pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(Multimodal.AudioSampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(Multimodal.encodeWav(k, pert), bos.toByteArray),
        s"manual WAV bytes diverge from the JDK writer at k=$k pert=$pert")
    }
  }

  test("real WAV codec: encode→decode roundtrip recovers exact sample statistics") {
    val k = 42L
    val n = Multimodal.synthAudioLen(k)
    val a = Multimodal.decodeWav(Multimodal.encodeWav(k))
    assert(a.sampleRate == 8000 && a.nSamples == n)
    // closed-form ground truth straight from the synth formula
    val samples = (0 until n).map(t => Multimodal.synthSample(k, t).toInt)
    assert(a.sumSamples == samples.map(_.toLong).sum)
    assert(a.sumSquares == samples.map(s => s.toLong * s).sum)
    assert(a.zeroCrossings == samples.sliding(2).count(p => p(0) * p(1) < 0))
    // the audio path flows through decodeFeatures with real rms/zcr/duration
    import spark.implicits._
    val media = Multimodal.audioFromDocs(spark,
      spark.range(0, 5).select(org.apache.spark.sql.functions.col("id").as("doc_id")))
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 5 && feats.forall(f => f.n_frames > 0 && f.features(0) > 0f))
  }

  test("SQL function registration: cell functions + tile_windows usable from SQL") {
    val s = spark
    graft.functions.CellFunctions.register(s)
    graft.functions.TileWindowsGenerator.register(s)
    val r = s.sql("SELECT cell_id(10.0d, 20.0d, 8) AS c, " +
      "size(k_ring(cell_id(10.0d, 20.0d, 8), 1, 8)) AS nk").head()
    assert(r.getLong(0) == graft.core.CellIndex.cellId(10.0, 20.0, 8))
    assert(r.getInt(1) == 9)
    val tw = s.sql("SELECT t.* FROM (SELECT 483 w, 216 h) " +
      "LATERAL VIEW tile_windows(w, h, 128, 128, 'whole_overlap') t").count()
    assert(tw == 8)
  }

  test("GraftExtensions injects the function set") {
    // unit-level: the extensions object wires all five functions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(ext)
    // smoke: building a throwaway session with extensions is covered by
    // spark.sql.extensions in production; here we only assert apply() runs
    succeed
  }

  test("dHash60: identical payloads collide, a one-pixel edit is hamming <= 1, planted groups pair up") {
    import spark.implicits._
    // determinism + near-dup property of the perceptual hash itself
    val base = Multimodal.dHash60(Multimodal.encodePng(40L))
    assert(base == Multimodal.dHash60(Multimodal.encodePng(40L)))
    val pert = Multimodal.dHash60(Multimodal.encodePng(40L, 0, perturbR00 = true))
    assert(java.lang.Long.bitCount(base ^ pert) <= 1,
      s"one-pixel edit moved ${java.lang.Long.bitCount(base ^ pert)} dHash bits")
    // distinct base images should not all collide (gradient bits are live)
    val others = Seq(1L, 2L, 3L, 7L, 13L).map(k => Multimodal.dHash60(Multimodal.encodePng(k)))
    assert((others :+ base).distinct.size >= 4)
    // end-to-end: two planted groups of 5 (4 identical + 1 near-dup each)
    val docs = (0L until 10L).toDF("doc_id")
    val hashes = Multimodal.nearDupImagesFromDocs(spark, docs)
      .mapPartitions(_.map(r => (r.doc_id, Multimodal.dHash60(r.payload))))
      .toDF("id", "h")
    val pairs = Dedup.hammingPairs(hashes, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (g <- Seq(0L, 5L); i <- 0 until 5; j <- (i + 1) until 5)
      assert(pairs.contains((g + i, g + j)), s"missing within-group pair ${g + i},${g + j}")
    assert(pairs((0L, 1L)) == 0 && pairs((5L, 6L)) == 0) // byte-identical members
    assert(pairs((0L, 4L)) <= 1)                         // the perturbed member
    spark.catalog.clearCache() // hammingPairs' persisted blocking frames
  }

  test("aHash60: identical WAVs collide, a one-sample edit is hamming <= 1, planted groups pair up") {
    import spark.implicits._
    val base = Multimodal.aHash60(Multimodal.encodeWav(12L))
    assert(base == Multimodal.aHash60(Multimodal.encodeWav(12L)))
    val pert = Multimodal.aHash60(Multimodal.encodeWav(12L, perturbT0 = true))
    assert(java.lang.Long.bitCount(base ^ pert) <= 1,
      s"one-sample edit moved ${java.lang.Long.bitCount(base ^ pert)} aHash bits")
    val others = Seq(4L, 8L, 16L, 20L).map(k => Multimodal.aHash60(Multimodal.encodeWav(k)))
    assert((others :+ base).distinct.size >= 3)
    val docs = (0L until 8L).toDF("doc_id")
    val hashes = Multimodal.nearDupAudioFromDocs(spark, docs)
      .mapPartitions(_.map(r => (r.doc_id, Multimodal.aHash60(r.payload))))
      .toDF("id", "h")
    val pairs = Dedup.hammingPairs(hashes, maxHamming = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (g <- Seq(0L, 4L); i <- 0 until 4; j <- (i + 1) until 4)
      assert(pairs.contains((g + i, g + j)), s"missing within-group pair ${g + i},${g + j}")
    assert(pairs((0L, 1L)) == 0 && pairs((4L, 5L)) == 0)
    assert(pairs((0L, 3L)) <= 1)
    spark.catalog.clearCache()
  }
}
