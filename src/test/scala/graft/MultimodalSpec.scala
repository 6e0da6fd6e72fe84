package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")

  test("binary column plumbing: bytes carried opaquely, features deterministic") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    assert(media.schema("bytes").dataType.typeName == "binary")
    val f = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f.map(_.byte_len).toSeq == Seq(11L, 5L))
    // determinism: same input → same stub decode
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f.forall(x => x.width >= 64 && x.height >= 64 && x.n_frames >= 1))
  }

  test("frame sampling explodes one media row into n frame rows") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, media, stride = 4)
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(counts(1L) == 2L) // 11 bytes / 4 = 2
    assert(counts(2L) == 1L) // max(1, 5/4)
  }

  test("real codec: ImageIO decodes and resizes actual PNG/BMP payloads through the same path") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def img(w: Int, h: Int, fmt: String): Array[Byte] = {
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) b.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(b, fmt, bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, img(20, 12, "png"), "image/png"),
      Multimodal.MediaRow(2L, img(8, 5, "bmp"), "image/bmp")
    ).toDS().toDF()
    // same mapPartitions feature-extract stage, real header parse
    val f = Multimodal.extractFeatures(spark, media, Multimodal.ImageIoCodec)
      .collect().sortBy(_.media_id)
    assert(f(0).width == 20 && f(0).height == 12 && f(0).n_frames == 1)
    assert(f(1).width == 8 && f(1).height == 5)
    assert(f(0).checksum == Multimodal.fnv1a(img(20, 12, "png")))
    // same mapPartitions resize stage, real rescale: decode the output and
    // check the actual pixel box
    val r = Multimodal.resize(spark, media.filter($"media_id" === 1L),
      targetW = 10, targetH = 6, codec = Multimodal.ImageIoCodec).collect().head
    val back = ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
    assert(back.getWidth == 10 && back.getHeight == 6)
  }

  test("resize stub: payload shrinks toward the target box, metadata updated, deterministic") {
    val media = Multimodal.withFakeMedia(
      Seq((1L, "x" * 5000)).toDF("doc_id", "text"), "doc_id", "text")
    val r = Multimodal.resize(spark, media, targetW = 32, targetH = 32)
      .collect().head
    assert(r.target_w == 32 && r.target_h == 32)
    assert(r.bytes.length < 5000 && r.bytes.length > 0) // downsampled
    val r2 = Multimodal.resize(spark, media, 32, 32).collect().head
    assert(r.bytes.toSeq == r2.bytes.toSeq) // deterministic
    // no-op when the target box is at least the decoded size
    val big = Multimodal.resize(spark, media, 4096, 4096).collect().head
    assert(big.bytes.length == 5000)
  }

  test("WavCodec: PCM header round-trips; parser WALKS chunks, rejects non-WAV") {
    val data = Array.tabulate(1000)(i => (i % 251).toByte)
    val wav = Multimodal.WavCodec.encodePcm(16000, 2, 16, data)
    // blockAlign = 2 ch × 2 bytes → 250 samples
    assert(Multimodal.WavCodec.parse(wav) == ((16000, 2, 16, 250L)))
    // a real parser walks chunks: splice an unknown odd-sized chunk
    // between fmt and data (word-aligned skip) and it must still land
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array(3.toByte, 0.toByte, 0.toByte, 0.toByte) ++ Array[Byte](1, 2, 3)
    val (head, tail) = wav.splitAt(36) // head = RIFF+WAVE+fmt, tail = data chunk
    val reordered = head ++ junk ++ Array[Byte](0) ++ tail // odd size + pad byte
    assert(Multimodal.WavCodec.parse(reordered)._4 == 250L)
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.parse("not a wave at all............................................".getBytes)
    }
  }

  test("WavCodec: REAL javax.sound PCM decode inverts encodeSamples bit-for-bit") {
    // mono 16-bit, full signed range incl. both extremes
    val mono = Array(-32768, -2000, -1, 0, 1, 777, 32767)
    val (sr, ch, got) = Multimodal.WavCodec.decodeSamples(
      Multimodal.WavCodec.encodeSamples(8000, 1, mono))
    assert((sr, ch) == ((8000, 1)))
    assert(got.toSeq == mono.toSeq)
    // stereo: interleaved order survives the frame reassembly
    val stereo = Array(100, -100, 200, -200, 300, -300)
    val (sr2, ch2, got2) = Multimodal.WavCodec.decodeSamples(
      Multimodal.WavCodec.encodeSamples(44100, 2, stereo))
    assert((sr2, ch2) == ((44100, 2)))
    assert(got2.toSeq == stereo.toSeq)
    // 8-bit unsigned WAV recenters to signed
    val bytes8 = Array[Byte](0, 128.toByte, 255.toByte)
    val wav8 = Multimodal.WavCodec.encodePcm(8000, 1, 8, bytes8)
    assert(Multimodal.WavCodec.decodeSamples(wav8)._3.toSeq == Seq(-128, 0, 127))
    // undecodable payloads throw, same contract as parse
    intercept[Exception] {
      Multimodal.WavCodec.decodeSamples("definitely not audio data at all....".getBytes)
    }
  }

  test("extractAudioStats: batched real decode over binary columns, integer-exact statistics") {
    val rows = Seq(
      (1L, Multimodal.WavCodec.encodeSamples(8000, 1, Array(5, -3, 10, -10)), "audio/wav"),
      (2L, Multimodal.WavCodec.encodeSamples(16000, 2, Array(1, 2, 3, 4)), "audio/wav"))
    val df = spark.createDataFrame(rows).toDF("media_id", "bytes", "mime")
    val got = Multimodal.extractAudioStats(spark, df).collect()
      .map(a => a.media_id -> a).toMap
    assert(got(1L) == Multimodal.AudioStats(1L, 8000, 1, 4L, 2L, 10, 5, -10))
    assert(got(2L) == Multimodal.AudioStats(2L, 16000, 2, 2L, 10L, 4, 1, 4))
  }

  test("AviCodec: avih main header round-trips; rejects non-AVI") {
    val avi = Multimodal.AviCodec.encode(640, 480, 123, 40000, Array[Byte](9, 9, 9))
    assert(Multimodal.AviCodec.parse(avi) == ((640, 480, 123, 40000L)))
    intercept[IllegalArgumentException] {
      Multimodal.AviCodec.parse(Multimodal.WavCodec.encodePcm(8000, 1, 16, Array[Byte](1, 2)))
    }
  }

  test("AviCodec: movi frame chunks round-trip raw padded DIB frames; corrupt sizes fail fast") {
    val w = 10; val h = 3 // stride 32: 2 pad bytes per row
    val stride = Multimodal.AviCodec.frameStride(w)
    assert(stride == 32)
    val frames = (0 until 4).map(f =>
      Array.tabulate(stride * h)(i => ((f * 31 + i) % 251).toByte))
    val avi = Multimodal.AviCodec.encodeFrames(w, h, 40000, frames)
    // header reflects the frame count; payload decodes byte-for-byte
    assert(Multimodal.AviCodec.parse(avi) == ((w, h, 4, 40000L)))
    val back = Multimodal.AviCodec.decodeFrames(avi)
    assert(back.length == 4)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // wrong-size frames are rejected at encode
    intercept[IllegalArgumentException] {
      Multimodal.AviCodec.encodeFrames(w, h, 40000, Seq(new Array[Byte](7)))
    }
    // a corrupted chunk size aborts the walk instead of hanging/overreading
    val corrupt = avi.clone()
    val moviAt = avi.indexOfSlice("movi".getBytes("US-ASCII"))
    // first 00db's size field (movi fourcc + frame fourcc = 8 bytes in)
    corrupt(moviAt + 8) = 0xff.toByte
    corrupt(moviAt + 9) = 0xff.toByte
    corrupt(moviAt + 10) = 0xff.toByte
    corrupt(moviAt + 11) = 0x7f.toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.AviCodec.decodeFrames(corrupt)
    }
    assert(e.getMessage.contains("corrupt"))
  }

  test("audio/video metadata extraction: batched parse over binary columns, durations derived") {
    val wavRows = Seq(
      (1L, Multimodal.WavCodec.encodePcm(8000, 1, 16, new Array[Byte](16000)), "audio/wav"),
      (2L, Multimodal.WavCodec.encodePcm(44100, 2, 16, new Array[Byte](44100 * 4)), "audio/wav")
    ).toDF("media_id", "bytes", "mime")
    val audio = Multimodal.extractAudioMeta(spark, wavRows).collect()
      .map(a => a.media_id -> a).toMap
    assert(audio(1L).n_samples == 8000L && audio(1L).duration_ms == 1000L)
    assert(audio(2L).n_samples == 44100L && audio(2L).duration_ms == 1000L)
    val aviRows = Seq(
      (3L, Multimodal.AviCodec.encode(320, 240, 250, 40000, Array.empty[Byte]), "video/avi")
    ).toDF("media_id", "bytes", "mime")
    val video = Multimodal.extractVideoMeta(spark, aviRows).collect().head
    assert(video.width == 320 && video.n_frames == 250 && video.video_ms == 10000L)
    // header-driven frame sampling: every 50th of 250 frames, ts from fps
    val frames = Multimodal.sampleVideoFrames(spark, aviRows, stride = 50)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sorted
    assert(frames.toSeq == Seq((0, 0L), (50, 2000L), (100, 4000L), (150, 6000L), (200, 8000L)))
  }
}
