package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct — the schema pattern used by large-scale multimodal training
  * pipelines: the engine never interprets the bytes except inside an
  * explicitly-batched decode stage.
  *
  * The decode itself is a STUB in this environment (no image/audio codecs in
  * the container): [[FakeCodec]] produces deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, binary column handling,
  * per-partition batched execution via `mapPartitions`, feature schema — is
  * real and tested; swapping `FakeCodec` for a JNI/FFI codec changes no
  * plan shape.
  *
  * Scale notes: decode runs per-partition with an iterator (constant
  * memory, no driver involvement); binary payloads never shuffle — features
  * are extracted first and only the (id, features) projection flows into
  * downstream joins/aggregations.
  */
object Multimodal {

  /** Media row: id + bytes + declared mime. */
  final case class MediaRow(media_id: Long, bytes: Array[Byte], mime: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Long,
      width: Int,       // stub: deterministic from content
      height: Int,      // stub: deterministic from content
      n_frames: Int,    // stub: video frame-sample count
      checksum: Long    // real: FNV-1a over the bytes
  )

  /** Pluggable decoder boundary: everything Spark-side (binary schema,
    * mapPartitions batching, payloads-never-shuffle) is codec-agnostic —
    * swapping the implementation changes no plan shape. */
  trait MediaCodec extends Serializable {
    /** bytes → (width, height, n_frames). */
    def decode(bytes: Array[Byte]): (Int, Int, Int)
    /** bytes → payload resized to the target box. */
    def resize(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
  }

  def fnv1a(bytes: Array[Byte]): Long = {
    var hash = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      hash ^= (bytes(i) & 0xff).toLong
      hash *= 0x100000001b3L
      i += 1
    }
    hash
  }

  /** STUB codec — deterministic fake decode, the default so the oracle
    * queries (q33/q44) stay replayable on arbitrary bytes. */
  object FakeCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      // Deterministic pseudo width/height/frames from content; stands in for
      // a real image/video header parse.
      val h = fnv1a(bytes)
      val width = 64 + (h % 1024).toInt.abs
      val height = 64 + ((h >> 10) % 1024).toInt.abs
      val frames = 1 + ((h >> 20) % 32).toInt.abs
      (width, height, frames)
    }

    /** Deterministic downsample: keep every k-th byte, k from the decoded
      * area / target box ratio (min 1 = no-op) — models the resize stage's
      * bytes-in/smaller-bytes-out shape without a real format. */
    def resize(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val (w, h, _) = decode(bytes)
      val ratio = math.max(1.0, (w.toLong * h).toDouble / (targetW.toLong * targetH))
      val k = math.max(1, math.round(ratio).toInt)
      val out = Array.newBuilder[Byte]
      var i = 0
      while (i < bytes.length) { out += bytes(i); i += k }
      out.result()
    }
  }

  /** REAL codec over the JDK's registered image formats (PNG, BMP, GIF,
    * JPEG via javax.imageio — no external libs): decode parses the actual
    * header (dimensions without a full pixel decode; frame count from the
    * reader for multi-frame formats), resize renders through a scaled
    * Graphics2D draw and re-encodes as PNG. Runs inside the same
    * mapPartitions stage as the stub — proof the plumbing carries real
    * formats unchanged. */
  object ImageIoCodec extends MediaCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no registered decoder for payload")
        val r = readers.next()
        r.setInput(iis)
        try {
          val n = try r.getNumImages(true) catch { case _: Exception => 1 }
          (r.getWidth(0), r.getHeight(0), math.max(1, n))
        } finally r.dispose()
      } finally iis.close()
    }

    def resize(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, targetW, targetH, null)
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  // ───────────────────────── audio / video ─────────────────────────
  // RIFF-container header math, implemented directly (WAV PCM and the AVI
  // main header are pure little-endian byte layout — no codec library
  // needed for metadata). Frame/sample DECODING beyond the header stays
  // stubbed like FakeCodec (no A/V libs in this container); the parse,
  // the typed metadata schema, and the per-partition batching are real.

  /** Parsed WAV (RIFF/WAVE PCM) header. `n_samples` = data bytes /
    * block align; `duration_ms` in integer milliseconds. */
  final case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
                             bits: Int, n_samples: Long, duration_ms: Long)

  /** Parsed AVI (RIFF/'avih') main header. `video_ms` = frames ·
    * µs-per-frame / 1000. */
  final case class VideoMeta(media_id: Long, width: Int, height: Int,
                             n_frames: Int, us_per_frame: Long, video_ms: Long)

  /** WAV PCM writer/parser — the canonical 44-byte header, real byte math
    * in both directions (encode is the test/fixture generator; parse is
    * the production header read). */
  object WavCodec {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def rd32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def rd16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    def encodePcm(sampleRate: Int, channels: Int, bits: Int,
                  data: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * bits / 8
      val byteRate = sampleRate * blockAlign
      "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(sampleRate) ++ le32(byteRate) ++ le16(blockAlign) ++ le16(bits) ++
        "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    }

    /** 16-bit signed samples → a complete WAV payload (header +
      * little-endian PCM data). Inverse of [[decodeSamples]]. */
    def encodeSamples(sampleRate: Int, channels: Int,
                      samples: Array[Int]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(i * 2) = (samples(i) & 0xff).toByte
        data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      encodePcm(sampleRate, channels, 16, data)
    }

    /** REAL PCM sample decode through the in-JDK `javax.sound.sampled`
      * pipeline — no external codec libs (closing the "headers only"
      * caveat for audio; video frames stay stubbed, genuinely no libs).
      * `AudioSystem` parses the container, validates the format chunk,
      * and streams the data chunk; sample reassembly from the raw frame
      * bytes (LE signed 16-bit / WAV-convention unsigned 8-bit) is
      * explicit byte math so the spec can pin it against
      * [[encodeSamples]] bit-for-bit. Returns (sampleRate, channels,
      * interleaved samples). Throws on undecodable payloads — callers
      * route per their policy, same contract as [[parse]]. */
    def decodeSamples(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16, s"unsupported PCM width: $bits")
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
          s"not PCM: ${fmt.getEncoding}")
        val data = ais.readAllBytes()
        val out = new Array[Int](data.length / (bits / 8))
        var i = 0
        if (bits == 16) {
          require(!fmt.isBigEndian, "WAV PCM is little-endian")
          while (i < out.length) {
            out(i) = ((data(i * 2) & 0xff) | (data(i * 2 + 1) << 8)).toShort.toInt
            i += 1
          }
        } else {
          // 8-bit WAV is unsigned by convention; recenter to signed
          while (i < out.length) { out(i) = (data(i) & 0xff) - 128; i += 1 }
        }
        (fmt.getSampleRate.toInt, fmt.getChannels, out)
      } finally ais.close()
    }

    /** (sample_rate, channels, bits, n_samples). Throws on a non-WAV
      * payload — callers route undecodable rows per their policy. */
    def parse(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      require(bytes.length >= 44 &&
        new String(bytes.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
      // walk chunks: fmt then data (canonical layout puts them at 12/36,
      // but a real parser walks — extensible-header files reorder)
      var o = 12
      var sr = -1; var ch = -1; var bits = -1; var blockAlign = -1; var dataLen = -1L
      while (o + 8 <= bytes.length && (sr < 0 || dataLen < 0)) {
        val id = new String(bytes.slice(o, o + 4), "US-ASCII")
        val sz = rd32(bytes, o + 4)
        // untrusted media bytes: a negative / oversized 32-bit chunk size
        // would stall or overrun the walk — reject instead of looping
        require(sz >= 0 && o.toLong + 8L + sz <= bytes.length,
          s"corrupt RIFF chunk '$id' at $o: size $sz overruns ${bytes.length}-byte payload")
        if (id == "fmt ") {
          ch = rd16(bytes, o + 10)
          sr = rd32(bytes, o + 12)
          blockAlign = rd16(bytes, o + 20)
          bits = rd16(bytes, o + 22)
        } else if (id == "data") dataLen = sz.toLong
        o += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      require(sr > 0 && blockAlign > 0 && dataLen >= 0, "missing fmt/data chunk")
      (sr, ch, bits, dataLen / blockAlign)
    }
  }

  /** AVI main-header ('avih') writer/parser — MainAVIHeader field layout
    * (µs-per-frame at +0, total frames at +16, width/height at +32/+36). */
  object AviCodec {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rd32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    def encode(width: Int, height: Int, nFrames: Int, usPerFrame: Int,
               payload: Array[Byte]): Array[Byte] = {
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = "hdrl".getBytes("US-ASCII") ++
        "avih".getBytes("US-ASCII") ++ le32(avih.length) ++ avih
      val body = "AVI ".getBytes("US-ASCII") ++
        "LIST".getBytes("US-ASCII") ++ le32(hdrl.length) ++ hdrl ++ payload
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

    /** Uncompressed-DIB AVI with a REAL `movi` list: one `00db` chunk
      * per frame holding raw BGR rows padded to 4-byte stride — the
      * standard raw-video AVI frame layout, encodable and decodable
      * with no codec library at all. Lossless, so frame decode is
      * analytically oracle-able (q149), unlike the MJPEG route whose
      * lossy coefficients have no SQL twin. `frames` must each be
      * exactly `stride(width) * height` bytes. */
    def frameStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

    def encodeFrames(width: Int, height: Int, usPerFrame: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
      val stride = frameStride(width)
      require(frames.forall(_.length == stride * height),
        s"each frame must be stride($stride)*height($height) bytes")
      val movi = "movi".getBytes("US-ASCII") ++ frames.flatMap { f =>
        // stride is a multiple of 4 ⇒ chunk sizes are even, no pad byte
        "00db".getBytes("US-ASCII") ++ le32(f.length) ++ f
      }
      encode(width, height, frames.length, usPerFrame,
        "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi)
    }

    /** The raw frame payloads of the `movi` list, in stream order.
      * Chunk sizes are validated (a corrupt size fails fast instead of
      * hanging the walk — the WavCodec hostile-payload lesson). */
    def decodeFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
      var m = 12
      while (m + 4 <= bytes.length &&
             new String(bytes.slice(m, m + 4), "US-ASCII") != "movi") m += 1
      require(m + 4 <= bytes.length, "no movi list found")
      val out = Seq.newBuilder[Array[Byte]]
      var o = m + 4
      var done = false
      while (!done && o + 8 <= bytes.length) {
        val fourcc = new String(bytes.slice(o, o + 4), "US-ASCII")
        val sz = rd32(bytes, o + 4)
        // Long arithmetic: a hostile size near Int.MaxValue overflows the
        // Int sum to negative and sails through the bound check
        require(sz >= 0 && o.toLong + 8L + sz <= bytes.length,
          s"corrupt $fourcc chunk size $sz at offset $o")
        if (fourcc == "00db") out += bytes.slice(o + 8, o + 8 + sz)
        else done = true // movi frames are contiguous in this layout
        o += 8 + sz + (sz & 1)
      }
      out.result()
    }

    /** (width, height, n_frames, us_per_frame). Throws on non-AVI. */
    def parse(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      require(bytes.length >= 12 &&
        new String(bytes.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") == "AVI ", "not a RIFF/AVI payload")
      // scan for the 'avih' fourcc (robust to list nesting variants)
      var o = 12
      while (o + 4 <= bytes.length) {
        if (new String(bytes.slice(o, o + 4), "US-ASCII") == "avih") {
          val d = o + 8 // skip fourcc + size
          require(d + 40 <= bytes.length, "truncated avih chunk")
          return (rd32(bytes, d + 32), rd32(bytes, d + 36),
            rd32(bytes, d + 16), rd32(bytes, d).toLong)
        }
        o += 1
      }
      throw new IllegalArgumentException("no avih header found")
    }
  }

  /** Batched WAV-header metadata extraction — same per-partition shape as
    * [[extractFeatures]]; payload bytes never shuffle. */
  def extractAudioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (sr, ch, bits, n) = WavCodec.parse(r.bytes)
        AudioMeta(r.media_id, sr, ch, bits, n, n * 1000L / sr)
      }
    }
  }

  /** Decoded-sample statistics — integer-exact (sum / peak / first /
    * last), so an oracle can replay them analytically from a synthesis
    * rule with zero fp policy. */
  final case class AudioStats(media_id: Long, sample_rate: Int, channels: Int,
                              n_samples: Long, sum_samples: Long, peak: Int,
                              first_sample: Int, last_sample: Int)

  /** Batched REAL PCM decode ([[WavCodec.decodeSamples]] —
    * `javax.sound.sampled`, in-JDK) + per-payload sample statistics.
    * Same per-partition shape as [[extractAudioMeta]]: payload bytes
    * never shuffle, samples never leave the task — only the fixed-width
    * stats row does. */
  def extractAudioStats(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (sr, ch, samples) = WavCodec.decodeSamples(r.bytes)
        var sum = 0L
        var peak = 0
        var i = 0
        while (i < samples.length) {
          sum += samples(i)
          val a = math.abs(samples(i))
          if (a > peak) peak = a
          i += 1
        }
        AudioStats(r.media_id, sr, ch, samples.length.toLong / ch, sum, peak,
          if (samples.isEmpty) 0 else samples(0),
          if (samples.isEmpty) 0 else samples(samples.length - 1))
      }
    }
  }

  /** Batched AVI-header metadata extraction. */
  def extractVideoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, nf, uspf) = AviCodec.parse(r.bytes)
        VideoMeta(r.media_id, w, h, nf, uspf, nf * uspf / 1000L)
      }
    }
  }

  /** One row per DECODED frame: exact per-channel pixel sums plus the
    * first/last stored bytes. */
  final case class FrameStats(media_id: Long, frame_idx: Int, sum_b: Long,
                              sum_g: Long, sum_r: Long, first_byte: Int,
                              last_byte: Int)

  /** REAL per-frame pixel decode of uncompressed-DIB AVIs
    * ([[AviCodec.decodeFrames]]): integer-exact channel sums per frame,
    * skipping the 4-byte row padding — the point where "video stays
    * behind the codec boundary" stops being true for the raw-frame
    * layout (JPEG/H.26x frames remain stubbed: lossy, no SQL twin).
    * Batched per partition; payload bytes never shuffle. */
  def extractVideoFrameStats(spark: SparkSession, media: DataFrame): Dataset[FrameStats] = {
    import spark.implicits._
    graft.io.Parallelism.ensure(media).as[MediaRow].flatMap { r =>
      val (w, h, _, _) = AviCodec.parse(r.bytes)
      val stride = AviCodec.frameStride(w)
      AviCodec.decodeFrames(r.bytes).zipWithIndex.map { case (f, i) =>
        require(f.length == stride * h, s"frame $i size ${f.length} != $stride*$h")
        var sb = 0L; var sg = 0L; var sr = 0L
        var s = 0
        while (s < h) {
          var x = 0
          while (x < w) {
            val p = s * stride + x * 3
            sb += f(p) & 0xff; sg += f(p + 1) & 0xff; sr += f(p + 2) & 0xff
            x += 1
          }
          s += 1
        }
        FrameStats(r.media_id, i, sb, sg, sr, f(0) & 0xff,
          f((h - 1) * stride + (w - 1) * 3 + 2) & 0xff)
      }
    }
  }

  /** Header-driven video frame sampling: every `stride`-th frame index of
    * the PARSED frame count (vs [[sampleFrames]]' byte-offset stub) — the
    * row-explosion a real frame extractor produces, with the decode of
    * each frame's pixels left to the codec boundary. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    require(stride > 0)
    graft.io.Parallelism.ensure(media).as[MediaRow].flatMap { r =>
      val (w, h, nf, uspf) = AviCodec.parse(r.bytes)
      (0 until nf by stride).map(i => (r.media_id, i, i * uspf / 1000L, w, h))
    }.toDF("media_id", "frame_idx", "ts_ms", "width", "height")
  }

  /** Attach a fake media column to a text table (UTF-8 bytes stand in for
    * image payloads) — test scaffolding for the binary-column path. */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      lit("application/octet-stream").as("mime")
    )

  /** Batched decode/feature-extract: one pass per partition, iterator-to-
    * iterator (no materialization of the whole partition). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    // decode is the compute bottleneck of any multimodal pipeline — never
    // let a narrow input serialize it onto one core
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = codec.decode(r.bytes)
        MediaFeatures(r.media_id, r.mime, r.bytes.length.toLong, w, h, frames,
          fnv1a(r.bytes))
      }
    }
  }

  /** Frame sampling stub: every `stride`-th byte offset becomes a "frame"
    * row — models video frame extraction's row-explosion shape (1 media row
    * → n frame rows) without a real codec. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    graft.io.Parallelism.ensure(media).as[MediaRow].flatMap { r =>
      val n = math.max(1, r.bytes.length / math.max(1, stride))
      (0 until n).map(i => (r.media_id, i, r.bytes.length.toLong, (i.toLong * stride) % 256))
    }.toDF("media_id", "frame_idx", "byte_len", "sample_val")
  }

  /** Resized media row: original id/mime + the declared target box + the
    * "resized" payload. */
  final case class ResizedMedia(media_id: Long, mime: String,
                                target_w: Int, target_h: Int, bytes: Array[Byte])

  /** Resize stage: bytes in → resized bytes out, metadata updated; batched
    * per-partition, payloads never shuffle. The transformation itself is
    * the codec's (deterministic byte decimation for the stub, a real
    * Graphics2D rescale + PNG re-encode for [[ImageIoCodec]]) — the plan
    * is identical either way. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int,
             codec: MediaCodec = FakeCodec): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0)
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        ResizedMedia(r.media_id, r.mime, targetW, targetH,
          codec.resize(r.bytes, targetW, targetH))
      }
    }
  }
}
