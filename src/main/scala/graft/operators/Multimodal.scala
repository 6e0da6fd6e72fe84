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

  /** STUB codec — deterministic fake decode. A real deployment replaces
    * exactly this object (same signature) with an actual decoder. */
  object FakeCodec extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      // Deterministic pseudo width/height/frames from content; stands in for
      // a real image/video header parse.
      val h = fnv1a(bytes)
      val width = 64 + (h % 1024).toInt.abs
      val height = 64 + ((h >> 10) % 1024).toInt.abs
      val frames = 1 + ((h >> 20) % 32).toInt.abs
      (width, height, frames)
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
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    // decode is the compute bottleneck of any multimodal pipeline — never
    // let a narrow input serialize it onto one core
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = FakeCodec.decode(r.bytes)
        MediaFeatures(r.media_id, r.mime, r.bytes.length.toLong, w, h, frames,
          FakeCodec.fnv1a(r.bytes))
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

  /** Resize stub: deterministic downsample of the payload to a size
    * proportional to the target box — models the resize stage's shape
    * (bytes in → smaller bytes out, metadata updated; batched
    * per-partition, payloads never shuffle). A real deployment replaces
    * the byte-level body with a codec call; the plan is unchanged. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0)
    graft.io.Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _) = FakeCodec.decode(r.bytes)
        // keep every k-th byte, k from the area ratio (min 1 = no-op)
        val ratio = math.max(1.0, (w.toLong * h).toDouble / (targetW.toLong * targetH))
        val k = math.max(1, math.round(ratio).toInt)
        val out = Array.newBuilder[Byte]
        var i = 0
        while (i < r.bytes.length) { out += r.bytes(i); i += k }
        ResizedMedia(r.media_id, r.mime, targetW, targetH, out.result())
      }
    }
  }
}
