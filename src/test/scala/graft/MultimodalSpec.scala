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
}
