package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import graft.tools.IcebergFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-iceberg STREAMING source: origin snapshot once, then the
  * snapshot lineage tailed in sequence order — exactly-once across
  * rate-limited micro-batches and restarts; loud refusals for the
  * shapes raw-file replay cannot honor (row-level deletes, non-append
  * snapshots without ignoreChanges). */
class IcebergSourceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def collectStream(dir: String, ckpt: String,
                            options: Map[String, String] = Map.empty)
      : (scala.collection.mutable.ListBuffer[(Long, String)],
         org.apache.spark.sql.streaming.StreamingQuery,
         java.util.concurrent.atomic.AtomicInteger) = {
    val buf = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    var r = spark.readStream.format("graft-iceberg")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id", "tag").as[(Long, String)].collect()
        if (rows.nonEmpty) {
          batches.incrementAndGet()
          buf.synchronized { buf ++= rows }
        }
        ()
      }.start()
    (buf, q, batches)
  }

  test("origin snapshot + tailed appends arrive exactly once, rate-limited") {
    val dir = Files.createTempDirectory("graft-ice-src").toString
    IcebergWrite.append(
      (0L until 20L).map(i => (i, s"a_$i")).toDF("id", "tag").repartition(4), dir)
    val (buf, q, batches) = collectStream(dir, s"$dir/ckpt",
      Map("maxFilesPerTrigger" -> "2"))
    try {
      q.processAllAvailable()
      assert(buf.synchronized(buf.map(_._1).sorted.toSeq) == (0L until 20L))
      // two appends land while the stream runs — tailed incrementally
      IcebergWrite.append(
        (20L until 30L).map(i => (i, s"b_$i")).toDF("id", "tag").repartition(2), dir)
      IcebergWrite.append(
        (30L until 35L).map(i => (i, s"c_$i")).toDF("id", "tag"), dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(buf.synchronized(buf.map(_._1).sorted.toSeq) == (0L until 35L),
      "every row exactly once across snapshot + tail")
    assert(batches.get >= 3, s"4+2+... files at 2/trigger must cut >=3 batches, saw ${batches.get}")
  }

  test("restart from checkpoint resumes past consumed offsets (no re-emission)") {
    val dir = Files.createTempDirectory("graft-ice-src-restart").toString
    IcebergWrite.append(
      (0L until 8L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val ckpt = s"$dir/ckpt"
    val (buf1, q1, _) = collectStream(dir, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(buf1.synchronized(buf1.size) == 8)
    // append between runs; the restarted stream must emit ONLY the new rows
    IcebergWrite.append(
      (8L until 12L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
    val (buf2, q2, _) = collectStream(dir, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(buf2.synchronized(buf2.map(_._1).sorted.toSeq) == (8L until 12L),
      s"restart must resume, not replay: ${buf2.synchronized(buf2.toList)}")
  }

  test("a non-append snapshot fails the stream; ignoreChanges re-emits its files") {
    val dir = Files.createTempDirectory("graft-ice-src-ovr").toString
    IcebergWrite.append(
      (0L until 6L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val (_, q1, _) = collectStream(dir, s"$dir/ckpt1")
    try {
      q1.processAllAvailable()
      IcebergWrite.overwrite(
        (100L until 103L).map(i => (i, s"z_$i")).toDF("id", "tag"), dir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q1.processAllAvailable())
      assert(e.getMessage.contains("not an append") ||
        Option(e.getCause).exists(_.getMessage.contains("not an append")),
        e.getMessage)
    } finally q1.stop()
    // with ignoreChanges a fresh stream consumes the overwrite's files:
    // origin snapshot (the post-overwrite live set) only — start a new
    // stream, then another overwrite tails through with the flag
    val (buf2, q2, _) = collectStream(dir, s"$dir/ckpt2",
      Map("ignoreChanges" -> "true"))
    try {
      q2.processAllAvailable()
      assert(buf2.synchronized(buf2.map(_._1).sorted.toSeq) == (100L until 103L))
      IcebergWrite.overwrite(
        (200L until 202L).map(i => (i, s"y_$i")).toDF("id", "tag"), dir)
      q2.processAllAvailable()
      assert(buf2.synchronized(buf2.map(_._1).sorted.toSeq) ==
        Seq(100L, 101L, 102L, 200L, 201L))
    } finally q2.stop()
  }


  test("a DELETE snapshot fails the tail; ignoreDeletes skips it, appends keep tailing") {
    val dir = Files.createTempDirectory("graft-ice-src-rowdel").toString
    IcebergWrite.append(
      (0L until 10L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val ckpt = s"$dir/ckpt"
    val (buf1, q1, _) = collectStream(dir, ckpt)
    try {
      q1.processAllAvailable()
      assert(buf1.synchronized(buf1.size) == 10)
      IcebergWrite.deleteWhere(spark, dir, col("id") < 3)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q1.processAllAvailable())
      assert(e.getMessage.contains("ignoreDeletes") ||
        Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")),
        e.getMessage)
    } finally q1.stop()
    // resume the SAME checkpoint with the flag: the delete snapshot
    // advances as a no-op (already-emitted rows stay downstream — the
    // documented tradeoff) and a later append still arrives
    val (buf3, q3, _) = collectStream(dir, ckpt,
      Map("ignoreDeletes" -> "true"))
    try {
      q3.processAllAvailable() // consumes the delete snapshot, emits nothing
      IcebergWrite.append(Seq((100L, "new")).toDF("id", "tag"), dir)
      q3.processAllAvailable()
    } finally q3.stop()
    assert(buf3.synchronized(buf3.map(_._1).sorted.toSeq) == Seq(100L),
      s"only the post-delete append arrives: ${buf3.synchronized(buf3.toList)}")
  }

  test("restart across a delete snapshot landed while DOWN: ignoreDeletes resumes cleanly") {
    val dir = Files.createTempDirectory("graft-ice-src-downdel").toString
    IcebergWrite.append(
      (0L until 10L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val ckpt = s"$dir/ckpt"
    val (buf1, q1, _) = collectStream(dir, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(buf1.synchronized(buf1.size) == 10)
    // while the stream is DOWN: a merge-on-read delete snapshot AND an
    // append land — the offset must advance over the delete on resume
    IcebergWrite.deleteWhere(spark, dir, col("id") < 4)
    IcebergWrite.append(
      (100L until 103L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
    // restart WITHOUT the flag: the pending delete snapshot refuses loudly
    val (bufF, qF, _) = collectStream(dir, ckpt)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        qF.processAllAvailable())
      assert(e.getMessage.contains("ignoreDeletes") ||
        Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")),
        e.getMessage)
    } finally qF.stop()
    assert(bufF.synchronized(bufF.isEmpty), "the refused restart emits nothing")
    // restart WITH ignoreDeletes: no wedge, no re-emission — the delete
    // snapshot skips and ONLY the while-down append's rows arrive
    val (buf2, q2, _) = collectStream(dir, ckpt, Map("ignoreDeletes" -> "true"))
    try {
      q2.processAllAvailable()
      assert(buf2.synchronized(buf2.map(_._1).sorted.toSeq) == (100L until 103L),
        s"only the while-down append arrives: ${buf2.synchronized(buf2.toList)}")
      // and the tail keeps working across a LIVE delete + append too
      IcebergWrite.deleteWhere(spark, dir, col("id") === 100L)
      IcebergWrite.append(Seq((200L, "c")).toDF("id", "tag"), dir)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(buf2.synchronized(buf2.map(_._1).sorted.toSeq) ==
      Seq(100L, 101L, 102L, 200L),
      s"exactly-once across the whole lineage: ${buf2.synchronized(buf2.toList)}")
  }

  test("startingSnapshotId: tail-only after a named snapshot; earliest replays history") {
    val dir = Files.createTempDirectory("graft-ice-src-start").toString
    val s1 = IcebergWrite.append(
      (0L until 5L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    IcebergWrite.append((5L until 10L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
    IcebergWrite.append((10L until 15L).map(i => (i, s"c_$i")).toDF("id", "tag"), dir)
    // tail-only after s1: NO backfill of s1's state, later appends replay
    val (buf1, q1, _) = collectStream(dir, s"$dir/ckpt1",
      Map("startingSnapshotId" -> s1.toString))
    try {
      q1.processAllAvailable()
      assert(buf1.synchronized(buf1.map(_._1).sorted.toSeq) == (5L until 15L),
        s"only post-s1 adds: ${buf1.synchronized(buf1.toList)}")
      IcebergWrite.append(Seq((15L, "d")).toDF("id", "tag"), dir)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(buf1.synchronized(buf1.map(_._1).sorted.toSeq) == (5L until 16L))
    // earliest: the whole history replays as adds
    val (buf2, q2, _) = collectStream(dir, s"$dir/ckpt2",
      Map("startingSnapshotId" -> "earliest"))
    try q2.processAllAvailable() finally q2.stop()
    assert(buf2.synchronized(buf2.map(_._1).sorted.toSeq) == (0L until 16L),
      s"earliest must replay everything: ${buf2.synchronized(buf2.size)}")
    // an unknown snapshot id refuses at stream start
    val (_, q3, _) = collectStream(dir, s"$dir/ckpt3",
      Map("startingSnapshotId" -> "424242"))
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q3.processAllAvailable())
      assert(e.getMessage.contains("not found") ||
        Option(e.getCause).exists(_.getMessage.contains("not found")), e.getMessage)
    } finally q3.stop()
  }

  test("row-level deletes refuse loudly in both phases") {
    val dir = Files.createTempDirectory("graft-ice-src-del").toString
    // fixture table with a position delete in its CURRENT snapshot
    IcebergFixture.append(
      (0L until 10L).map(i => (i, s"a_$i", 0.0)).toDF("id", "tag", "v"), dir)
    val victim = IcebergInterop.readIceberg(spark, dir)
      .select(col("_metadata.file_path").as("fp"), col("_metadata.row_index").as("pos"))
      .limit(1).head()
    IcebergFixture.deletePositions(spark, dir,
      Seq((victim.getString(0).stripPrefix("file:"), victim.getLong(1))))
    // ORIGIN phase: the snapshot carries deletes — the stream must refuse
    val (_, q, _) = collectStream(dir, s"$dir/ckpt")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getMessage.contains("row-level deletes") ||
        Option(e.getCause).exists(_.getMessage.contains("row-level deletes")),
        e.getMessage)
    } finally q.stop()
  }

  test("a manifest merge mid-stream is invisible to the tailer (no flags needed)") {
    val dir = Files.createTempDirectory("graft-ice-src-rwman").toString
    (0 until 5).foreach { k =>
      IcebergWrite.append(
        Seq((k.toLong, s"a_$k")).toDF("id", "tag"), dir)
    }
    val (buf, q, _) = collectStream(dir, s"$dir/ckpt")
    try {
      q.processAllAvailable()
      assert(buf.synchronized(buf.size) == 5)
      // the maintenance snapshot lands MID-STREAM: a `replace` commit
      // of EXISTING-only entries — no ignoreChanges, no error, nothing
      // re-emitted
      val (_, merged, _) = IcebergWrite.rewriteManifests(spark, dir,
        targetEntriesPerManifest = 100)
      assert(merged == 4)
      IcebergWrite.append(Seq((100L, "post")).toDF("id", "tag"), dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(buf.synchronized(buf.map(_._1).sorted.toSeq) ==
      Seq(0L, 1L, 2L, 3L, 4L, 100L),
      s"tailer must pass through the merge emitting only the new append: " +
      buf.synchronized(buf.toList))
  }

  test("a ROLLBACK snapshot fails the raw tail loudly (never a silent skip)") {
    val dir = Files.createTempDirectory("graft-ice-src-rollback").toString
    val s1 = IcebergWrite.append(
      (0L until 6L).map(i => (i, s"a$i")).toDF("id", "tag"), dir)
    IcebergWrite.append((6L until 9L).map(i => (i, s"b$i")).toDF("id", "tag"), dir)
    val (buf, q, _) = collectStream(dir, Files.createTempDirectory("ck-rb").toString,
      Map.empty)
    try {
      q.processAllAvailable()
      assert(buf.synchronized(buf.size) == 9)
      IcebergWrite.rollbackTo(spark, dir, s1)
      IcebergWrite.append(Seq((100L, "x")).toDF("id", "tag"), dir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getMessage.contains("rollback") ||
        Option(e.getCause).exists(_.getMessage.contains("rollback")),
        e.getMessage)
    } finally { try q.stop() catch { case _: Exception => () } }
  }

  test("a fully-consumed boundary snapshot may expire without killing the stream") {
    import graft.io.{IcebergInterop, IcebergWrite}
    val tmp = java.nio.file.Files.createTempDirectory("graft-src-exp").toString
    val dir = s"$tmp/t"
    import spark.implicits._
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    IcebergWrite.append(Seq((2L, "b")).toDF("id", "tag"), dir)
    val src = new graft.streaming.IcebergSource(spark, dir, s"$tmp/meta", Map())
    // the checkpoint says: snapshot seq 2 FULLY consumed (1 added file)
    val committed = graft.streaming.IcebergSourceOffset(2L, 1, starting = false)
    IcebergWrite.append(Seq((3L, "c")).toDF("id", "tag"), dir)
    // retire everything but the head — including the fully-consumed
    // boundary snapshot the resume point names
    IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    // advance must tolerate the expired boundary (the offset proves
    // consumption) and resume at the live head...
    val next = graft.streaming.IcebergSourceOffset.from(src.latestOffset(committed,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()))
    assert(next.seq == 3L && !next.starting)
    // ...and the batch from there plans over the live snapshot's file
    // (streaming-flagged — assert via its input files, not an action)
    val batch = src.getBatch(Some(committed), next)
    assert(batch.queryExecution.logical.collectLeaves().nonEmpty)
    // a GENUINELY unconsumed expired snapshot still fails loudly:
    // resuming from seq 1 (its successor seq 2 is gone) must refuse
    IcebergWrite.append(Seq((4L, "d")).toDF("id", "tag"), dir)
    intercept[IllegalStateException] {
      src.latestOffset(graft.streaming.IcebergSourceOffset(1L, 1, starting = false),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    }
  }
}
