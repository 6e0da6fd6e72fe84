package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch = Seq(
    (1L, ts("2024-01-01 10:05:00"), 100L, "click", 1.0, "{}"),
    (2L, ts("2024-01-01 10:20:00"), 100L, "click", 2.0, "{}"),
    (3L, ts("2024-01-01 11:10:00"), 100L, "view", 3.0, "{}"),
    (4L, ts("2024-01-01 10:30:00"), 200L, "click", 4.0, "{}"),
    (3L, ts("2024-01-01 11:10:00"), 100L, "view", 3.0, "{}") // dup event
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("hourlyByType works identically on batch (streaming contract)") {
    val out = EventStream.hourlyByType(batch).collect()
      .map(r => (r.getAs[Timestamp]("hour_start").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"))).toSet
    assert(out.contains(("2024-01-01 10:00:00.0", "click", 3L)))
    assert(out.contains(("2024-01-01 11:00:00.0", "view", 2L)))
  }

  test("streaming micro-batches: windowed counts via MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.hourlyByType(events, watermark = "10 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("hourly_test").start()
    mem.addData((1L, ts("2024-01-01 10:05:00"), 100L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 100L, "click", 2.0, "{}"))
    q.processAllAvailable()
    val rows = spark.table("hourly_test").collect()
    assert(rows.exists(r => r.getAs[Long]("n_events") == 2L))
    q.stop()
  }

  test("lateness metrics: observed per-batch counters + dropped-by-watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val listener = new EventStream.LatenessListener("late_test")
    spark.streams.addListener(listener)
    // append mode: only watermark-finalized windows emit, so a row whose
    // window closed before the watermark is genuinely discarded (and counted)
    val q = EventStream.hourlyByType(EventStream.observeInput(events),
        watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("late_test").start()
    try {
      // batch 1 advances the watermark to 10:35
      mem.addData((1L, ts("2024-01-01 10:05:00"), 100L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 10:45:00"), 100L, "click", 2.0, "{}"))
      q.processAllAvailable()
      // batch 2: window [09:00, 10:00) ended before the watermark → dropped
      mem.addData((3L, ts("2024-01-01 09:00:00"), 100L, "view", 3.0, "{}"))
      q.processAllAvailable()
      assert(listener.awaitBatches(2), s"progress events missing: ${listener.batches}")
      assert(listener.totalRows == 3) // observe saw every input row
      assert(listener.totalDropped == 1, s"batches: ${listener.batches}")
      val b1 = listener.batches.find(_.nRows == 2).get
      assert(b1.minTs.startsWith("2024-01-01 10:05") && b1.maxTs.startsWith("2024-01-01 10:45"))
      // the batch that dropped the late row reports the watermark it used
      val late = listener.batches.find(_.droppedByWatermark == 1).get
      assert(late.watermark != null && late.watermark.contains("10:35:00"))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("stream dedup removes duplicate event ids (batch semantics)") {
    assert(EventStream.dedupEvents(batch).count() == 4)
  }

  test("streaming SCD2: dim updates merge per micro-batch (expire + insert)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("graft-dimstream").toString
    val mem = MemoryStream[(String, String, String)]
    val updates = mem.toDF().toDF("id", "name", "city")
    val spec = graft.ops.Scd2.Scd2Spec(Seq("id"), Seq("name", "city"), "sk", "dim_s")
    val q = graft.streaming.DimStream.scd2Sink(spark, updates, spec,
      s"$root/dim", s"$root/ckpt", _ => graft.pipeline.FixedClock("2024-01-01 00:00:00"))
    mem.addData(("1", "a", "x"), ("2", "b", "y"))
    q.processAllAvailable()
    assert(graft.streaming.DimStream.readDim(spark, s"$root/dim").count() == 2)
    mem.addData(("1", "a", "MOVED"))
    q.processAllAvailable()
    q.stop()
    val dim = graft.streaming.DimStream.readDim(spark, s"$root/dim").collect()
    assert(dim.length == 3)
    val k1 = dim.filter(_.getAs[String]("id") == "1")
    assert(k1.count(_.getAs[Boolean]("is_active")) == 1)
    assert(k1.find(_.getAs[Boolean]("is_active")).get.getAs[String]("city") == "MOVED")
  }

  test("stateful sessionization over a stream emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionize(spark, events, gapMs = 30 * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("sess_test").start()
    // two micro-batches: the second closes user 100's first session
    mem.addData((1L, ts("2024-01-01 10:05:00"), 100L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 100L, "click", 2.0, "{}"))
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 12:00:00"), 100L, "view", 3.0, "{}"))
    q.processAllAvailable()
    val sessions = spark.table("sess_test").as[EventStream.SessionUpdate].collect()
    assert(sessions.exists(s => s.user_id == 100L && s.n_events == 2))
    q.stop()
  }

  test("transformWithState sessionization carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionizeTws(spark, events, gapMs = 30 * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("sess_tws_test").start()
    // batch 1 opens a session; batch 2's distant event must close it,
    // which requires the ValueState to survive the micro-batch boundary
    mem.addData((1L, ts("2024-01-01 10:05:00"), 100L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 100L, "click", 2.0, "{}"))
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 12:00:00"), 100L, "view", 3.0, "{}"))
    q.processAllAvailable()
    val sessions = spark.table("sess_tws_test").as[EventStream.SessionUpdate].collect()
    assert(sessions.length == 1)
    assert(sessions.head.user_id == 100L && sessions.head.n_events == 2)
    assert(sessions.head.session_end.getTime - sessions.head.session_start.getTime == 15 * 60 * 1000)
    q.stop()
  }

  test("AggStream.incrementalSink: checkpointed restart does not re-fold processed batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-aggstream").toString
    val updates = s"$tmp/updates"
    val delta1 = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    delta1.write.mode("append").parquet(updates)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(delta1.schema).parquet(updates)
      val q = graft.streaming.AggStream.incrementalSink(
        spark, stream, Seq("k"), Seq("v"), s"$tmp/state", s"$tmp/ckpt")
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    def state() = graft.streaming.AggStream.readState(spark, s"$tmp/state")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val first = state()
    assert(first == Map(1L -> ((2L, 30.0)), 2L -> ((1L, 5.0))))
    // restart on the SAME checkpoint with no new files: state must not double
    runOnce()
    assert(state() == first)
    // a new delta folds in exactly once across a restart
    Seq((2L, 7.0), (3L, 1.0)).toDF("k", "v").write.mode("append").parquet(updates)
    runOnce()
    assert(state() == Map(1L -> ((2L, 30.0)), 2L -> ((2L, 12.0)), 3L -> ((1L, 1.0))))
  }

  test("session_window boundary: a gap of exactly 30 minutes stays in the SAME session (oracle rule: > 1800s splits)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10:00:00, 10:30:00 (exactly 30 min later), 11:00:00.000001 (30min+1µs later)
    val df = Seq(
      (100L, ts("2024-01-01 10:00:00")),
      (100L, ts("2024-01-01 10:30:00")),
      (100L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
      // push the third event to exactly gap+1µs after the second
      .withColumn("ts", when(hour(col("ts")) === 11,
        timestamp_micros(unix_micros(col("ts")) + 1L)).otherwise(col("ts")))
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .collect()
    // oracle semantics: gap == 1800s → same session; gap == 1800s + 1µs → new
    assert(sessions.length == 2, s"expected 2 sessions, got ${sessions.length}")
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("AnnStream.indexMaintenanceSink: replayed batches rewrite, never duplicate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    val updates = s"$tmp/updates"
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    vecs.write.mode("append").parquet(updates)
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val model = graft.operators.ProductQuant.PQModel(m = 1, k = 2, subDim = 2,
      codebooks = Seq(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema(vecs.schema).parquet(updates)
      val q = graft.streaming.AnnStream.indexMaintenanceSink(
        spark, stream, "vec_id", "embedding", cents, model, s"$tmp/state", ckpt)
      q.processAllAvailable(); q.stop()
    }
    runOnce(s"$tmp/ckpt")
    def state() = graft.streaming.AnnStream.readCodes(spark, s"$tmp/state")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    val first = state()
    // both vectors sit exactly ON their centroid → residual (0,0) is
    // equidistant to both codebook entries → tie-break to code 0
    assert(first == Seq((1L, 0, Seq(0)), (2L, 1, Seq(0))))
    // a fresh checkpoint re-delivers batch 0: the b0 dir is rewritten
    // with identical rows, not appended to
    runOnce(s"$tmp/ckpt2")
    assert(state() == first, "replayed batch duplicated index rows")
  }

  test("AggStream.incrementalSink: a replayed batchId is skipped, not re-folded") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-aggreplay").toString
    val updates = s"$tmp/updates"
    Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v").write.mode("append").parquet(updates)
    val schema = spark.read.parquet(updates).schema
    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema).parquet(updates)
      val q = graft.streaming.AggStream.incrementalSink(
        spark, stream, Seq("k"), Seq("v"), s"$tmp/state", ckpt)
      q.processAllAvailable(); q.stop()
    }
    runOnce(s"$tmp/ckpt")
    def state() = graft.streaming.AggStream.readState(spark, s"$tmp/state")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val first = state()
    assert(first == Map(1L -> ((1L, 10.0)), 2L -> ((1L, 5.0))))
    // simulate the at-least-once replay foreachBatch can deliver: a FRESH
    // checkpoint re-issues batchId 0 with the same files — the versioned
    // state must detect id 0 <= last-applied 0 and skip the merge
    runOnce(s"$tmp/ckpt2")
    assert(state() == first, "replayed batchId 0 must not double the state")
    // crash-safety shape: the previous committed version survives the swap
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/state/_CURRENT")))
  }
}
