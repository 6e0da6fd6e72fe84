package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean
import graft.io.{DeltaInterop, IcebergInterop, IcebergWrite}
import graft.streaming.IcebergStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once streaming INTO native Iceberg ([[IcebergStream]] /
  * [[IcebergWrite.appendOnce]]): the txn ledger rides the snapshot
  * summaries, so crash-replays write nothing; composed with the
  * graft-delta SOURCE it is a lake-to-lake mirror (Delta commits →
  * Iceberg snapshots), both ends exactly-once. */
class IcebergStreamSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("appendOnce: same (appId, txn) replays write nothing; higher txns append") {
    val dir = Files.createTempDirectory("graft-ice-once").toString
    val s1 = IcebergWrite.appendOnce(
      (0L until 5L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir, "app1", 0L)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 5)
    // replay of batch 0: nothing written, current snapshot returned
    val sReplay = IcebergWrite.appendOnce(
      (0L until 5L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir, "app1", 0L)
    assert(sReplay == s1, "replay must defer to the committed snapshot")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 5)
    assert(IcebergInterop.snapshots(spark, dir).count() == 1)
    // next batch appends; a different app's txn 0 also appends
    IcebergWrite.appendOnce(Seq((5L, "b")).toDF("id", "tag"), dir, "app1", 1L)
    IcebergWrite.appendOnce(Seq((6L, "c")).toDF("id", "tag"), dir, "app2", 0L)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 7)
    assert(IcebergInterop.snapshots(spark, dir).count() == 3)
  }

  test("crash between table commit and offset commit: restart writes nothing twice") {
    val tmp = Files.createTempDirectory("graft-ice-crash").toString
    val src = s"$tmp/src"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val fired = new AtomicBoolean(false)
    def run(hook: Long => Unit) = IcebergStream.sink(spark,
      spark.readStream.schema(schema).parquet(src),
      s"$tmp/table", "crashapp", s"$tmp/ckpt", postCommitHook = hook)
    val q1 = run(_ => if (!fired.getAndSet(true))
      throw new RuntimeException("injected crash after table commit"))
    val crashed =
      try { q1.processAllAvailable(); false } catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }
    assert(crashed, "injected crash did not fire")
    // the table committed batch 0 before the crash
    assert(IcebergInterop.readIceberg(spark, s"$tmp/table").count() == 2)
    // restart replays batch 0 (its offset never committed) — the
    // ledger recognizes it; then new data flows
    Seq((3L, "c")).toDF("id", "tag").write.mode("append").parquet(src)
    val q2 = run(_ => ())
    try q2.processAllAvailable() finally q2.stop()
    val t = IcebergInterop.readIceberg(spark, s"$tmp/table")
    assert(t.count() == 3, s"rows must appear exactly once, got ${t.count()}")
    assert(t.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("lake-to-lake mirror: graft-delta source -> Iceberg sink, exactly once") {
    val tmp = Files.createTempDirectory("graft-lake2lake").toString
    val deltaDir = s"$tmp/delta"
    val iceDir = s"$tmp/iceberg"
    DeltaInterop.writeDelta(
      (0L until 30L).map(i => (i, s"d_$i")).toDF("id", "tag").repartition(3),
      deltaDir, Nil)
    val q = IcebergStream.sink(spark,
      spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "2").load(deltaDir),
      iceDir, "mirror", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
      // more Delta commits while the mirror runs
      DeltaInterop.writeDelta(
        (30L until 40L).map(i => (i, s"d_$i")).toDF("id", "tag"), deltaDir, Nil)
      q.processAllAvailable()
    } finally q.stop()
    val ice = IcebergInterop.readIceberg(spark, iceDir)
    assert(ice.count() == 40)
    assert(ice.select("id").as[Long].collect().sorted.toSeq == (0L until 40L))
    // the mirror is a REAL Iceberg table: snapshots + time travel work
    assert(IcebergInterop.snapshots(spark, iceDir).count() >= 2,
      "rate-limited mirroring must land multiple snapshots")
  }

  test("upsertSink: CDC apply by key — arbitration, tombstones, crash replay") {
    val tmp = Files.createTempDirectory("graft-ice-upsert").toString
    val src = s"$tmp/src"
    // batch 0 (bootstrap): ids 0..9 insert
    (0L until 10L).map(i => (i, s"v0_$i", false, 0L))
      .toDF("id", "v", "del", "seq").coalesce(1)
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val fired = new AtomicBoolean(false)
    def run(hook: Long => Unit) = IcebergStream.upsertSink(spark,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      s"$tmp/table", Seq("id"), "cdc", s"$tmp/ckpt",
      sequenceCol = Some("seq"), deleteCol = Some("del"),
      postCommitHook = hook)
    val q0 = run(_ => ())
    try q0.processAllAvailable() finally q0.stop()
    assert(IcebergInterop.readIceberg(spark, s"$tmp/table").count() == 10)
    // batch 1: id 3 updated TWICE (seq arbitration keeps seq 2), id 5
    // tombstoned, id 10 inserted, id 99 tombstoned-but-never-seen
    Seq((3L, "v1_3", false, 1L), (3L, "v2_3", false, 2L),
        (5L, null.asInstanceOf[String], true, 1L),
        (10L, "v0_10", false, 1L),
        (99L, null.asInstanceOf[String], true, 1L))
      .toDF("id", "v", "del", "seq").coalesce(1)
      .write.mode("append").parquet(src)
    // crash AFTER the merge snapshot commits, BEFORE the offset does
    val q1 = run(_ => if (!fired.getAndSet(true))
      throw new RuntimeException("injected crash after merge commit"))
    val crashed =
      try { q1.processAllAvailable(); false } catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }
    assert(crashed, "injected crash did not fire")
    val mid = IcebergInterop.readIceberg(spark, s"$tmp/table")
    assert(mid.count() == 10, "10 - 1 tombstone + 1 insert")
    // restart replays batch 1 — the ledger makes it a structural no-op —
    // then batch 2 flows: id 0 tombstoned, id 10 updated
    val snapsMid = IcebergInterop.snapshots(spark, s"$tmp/table").count()
    Seq((0L, null.asInstanceOf[String], true, 3L), (10L, "v1_10", false, 3L))
      .toDF("id", "v", "del", "seq").coalesce(1)
      .write.mode("append").parquet(src)
    val q2 = run(_ => ())
    try q2.processAllAvailable() finally q2.stop()
    val t = IcebergInterop.readIceberg(spark, s"$tmp/table")
    val byId = t.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.keySet == (1L until 10L).toSet - 5L + 10L)
    assert(byId(3L) == "v2_3", "within-batch sequence arbitration")
    assert(byId(10L) == "v1_10", "cross-batch upsert")
    assert(IcebergInterop.snapshots(spark, s"$tmp/table").count() == snapsMid + 1,
      "the replayed batch must not land a second snapshot")
  }

  test("lineage replication: changelog stream -> upsert sink mirrors a table") {
    val tmp = Files.createTempDirectory("graft-ice-replica").toString
    val srcT = s"$tmp/srcT"
    val dst = s"$tmp/dst"
    IcebergWrite.appendLineage((0L until 20L).map(i => (i, i * 10))
      .toDF("id", "v").repartition(1).sortWithinPartitions("id"), srcT)
    // keyed CDC: the row id IS the replication key — no natural key needed
    val changes = spark.readStream.format("graft-iceberg")
      .option("readChanges", "true").option("lineage", "true").load(srcT)
    assert(changes.schema.fieldNames.contains("_row_id"))
    val feed = changes
      .withColumn("_src_row_id", col("_row_id"))
      .withColumn("_del", col("_change_type") === "delete")
      .withColumn("_seq", col("_change_ordinal") * 2 +
        when(col("_change_type") === "insert", 1).otherwise(0))
      .drop("_row_id", "_change_type", "_change_ordinal", "_commit_snapshot_id")
    val q = graft.streaming.IcebergStream.upsertSink(spark, feed, dst,
      Seq("_src_row_id"), "mirror", s"$tmp/ckpt",
      sequenceCol = Some("_seq"), deleteCol = Some("_del"))
    def mirrored(): Seq[(Long, Long)] =
      IcebergInterop.readIceberg(spark, dst).select("id", "v")
        .as[(Long, Long)].collect().sorted.toSeq
    def sourceRows(): Seq[(Long, Long)] =
      IcebergInterop.readIceberg(spark, srcT).select("id", "v")
        .as[(Long, Long)].collect().sorted.toSeq
    try {
      q.processAllAvailable()
      assert(mirrored() == sourceRows(), "bootstrap mirrors the origin")
      // an update and a delete land while the mirror runs — possibly
      // in ONE micro-batch: sequence arbitration orders them
      IcebergWrite.updateWhereDV(spark, srcT, col("id") % 4 === 1,
        Map("v" -> (col("v") + 100L)))
      IcebergWrite.deleteWhereDV(spark, srcT, col("id") === 2L)
      q.processAllAvailable()
      assert(mirrored() == sourceRows(),
        "the mirror tracks updates and deletes by row identity")
      IcebergWrite.append((20L until 25L).map(i => (i, i * 10))
        .toDF("id", "v").repartition(1).sortWithinPartitions("id"), srcT)
      q.processAllAvailable()
      assert(mirrored() == sourceRows(), "later appends keep flowing")
    } finally q.stop()
    // the mirror is itself a real Iceberg table with per-batch snapshots
    assert(IcebergInterop.snapshots(spark, dst).count() >= 2)
  }

  test("upsertSink: a NULL tombstone flag is a normal upsert, never a drop") {
    val tmp = Files.createTempDirectory("graft-ice-nullflag").toString
    val src = s"$tmp/src"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("del", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))
    def stage(rows: Seq[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
        .coalesce(1).write.mode("append").parquet(src)
    import org.apache.spark.sql.Row
    // bootstrap batch: one true insert with a NULL flag
    stage(Seq(Row(1L, "a", null, 0L), Row(2L, "b", false, 0L)))
    val q0 = graft.streaming.IcebergStream.upsertSink(spark,
      spark.readStream.schema(schema).parquet(src),
      s"$tmp/table", Seq("id"), "nf", s"$tmp/ckpt",
      sequenceCol = Some("seq"), deleteCol = Some("del"))
    try {
      q0.processAllAvailable()
      assert(IcebergInterop.readIceberg(spark, s"$tmp/table").count() == 2,
        "null-flag bootstrap rows must land")
      // merge batch: a null-flag NEW key inserts, a null-flag EXISTING
      // key updates
      stage(Seq(Row(3L, "c", null, 1L), Row(1L, "a2", null, 1L)))
      q0.processAllAvailable()
    } finally q0.stop()
    val byId = IcebergInterop.readIceberg(spark, s"$tmp/table")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }
}
