package graft

import graft.io.{DeltaInterop, TempDirs}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ListBuffer

/** The graft-delta streaming SOURCE: snapshot-then-tail semantics,
  * exactly-once across restarts, rate limiting, and the change-commit
  * gates — the read half of the Delta streaming story (the sink half
  * lives in StreamingCrashSpec / DeltaStream). Restart tests sink via
  * foreachBatch (memory sink does not recover append-mode checkpoints). */
class DeltaSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docs(n: Int, from: Int = 0): DataFrame =
    (from until from + n).map(i => (i.toLong, s"doc $i", (i % 3).toString))
      .toDF("id", "body", "grp")

  private def sortedRows(df: DataFrame): Seq[(Long, String, String)] =
    df.select("id", "body", "grp").as[(Long, String, String)].collect().toSeq.sortBy(_._1)

  /** Run the source to exhaustion into a driver-side buffer through a
    * durable checkpoint; each call is one stream incarnation. */
  private def runStream(dir: String, ckpt: String,
                        into: ListBuffer[(Long, String, String)],
                        opts: Map[String, String] = Map.empty): Unit = {
    val reader = opts.foldLeft(spark.readStream.format("graft-delta")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(dir).writeStream
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.select("id", "body", "grp")
          .as[(Long, String, String)](implicitly).collect()
        into.synchronized { into ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("snapshot then tail equals the batch read; appends arrive exactly once") {
    val dir = TempDirs.scratch("delta-src-basic")
    DeltaInterop.writeDelta(docs(20).repartition(3), dir, Seq("grp"))
    DeltaInterop.writeDelta(docs(10, from = 20).repartition(2), dir, Seq("grp"))

    val q = spark.readStream.format("graft-delta").load(dir)
      .writeStream.format("memory").queryName("dsrc_basic").start()
    try {
      q.processAllAvailable()
      assert(sortedRows(spark.table("dsrc_basic")) ===
        sortedRows(DeltaInterop.readDelta(spark, dir)))
      // two more commits while the stream is live
      DeltaInterop.writeDelta(docs(5, from = 30).repartition(2), dir, Seq("grp"))
      DeltaInterop.writeDelta(docs(5, from = 35), dir, Seq("grp"))
      q.processAllAvailable()
      assert(sortedRows(spark.table("dsrc_basic")) ===
        sortedRows(DeltaInterop.readDelta(spark, dir)))
      assert(spark.table("dsrc_basic").count() === 40L) // exactly once, no dupes
    } finally q.stop()
  }

  test("restart from checkpoint resumes the tail exactly once") {
    val dir = TempDirs.scratch("delta-src-restart")
    val ckpt = TempDirs.scratch("delta-src-restart-ckpt")
    DeltaInterop.writeDelta(docs(12).repartition(2), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got)
    assert(got.size === 12)

    // append while the stream is DOWN, restart on the same checkpoint:
    // the snapshot must NOT re-emit; the append arrives exactly once
    DeltaInterop.writeDelta(docs(6, from = 12), dir, Nil)
    runStream(dir, ckpt, got)
    assert(got.size === 18, s"expected 12 snapshot + 6 appended, got ${got.size}")
    assert(got.toSeq.sortBy(_._1) === sortedRows(DeltaInterop.readDelta(spark, dir)))
  }

  test("maxFilesPerTrigger cuts the stream into multiple rate-limited batches") {
    val dir = TempDirs.scratch("delta-src-rate")
    DeltaInterop.writeDelta(docs(24).repartition(6), dir, Nil)
    DeltaInterop.writeDelta(docs(8, from = 24).repartition(4), dir, Nil)
    val q = spark.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.format("memory").queryName("dsrc_rate").start()
    try {
      q.processAllAvailable()
      assert(sortedRows(spark.table("dsrc_rate")) ===
        sortedRows(DeltaInterop.readDelta(spark, dir)))
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4, // 10 files at ≤2 per trigger
        s"expected several rate-limited batches, saw $dataBatches")
    } finally q.stop()
  }

  test("startingVersion replays the add stream only — no snapshot phase") {
    val dir = TempDirs.scratch("delta-src-startv")
    DeltaInterop.writeDelta(docs(10), dir, Nil)                 // v0
    DeltaInterop.writeDelta(docs(5, from = 10), dir, Nil)       // v1
    DeltaInterop.writeDelta(docs(5, from = 15), dir, Nil)       // v2

    val fromV1 = ListBuffer.empty[(Long, String, String)]
    runStream(dir, TempDirs.scratch("delta-src-startv-ck1"), fromV1,
      Map("startingVersion" -> "1"))
    assert(fromV1.toSeq.sortBy(_._1) ===
      sortedRows(DeltaInterop.readDelta(spark, dir).filter(col("id") >= 10)))

    val fromEarliest = ListBuffer.empty[(Long, String, String)]
    runStream(dir, TempDirs.scratch("delta-src-startv-ck2"), fromEarliest,
      Map("startingVersion" -> "earliest"))
    assert(fromEarliest.toSeq.sortBy(_._1) ===
      sortedRows(DeltaInterop.readDelta(spark, dir)))
  }

  test("a data-changing remove fails the stream unless ignoreChanges") {
    val dir = TempDirs.scratch("delta-src-chg")
    val ckpt = TempDirs.scratch("delta-src-chg-ckpt")
    DeltaInterop.writeDelta(docs(10).repartition(1), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got) // consume the snapshot
    assert(got.size === 10)

    DeltaInterop.deleteWhere(spark, dir, col("id") % 2 === 0L) // copy-on-write rewrite
    val ex = intercept[StreamingQueryException] { runStream(dir, ckpt, got) }
    assert(ex.getCause.getMessage.contains("ignoreChanges"),
      s"wrong failure: ${ex.getCause.getMessage}")

    // with ignoreChanges the rewritten file's rows re-emit (the
    // documented Delta reprocessing tradeoff) — exactly the 5 survivors
    runStream(dir, ckpt, got, Map("ignoreChanges" -> "true"))
    assert(got.size === 15, s"10 snapshot + 5 surviving rewritten, got ${got.size}")
    assert(got.drop(10).map(_._1).forall(_ % 2 === 1L))
  }

  test("dataChange=false commits (compaction) advance without re-emission") {
    val dir = TempDirs.scratch("delta-src-compact")
    val ckpt = TempDirs.scratch("delta-src-compact-ckpt")
    DeltaInterop.writeDelta(docs(16).repartition(4), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got)
    assert(got.size === 16)

    val (_, nIn, _) = DeltaInterop.compact(spark, dir) // dataChange=false rewrite
    assert(nIn > 0, "compaction should have compacted the small files")
    DeltaInterop.writeDelta(docs(4, from = 16), dir, Nil)
    runStream(dir, ckpt, got)
    assert(got.size === 20,
      s"compaction must not re-emit rows and the append must arrive; got ${got.size}")
  }

  test("DV delete is a data change; ignoreChanges re-reads the file masked") {
    val dir = TempDirs.scratch("delta-src-dv")
    val ckpt = TempDirs.scratch("delta-src-dv-ckpt")
    DeltaInterop.writeDelta(docs(10).repartition(1), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got)
    assert(got.size === 10)

    val (_, touched, nDel) = DeltaInterop.deleteWhereDV(spark, dir, col("id") < 3L)
    assert(touched > 0 && nDel === 3L)
    intercept[StreamingQueryException] { runStream(dir, ckpt, got) }

    // the DV commit re-adds the SAME file with a mask: ignoreChanges
    // re-emits it DV-MASKED — deleted rows never flow downstream
    runStream(dir, ckpt, got, Map("ignoreChanges" -> "true"))
    assert(got.size === 17, s"10 snapshot + 7 masked re-emission, got ${got.size}")
    assert(got.drop(10).map(_._1).forall(_ >= 3L))
  }

  test("schema change after stream start fails with a restart hint") {
    val dir = TempDirs.scratch("delta-src-schema")
    val ckpt = TempDirs.scratch("delta-src-schema-ckpt")
    DeltaInterop.writeDelta(docs(6), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got)
    DeltaInterop.writeDelta(
      docs(3, from = 6).withColumn("extra", lit(1L)), dir, Nil)
    val ex = intercept[StreamingQueryException] { runStream(dir, ckpt, got) }
    assert(ex.getCause.getMessage.contains("restart the stream"),
      s"wrong failure: ${ex.getCause.getMessage}")
  }

  test("CDF mode streams change rows: snapshot inserts, then deletes/updates") {
    val dir = TempDirs.scratch("delta-src-cdfmode")
    val ckpt = TempDirs.scratch("delta-src-cdfmode-ckpt")
    DeltaInterop.writeDelta(docs(10).repartition(1), dir, Nil)
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    val got = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true").load(dir)
        .writeStream
        .foreachBatch { (df: Dataset[Row], _: Long) =>
          val rows = df.select("_change_type", "id", "_commit_version")
            .as[(String, Long, Long)](implicitly).collect()
          got.synchronized { got ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // snapshot → inserts
    assert(got.count(_._1 == "insert") === 10)
    DeltaInterop.deleteWhere(spark, dir, col("id") < 3L)
    DeltaInterop.updateWhere(spark, dir, col("id") === 5L,
      Map("body" -> concat(col("body"), lit("!"))))
    run() // tail → CDC rows, NOT re-emitted data files
    assert(got.count(_._1 == "delete") === 3)
    assert(got.count(_._1 == "update_preimage") === 1 &&
      got.count(_._1 == "update_postimage") === 1)
    assert(got.size === 15, s"no data-file re-emission in CDF mode: ${got.size}")
    // the streamed feed equals the batch feed for the tail versions
    val batchFeed = DeltaInterop.readChangeFeed(spark, dir, 2, 3)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq.sorted
    assert(got.drop(10).map(r => (r._1, r._2)).sorted === batchFeed)
  }

  test("CDF mode fails on a rows-changed-without-CDC commit") {
    val dir = TempDirs.scratch("delta-src-cdfmode-off")
    val ckpt = TempDirs.scratch("delta-src-cdfmode-off-ckpt")
    DeltaInterop.writeDelta(docs(6).repartition(1), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got, Map("readChangeFeed" -> "true")) // inserts fine
    DeltaInterop.deleteWhere(spark, dir, col("id") === 0L) // CDF never enabled
    val ex = intercept[StreamingQueryException] {
      runStream(dir, ckpt, got, Map("readChangeFeed" -> "true"))
    }
    assert(ex.getCause.getMessage.contains("enableChangeDataFeed"),
      s"wrong failure: ${ex.getCause.getMessage}")
  }

  test("the source streams a column-mapped (renamed) table through the mapping") {
    val dir = TempDirs.scratch("delta-src-mapped")
    val ckpt = TempDirs.scratch("delta-src-mapped-ckpt")
    DeltaInterop.writeDelta(docs(8), dir, Nil)
    DeltaInterop.renameColumn(spark, dir, "body", "text")
    val got = ListBuffer.empty[(Long, String, String)]
    val q = spark.readStream.format("graft-delta").load(dir)
      .writeStream
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.select("id", "text", "grp")
          .as[(Long, String, String)](implicitly).collect()
        got.synchronized { got ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(got.size === 8 && got.forall(_._2.startsWith("doc ")))
      // a post-rename append (physical-named file) tails through too
      DeltaInterop.writeDelta(
        (8L until 10L).map(i => (i, s"doc $i", "1")).toDF("id", "text", "grp"),
        dir, Nil)
      q.processAllAvailable()
      assert(got.size === 10)
    } finally q.stop()
  }

  test("origin survives restart: snapshot boundary fixed at first start") {
    val dir = TempDirs.scratch("delta-src-origin")
    val ckpt = TempDirs.scratch("delta-src-origin-ckpt")
    DeltaInterop.writeDelta(docs(8), dir, Nil)
    val got = ListBuffer.empty[(Long, String, String)]
    runStream(dir, ckpt, got)
    assert(got.size === 8)
    // append, restart on the same checkpoint: the origin file pins the
    // ORIGINAL snapshot version, so only the append enumerates as tail
    DeltaInterop.writeDelta(docs(4, from = 8), dir, Nil)
    runStream(dir, ckpt, got)
    assert(got.drop(8).map(_._1).sorted === (8L until 12L).toSeq)
  }
}
