package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean
import graft.io.IcebergInterop
import graft.streaming.DedupStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming INCREMENTAL near-dup dedup ([[DedupStream.dedupSink]]):
  * MinHash/LSH collisions against the persisted survivor signature
  * table drop duplicates across batches, bucket-local min-id
  * suppression handles within-batch copies, and both the corpus and
  * the signature state land exactly-once (crash between the two
  * commits replays only the missing half). */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def txt(seed: String): String =
    (1 to 30).map(i => s"$seed word$i token$i").mkString(" ")

  test("state collisions drop, batch min-id wins, crash replays half-committed") {
    val tmp = Files.createTempDirectory("graft-dedup-stream").toString
    val src = s"$tmp/src"
    def stage(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    // batch 0: three distinct docs + one exact copy of doc 0 (id 3)
    stage(Seq(0L -> txt("alpha"), 1L -> txt("beta"), 2L -> txt("gamma"),
      3L -> txt("alpha")))
    val schema = spark.read.parquet(src).schema
    val fired = new AtomicBoolean(false)
    def run(hook: (Long, Long) => Unit) = DedupStream.dedupSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/sigs", "dd", s"$tmp/ckpt",
      postCommitHook = hook)
    val q0 = run((_, _) => ())
    try q0.processAllAvailable() finally q0.stop()
    def corpusIds: Set[Long] = IcebergInterop.readIceberg(spark, s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpusIds == Set(0L, 1L, 2L), "min-id survives its within-batch copy")
    // batch 1: a copy of doc 1 (state collision) + one new doc —
    // crash AFTER both commits, BEFORE the offset commit
    stage(Seq(10L -> txt("beta"), 11L -> txt("delta")))
    val q1 = run((_, _) => if (!fired.getAndSet(true))
      throw new RuntimeException("injected crash"))
    val crashed =
      try { q1.processAllAvailable(); false } catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }
    assert(crashed)
    assert(corpusIds == Set(0L, 1L, 2L, 11L), "state collision dropped doc 10")
    val sigRows = IcebergInterop.readIceberg(spark, s"$tmp/sigs").count()
    // batch 2 after restart: the replay of batch 1 is a no-op, then a
    // copy of doc 11 drops while a new doc survives
    stage(Seq(20L -> txt("delta"), 21L -> txt("epsilon")))
    val q2 = run((_, _) => ())
    try q2.processAllAvailable() finally q2.stop()
    assert(corpusIds == Set(0L, 1L, 2L, 11L, 21L))
    val sigAfter = IcebergInterop.readIceberg(spark, s"$tmp/sigs")
    assert(sigAfter.filter(col("doc_id") === 21L).count() > 0,
      "the new survivor's keys joined the state")
    assert(sigAfter.count() > sigRows, "only batch 2 extended the state")
    assert(sigAfter.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 11L, 21L), "state holds exactly the survivors' keys")
    // both ledgers: 3 snapshots each, no replay double-commits
    assert(IcebergInterop.snapshots(spark, s"$tmp/corpus").count() == 3)
    assert(IcebergInterop.snapshots(spark, s"$tmp/sigs").count() == 3)
  }

  test("bucket[N] state: the probe opens a strict file subset, same survivors") {
    val tmp = Files.createTempDirectory("graft-dedup-bucket").toString
    val src = s"$tmp/src"
    def stage(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    def run(tag: String, buckets: Int) = {
      val schema = spark.read.parquet(src).schema
      DedupStream.dedupSink(spark,
        spark.readStream.schema(schema).parquet(src),
        "doc_id", "text", s"$tmp/corpus-$tag", s"$tmp/sigs-$tag", s"dd-$tag",
        s"$tmp/ckpt-$tag", stateBuckets = buckets)
    }
    def ids(tag: String): Set[Long] =
      IcebergInterop.readIceberg(spark, s"$tmp/corpus-$tag")
        .select("doc_id").as[Long].collect().toSet
    // three batches: dups across batches and within a batch
    val batches = Seq(
      Seq(0L -> txt("alpha"), 1L -> txt("beta"), 2L -> txt("gamma"),
        3L -> txt("alpha")),
      Seq(10L -> txt("beta"), 11L -> txt("delta"), 12L -> txt("epsilon")),
      Seq(20L -> txt("delta"), 21L -> txt("zeta"), 22L -> txt("gamma")))
    batches.zipWithIndex.foreach { case (b, i) =>
      stage(b)
      // plain FIRST so the bucketed run's probe telemetry is what the
      // asserts read afterwards
      val qp = run("plain", 0); try qp.processAllAvailable() finally qp.stop()
      val qb = run("bkt", 32); try qb.processAllAvailable() finally qb.stop()
      if (i > 0) {
        // the probe scanned a STRICT subset of the state's data files:
        // whole bucket manifests the batch's keys cannot hash into
        // were never opened
        val (probeKept, _) = DedupStream.lastProbeFiles
        val (_, manSkipped) = DedupStream.lastProbeManifests
        IcebergInterop.readIceberg(spark, s"$tmp/sigs-bkt") // full scan
        val (totalFiles, _) = IcebergInterop.lastDataFileScan
        assert(manSkipped > 0, s"batch $i: no bucket manifest skipped")
        assert(probeKept < totalFiles,
          s"batch $i: probe read $probeKept of $totalFiles state files")
      }
    }
    assert(ids("bkt") == ids("plain"),
      "bucketed layout must not change dedup results")
    assert(ids("bkt") == Set(0L, 1L, 2L, 11L, 12L, 21L))
    // the bucketed sig table holds exactly the plain run's state rows
    val plainSigs = IcebergInterop.readIceberg(spark, s"$tmp/sigs-plain")
      .select("doc_id", "band_key").as[(Long, String)].collect().toSet
    val bktSigs = IcebergInterop.readIceberg(spark, s"$tmp/sigs-bkt")
      .select("doc_id", "band_key").as[(Long, String)].collect().toSet
    assert(bktSigs == plainSigs)
    // exactly-once held on the partitioned path too
    assert(IcebergInterop.snapshots(spark, s"$tmp/sigs-bkt").count() == 3)
  }

  test("bucket[N] state: crash between commits replays only the missing half") {
    val tmp = Files.createTempDirectory("graft-dedup-bucket-crash").toString
    val src = s"$tmp/src"
    def stage(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    stage(Seq(0L -> txt("alpha"), 1L -> txt("beta")))
    val schema = spark.read.parquet(src).schema
    val fired = new AtomicBoolean(false)
    def run(hook: (Long, Long) => Unit) = DedupStream.dedupSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/sigs", "ddc", s"$tmp/ckpt",
      stateBuckets = 8, postCommitHook = hook)
    val q0 = run((_, _) => ())
    try q0.processAllAvailable() finally q0.stop()
    stage(Seq(10L -> txt("alpha"), 11L -> txt("theta")))
    val q1 = run((_, _) => if (!fired.getAndSet(true))
      throw new RuntimeException("injected crash"))
    val crashed =
      try { q1.processAllAvailable(); false } catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }
    assert(crashed)
    stage(Seq(20L -> txt("iota")))
    val q2 = run((_, _) => ())
    try q2.processAllAvailable() finally q2.stop()
    assert(IcebergInterop.readIceberg(spark, s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 11L, 20L))
    // 3 real batches → 3 ledgered snapshots on the partitioned state
    assert(IcebergInterop.snapshots(spark, s"$tmp/sigs").count() == 3)
    assert(IcebergInterop.readIceberg(spark, s"$tmp/sigs")
      .select("doc_id").distinct().as[Long].collect().toSet ==
      Set(0L, 1L, 11L, 20L))
  }
}
