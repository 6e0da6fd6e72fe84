package graft

import graft.ops.Scd2
import graft.pipeline.FixedClock
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicBoolean

/** Failure injection for the exactly-once streaming sinks: each test
  * kills the query IN the crash window — after the sink's data write,
  * before the checkpoint offset commit (the `postCommitHook` throws) —
  * then restarts on the same checkpoint, forcing a genuine at-least-once
  * replay of the half-committed batch. The final state must equal a
  * control pipeline that never crashed. This is the window round 5's
  * replay specs only simulated with fresh checkpoints; here the replay
  * comes from an actual crashed query. */
class StreamingCrashSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Throws on the first call with `batchId` ≥ `failAt` — one injected
    * crash, then clean. */
  private def crashOnce(failAt: Long): (Long => Unit, AtomicBoolean) = {
    val fired = new AtomicBoolean(false)
    val hook = (id: Long) =>
      if (id >= failAt && !fired.getAndSet(true))
        throw new RuntimeException(s"injected crash after commit of batch $id")
    (hook, fired)
  }

  private def expectCrash(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val thrown =
      try { q.processAllAvailable(); false }
      catch { case _: Exception => true }
    try q.stop() catch { case _: Exception => () }
    assert(thrown, "injected crash did not terminate the query")
  }

  test("AggStream: crash between commit and checkpoint — replay is skipped, state converges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-crash-agg").toString
    val updates = s"$tmp/updates"
    Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v").write.mode("append").parquet(updates)
    val schema = spark.read.parquet(updates).schema
    def run(hook: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
      graft.streaming.AggStream.incrementalSink(spark,
        spark.readStream.schema(schema).parquet(updates),
        Seq("k"), Seq("v"), s"$tmp/state", s"$tmp/ckpt", postCommitHook = hook)
    // batch 0 commits cleanly
    val q0 = run(_ => ()); q0.processAllAvailable(); q0.stop()
    // batch 1 commits, then the query dies BEFORE the checkpoint records it
    Seq((1L, 20.0), (3L, 1.0)).toDF("k", "v").write.mode("append").parquet(updates)
    val (hook, fired) = crashOnce(1L)
    expectCrash(run(hook))
    assert(fired.get, "crash hook never fired")
    // restart on the same checkpoint: batch 1 REPLAYS (it was never
    // committed) — the versioned state must skip id 1 <= last-applied 1
    val q2 = run(_ => ()); q2.processAllAvailable(); q2.stop()
    def state() = graft.streaming.AggStream.readState(spark, s"$tmp/state")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(state() == Map(1L -> ((2L, 30.0)), 2L -> ((1L, 5.0)), 3L -> ((1L, 1.0))),
      "replayed half-committed batch was re-folded")
    // and the stream keeps working after recovery
    Seq((3L, 2.0)).toDF("k", "v").write.mode("append").parquet(updates)
    val q3 = run(_ => ()); q3.processAllAvailable(); q3.stop()
    assert(state()(3L) == ((2L, 3.0)))
  }

  test("DeltaStream: crash between table commit and checkpoint — txn watermark drops the replay") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-crash-delta").toString
    val src = s"$tmp/src"
    val table = s"$tmp/table"
    Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "name", "part")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(hook: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
      graft.streaming.DeltaStream.sink(spark,
        spark.readStream.schema(schema).parquet(src),
        table, Seq("part"), "graft-crash-delta", s"$tmp/ckpt", postCommitHook = hook)
    // batch 0 lands in the TABLE, then the query dies before Spark's
    // checkpoint records the offset — the at-least-once window
    val (hook, fired) = crashOnce(0L)
    expectCrash(run(hook))
    assert(fired.get, "crash hook never fired")
    assert(graft.io.DeltaInterop.readDelta(spark, table).count() == 2)
    // restart: batch 0 REPLAYS; the txn watermark (appId, batchId=0) is
    // already committed, so the table must not double-count
    Seq((3L, "c", 0)).toDF("id", "name", "part").write.mode("append").parquet(src)
    val q2 = run(_ => ()); q2.processAllAvailable(); q2.stop()
    val t = graft.io.DeltaInterop.readDelta(spark, table)
    assert(t.count() == 3, "replayed micro-batch was double-committed")
    assert(t.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the replayed batch's txn is visible to any Delta reader
    val st = graft.io.DeltaInterop.state(spark, table)
    assert(st.txns.get("graft-crash-delta").exists(_ >= 1L))
    // no orphan files left behind by the replay (it skipped pre-staging)
    assert(graft.io.DeltaInterop.vacuum(spark, table, retainMillis = 0L) == 0)
  }

  test("AggStream: retainVersions keeps a deeper laggard-reader window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-retain").toString
    val updates = s"$tmp/updates"
    val schema = {
      Seq((1L, 1.0)).toDF("k", "v").write.mode("append").parquet(updates)
      spark.read.parquet(updates).schema
    }
    def runOnce(): Unit = {
      val q = graft.streaming.AggStream.incrementalSink(spark,
        spark.readStream.schema(schema).parquet(updates),
        Seq("k"), Seq("v"), s"$tmp/state", s"$tmp/ckpt", retainVersions = 3)
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    Seq((1L, 2.0)).toDF("k", "v").write.mode("append").parquet(updates); runOnce()
    Seq((1L, 3.0)).toDF("k", "v").write.mode("append").parquet(updates); runOnce()
    Seq((1L, 4.0)).toDF("k", "v").write.mode("append").parquet(updates); runOnce()
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/state"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .map(_.getPath.getName.stripPrefix("v").toLong).sorted.toSeq
    // 4 commits (v0..v3), newest 3 retained
    assert(versions == Seq(1L, 2L, 3L), s"unexpected retained versions: $versions")
    assert(graft.streaming.AggStream.readState(spark, s"$tmp/state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 4L, 10.0)))
  }

  test("AnnStream: crash between batch-dir write and checkpoint — replay rewrites, codes converge") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-crash-ann").toString
    val updates = s"$tmp/updates"
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    vecs.write.mode("append").parquet(updates)
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val model = graft.operators.ProductQuant.PQModel(m = 1, k = 2, subDim = 2,
      codebooks = Seq(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    def run(hook: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
      graft.streaming.AnnStream.indexMaintenanceSink(spark,
        spark.readStream.schema(vecs.schema).parquet(updates),
        "vec_id", "embedding", cents, model, s"$tmp/state", s"$tmp/ckpt",
        postCommitHook = hook)
    // batch 0 writes its dir, then the query dies before the checkpoint
    val (hook, fired) = crashOnce(0L)
    expectCrash(run(hook))
    assert(fired.get)
    // restart: batch 0 replays into the SAME b0 dir (overwrite, no dupes),
    // then batch 1 ingests normally
    Seq((3L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(updates)
    val q2 = run(_ => ()); q2.processAllAvailable(); q2.stop()
    val got = graft.streaming.AnnStream.readCodes(spark, s"$tmp/state")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    // (0.9, 0.1) routes to cell 0; residual (−0.1, 0.1) is nearer codebook
    // entry 1 (0.82 vs 1.22 squared distance)
    assert(got == Seq((1L, 0, Seq(0)), (2L, 1, Seq(0)), (3L, 0, Seq(1))),
      "replayed batch duplicated or lost index rows")
  }

  test("DimStream: crash after dim overwrite — the replayed SCD2 merge is a no-op, dim converges") {
    val base = Seq((1L, "n1", "A"), (2L, "n2", "B"), (3L, "n3", "A"))
      .toDF("k", "name", "seg")
    val mutated = Seq((1L, "n1", "A"), (2L, "n2", "B2"), (3L, "n3", "A"),
      (4L, "n4", "C")).toDF("k", "name", "seg")
    val spec = Scd2.Scd2Spec(Seq("k"), Seq("name", "seg"), "sk", "dim_t")
    val clocks = Map(
      0L -> FixedClock("2024-01-01 00:00:00"),
      1L -> FixedClock("2024-06-01 00:00:00"))
    def pipeline(dir: String, crashBatch1: Boolean): Unit = {
      val updates = s"$dir/updates"
      base.write.mode("append").parquet(updates)
      def run(hook: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
        graft.streaming.DimStream.scd2Sink(spark,
          spark.readStream.schema(base.schema).parquet(updates),
          spec, s"$dir/dim", s"$dir/ckpt", clocks(_), postCommitHook = hook)
      val q0 = run(_ => ()); q0.processAllAvailable(); q0.stop()
      mutated.write.mode("append").parquet(updates)
      if (crashBatch1) {
        val (hook, fired) = crashOnce(1L)
        expectCrash(run(hook))
        assert(fired.get)
        // restart: batch 1 replays — the merge re-runs against the
        // ALREADY-merged dim with the same clock and must change nothing
      }
      val q1 = run(_ => ()); q1.processAllAvailable(); q1.stop()
    }
    val ctlDir = java.nio.file.Files.createTempDirectory("graft-crash-dim-ctl").toString
    val crashDir = java.nio.file.Files.createTempDirectory("graft-crash-dim").toString
    pipeline(ctlDir, crashBatch1 = false)
    pipeline(crashDir, crashBatch1 = true)
    def dim(dir: String) = graft.streaming.DimStream.readDim(spark, s"$dir/dim")
      .collect().map(_.toSeq).toSet
    val control = dim(ctlDir)
    assert(dim(crashDir) == control, "crashed+replayed dim diverged from the no-crash run")
    // sanity: the control dim actually carries SCD2 history (2 versions of key 2)
    assert(control.size == 5)
  }

  test("NbStream: crash between model commit and checkpoint — replay skipped, model converges") {
    val batchA = Seq((1L, "the cat sat on the mat with the hat", "en"),
      (2L, "der hund lief durch den wald und bellte", "de")).toDF("doc_id", "text", "lang")
    val batchB = Seq((3L, "the dog ran over the hill to the barn", "en"),
      (4L, "die katze schlief auf dem warmen ofen", "de")).toDF("doc_id", "text", "lang")
    def pipeline(dir: String, crashBatch1: Boolean): Unit = {
      val src = s"$dir/src"
      batchA.write.mode("append").parquet(src)
      def run(hook: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
        graft.streaming.NbStream.trainingSink(spark,
          spark.readStream.schema(batchA.schema).parquet(src),
          "text", "lang", s"$dir/model", s"$dir/ckpt", postCommitHook = hook)
      val q0 = run(_ => ()); q0.processAllAvailable(); q0.stop()
      batchB.write.mode("append").parquet(src)
      if (crashBatch1) {
        val (hook, fired) = crashOnce(1L)
        expectCrash(run(hook))
        assert(fired.get)
        // restart: batch 1 replays against state that already folded it —
        // the batchId guard must skip the non-idempotent merge
      }
      val q1 = run(_ => ()); q1.processAllAvailable(); q1.stop()
    }
    val ctlDir = java.nio.file.Files.createTempDirectory("graft-crash-nb-ctl").toString
    val crashDir = java.nio.file.Files.createTempDirectory("graft-crash-nb").toString
    pipeline(ctlDir, crashBatch1 = false)
    pipeline(crashDir, crashBatch1 = true)
    def model(dir: String) = graft.streaming.NbStream.readCurrentModel(spark, s"$dir/model")
    val control = model(ctlDir)
    val crashed = model(crashDir)
    assert(crashed.counts.view.mapValues(_.toSeq).toMap ==
      control.counts.view.mapValues(_.toSeq).toMap,
      "replayed half-committed batch was re-merged into the model")
    assert(crashed.docCounts == control.docCounts)
    // and BOTH equal the one-shot batch model — stream ≡ batch exactly
    val oneShot = graft.operators.LangModel.train(batchA.unionByName(batchB), "text", "lang")
    assert(control.counts.view.mapValues(_.toSeq).toMap ==
      oneShot.counts.view.mapValues(_.toSeq).toMap)
    assert(control.docCounts == oneShot.docCounts &&
      control.gramTotals == oneShot.gramTotals && control.vocab == oneShot.vocab)
  }

  test("NbStream: crash AFTER writeModel but BEFORE the pointer swap — orphan v-dir rewritten on replay") {
    // the window the post-swap test can't reach: v<batchId> exists on
    // disk (fully or partially written) but _CURRENT still points at the
    // previous version. The replay re-trains the batch and must be able
    // to REWRITE the orphan dir (SaveMode.Overwrite) instead of dying
    // with 'path already exists' and wedging the stream forever.
    val batchA = Seq((1L, "the cat sat on the mat with the hat", "en"),
      (2L, "der hund lief durch den wald und bellte", "de")).toDF("doc_id", "text", "lang")
    val batchB = Seq((3L, "the dog ran over the hill to the barn", "en"),
      (4L, "die katze schlief auf dem warmen ofen", "de")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-nb-preswap").toString
    val src = s"$dir/src"
    batchA.write.mode("append").parquet(src)
    def run(pre: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
      graft.streaming.NbStream.trainingSink(spark,
        spark.readStream.schema(batchA.schema).parquet(src),
        "text", "lang", s"$dir/model", s"$dir/ckpt", preSwapHook = pre)
    val q0 = run(_ => ()); q0.processAllAvailable(); q0.stop()
    batchB.write.mode("append").parquet(src)
    val (hook, fired) = crashOnce(1L)
    expectCrash(run(hook))
    assert(fired.get)
    // v1 exists but the pointer still says v0
    val fsRoot = new java.io.File(s"$dir/model")
    assert(new java.io.File(fsRoot, "v1").isDirectory)
    assert(scala.io.Source.fromFile(new java.io.File(fsRoot, "_CURRENT")).mkString.trim == "v0")
    // restart: batchId 1 > lastId 0 ⇒ the batch re-trains, rewrites v1,
    // and swaps the pointer — no wedge, and the model equals batch truth
    val q1 = run(_ => ()); q1.processAllAvailable(); q1.stop()
    val streamed = graft.streaming.NbStream.readCurrentModel(spark, s"$dir/model")
    val oneShot = graft.operators.LangModel.train(batchA.unionByName(batchB), "text", "lang")
    assert(streamed.counts.view.mapValues(_.toSeq).toMap ==
      oneShot.counts.view.mapValues(_.toSeq).toMap)
    assert(streamed.docCounts == oneShot.docCounts)
  }

  test("BatchTuning right-sizes the stream's CLONED session, never the user's") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tune").toString
    val updates = s"$tmp/updates"
    Seq((1L, 1.0)).toDF("k", "v").write.mode("append").parquet(updates)
    val schema = spark.read.parquet(updates).schema
    val userPartitions = spark.conf.get("spark.sql.shuffle.partitions")
    @volatile var batchSessionIsClone = false
    @volatile var batchPartitions = ""
    val q = spark.readStream.schema(schema).parquet(updates).writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.BatchTuning.rightSize(b)
        batchSessionIsClone = b.sparkSession ne spark
        batchPartitions = b.sparkSession.conf.get("spark.sql.shuffle.partitions")
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batchSessionIsClone,
      "foreachBatch must hand a per-query session clone (the tuning isolation boundary)")
    assert(batchPartitions == "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == userPartitions,
      "the user's session width must be untouched")
  }
}
