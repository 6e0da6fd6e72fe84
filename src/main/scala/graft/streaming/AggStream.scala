package graft.streaming

import graft.io.{Readers, Writers}
import graft.ops.IncrementalAgg
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets

/** Streaming materialized-view maintenance: each micro-batch of raw rows
  * folds into a persisted per-key aggregate state via
  * [[graft.ops.IncrementalAgg]] — the streaming twin of q74's batch
  * refresh, through foreachBatch for the same reason as [[DimStream]]
  * (a merge-shaped sink that append/update output modes can't express).
  *
  * Because the state is a commutative monoid (counts + sums), the merge
  * is insensitive to batch boundaries: ANY partitioning of the input
  * stream into micro-batches lands the same state as one batch build —
  * which is exactly what the oracle gate checks.
  *
  * EXACTLY-ONCE: foreachBatch is at-least-once — a batch can replay after
  * a crash between the sink's side effect and the checkpoint commit. The
  * sink is therefore idempotent BY CONSTRUCTION, the pattern Spark's own
  * foreachBatch docs prescribe:
  *   - every committed state version is an immutable directory
  *     `<statePath>/v<batchId>`; the version name IS the last-applied
  *     batch id, so a replayed id (<= current) is detected and skipped
  *     instead of re-folded into the non-idempotent monoid merge;
  *   - commit = writing the new version dir, THEN atomically swapping the
  *     `_CURRENT` pointer file (FileContext rename with OVERWRITE — atomic
  *     on HDFS and local). A crash mid-write leaves the pointer on the old
  *     version; accumulated state is never destroyed in place.
  * Lifecycle note: batch ids restart at 0 with a FRESH checkpoint, so
  * state and checkpoint must be retired together (true of any
  * batchId-keyed idempotent sink).
  */
object AggStream {

  private val Pointer = "_CURRENT"

  /** The committed state version dir, or None before the first commit. */
  def currentStateDir(spark: SparkSession, statePath: String): Option[String] = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, Pointer)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val v =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8).trim
        finally in.close()
      Some(new Path(root, v).toString)
    }
  }

  /** Read the current committed state (pointer-resolved).
    *
    * Reader contract: the returned DataFrame is LAZY — it resolves
    * `_CURRENT` now but reads files at action time. Materialize promptly
    * (or raise `retainVersions`): a plan held across more than
    * `retainVersions − 1` later commits scans a GC'd directory. */
  def readState(spark: SparkSession, statePath: String): DataFrame =
    currentStateDir(spark, statePath)
      .map(d => Readers.parquet(spark, d))
      .getOrElse(throw new IllegalStateException(s"no committed state under $statePath"))

  /** `retainVersions`: how many committed version dirs survive GC (newest
    * first, the committed one included) — the time-travel/laggard-reader
    * window, same knob shape as the streaming state store's
    * minVersionsToRetain. Minimum 2: the new version plus its
    * predecessor, so a reader that resolved the old pointer just before
    * the swap still scans an existing directory. */
  /** `postCommitHook` fires after the sink's full side effect (state dir +
    * pointer swap) but BEFORE foreachBatch returns — i.e. before the
    * checkpoint offset commit. A hook that throws simulates the crash
    * window exactly-once sinks must survive: the batch replays on restart
    * and the batchId guard must skip it (StreamingCrashSpec). */
  def incrementalSink(
      spark: SparkSession,
      updates: DataFrame,
      keys: Seq[String],
      measures: Seq[String],
      statePath: String,
      checkpoint: String,
      retainVersions: Int = 2,
      postCommitHook: Long => Unit = _ => ()
  ): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = BatchTuning.rightSize(batch0)
        if (!batch.isEmpty) {
          val root = new Path(statePath)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val cur = currentStateDir(spark, statePath)
          val lastId = cur.map(d => new Path(d).getName.stripPrefix("v").toLong).getOrElse(-1L)
          if (batchId > lastId) {
            val merged = cur match {
              case Some(d) => IncrementalAgg.merge(Readers.parquet(spark, d), batch, keys, measures)
              case None    => IncrementalAgg.build(batch, keys, measures)
            }
            val newDir = new Path(root, s"v$batchId")
            Writers.parquet(merged, newDir.toString)
            // atomic pointer swap — the commit point
            val tmp = new Path(root, s"$Pointer.tmp")
            val out = fs.create(tmp, true)
            try out.write(s"v$batchId".getBytes(StandardCharsets.UTF_8))
            finally out.close()
            val fc = FileContext.getFileContext(root.toUri, spark.sparkContext.hadoopConfiguration)
            fc.rename(tmp, new Path(root, Pointer), Options.Rename.OVERWRITE)
            // GC: keep the newest `retainVersions` version dirs (committed
            // one included); everything older goes
            val versions = fs.listStatus(root)
              .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
              .map(_.getPath)
              .sortBy(p => -p.getName.stripPrefix("v").toLong)
            versions.drop(math.max(retainVersions, 2))
              .foreach(p => fs.delete(p, true))
          }
        }
        postCommitHook(batchId)
        ()
      }
      .start()
}
