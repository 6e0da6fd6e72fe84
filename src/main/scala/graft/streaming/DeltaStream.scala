package graft.streaming

import graft.io.DeltaInterop
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming → Delta-format table, exactly-once.
  *
  * Each micro-batch is ONE [[DeltaInterop.appendOnce]] commit carrying
  * the protocol's `txn` action stamped (appId, batchId). The failure
  * mode this closes: a crash AFTER the table commit but BEFORE Spark's
  * own checkpoint offset commit re-delivers the batch on restart — the
  * table's txn watermark recognizes it and the replay writes nothing
  * (crash-injected in DeltaStreamCrashSpec via the postCommitHook seam,
  * the [[DimStream]] pattern). Concurrent writers are safe twice over:
  * version races rebase, duplicate same-batch writers are detected on
  * re-read and their staged files cleaned up.
  *
  * 100 TB posture: the sink's work per batch is the batch's own
  * distributed write plus a metadata-sized log commit; the table stays
  * readable by ANY Delta reader mid-stream (readers replay the log,
  * never see a partial batch — the commit is one atomic put-if-absent
  * file create).
  */
object DeltaStream {

  def sink(
      spark: SparkSession,
      docs: DataFrame,
      tableDir: String,
      partCols: Seq[String],
      appId: String,
      checkpoint: String,
      postCommitHook: Long => Unit = _ => ()
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = BatchTuning.rightSize(batch0)
        if (!batch.isEmpty) {
          val v = DeltaInterop.appendOnce(batch, tableDir, partCols, appId, batchId)
          postCommitHook(v)
        }
      }
      .start()
}
