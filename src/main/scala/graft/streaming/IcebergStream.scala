package graft.streaming

import graft.io.IcebergWrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming → native Apache Iceberg table, exactly-once —
  * [[DeltaStream]]'s contract on the Iceberg plane, closing the
  * round-13 streaming story (the read half is [[IcebergSource]]).
  *
  * Each micro-batch is ONE [[IcebergWrite.appendOnce]] snapshot with
  * the (appId, batchId) ledger stamped in the snapshot SUMMARY. A
  * crash after the table commit but before Spark's own offset commit
  * re-delivers the batch on restart; the ledger recognizes it and the
  * replay writes nothing. Version races rebase; a duplicate
  * same-batch writer is detected on re-read and its staged files are
  * cleaned up.
  *
  * Composes with [[DeltaSource]] into a LAKE-TO-LAKE mirror: tail a
  * Delta table's commits and land them as Iceberg snapshots — format
  * migration as a stream, with both planes exactly-once
  * (IcebergStreamSpec proves the composition).
  *
  * 100 TB posture: per batch, the batch's own distributed write plus
  * metadata-sized snapshot authoring (one grouped stats job, one
  * manifest, one metadata JSON); the table stays readable by ANY
  * Iceberg client mid-stream — the commit is one atomic
  * rename-without-overwrite of the metadata version. */
object IcebergStream {

  def sink(
      spark: SparkSession,
      rows: DataFrame,
      tableDir: String,
      appId: String,
      checkpoint: String,
      postCommitHook: Long => Unit = _ => ()
  ): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = BatchTuning.rightSize(batch0)
        if (!batch.isEmpty) {
          val s = IcebergWrite.appendOnce(batch, tableDir, appId, batchId)
          postCommitHook(s)
        }
      }
      .start()
}
