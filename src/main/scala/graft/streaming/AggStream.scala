package graft.streaming

import graft.io.{Readers, Writers}
import graft.ops.IncrementalAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming materialized-view maintenance: each micro-batch of raw rows
  * folds into a persisted per-key aggregate state via
  * [[graft.ops.IncrementalAgg]] — the streaming twin of q74's batch
  * refresh, through foreachBatch for the same reason as [[DimStream]]
  * (a merge-shaped sink that append/update output modes can't express).
  *
  * Because the state is a commutative monoid (counts + sums), the merge
  * is insensitive to batch boundaries: ANY partitioning of the input
  * stream into micro-batches lands the same state as one batch build —
  * which is exactly what the oracle gate checks. Exactly-once per batch
  * comes from the checkpoint + idempotent two-phase overwrite.
  */
object AggStream {

  def incrementalSink(
      spark: SparkSession,
      updates: DataFrame,
      keys: Seq[String],
      measures: Seq[String],
      statePath: String,
      checkpoint: String
  ): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val stateHPath = new org.apache.hadoop.fs.Path(statePath)
          val fs = stateHPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val merged =
            if (fs.exists(stateHPath))
              IncrementalAgg.merge(Readers.parquet(spark, statePath), batch, keys, measures)
            else IncrementalAgg.build(batch, keys, measures)
          // two-phase write: the merge reads the table it replaces
          val tmp = s"$statePath.tmp"
          Writers.parquet(merged, tmp)
          Writers.parquet(Readers.parquet(spark, tmp), statePath)
          fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        }
        ()
      }
      .start()
}
