package graft.streaming

import graft.io.{Readers, Writers}
import graft.ops.Scd2
import graft.pipeline.{Clock, SystemClock}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD2 dimension maintenance: a stream of dimension updates is
  * merged into a persisted dim with the same hash-diff semantics as the
  * batch [[graft.ops.Scd2]] — the streaming twin of the reference's core
  * operator, via foreachBatch (the standard pattern for merge-shaped sinks
  * that Structured Streaming's append/update modes can't express).
  *
  * Each micro-batch: dedup the batch on the business key (last update
  * wins under `orderCol`), read the current dim, run the merge, two-phase
  * write (the merge reads the table it replaces). Exactly-once per batch
  * comes from the checkpoint + idempotent overwrite.
  */
object DimStream {

  /** `clockForBatch` maps the micro-batch id to the merge clock — real
    * deployments pass a constant SystemClock; replayable tests/oracles pin
    * one FixedClock per batch (load date semantics, same as running the
    * batch merge once per arrival). */
  def scd2Sink(
      spark: SparkSession,
      updates: DataFrame,
      spec: Scd2.Scd2Spec,
      dimPath: String,
      checkpoint: String,
      clockForBatch: Long => Clock = _ => SystemClock,
      faithful: Boolean = true
  ): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val clock = clockForBatch(batchId)
          val deduped = batch.dropDuplicates(spec.keyCols)
          // Hadoop FS existence check — java.io.File is local-only and would
          // silently treat every batch as a first run on HDFS/S3A, wiping
          // SCD2 history (review finding).
          val dimHPath = new org.apache.hadoop.fs.Path(dimPath)
          val dimFs = dimHPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val existing =
            if (dimFs.exists(dimHPath)) Some(Readers.parquet(spark, dimPath))
            else None
          val merged =
            if (faithful) Scd2.faithful(deduped, existing, spec, clock)
            else Scd2.idiomatic(deduped, existing, spec, clock)
          val tmp = s"$dimPath.tmp"
          Writers.parquet(merged, tmp)
          Writers.parquet(Readers.parquet(spark, tmp), dimPath)
          val fs = new org.apache.hadoop.fs.Path(tmp)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        }
        () // foreachBatch wants a Unit-returning function
      }
      .start()
}
