package graft.streaming

import graft.operators.ProductQuant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN-index maintenance: arriving vectors fold into an
  * EXISTING residual IVF-PQ index via foreachBatch — each micro-batch is
  * routed and PQ-encoded map-side against the FROZEN model
  * ([[ProductQuant.encodeResidual]]: centroid/codebook literals, no
  * exchange) and lands as one immutable batch directory of codes.
  *
  * Equivalence guarantee (the oracle-gated property): encoding depends
  * only on the frozen model, never on previously indexed vectors, so the
  * incrementally maintained index is row-identical to re-encoding the
  * union in one shot — micro-batch boundaries cannot be observed in the
  * final state. (Retraining the model on drifted data is a separate,
  * offline decision — exactly how production ANN services run: frozen
  * codebooks serve + ingest, retrain republishes a new index version via
  * [[ProductQuant.saveResidualIndex]].)
  *
  * Exactly-once: the sink writes each batch to a `b<batchId>` directory
  * with overwrite — a replayed batch (foreachBatch is at-least-once)
  * rewrites the same rows instead of duplicating them. The batchId-keyed
  * layout is the simpler sibling of [[AggStream]]'s pointer swap, usable
  * here because batches are independent appends, not a running fold. */
object AnnStream {

  /** `postCommitHook` fires after the batch dir write, before the
    * checkpoint commit — the crash window; a throwing hook forces the
    * replay the overwrite-idempotent layout must absorb
    * (StreamingCrashSpec). */
  def indexMaintenanceSink(
      spark: SparkSession,
      updates: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      model: ProductQuant.PQModel,
      statePath: String,
      checkpoint: String,
      postCommitHook: Long => Unit = _ => ()
  ): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = BatchTuning.rightSize(batch0)
        if (!batch.isEmpty) {
          ProductQuant.encodeResidual(batch, idCol, vecCol, centroids, model)
            .write.mode("overwrite").parquet(s"$statePath/b$batchId")
        }
        postCommitHook(batchId)
        ()
      }
      .start()

  /** The maintained code set: every batch directory, one relation. */
  def readCodes(spark: SparkSession, statePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(statePath)
}
