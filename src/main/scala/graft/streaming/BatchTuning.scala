package graft.streaming

import org.apache.spark.sql.DataFrame

/** Per-micro-batch session tuning for foreachBatch sinks.
  *
  * A micro-batch is CHANGE-sized (one commit's files, one trigger's
  * admissions) — orders of magnitude smaller than the table it folds
  * into — yet every exchange in the batch plan inherits the session's
  * `spark.sql.shuffle.partitions` (32 here, hundreds on a real
  * cluster), and AQE is disabled inside streaming, so nothing coalesces
  * them: each tiny aggregate pays full-width task scheduling. Measured
  * at sf0.1, this overhead — not data — dominates q130/q144/q164.
  *
  * [[rightSize]] shrinks the partition count on the batch's OWN session
  * — the streaming engine's per-query CLONE (`sparkSessionForStream`),
  * never the user's session, so concurrent batch queries on the main
  * session are untouched. foreachBatch sinks only: they carry no
  * engine state store, whose partitioning must stay fixed across
  * restarts. The folds these sinks run (monoid count merges, PQ code
  * assignment, keyed dedup) are exact and partition-count-invariant,
  * so results are unchanged by construction.
  */
object BatchTuning {

  /** Shrink the cloned streaming session's shuffle width for a
    * change-sized batch. Idempotent; call at the top of foreachBatch. */
  def rightSize(batch: DataFrame, partitions: Int = 8): DataFrame = {
    val ss = batch.sparkSession
    if (ss.conf.get("spark.sql.shuffle.partitions") != partitions.toString)
      ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    batch
  }
}
