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
      // land every micro-batch on a named BRANCH (write-audit-publish
      // staging): main stays untouched until a fastForward publishes
      branch: Option[String] = None,
      postCommitHook: Long => Unit = _ => ()
  ): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = BatchTuning.rightSize(batch0)
        if (!batch.isEmpty) {
          def commit() = IcebergWrite.appendOnce(batch, tableDir, appId, batchId)
          val s = branch match {
            case Some(b) => IcebergWrite.onBranch(b)(commit())
            case None => commit()
          }
          postCommitHook(s)
        }
      }
      .start()

  /** CDC UPSERT sink: apply a change stream to a native Iceberg table
    * by KEY, exactly-once — each micro-batch lands as ONE
    * merge-on-read MERGE snapshot (position deletes + postimage/insert
    * appends, zero data-file rewrites) with the (appId, batchId)
    * ledger stamped, so the crash-window replay is a structural no-op.
    *
    * Batch semantics (the Flink/Iceberg upsert-sink contract):
    *   - `sequenceCol` (when given) arbitrates WITHIN a batch — only
    *     each key's highest-sequence change applies (a key updated
    *     five times in one batch merges once, with the final image).
    *     Without it, a batch must not carry duplicate keys (merge
    *     refuses loudly — correctness over guessing).
    *   - `deleteCol` (when given) is a boolean tombstone flag: flagged
    *     keys DELETE on match (and are ignored when absent); the flag
    *     and sequence columns are control metadata, never written.
    *   - everything else upserts: matched keys replace their row with
    *     the source image, unmatched keys insert.
    *
    * 100 TB posture: per batch, MERGE's probe prunes through manifest
    * bounds by the batch's key range; work is O(changed rows) +
    * metadata-sized commit. Periodic [[IcebergWrite.compact]] folds
    * the accumulated delete files (q196's maintenance loop). */
  def upsertSink(
      spark: SparkSession,
      changes: DataFrame,
      tableDir: String,
      keyCols: Seq[String],
      appId: String,
      checkpoint: String,
      sequenceCol: Option[String] = None,
      deleteCol: Option[String] = None,
      // apply every micro-batch's merge on a named BRANCH
      // (write-audit-publish staging for CDC apply): main stays
      // untouched until a fastForward publishes
      branch: Option[String] = None,
      postCommitHook: Long => Unit = _ => ()
  ): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "upsertSink needs key columns")
    def scoped[T](body: => T): T = branch match {
      case Some(b) => IcebergWrite.onBranch(b)(body)
      case None => body
    }
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch1 = BatchTuning.rightSize(batch0)
        if (!batch1.isEmpty) scoped {
          // within-batch arbitration: the key's HIGHEST sequence wins.
          // Ties break DETERMINISTICALLY by a hash over the remaining
          // columns — replay after a crash-before-ledger-commit must
          // re-pick the SAME winner, or the second attempt commits a
          // different image than the first (the exactly-once contract
          // is about images, not just row counts).
          val deduped = sequenceCol match {
            case None => batch1
            case Some(seq) =>
              val tieCols = batch1.columns.toSeq.filterNot(_ == seq)
              batch1.withColumn("_g_rn", row_number().over(Window
                  .partitionBy(keyCols.map(col): _*)
                  .orderBy(col(seq).desc,
                    xxhash64(tieCols.map(col): _*).asc)))
                .filter(col("_g_rn") === 1).drop("_g_rn", seq)
          }
          // the tombstone flag RIDES the merge source (clause
          // conditions resolve against s./t. columns), but is control
          // metadata: SET/INSERT assignments never mention it, so it
          // is never written.
          // NOT checkpointed here when a sequence column arbitrates:
          // [[IcebergWrite.mergeInto]] checkpoints its source itself,
          // and a second materialization of the same rows was one
          // redundant per-batch action + memory copy (r18 verdict's
          // q210/q214 item). The no-sequence path still checkpoints —
          // its duplicate-key probe below is a second pass.
          val source =
            if (sequenceCol.isDefined) deduped
            else deduped.localCheckpoint(false)
          // without a sequence column, duplicate keys in one batch are
          // ambiguous — refuse on the BOOTSTRAP path too (the merge
          // path already does)
          if (sequenceCol.isEmpty) {
            val dup = source.groupBy(keyCols.map(col): _*).count()
              .filter(col("count") > 1).limit(1).collect()
            require(dup.isEmpty,
              s"upsert batch $batchId has duplicate keys (e.g. " +
              s"${dup.headOption.mkString}) — pass sequenceCol to arbitrate")
          }
          val valueCols = source.columns.toSeq
            .filterNot(c => keyCols.contains(c) || deleteCol.contains(c))
          // FIRST batch bootstraps the table: the non-tombstone image
          // appends (ledger-stamped), tombstones of never-seen keys
          // are definitionally no-ops
          if (!IcebergWrite.tableExists(spark, tableDir)) {
            // a NULL flag is a normal upsert (null-safe: =!= would
            // silently drop the row)
            val inserts = deleteCol
              .map(flag => source.filter(!(col(flag) <=> lit(true))).drop(flag))
              .getOrElse(source)
            postCommitHook(IcebergWrite.appendOnce(
              inserts, tableDir, appId, batchId))
          } else {
            // clause order (first firing wins): tombstone DELETE, then
            // replace-with-source UPDATE; unflagged unmatched rows INSERT
            val matched = deleteCol.toSeq.map(flag =>
              graft.io.DeltaInterop.MatchedClause(
                Some(col(s"s.$flag") === lit(true)), Map.empty, delete = true)) :+
              graft.io.DeltaInterop.MatchedClause(None,
                valueCols.map(c => c -> col(s"s.$c")).toMap, delete = false)
            val notMatched = Some((
              deleteCol.map(flag => !(col(s"s.$flag") <=> lit(true))),
              (keyCols ++ valueCols).map(c => c -> col(s"s.$c")).toMap))
            val (snap, _, _) = IcebergWrite.mergeInto(spark, tableDir,
              source, keyCols, matched, notMatched,
              txn = Some((appId, batchId)),
              // sequence arbitration just established per-key
              // uniqueness — skip the merge's own re-verification job
              sourceDistinctKeys = sequenceCol.isDefined)
            postCommitHook(snap)
          }
        }
      }
      .start()
  }
}
