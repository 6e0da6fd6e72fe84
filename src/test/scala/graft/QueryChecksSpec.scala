package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays every query whose in-body lifecycle asserts were moved
  * behind [[QueryChecks]] (optimization round 18 — the asserts launch
  * extra Spark actions that are not the measured operator, guide
  * §1.4), with checks ENABLED, so each invariant stays pinned under
  * test:
  *
  *   - q194/q201: merge-on-read deletes never rewrite data files;
  *     time travel still reads the pre-delete corpus
  *   - q195: schema evolution is metadata-only
  *   - q196: manifest merge/compaction/expiry never change live rows;
  *     expired time travel refuses
  *   - q197: MoR update/merge leave original files; 3 snapshots
  *   - q199: the bucket point read returns the min doc
  *   - q200: equality delete masks exactly the key band, zero
  *     data-file work; re-appends survive; compact folds it
  *   - q202: rollback restores s1; rolled-past snapshots travelable
  *   - q203: files-table counts sum to the corpus
  *   - q204: the (day × bucket) probe opens ONE manifest, before and
  *     after the partition-preserving compact
  *   - q205: name ≡ path reads agree
  *   - q206/q217: changelog ordinal inventory + fold-equals-live
  *   - q207: compaction moves no (_row_id, _last_updated_seq) pair
  *   - q208: the 2-D boxed read stays exact through the z-rewrite
  *   - q210: 3 snapshots; a ledger-covered merge replays as a no-op
  *   - q211: partition statistics sum to the corpus
  *   - q212: 3 exactly-once snapshots on both dedup ledgers
  *   - q213: lineage-keyed fold reconstructs the live table
  *   - q214: the replicated mirror equals the source row-for-row
  *   - q216/q221: main stays pinned while the audit branch stages
  *
  * Runs at sf0.001 — the same scale the driver's small-SF correctness
  * gate exercised these asserts at in rounds 14–17. The query RESULT
  * is identical with checks on or off (the oracle hash pins that); what
  * this spec adds is the lifecycle invariants themselves.
  */
class QueryChecksSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val gated = Seq(
    "q194_iceberg_delete", "q195_iceberg_write_evolution",
    "q196_iceberg_maintenance", "q197_iceberg_upsert",
    "q199_iceberg_bucket_write", "q200_iceberg_eq_delete",
    "q201_iceberg_dv_delete", "q202_iceberg_rollback",
    "q203_iceberg_meta_tables", "q204_iceberg_multi_partition",
    "q205_iceberg_named_sql", "q206_iceberg_changelog",
    "q207_iceberg_lineage_native", "q208_iceberg_zorder",
    "q210_iceberg_upsert_stream", "q211_iceberg_partition_stats",
    "q212_stream_dedup", "q213_lineage_changelog",
    "q214_lineage_replication", "q216_iceberg_wap",
    "q217_changelog_rollback", "q221_branch_stream")

  gated.foreach { name =>
    test(s"$name passes its lifecycle asserts with checks enabled") {
      QueryChecks.enabled = true
      try {
        val n = SparkEntry.queries(name)(spark, sf).count()
        assert(n >= 0)
      } finally QueryChecks.enabled = false
    }
  }
}
