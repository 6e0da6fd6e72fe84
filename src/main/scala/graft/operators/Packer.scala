package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: greedily bin whole documents into fixed token budgets
  * (the "pack short documents into one context window" step every LLM
  * training pipeline runs between curation and tokenization).
  *
  * Semantics (deterministic, oracle-replayable): documents are assigned to
  * `numGroups` independent packers by content-addressed hash of the id
  * ([[Curation.hashBucket]] — stable across runs, engines and
  * partitionings); within a packer, documents are visited in id order and
  * appended to the current pack while they fit; a document that would
  * overflow `budget` starts a new pack (a document longer than the budget
  * occupies a pack of its own). Pack ids are per-group.
  *
  * Scale design: greedy packing is inherently sequential, so the
  * parallelism unit is the GROUP, not the corpus — `numGroups` independent
  * greedy scans (set it to O(cores·executors); each group only needs to
  * stream its rows in sorted order, nothing is held in memory beyond the
  * running fill). The plan is one hash exchange on the group key + an
  * in-partition sort + a streaming `mapPartitions` — the same shape as any
  * keyed window, except the per-row state machine cannot be expressed with
  * window functions (the pack boundary depends on the running fill, which
  * resets on overflow — a non-associative recurrence). This is the
  * documented "genuine per-partition imperative logic" case where
  * `mapPartitions` is the right tool (SURVEY §7.3).
  */
object Packer {

  /** Pack documents into token budgets. Input: any relation with an id and
    * a token-count column. Output: (grp, id, n_tokens, pack_id, pack_pos) —
    * `pack_id` numbered from 0 within each group, `pack_pos` the document's
    * position within its pack. */
  def packGreedy(df: DataFrame, idCol: String, nTokCol: String,
                 budget: Int, numGroups: Int): DataFrame = {
    require(budget > 0 && numGroups > 0, "budget and numGroups must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      Curation.hashBucket(col(idCol), numGroups).cast("int").as("grp"),
      col(idCol).cast("long").as("id"),
      col(nTokCol).cast("int").as("n_tokens"))
    prepared.as[(Int, Long, Int)]
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
      .mapPartitions { it =>
        // a partition holds whole groups (hash-partitioned on grp), sorted
        // by (grp, id): one O(1)-state streaming scan packs every group it
        // owns — nothing is buffered.
        var curGrp = Int.MinValue
        var pack = -1L
        var fill = Int.MaxValue // forces a new pack on the first row
        var pos = 0
        it.map { case (grp, id, tok) =>
          if (grp != curGrp) { curGrp = grp; pack = -1L; fill = Int.MaxValue }
          if (fill.toLong + tok > budget) { pack += 1; fill = tok; pos = 0 }
          else { fill += tok; pos += 1 }
          (grp, id, tok, pack, pos)
        }
      }
      .toDF("grp", "id", "n_tokens", "pack_id", "pack_pos")
  }

  /** Pack LAYOUT: each document's token offset within its pack — the
    * boundary table a trainer consumes to build attention masks /
    * position ids over packed sequences. A plain windowed cumulative sum
    * keyed by (grp, pack_id): packs are small (≤ budget tokens), so the
    * window never sorts more than a pack's documents per key. */
  def withOffsets(packed: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"), col("pack_id"))
      .orderBy(col("pack_pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    packed.withColumn("pack_offset",
      coalesce(sum(col("n_tokens")).over(w), lit(0)).cast("int"))
  }
}
