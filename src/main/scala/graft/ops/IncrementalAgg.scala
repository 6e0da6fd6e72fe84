package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern.
  *
  * Per-key aggregate STATE (count + per-measure sum) forms a commutative
  * monoid: merging a day's delta into the snapshot is the same
  * groupBy+sum as building from scratch, so the view stays current by
  * folding increments without ever rescanning history. At 100 TB this is
  * the difference between touching one day of data per refresh and
  * touching all 365. Ratios (avg = sum/count) are derived at READ time —
  * never stored — because averages don't merge.
  */
object IncrementalAgg {

  private def stateCols(measures: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +: measures.map(m => sum(col(m)).as(s"sum_$m"))

  /** Build the aggregate state from raw rows. */
  def build(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = stateCols(measures)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a raw delta into an existing state snapshot (same schema out). */
  def merge(snapshot: DataFrame, delta: DataFrame,
            keys: Seq[String], measures: Seq[String]): DataFrame = {
    val deltaState = build(delta, keys, measures)
    val sumAggs = sum(col("n_rows")).as("n_rows") +:
      measures.map(m => sum(col(s"sum_$m")).as(s"sum_$m"))
    snapshot.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(sumAggs.head, sumAggs.tail: _*)
  }
}
