package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without a nested-loop plan.
  *
  * A pure range predicate — `l.point BETWEEN r.lo AND r.hi` with no
  * equality key — gives Catalyst nothing to hash on, so Spark plans a
  * BroadcastNestedLoopJoin (or a cartesian product): O(|L|·|R|) row
  * comparisons, the classic non-equi-join scale killer.
  *
  * The standard fix, implemented here: quantize the range axis into
  * fixed-width buckets, explode each right-side interval into every
  * bucket it covers, bucket each left-side point once, equi-join on the
  * bucket id, and re-check the exact predicate. The equi-join hashes and
  * shuffles like any other join (AQE, skew handling, broadcast all
  * apply); each point meets only the intervals sharing its bucket —
  * O(|L| + Σ interval_width/bucket) pairs instead of |L|·|R|. Bucket
  * width tunes the trade: wider → fewer exploded rows, more false pairs
  * to re-check; the sweet spot is the typical interval length.
  *
  * Exact same semantics as the naive join (the verify predicate is the
  * original one; a point pairs with an interval exactly once because its
  * point-bucket matches exactly one of the interval's covered buckets).
  */
object RangeJoin {

  /** Join `points` (with a numeric `pointCol`) to `intervals` (with
    * numeric `loCol`/`hiCol`, inclusive bounds) on
    * `lo ≤ point ≤ hi`, via `bucketWidth`-sized buckets. Returns the
    * full row pairs (columns of both inputs; caller projects). */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, loCol: String, hiCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // one row per bucket the interval covers — Σ width/bucketWidth rows,
    // independent of |points|
    val exploded = intervals.withColumn("__bkt",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val bucketedPoints = points.withColumn("__bkt",
      floor(col(pointCol) / bucketWidth).cast("long"))
    bucketedPoints.join(exploded, "__bkt")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bkt")
  }
}
