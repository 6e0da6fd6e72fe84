package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics — selection without a total order.
  *
  * `kthSmallest` finds the exact k-th smallest value of a column with NO
  * global sort: `approx_percentile` proposes a pivot, one map-side
  * aggregate counts `(< pivot, = pivot)` as the EXACTNESS GUARD, and the
  * candidate region shrinks geometrically (the sketch's rank error bounds
  * the surviving region at ~regionSize/accuracy rows) until the guard
  * proves the pivot IS the k-th value. This is the classic iterative
  * refinement selection (Munro–Paterson style): every pass is a
  * partial-aggregated scan of a narrow numeric projection, nothing is
  * ever totally ordered, and only scalars reach the driver — the shape
  * that survives 100 TB where a `Window.orderBy` (one executor sorts
  * everything) does not.
  *
  * Termination: each miss strictly shrinks the region's distinct-value
  * set (a `< pivot` miss drops the pivot's ties and everything above; a
  * `> pivot` miss drops the pivot's ties and everything below), and once
  * the region row count is ≤ `smallRegion` the remaining rank is taken
  * with one distributed top-k (`TakeOrderedAndProject` — per-partition
  * heaps, driver merges k rows), so the loop is bounded in both theory
  * and practice (with accuracy 10⁴ real data converges in 1–2 passes).
  */
object Quantiles {

  /** Exact k-th smallest (1-based, duplicates counted) of `colName` in
    * `df`. `n` = the caller's row count of `df` (callers always have it
    * — passing it saves a job). Nulls must be pre-filtered by the
    * caller. Returns the value as the column's native type. */
  def kthSmallest(df: DataFrame, colName: String, k: Long, n: Long,
                  smallRegion: Long = 1L << 16, accuracy: Int = 10000): Any = {
    require(k >= 1 && k <= n, s"rank $k outside [1, $n]")
    var region = df.select(col(colName).as("__v"))
    var regionCnt = n
    var need = k
    while (regionCnt > smallRegion) {
      val p = math.min(1.0, need.toDouble / regionCnt.toDouble)
      val pivot = region
        .select(expr(s"approx_percentile(__v, $p, $accuracy)")).first().get(0)
      val guard = region.agg(
        sum(when(col("__v") < lit(pivot), 1L).otherwise(0L)).as("lt"),
        sum(when(col("__v") === lit(pivot), 1L).otherwise(0L)).as("eq")).first()
      val cLt = guard.getLong(0)
      val cEq = guard.getLong(1)
      if (need > cLt && need <= cLt + cEq) return pivot
      else if (need <= cLt) {
        region = region.filter(col("__v") < lit(pivot)); regionCnt = cLt
      } else {
        region = region.filter(col("__v") > lit(pivot))
        regionCnt -= cLt + cEq; need -= cLt + cEq
      }
    }
    // distributed top-k over the (small) remaining region — from
    // whichever END is closer, so the driver merge never carries more
    // than half the region (k-th smallest ≡ (n−k+1)-th largest)
    if (need <= regionCnt - need)
      region.orderBy(col("__v")).limit(need.toInt)
        .agg(max(col("__v"))).first().get(0)
    else
      region.orderBy(col("__v").desc).limit((regionCnt - need + 1).toInt)
        .agg(min(col("__v"))).first().get(0)
  }

  /** Exact rank-`k` threshold PAIR under the composite order
    * `(value, tieCol)` with `tieCol` unique — the boundary row of a
    * count-balanced tile. Returns `(v*, t*)` such that exactly `k` rows
    * satisfy `value < v* OR (value = v* AND tieCol <= t*)`. Two nested
    * selections: the k-th value overall, then the residual rank among
    * that value's ties — both via [[kthSmallest]], so still no total
    * order anywhere. */
  def kthPair(df: DataFrame, valueCol: String, tieCol: String, k: Long,
              n: Long): (Any, Any) = {
    val v = kthSmallest(df, valueCol, k, n)
    val guard = df.agg(
      sum(when(col(valueCol) < lit(v), 1L).otherwise(0L)).as("lt"),
      sum(when(col(valueCol) === lit(v), 1L).otherwise(0L)).as("eq")).first()
    val cLt = guard.getLong(0)
    val cEq = guard.getLong(1)
    val t = kthSmallest(df.filter(col(valueCol) === lit(v)), tieCol, k - cLt, cEq)
    (v, t)
  }
}
