package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality observation — the engine-native form of the reference's
  * count-based completeness gate (the Lambda's 18-file barrier and the
  * per-table count() guards).
  *
  * `observe` piggybacks aggregates onto whatever action runs next: the
  * metrics are folded in map-side as rows stream through the existing
  * plan, so row counts and null tallies cost ZERO extra passes — at
  * 100 TB the difference between "audited" and "audited at 2× the IO".
  * The [[Observation]] handle (listener-backed) delivers the metrics for
  * any action on the frame, including writes.
  */
object Quality {

  /** Attach metrics to `df`: total row count plus a null count per listed
    * column. Returns the instrumented frame and the handle whose `.get`
    * blocks until the next action on that frame completes. */
  def observed(df: DataFrame, name: String, cols: Seq[String]): (DataFrame, Observation) = {
    val ob = Observation(name)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (df.observe(ob, aggs.head, aggs.tail: _*), ob)
  }

  /** Convenience gate: run `df` to completion (count action), then assert
    * no listed column exceeds `maxNullFraction` nulls. Returns (rows,
    * metric map). Throws IllegalStateException naming the offending
    * column. */
  def gate(df: DataFrame, name: String, cols: Seq[String],
           maxNullFraction: Double): (Long, Map[String, Any]) = {
    val (obs, ob) = observed(df, name, cols)
    val n = obs.count()
    val m = ob.get
    cols.foreach { c =>
      val nulls = m(s"nulls_$c").asInstanceOf[Long]
      if (n > 0 && nulls.toDouble / n > maxNullFraction)
        throw new IllegalStateException(
          s"quality gate '$name': column $c has $nulls/$n nulls " +
            s"(> $maxNullFraction)")
    }
    (n, m)
  }
}
