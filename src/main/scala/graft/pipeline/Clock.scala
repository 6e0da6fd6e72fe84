package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injectable clock so `current_timestamp()`-style audit columns are
  * deterministic under test / oracle comparison (SURVEY.md §5.2). */
trait Clock extends Serializable {
  /** The "now" column stamped into created_at / modified_at. */
  def now: Column
}

/** Production clock — Spark's own current_timestamp(). */
object SystemClock extends Clock {
  def now: Column = current_timestamp()
}

/** Frozen clock — a literal UTC timestamp, e.g. "2024-01-01 00:00:00". */
final case class FixedClock(utc: String) extends Clock {
  def now: Column = to_timestamp(lit(utc))
}
