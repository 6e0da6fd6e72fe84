package graft.ops

import graft.pipeline.{Clock, SystemClock}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema builder (SURVEY.md §2.11; reference:
  * Patient_datamart.py:117-230).
  *
  * Generic re-expression of the reference's datamart stage: each dimension
  * is select → dropna → dropDuplicates → SCD2 merge; the fact table is the
  * base entity left-joined to dimension surrogate keys and pre-aggregated
  * measures, null-filled and timestamped.
  *
  * Scale notes: dimension lookups are the classic star-join — the
  * aggregated/deduped dim sides are small relative to the fact, so Catalyst
  * (with AQE) broadcasts them; the fact side never shuffles for the lookup
  * joins. Measures are pre-aggregated with partial (map-side) aggregation
  * before the join, so the join input is |groups|, not |rows|.
  */
object StarSchema {

  /** One dimension: projection from a staging table + SCD2 spec. */
  final case class DimSpec(
      name: String,
      select: Seq[(String, String)], // (source expr/col, alias)
      scd2: Scd2.Scd2Spec
  )

  /** select → dropna → dropDuplicates (reference does this per dim,
    * Patient_datamart.py:119-121 etc.). */
  def dimInput(staging: DataFrame, select: Seq[(String, String)]): DataFrame =
    staging
      .select(select.map { case (src, alias) => expr(src).as(alias) }: _*)
      .na.drop()
      .dropDuplicates()

  /** Build (or merge into) one dimension. */
  def buildDim(
      staging: DataFrame,
      existing: Option[DataFrame],
      spec: DimSpec,
      clock: Clock = SystemClock,
      faithfulMode: Boolean = true
  ): DataFrame = {
    val input = dimInput(staging, spec.select)
    if (faithfulMode) Scd2.faithful(input, existing, spec.scd2, clock)
    else Scd2.idiomatic(input, existing, spec.scd2, clock)
  }

  /** A pre-aggregated measure: count per key (reference:
    * Patient_datamart.py:194-195). */
  def countMeasure(df: DataFrame, keyCol: String, as: String): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as(as))

  /** D2 — keyed dedup with a deterministic survivor: first row per key under
    * an explicit ordering (the reference's `dropDuplicates([key])` picks an
    * arbitrary survivor; deterministic mode is required for oracle parity,
    * SURVEY.md §5.2). */
  def dedupKeyed(df: DataFrame, key: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key.map(col): _*)
      .orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Fact assembly: base ⟕ each dim lookup ⟕ each measure, null-fill
    * numeric measures with 0, stamp audit timestamps (reference:
    * Patient_datamart.py:203-230). `lookups` are (dimDf, joinCond, cols to
    * take); small dims are explicitly broadcast. */
  def buildFact(
      base: DataFrame,
      lookups: Seq[(DataFrame, Column, Seq[Column])],
      measures: Seq[(DataFrame, Seq[String])],
      measureFill: Double = 0.0,
      clock: Clock = SystemClock
  ): DataFrame = {
    val withDims = lookups.foldLeft(base) { case (acc, (dim, cond, take)) =>
      acc.join(broadcast(dim), cond, "left").select((acc.columns.map(acc(_)) ++ take).toIndexedSeq: _*)
    }
    val withMeasures = measures.foldLeft(withDims) { case (acc, (m, keys)) =>
      acc.join(broadcast(m), keys, "left")
    }
    val measureCols = measures.flatMap { case (m, keys) => m.columns.filterNot(keys.contains) }
    withMeasures
      .na.fill(measureFill, measureCols)
      .withColumn("created_at", clock.now)
      .withColumn("modified_at", clock.now)
  }
}
