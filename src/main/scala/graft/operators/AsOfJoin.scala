package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (inclusive) — for each left row, the single right row with
  * the same key and, in `backward` mode, the greatest right timestamp ≤
  * the left timestamp (or, in `forward` mode, the smallest right
  * timestamp ≥ it). The canonical time-series enrichment operator (DuckDB
  * `ASOF JOIN`, pandas `merge_asof`); Spark has no builtin.
  *
  * Implementation: the union-window trick rather than a range join —
  * tag both sides, union, sort within each key by (ts, side, tie) and
  * carry the most recent right row forward with
  * `last(struct, ignoreNulls).over(unboundedPreceding..current)`. One
  * shuffle + one sort over |L|+|R| rows, no range explosion — the plan
  * you want at 100 TB (a theta/range join goes quadratic per key).
  *
  * The right row travels as ONE struct so all value columns come from the
  * same matched row even when individual values are null. Right rows sort
  * before left rows at equal timestamps (side 0 < 1) → inclusive
  * `r.ts <= l.ts`, matching DuckDB ASOF semantics. If multiple right rows
  * share (key, ts), the survivor is the greatest `tieBreak` value — pass a
  * unique column for determinism.
  */
object AsOfJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightValueCols: Seq[String],
      tieBreak: Option[String] = None,
      direction: String = "backward"
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightValueCols.contains(keyCol), "key cannot be a value column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // forward = the same one-pass traversal run in reverse time order;
    // right still sorts before left at equal ts (side 0 < 1) → inclusive.
    val tsOrder =
      if (direction == "backward") col("__ts").asc else col("__ts").desc

    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(0L))

    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      .select(col(keyCol), col("__ts"), col("__side"), col("__tie"),
        struct(rightValueCols.map(col): _*).as("__r"))

    val combined = taggedLeft
      .select((Seq("__ts", "__side", "__tie") ++ leftCols).map(col): _*)
      .unionByName(taggedRight, allowMissingColumns = true)

    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(tsOrder, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    combined
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightValueCols.map(c => col(s"__match.$c").as(s"${c}_asof"))): _*)
  }
}
