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

  /** Single-pass table profile — the statistics half of what the
    * reference's Glue crawler produces when it registers a table: one row
    * per profiled column with total/null/distinct counts and numeric
    * min/max (`try_cast` to double; non-numeric columns profile with NULL
    * bounds). ONE aggregation job over the table: all columns' aggregates
    * ride one scan (the multi-distinct expands the input |cols|-way —
    * the standard exact-profile cost; swap `countDistinct` for
    * `approx_count_distinct` at the 100 TB scale point), and the per-column
    * rows come from `stack` over the single 1-row result, not one job per
    * column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      // numeric bounds via a string hop so ANY column type profiles
      // (timestamps/dates can't cast straight to double): both engines
      // print round-trippable numerics, and non-numerics try_cast to NULL
      val asNum = col(c).cast(org.apache.spark.sql.types.StringType)
        .try_cast(org.apache.spark.sql.types.DoubleType)
      Seq(
        count(col(c)).as(s"__nn$i"),
        countDistinct(col(c)).as(s"__nd$i"),
        min(asNum).as(s"__mn$i"),
        max(asNum).as(s"__mx$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"'$c', __n - __nn$i, __nd$i, __mn$i, __mx$i" }
      .mkString(", ")
    one.select(
      expr(s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_num, max_num)"),
      col("__n").as("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"))
  }

  /** Exact heavy hitters: the `k` most frequent values per profiled
    * column — the skew detector (a hot join key, a default-value column,
    * a null-explosion) run BEFORE the query that would trip over it.
    * ONE pass: `stack` pivots the columns into (col_name, value) rows
    * map-side, one grouped count with partial aggregation, then a
    * per-column top-k window over the (tiny) distinct-value counts.
    * Values ride as strings so any column type profiles; ties break on
    * the value for determinism. */
  def heavyHitters(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    // typed explode(array(struct...)) instead of a spliced stack() SQL
    // string: a column named with a quote/backtick would break parsing or
    // mislabel col_name. col() itself parses attribute names, so raw
    // names are backtick-escaped (`` doubles an embedded backtick).
    def raw(c: String) = col("`" + c.replace("`", "``") + "`")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), raw(c).cast("string").as("value"))): _*))
        .as("kv"))
      .select(col("kv.col_name"), col("kv.value"))
    val counts = stacked.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name")).orderBy(col("n").desc, col("value").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("col_name"), col("value"), col("n"), col("rank"))
  }

  /** Fixed-bound equi-width histogram of a numeric column: `nBins` bins
    * over [lo, hi], values outside dropped, the top edge closed (x = hi
    * lands in the last bin). Explicit bounds keep it deterministic and
    * single-pass (a min/max-derived range needs a pre-pass; at 100 TB
    * profile once with [[profile]], then histogram with pinned bounds).
    * Per-row arithmetic + one grouped count — scan-speed. */
  def histogram(df: DataFrame, c: String, nBins: Int,
                lo: Double, hi: Double): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val width = (hi - lo) / nBins
    val x = col(c).cast("double")
    val bin = least(floor((x - lo) / width), lit(nBins - 1)).cast("int")
    df.filter(x >= lo && x <= hi)
      .select(bin.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("lo_edge"),
        (lit(lo) + (col("bin") + 1) * width).as("hi_edge"),
        col("n"))
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
