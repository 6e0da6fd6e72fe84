package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every business key as added / removed /
  * changed / unchanged between two keyed table versions — the audit
  * primitive behind incremental publication ("what did today's load
  * actually do?"), CDC reconciliation, and snapshot-store validation.
  *
  * Scale shape: ONE full outer join on the business key, with each side
  * first reduced map-side to (key, row_hash) — the shuffle carries two
  * hashes per key, never the payload columns, so diffing two 100 TB
  * snapshots moves O(|keys|) fixed-width rows. The row hash is the same
  * sha2(concat_ws) fingerprint the SCD2 family uses (`Scd2` change
  * detection), so "changed" here agrees exactly with what a merge would
  * update. */
object TableDiff {

  /** Diff `next` against `prev` on `keyCols`, comparing `valueCols`.
    * Returns (keyCols..., change) with change ∈ added|removed|changed|
    * unchanged. */
  def diff(prev: DataFrame, next: DataFrame,
           keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    // explicit aliases: both sides often derive from the same source
    // (snapshot N vs snapshot N+1 of one table), which otherwise trips
    // Spark's ambiguous-self-join detection
    def hashed(df: DataFrame, hashName: String): DataFrame =
      df.select(keyCols.map(col) :+
        sha2(concat_ws("|", valueCols.map(col): _*), 256).as(hashName): _*)
    val p = hashed(prev, "__ph").alias("__tdp")
    val n = hashed(next, "__nh").alias("__tdn")
    val joinCond = keyCols.map(k => col(s"__tdp.$k") <=> col(s"__tdn.$k")).reduce(_ && _)
    p.join(n, joinCond, "full_outer")
      .select(
        keyCols.map(k => coalesce(col(s"__tdp.$k"), col(s"__tdn.$k")).as(k)) :+
          when(col("__tdp.__ph").isNull, lit("added"))
            .when(col("__tdn.__nh").isNull, lit("removed"))
            .when(col("__tdp.__ph") =!= col("__tdn.__nh"), lit("changed"))
            .otherwise(lit("unchanged")).as("change"): _*)
  }
}
