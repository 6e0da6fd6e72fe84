package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to one reducer; at
  * 100 TB a single celebrity key can hold a 1000-executor stage hostage.
  * Salting splits each left key into `saltBuckets` sub-keys (deterministic
  * per-row hash — NOT rand(), which breaks retry/replay determinism) and
  * replicates the right side once per bucket, so the hot key's rows spread
  * over `saltBuckets` reducers.
  *
  * AQE's skew-join splitting handles moderate skew automatically; explicit
  * salting is for the pathological keys you know about (and composes with
  * AQE for the rest). Result is row-identical to the unsalted join.
  */
object SkewJoin {

  /** Inner/left equi-join on `key` with the left side salted.
    * `left` is the large/skewed side; `right` is replicated ×saltBuckets
    * (keep it the smaller side). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // Deterministic per-row salt: hash of the whole left row (stable across
    // retries, unlike rand()).
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft
      .join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
