package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the runtime-filter pattern, exposed
  * as an explicit operator.
  *
  * Build a bloom filter over the build (small) side's join keys, then
  * prefilter the probe (large) side with `might_contain` BEFORE its
  * shuffle. Bloom filters have no false negatives, so the join result is
  * exactly the plain join's (the oracle pins this); false positives only
  * let through rows the join drops anyway. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling
  * roughly its matching fraction: the filter is a few MB broadcast as a
  * literal, evaluated map-side against the scan, and (for selective
  * builds) the dominant exchange shrinks by the non-match ratio.
  *
  * Spark's AQE has an automatic version (runtime bloom filters on shuffle
  * joins); this operator makes the plan explicit and usable on any join
  * the caller knows is selective, independent of optimizer heuristics.
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (codegen'd; keys hashed with xxhash64, the same pairing
  * the optimizer's runtime filter injects).
  */
object BloomJoin {

  /** Inner equi-join of `probe` ⋈ `build` on `probe(probeKey) ===
    * build(buildKey)`, with the probe side bloom-prefiltered. `expectedItems`
    * sizes the filter (Spark defaults the bit budget from it). */
  def prefilteredJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L
  ): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val agg = new BloomFilterAggregate(
      expression(xxhash64(col(buildKey))), expectedItems).toAggregateExpression()
    val bloomBytes = build
      .select(column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val filtered = probe.filter(column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      expression(xxhash64(col(probeKey))))))
    filtered.join(build, col(probeKey) === col(buildKey))
  }
}
