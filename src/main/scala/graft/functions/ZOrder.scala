package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers for multi-dimensional data layout.
  *
  * Sorting a table by the bit-interleaving of two key columns clusters rows
  * that are close in BOTH dimensions into the same files, so parquet
  * min/max footer stats (and any manifest-level zone map) prune scans for
  * predicates on EITHER column — the standard lakehouse layout trick for
  * the "filter by customer AND by date" workloads a linear sort can only
  * serve for its leading column. The z-value is pure per-row bit
  * arithmetic (shift/and/or — all codegen'd builtins, no UDF) and the
  * layout write is one range repartitioning: at 100 TB the cost is the
  * same single shuffle a plain sort-by-key layout already pays, the
  * pruning benefit applies to every subsequent scan.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into a single long — the Morton code. Inputs are taken
    * mod 2^bits (callers bucket/scale real keys into that range first).
    * Engine-portable: `pmod`, shifts and bit-ands mirror 1:1 into SQL. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xm = pmod(x.cast("long"), lit(1L << bits))
    val ym = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(xm, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(ym, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton code: bit `b` of input `i` lands at interleaved
    * position `b·n + i`. Two dims reproduce [[zValue]] exactly; real
    * lakehouse layouts commonly interleave 3–4 (customer × date ×
    * amount-bucket). `bits · n ≤ 62` keeps the code in a positive long. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "need at least two dimensions")
    require(bits > 0 && bits * n <= 62, s"bits*dims must fit a long: $bits*$n")
    val ms = cols.map(c => pmod(c.cast("long"), lit(1L << bits)))
    (for {
      b <- 0 until bits
      (m, i) <- ms.zipWithIndex
    } yield shiftleft(shiftright(m, b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_ bitwiseOR _)
  }

  /** ONE z-layout key over arbitrary clustering columns — the shared
    * engine of `OPTIMIZE ... ZORDER BY` on BOTH lakehouse planes
    * ([[graft.io.DeltaInterop.optimizeZOrder]] and
    * [[graft.io.IcebergWrite.optimizeZOrder]]). Each column maps to an
    * ORDER-PRESERVING double (numeric cast; 48-bit lexicographic
    * prefix for strings — double-exact; epoch seconds for temporals),
    * ranks into `bits` buckets between its OBSERVED min/max (one agg
    * action on `df` here), and the per-column ranks bit-interleave
    * into the Morton code. Exactness is irrelevant — the key only
    * shapes the LAYOUT; reads stay exact. */
  def layoutKey(df: DataFrame, zCols: Seq[String], bits: Int = 16): Column = {
    import org.apache.spark.sql.types.{BooleanType, DateType, NumericType,
      StringType, TimestampNTZType, TimestampType}
    require(zCols.nonEmpty, "zCols must be non-empty")
    def orderKey(c: String): Column =
      df.schema(c).dataType match {
        case _: NumericType => col(c).cast("double")
        case BooleanType => col(c).cast("double")
        case StringType =>
          conv(rpad(hex(substring(encode(col(c), "UTF-8"), 1, 6)), 12, "0"),
            16, 10).cast("double")
        case DateType | TimestampType | TimestampNTZType =>
          col(c).cast("timestamp").cast("double")
        case other => throw new IllegalArgumentException(
          s"cannot z-order by $c: unsupported type $other")
      }
    val aggs = zCols.flatMap(c => Seq(min(orderKey(c)), max(orderKey(c))))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val n = zCols.length
    zCols.zipWithIndex.map { case (c, i) =>
      // an EMPTY frame or an all-null column has no observed range:
      // that dimension contributes rank 0 (no clustering signal —
      // layout-only, and a NullPointerException here would fail the
      // whole rewrite); the other dimensions still cluster
      if (mm.isNullAt(2 * i) || mm.isNullAt(2 * i + 1)) lit(0L)
      else {
        val (lo, hi) = (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
        val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
        // `bits`-bit rank of the value within [lo, hi], then interleave:
        // output bit (b * nCols + i) takes input bit b of col i
        val rank = least(lit((1 << bits) - 1), greatest(lit(0),
          floor((orderKey(c) - lit(lo)) / lit(span) * lit(1 << bits)).cast("long")))
        (0 until bits).map(b =>
          shiftleft(rank.bitwiseAND(lit(1L << b)), b * (n - 1) + i))
          .reduce(_ bitwiseOR _)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on (xCol, yCol) into `numFiles` range-partitioned
    * parquet files. One shuffle (range exchange on the z-value) + an
    * in-partition sort; the z column itself is dropped from the output.
    * Range boundaries come from Spark's reservoir sampling — fine for a
    * layout decision (file CONTENTS are deterministic data, only the
    * file boundaries are sampled). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
