package graft

import graft.functions.expressions.{DotProduct, IntersectSize, MinHashSig, SimHashExpr, SortedLongIntersectSize}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's custom expressions as SQL
  * functions, so `spark.sql("SELECT dot_product(a, b) ...")` works the same
  * as the Column API. Install with:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL front-end for the Delta mutation surface (DELETE/UPDATE/MERGE/
    // DESCRIBE HISTORY/RESTORE/table_changes over delta.`path` tables
    // and registered [db.]table names); every other statement delegates
    // verbatim to Spark's parser
    ext.injectParser((_, delegate) => new graft.sql.DeltaSqlParser(delegate))
    // Table-valued functions backing the READ side of the Delta SQL
    // surface. Resolution happens per query, so every expansion sees
    // the table's CURRENT snapshot; the returned plan is the same
    // file-pruned parquet scan the Scala API builds (pushdown intact).
    // graft_delta also serves as the view text of catalog-registered
    // Delta tables (DeltaInterop.registerCatalogTable), which makes
    // SELECT-by-name pure stock-Spark view expansion.
    def stringArg(fn: String, args: Seq[Expression], i: Int): String = args(i) match {
      case Literal(s, org.apache.spark.sql.types.StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }
    def longArg(fn: String, args: Seq[Expression], i: Int): Long = args(i) match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }
    ext.injectTableFunction((
      FunctionIdentifier("graft_delta"),
      info("graft_delta",
        "graft_delta(path_or_name[, version]) - rows of the graft-Delta table (optionally time-traveled)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_delta takes (path[, version]), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_delta", args, 0)
        val dir = graft.io.DeltaInterop.catalogDeltaPath(spark, ref).getOrElse(ref)
        val version = if (args.length > 1) Some(longArg("graft_delta", args, 1)) else None
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.DeltaInterop.readDelta(spark, dir, version))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg"),
      info("graft_iceberg",
        "graft_iceberg(path[, snapshot_id]) - rows of a foreign Apache Iceberg table (optionally time-traveled)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_iceberg takes (path_or_name[, snapshot_id]), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        val snap = if (args.length > 1) Some(longArg("graft_iceberg", args, 1)) else None
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.readIceberg(spark, path, snap))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg_ref"),
      info("graft_iceberg_ref",
        "graft_iceberg_ref(path, ref) - rows of an Iceberg table at a named branch/tag"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_iceberg_ref takes (path, ref), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg_ref", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        val name = stringArg("graft_iceberg_ref", args, 1)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.readIceberg(spark, path,
            Some(graft.io.IcebergInterop.snapshotOfRef(spark, path, name))))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg_files"),
      info("graft_iceberg_files",
        "graft_iceberg_files(path) - the table's live files from manifest metadata (no data scan)"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_iceberg_files takes (path), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg_files", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.filesTable(spark, path))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg_partitions"),
      info("graft_iceberg_partitions",
        "graft_iceberg_partitions(path) - per-partition live row/manifest counts from manifest metadata (no data scan)"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_iceberg_partitions takes (path), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg_partitions", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.partitionsTable(spark, path))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg_refs"),
      info("graft_iceberg_refs",
        "graft_iceberg_refs(path) - the table's named references (branches/tags) with each un-published branch's staged-commit count"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_iceberg_refs takes (path), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg_refs", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.refsTable(spark, path))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg_stats"),
      info("graft_iceberg_stats",
        "graft_iceberg_stats(path) - the current snapshot's registered column statistics (ndv/row count) from the Puffin statistics file metadata"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_iceberg_stats takes (path), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg_stats", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.statsTable(spark, path))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("graft_iceberg_partition_stats"),
      info("graft_iceberg_partition_stats",
        "graft_iceberg_partition_stats(path) - the current snapshot's registered partition-statistics file rows (per-partition live counts)"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_iceberg_partition_stats takes (path), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("graft_iceberg_partition_stats", args, 0)
        val path = graft.io.IcebergInterop.catalogIcebergPath(spark, ref).getOrElse(ref)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.IcebergInterop.partitionStatsTable(spark, path).getOrElse(
            throw new IllegalArgumentException(
              s"no partition statistics registered for the current snapshot of $path — run analyzePartitions")))
      }
    ))
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(path_or_name, from_version[, to_version]) - the table's change data feed over the version range"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          s"table_changes takes (table, from[, to]), got ${args.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val ref = stringArg("table_changes", args, 0)
        val dir = graft.io.DeltaInterop.catalogDeltaPath(spark, ref).getOrElse(ref)
        val from = longArg("table_changes", args, 1)
        val to =
          if (args.length > 2) longArg("table_changes", args, 2)
          else graft.io.DeltaInterop.latestVersion(spark, dir)
        org.apache.spark.sql.GraftBridge.plan(
          graft.io.DeltaInterop.readChangeFeed(spark, dir, from, to))
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential double dot product of two numeric arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("intersect_size"),
      info("intersect_size", "intersect_size(a, b) - set-intersection cardinality of two string arrays"),
      (args: Seq[Expression]) => IntersectSize(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - merge-intersection cardinality of two sorted long arrays"),
      (args: Seq[Expression]) => SortedLongIntersectSize(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      info("simhash", "simhash(tokens) - 60-bit SimHash fingerprint of a string array"),
      (args: Seq[Expression]) => SimHashExpr(args(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("arg_max"),
      info("arg_max", "arg_max(value, ord) - value at max ord; hash-aggregable for any value type (ObjectHashAggregate, never SortAggregate)"),
      (args: Seq[Expression]) =>
        graft.functions.expressions.ArgExtremum(args(0), args(1), findMax = true)
          .toAggregateExpression()
    ))
    ext.injectFunction((
      FunctionIdentifier("arg_min"),
      info("arg_min", "arg_min(value, ord) - value at min ord; hash-aggregable for any value type (ObjectHashAggregate, never SortAggregate)"),
      (args: Seq[Expression]) =>
        graft.functions.expressions.ArgExtremum(args(0), args(1), findMax = false)
          .toAggregateExpression()
    ))
    // Composed-expression functions: the SAME trees the Column helpers
    // build (ZOrder.zValueN / Curation.hashBucket), assembled directly
    // from Catalyst expression classes — a Column round-trip here leaves
    // unresolved function nodes inside a ColumnNodeExpression, which the
    // analyzer won't resolve from a function builder (Unevaluable at
    // codegen; review finding). No new Expression classes: the composed
    // builtins inherit whole-stage codegen from their parts.
    ext.injectFunction((
      FunctionIdentifier("zorder_value"),
      info("zorder_value",
        "zorder_value(bits, c1, c2, ...) - N-dimensional Morton interleave of the low `bits` bits of each key"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.LongType
        val bits = args.head match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"zorder_value: bits must be an integer literal, got $other")
        }
        val dims = args.tail
        require(dims.length >= 2 && bits > 0 && bits * dims.length <= 62,
          s"zorder_value: need >= 2 dims and bits*dims <= 62")
        val ms = dims.map(a => Pmod(Cast(a, LongType), Literal(1L << bits)))
        (for {
          b <- 0 until bits
          (m, i) <- ms.zipWithIndex
        } yield ShiftLeft(BitwiseAnd(ShiftRight(m, Literal(b)), Literal(1L)),
          Literal(b * dims.length + i)): Expression)
          .reduce(BitwiseOr(_, _))
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("hash_bucket"),
      info("hash_bucket",
        "hash_bucket(key, buckets) - content-addressed bucket in [0, buckets) from the first 16 md5 bits"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{LongType, StringType}
        // mirror of Curation.hashBucket: conv(substring(md5(key), 1, 4),
        // 16, 10) cast long % buckets (Remainder, like Column's %)
        Remainder(
          Cast(Conv(Substring(Md5(Cast(args.head, StringType)),
            Literal(1), Literal(4)), Literal(16), Literal(10)), LongType),
          Cast(args(1), LongType))
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(shingles, k) - k-permutation MinHash signature (md5 min per seed); NULL for empty input"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig: k must be an integer literal, got $other")
        }
        MinHashSig(args(0), k)
      }
    ))
  }
}
