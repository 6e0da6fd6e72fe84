package graft

import java.nio.file.Files
import graft.io.{IcebergFormat, IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Puffin TABLE STATISTICS (iceberg.apache.org/spec/ "Table
  * statistics" + the Puffin file spec): `ANALYZE` publishes per-column
  * NDV blobs in a statistics file registered under the metadata's
  * `statistics` field, readers resolve them by field id and apply the
  * snapshot-freshness rule, and expiry prunes entries with their
  * snapshots. */
class IcebergStatsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def statsEntries(dir: String): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    import scala.jdk.CollectionConverters._
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val v = new java.io.File(s"$dir/metadata").list()
      .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).max
    M.readTree(new java.io.File(s"$dir/metadata/v$v.metadata.json"))
      .path("statistics").elements().asScala.toSeq
  }

  test("analyzeTable: exact ndv lands in a spec-shaped Puffin statistics file") {
    val dir = Files.createTempDirectory("graft-iceberg-stats").toString
    // 100 rows: id distinct, k has 7 values, lang has 3
    IcebergWrite.append((0L until 100L).map(i =>
      (i, i % 7, s"l${i % 3}")).toDF("id", "k", "lang"), dir)
    val (_, ndv) = IcebergWrite.analyzeTable(spark, dir, exact = true)
    assert(ndv == Map("id" -> 100L, "k" -> 7L, "lang" -> 3L))
    assert(IcebergInterop.tableStatistics(spark, dir) == ndv)
    val t = IcebergInterop.statsTable(spark, dir).collect()
    assert(t.map(r => r.getString(0) -> r.getLong(1)).toMap == ndv)
    assert(t.forall(_.getLong(2) == 100L), "row-count property rides every blob")
    // the Puffin file itself round-trips: footer blob metadata + a
    // STANDARD datasketches compact theta sketch any foreign reader
    // can deserialize — its estimate matches the registered ndv, and
    // two blobs MERGE through a plain theta union (the property the
    // spec's apache-datasketches-theta-v1 type exists for)
    val entry = statsEntries(dir).head
    val p = new org.apache.hadoop.fs.Path(entry.path("statistics-path").asText)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.getFileStatus(p).getLen == entry.path("file-size-in-bytes").asLong)
    val blobs = IcebergFormat.readPuffinFooter(
      spark.sparkContext.hadoopConfiguration, p)
    assert(blobs.map(_.blobType).toSet == Set("apache-datasketches-theta-v1"))
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.Sketches
    blobs.foreach { b =>
      val est = Math.round(
        Sketches.wrapCompactSketch(Memory.wrap(b.payload)).getEstimate)
      assert(est.toString == b.properties("ndv"),
        s"sketch estimate $est vs recorded ${b.properties("ndv")}")
    }
    val union = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    blobs.foreach(b =>
      union.union(Sketches.wrapCompactSketch(Memory.wrap(b.payload))))
    // id (100 distinct) ∪ k (7) ∪ lang (3): disjoint domains except
    // k ⊂ id values 0..6 — the union is deserializable and sane
    val u = Math.round(union.getResult.getEstimate)
    assert(u >= 100 && u <= 111, s"merged estimate $u")
  }

  test("freshness: a later commit invalidates; re-analysis replaces, not appends") {
    val dir = Files.createTempDirectory("graft-iceberg-stats-fresh").toString
    IcebergWrite.append((0L until 50L).map(i => (i, s"t$i")).toDF("id", "tag"), dir)
    IcebergWrite.analyzeTable(spark, dir, exact = true)
    assert(IcebergInterop.tableStatistics(spark, dir)("id") == 50L)
    IcebergWrite.append((50L until 60L).map(i => (i, s"t$i")).toDF("id", "tag"), dir)
    assert(IcebergInterop.tableStatistics(spark, dir).isEmpty,
      "stats bound to an older snapshot must not surface")
    IcebergWrite.analyzeTable(spark, dir, exact = true)
    assert(IcebergInterop.tableStatistics(spark, dir)("id") == 60L)
    // re-analyzing the SAME snapshot: one entry, the stale file reclaims
    val before = statsEntries(dir)
    val stalePath = new org.apache.hadoop.fs.Path(
      before.last.path("statistics-path").asText)
    IcebergWrite.analyzeTable(spark, dir, exact = true)
    val after = statsEntries(dir)
    assert(after.count(_.path("snapshot-id").asLong ==
      before.last.path("snapshot-id").asLong) == 1)
    val f = stalePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(stalePath), "the replaced statistics file reclaims")
    // approx mode: HLL within 5% on a 60-distinct column
    val (_, approx) = IcebergWrite.analyzeTable(spark, dir)
    assert(math.abs(approx("id") - 60L) <= 3, s"ndv=${approx("id")}")
  }

  test("SQL ANALYZE + graft_iceberg_stats TVF, path- and name-addressed") {
    val dir = Files.createTempDirectory("graft-iceberg-stats-sql").toString
    IcebergWrite.append((0L until 40L).map(i => (i, i % 5)).toDF("id", "k"), dir)
    val res = spark.sql(
      s"ANALYZE TABLE iceberg.`$dir` COMPUTE STATISTICS FOR COLUMNS k")
      .collect()
    assert(res.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("k", 5L)))
    assert(IcebergInterop.tableStatistics(spark, dir) == Map("k" -> 5L))
    val tvf = spark.sql(s"SELECT column, ndv FROM graft_iceberg_stats('$dir')")
      .collect()
    assert(tvf.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("k", 5L)))
    // DESCRIBE DETAIL surfaces the freshness flag (and the lineage
    // watermark, -1 here: lineage off)
    val det = spark.sql(s"DESCRIBE DETAIL iceberg.`$dir`").head()
    assert(det.getBoolean(det.fieldIndex("stats_fresh")))
    assert(det.getLong(det.fieldIndex("next_row_id")) == -1L)
    // name-addressed through the catalog prepass
    IcebergInterop.registerCatalogTable(spark, "stats_t", dir)
    val byName = spark.sql(
      "ANALYZE TABLE stats_t COMPUTE STATISTICS").collect()
    assert(byName.map(_.getString(0)).sorted.toSeq == Seq("id", "k"))
  }

  test("expiry prunes statistics entries with their snapshots") {
    val dir = Files.createTempDirectory("graft-iceberg-stats-expire").toString
    IcebergWrite.append((0L until 30L).map(i => (i, s"a$i")).toDF("id", "tag"), dir)
    IcebergWrite.analyzeTable(spark, dir, exact = true)
    val oldPath = new org.apache.hadoop.fs.Path(
      statsEntries(dir).head.path("statistics-path").asText)
    Thread.sleep(5)
    IcebergWrite.append((30L until 40L).map(i => (i, s"b$i")).toDF("id", "tag"), dir)
    IcebergWrite.analyzeTable(spark, dir, exact = true)
    val (expired, _) = IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    assert(expired >= 1)
    val entries = statsEntries(dir)
    assert(entries.length == 1, "only the current snapshot's entry survives")
    val f = oldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(oldPath), "the expired snapshot's statistics file reclaims")
    assert(IcebergInterop.tableStatistics(spark, dir)("id") == 40L,
      "the surviving entry still serves the current snapshot")
  }

  test("partition statistics: per-tuple counts from metadata, registered + fresh") {
    val dir = Files.createTempDirectory("graft-iceberg-pstats").toString
    // day(ts)-partitioned: 300 rows over 3 days, two appends so each
    // day holds at least two files
    def rowsOf(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-0${i % 3 + 1} 01:02:03"))
    }.toDF("id", "ts")
    IcebergWrite.appendPartitioned(rowsOf(0, 150), dir, "ts", "day")
    IcebergWrite.appendPartitioned(rowsOf(150, 300), dir, "ts", "day")
    val (_, nParts) = IcebergWrite.analyzePartitions(spark, dir)
    assert(nParts == 3)
    val st = IcebergInterop.partitionStatsTable(spark, dir).get
    assert(st.columns.toSeq == Seq("partition", "spec_id",
      "data_record_count", "data_file_count", "total_data_file_size_in_bytes"))
    val rows = st.select(col("partition.ts_day"), col("data_record_count"),
      col("data_file_count")).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getLong(1) == 100L), "100 rows per day")
    assert(rows.forall(_.getInt(2) >= 2), "two appends = two files per day")
    // the day values are the spec's epoch-day ints, distinct and adjacent
    val days = rows.map(_.getInt(0)).sorted
    assert(days.toSeq == Seq(days(0), days(0) + 1, days(0) + 2))
    // SQL TVF reads the same file
    val tvf = spark.sql(
      s"SELECT sum(data_record_count) FROM graft_iceberg_partition_stats('$dir')")
    assert(tvf.head().getLong(0) == 300L)
    // freshness: a later commit invalidates; re-analysis replaces
    IcebergWrite.appendPartitioned(rowsOf(300, 303), dir, "ts", "day")
    assert(IcebergInterop.partitionStatsTable(spark, dir).isEmpty)
    IcebergWrite.analyzePartitions(spark, dir)
    assert(IcebergInterop.partitionStatsTable(spark, dir).get
      .agg(sum(col("data_record_count"))).head().getLong(0) == 303L)
    // per-snapshot entries COEXIST across snapshots (the spec's shape);
    // expiry prunes the old snapshot's entry and reclaims its file
    import scala.jdk.CollectionConverters._
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    def entries() = {
      val v = new java.io.File(s"$dir/metadata").list()
        .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
        .map(_.group(1).toInt).max
      M.readTree(new java.io.File(s"$dir/metadata/v$v.metadata.json"))
        .path("partition-statistics").elements().asScala.toSeq
    }
    assert(entries().map(_.path("snapshot-id").asLong).distinct.length ==
      entries().length, "one entry per snapshot")
    val pathsBefore = entries().map(_.path("statistics-path").asText)
    IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    val pathsAfter = entries().map(_.path("statistics-path").asText)
    assert(pathsAfter.length == 1, "expiry prunes expired snapshots' entries")
    val fs0 = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    pathsBefore.filterNot(pathsAfter.contains).foreach { p =>
      assert(!fs0.exists(new org.apache.hadoop.fs.Path(p)),
        "the pruned entry's file reclaims")
    }
    // unpartitioned tables refuse loudly
    val plain = Files.createTempDirectory("graft-iceberg-pstats-plain").toString
    IcebergWrite.append((0L until 5L).map(i => (i, s"t$i")).toDF("id", "tag"), plain)
    intercept[IllegalArgumentException](IcebergWrite.analyzePartitions(spark, plain))
  }
}
