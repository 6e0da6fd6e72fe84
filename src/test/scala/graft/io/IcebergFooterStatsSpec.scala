package graft.io

import graft.SharedSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The footer-first commit stats path (optimization r18) must author
  * manifests BYTE-IDENTICAL in (record_count, lower_bounds,
  * upper_bounds) to the grouped-aggregation job it replaces — across
  * longs, doubles (incl. -0.0), dates, timestamps, nulls, all-null
  * columns, short ASCII strings, > 32-byte strings (bounds dropped on
  * both paths) and non-ASCII strings (footer path must fall back, not
  * guess). */
class IcebergFooterStatsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  /** Per-file (record_count, lower_bounds, upper_bounds) of the
    * current snapshot's data manifests, as a multiset independent of
    * file paths and snapshot ids. */
  private def manifestStats(dir: String): Seq[(Long, Map[Int, Seq[Byte]], Map[Int, Seq[Byte]])] = {
    val meta = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    val snapId = meta.path("current-snapshot-id").asLong
    val snap = meta.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong == snapId).get
    val listPath = snap.path("manifest-list").asText
    def bounds(df: org.apache.avro.generic.GenericRecord, f: String): Map[Int, Seq[Byte]] =
      Option(df.getSchema.getField(f)).flatMap(_ => Option(df.get(f))).map {
        _.asInstanceOf[java.util.List[_]].asScala.map { kv0 =>
          val kv = kv0.asInstanceOf[org.apache.avro.generic.GenericRecord]
          val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer].duplicate()
          val b = new Array[Byte](bb.remaining()); bb.get(b)
          kv.get("key").asInstanceOf[Number].intValue -> b.toSeq
        }.toMap
      }.getOrElse(Map.empty)
    IcebergInterop.avroRecords(spark, new Path(IcebergInterop.resolve(listPath)))
      .flatMap { m =>
        IcebergInterop.avroRecords(spark,
          new Path(IcebergInterop.resolve(m.get("manifest_path").toString)))
      }
      .map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
      .map { df =>
        (df.get("record_count").asInstanceOf[Number].longValue,
          bounds(df, "lower_bounds"), bounds(df, "upper_bounds"))
      }
      .sortBy(_.toString())
  }

  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, "en", "a short ascii text", Some(3.5), "2024-01-02", 1000000L),
      (2L, "de", "x" * 50 + " long body exceeding the 32-byte bound cutoff", Some(-0.0), "2024-01-01", 2000000L),
      (3L, "en", "another short one", None, "2024-03-09", 1500000L),
      (4L, "fr", "zz" * 30, Some(7.25), "2023-12-31", 900000L)
    ).toDF("doc_id", "lang", "text", "score", "d", "micros")
      .withColumn("d", to_date(col("d")))
      .withColumn("ts", timestamp_micros(col("micros"))).drop("micros")
      .withColumn("all_null", lit(null).cast("string"))
  }

  test("footer-stats manifests are identical to the grouped-job manifests") {
    val base = java.nio.file.Files.createTempDirectory("footer-stats").toString
    val dfAscii = fixture().repartition(2, col("doc_id"))
    val hits0 = IcebergWrite.footerStatsHits
    IcebergWrite.append(dfAscii, s"$base/fast")
    assert(IcebergWrite.footerStatsHits > hits0,
      "the ASCII fixture must take the footer fast path, not fall back")
    IcebergWrite.disableFooterStats = true
    try IcebergWrite.append(dfAscii, s"$base/job")
    finally IcebergWrite.disableFooterStats = false
    assert(manifestStats(s"$base/fast") == manifestStats(s"$base/job"))
    assert(manifestStats(s"$base/fast").exists(_._2.nonEmpty),
      "the fixture must actually produce bounds")
  }

  test("non-ASCII short strings take the footer fast path byte-identically") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("footer-stats-zh").toString
    // includes the case where UTF-16 (java String) order and UTF-8
    // binary order DISAGREE: U+10000 (UTF-16 leads with surrogate
    // D800; UTF-8 F0 90 80 80) vs U+FF61 (UTF-16 FF61; UTF-8 EF BD
    // A1). Java order puts U+10000 first; Spark's UTF8_BINARY min/max
    // and parquet's BinaryStatistics both put U+FF61 first. The
    // byte-identity assertion below is the proof the fast path uses
    // the job's order.
    val supp = new String(Character.toChars(0x10000))
    val df = Seq((1L, "中文短串"), (2L, supp), (3L, "｡"), (4L, "ascii"))
      .toDF("id", "s")
    val hits0 = IcebergWrite.footerStatsHits
    IcebergWrite.append(df, s"$base/fast")
    assert(IcebergWrite.footerStatsHits > hits0,
      "short non-ASCII string bounds are exact under UTF8_BINARY — no fallback")
    IcebergWrite.disableFooterStats = true
    try IcebergWrite.append(df, s"$base/job")
    finally IcebergWrite.disableFooterStats = false
    val fast = manifestStats(s"$base/fast")
    assert(fast == manifestStats(s"$base/job"))
    assert(fast.exists(_._2.contains(2)), "the string column must bound")
  }

  test("decimal columns get NO footer bounds (job path never bounds them)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("footer-stats-dec").toString
    // precision <= 18: stored as decimal-annotated INT64 — the raw
    // int/long chunk stats must NOT leak into the manifest (the
    // Iceberg spec wants big-endian unscaled bytes; the job path
    // simply emits no bound), while the sibling long still bounds
    val df = Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("-5.00")),
        (3L, BigDecimal("99.99")))
      .toDF("id", "amt")
      .withColumn("amt", col("amt").cast("decimal(9,2)"))
      .withColumn("amt64", col("amt").cast("decimal(18,2)"))
    val hits0 = IcebergWrite.footerStatsHits
    IcebergWrite.append(df, s"$base/fast")
    assert(IcebergWrite.footerStatsHits > hits0,
      "a decimal column must SKIP, not force the job fallback")
    IcebergWrite.disableFooterStats = true
    try IcebergWrite.append(df, s"$base/job")
    finally IcebergWrite.disableFooterStats = false
    val fast = manifestStats(s"$base/fast")
    assert(fast == manifestStats(s"$base/job"))
    // field 1 = id (bounded); fields 2,3 = decimals (no bounds at all)
    assert(fast.exists(_._2.contains(1)), "the long column must bound")
    assert(fast.forall(s => !s._2.contains(2) && !s._2.contains(3)),
      "decimal field ids must carry no bounds on either path")
  }

  test("non-MICROS timestamps force the job fallback") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("footer-stats-ms").toString
    val df = Seq((1L, 1000000L), (2L, 2000000L)).toDF("id", "m")
      .withColumn("ts", timestamp_micros(col("m"))).drop("m")
    val misses0 = IcebergWrite.footerStatsMisses
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      IcebergWrite.append(df, s"$base/fast")
      assert(IcebergWrite.footerStatsMisses > misses0,
        "a MILLIS-annotated timestamp chunk has no provably-exact footer " +
        "bounds — the job (which WOULD bound the column) must run")
      IcebergWrite.disableFooterStats = true
      try IcebergWrite.append(df, s"$base/job")
      finally IcebergWrite.disableFooterStats = false
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    val fast = manifestStats(s"$base/fast")
    assert(fast == manifestStats(s"$base/job"))
    assert(fast.exists(_._2.contains(2)), "the timestamp column must bound")
  }

  test("MoR delete + compact keep manifests identical on both stats paths") {
    val baseA = java.nio.file.Files.createTempDirectory("footer-lc-a").toString
    val baseB = java.nio.file.Files.createTempDirectory("footer-lc-b").toString
    def lifecycle(dir: String): Unit = {
      IcebergWrite.append(fixture().repartition(2, col("doc_id")), dir)
      IcebergWrite.deleteWhere(spark, dir, col("doc_id") < 2L,
        ranges = Map("doc_id" -> ((1.0, 1.0))))
      IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    }
    lifecycle(baseA)
    IcebergWrite.disableFooterStats = true
    try lifecycle(baseB)
    finally IcebergWrite.disableFooterStats = false
    assert(manifestStats(baseA) == manifestStats(baseB))
    assert(IcebergInterop.readIceberg(spark, baseA).count() ==
      IcebergInterop.readIceberg(spark, baseB).count())
  }
}
