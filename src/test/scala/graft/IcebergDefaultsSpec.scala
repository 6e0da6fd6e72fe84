package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 FIELD DEFAULT VALUES (iceberg.apache.org/spec/ "Default
  * values"): a column added with `initial-default` reads the DEFAULT
  * (not null) from files that predate it — per file, resolved through
  * the adding snapshot's pinned schema-id with a sequence-number
  * fallback that survives snapshot expiry — while `write-default`
  * fills the column when a write omits it. Exercised on the batch
  * reader, the changelog, and the streaming source; unresolvable
  * applicability refuses by name instead of surfacing null. */
class IcebergDefaultsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def mkTable(dir: String): Unit = {
    IcebergWrite.append((0L until 5L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergWrite.append((5L until 10L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergWrite.addColumn(spark, dir, "score", LongType, default = Some(7L))
    // explicit values AFTER the add — including an explicit null,
    // which must NOT be replaced by the default
    IcebergWrite.append(Seq((10L, "n10", Some(100L)), (11L, "n11", None))
      .toDF("id", "name", "score"), dir)
  }

  test("initial-default for pre-add files; explicit values (incl null) win") {
    val dir = Files.createTempDirectory("graft-dflt").toString + "/t"
    mkTable(dir)
    val rows = IcebergInterop.readIceberg(spark, dir)
      .select("id", "score").as[(Long, Option[Long])].collect().toMap
    (0L until 10L).foreach(i => assert(rows(i) == Some(7L),
      s"pre-add row $i must read the default"))
    assert(rows(10L) == Some(100L) && rows(11L).isEmpty,
      "explicit values and explicit nulls survive")
    // the add bumped the table to format v3
    val meta = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    assert(meta.path("format-version").asInt == 3)
    // time travel BEFORE the add reads the old shape — no column at all
    val firstSnap = IcebergInterop.snapshots(spark, dir)
      .orderBy(col("timestamp_ms"), col("sequence_number"))
      .select("snapshot_id").as[Long].head()
    assert(!IcebergInterop.readIceberg(spark, dir, Some(firstSnap))
      .columns.contains("score"))
  }

  test("write-default fills an omitted column; defaults survive delete masking") {
    val dir = Files.createTempDirectory("graft-dflt-w").toString + "/t"
    mkTable(dir)
    IcebergWrite.append((20L until 23L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val rows = IcebergInterop.readIceberg(spark, dir)
      .select("id", "score").as[(Long, Option[Long])].collect().toMap
    (20L until 23L).foreach(i => assert(rows(i) == Some(7L),
      "write-default fills the omitted column"))
    // DV-mask some pre-add rows: survivors still read the default
    IcebergWrite.deleteWhereDV(spark, dir, col("id") % 2 === 0L)
    val after = IcebergInterop.readIceberg(spark, dir)
      .select("id", "score").as[(Long, Option[Long])].collect().toMap
    assert(!after.contains(0L) && after(1L) == Some(7L) && after(21L) == Some(7L))
  }

  test("changelog inserts surface the default for pre-add snapshots") {
    val dir = Files.createTempDirectory("graft-dflt-c").toString + "/t"
    mkTable(dir)
    val ch = graft.io.IcebergChangelog.readChangesBetween(spark, dir)
      .select("id", "score", "_change_type").as[(Long, Option[Long], String)]
      .collect()
    val inserts = ch.filter(_._3 == "insert").map(t => t._1 -> t._2).toMap
    assert(inserts(0L) == Some(7L) && inserts(9L) == Some(7L),
      "pre-add insert rows carry the default in the changelog")
    assert(inserts(10L) == Some(100L) && inserts(11L).isEmpty)
  }

  test("streaming source surfaces the default on the origin backfill") {
    val dir = Files.createTempDirectory("graft-dflt-s").toString + "/t"
    mkTable(dir)
    val q = spark.readStream.format("graft-iceberg").load(dir)
      .writeStream.format("memory").queryName("dflt_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dflt-ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("dflt_stream")
      .select("id", "score").as[(Long, Option[Long])].collect().toMap
    assert(rows(0L) == Some(7L) && rows(9L) == Some(7L))
    assert(rows(10L) == Some(100L) && rows(11L).isEmpty)
  }

  test("SQL: ADD COLUMN ... DEFAULT stamps a v3 default") {
    val dir = Files.createTempDirectory("graft-dflt-sql").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    spark.sql(s"ALTER TABLE iceberg.`$dir` ADD COLUMN note string DEFAULT 'none'")
    spark.sql(s"ALTER TABLE iceberg.`$dir` ADD COLUMNS (w bigint DEFAULT 9)")
    IcebergWrite.append(Seq((10L, "n10", "real", 1L))
      .toDF("id", "name", "note", "w"), dir)
    val byId = spark.sql(s"SELECT id, note, w FROM iceberg.`$dir`")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(0L) == (("none", 9L)) && byId(10L) == (("real", 1L)))
  }

  test("expiry-safe: defaults still resolve after the adding snapshots expire") {
    val dir = Files.createTempDirectory("graft-dflt-e").toString + "/t"
    mkTable(dir)
    val (expired, _) = IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    assert(expired > 0, "old snapshots must actually expire")
    val rows = IcebergInterop.readIceberg(spark, dir)
      .select("id", "score").as[(Long, Option[Long])].collect().toMap
    assert(rows(0L) == Some(7L) && rows(10L) == Some(100L),
      "the graft.field-added-seq fallback resolves applicability")
  }

  test("driver and distributed applicability maps are bit-identical") {
    val dir = Files.createTempDirectory("graft-dflt-dist").toString + "/t"
    mkTable(dir)
    def state(): Seq[(Long, String, Option[Long])] =
      IcebergInterop.readIceberg(spark, dir)
        .select("id", "name", "score").as[(Long, String, Option[Long])]
        .collect().sortBy(_._1).toSeq
    val viaDriver = state()
    val conf = graft.io.IcebergChangelog.LineageDriverManifestsConf
    spark.conf.set(conf, "0") // force the distributed flags path
    try {
      val viaDistributed = state()
      assert(viaDistributed == viaDriver,
        "the gate must only move WHERE the flags materialize, never the values")
    } finally spark.conf.unset(conf)
  }

  test("unresolvable applicability refuses by name, never silent null") {
    val dir = Files.createTempDirectory("graft-dflt-r").toString + "/t"
    mkTable(dir)
    IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    // strip the fallback property — now neither the adding snapshot
    // nor the sequence stamp can resolve pre-add files
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val metaP = IcebergInterop.currentMetadataPath(spark, dir)
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new java.io.File(metaP.toUri.getPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val props = m.path("properties")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    props.properties().removeIf(_.getKey.startsWith("graft.field-added-seq."))
    val out = f.create(metaP, true) // through Hadoop FS: CRC stays valid
    try out.write(m.toPrettyString.getBytes("UTF-8")) finally out.close()
    val ex = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, dir).select("score").collect()
    }
    assert(ex.getMessage.contains("initial-default"))
  }
}
