package graft

import java.nio.file.Files
import graft.io.DeltaInterop
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** IDENTITY column value generation (PROTOCOL.md "Identity Columns"):
  * appends generate `start + step·k` values without a shuffle or a
  * driver round trip, the high-water mark advances from the staged
  * files' own footer stats, and ops that could corrupt the invariant
  * (SET on the column, MERGE inserts, GENERATED ALWAYS explicit
  * values) refuse loudly. */
class DeltaIdentitySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def idField(name: String, start: Long, step: Long,
                      allowExplicit: Boolean = false): StructField = {
    val mb = new MetadataBuilder()
      .putLong("delta.identity.start", start)
      .putLong("delta.identity.step", step)
    if (allowExplicit) mb.putBoolean("delta.identity.allowExplicitInsert", true)
    StructField(name, LongType, nullable = true, mb.build())
  }

  private def createIdentityTable(start: Long, step: Long,
                                  allowExplicit: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft-identity").toString
    val schema = StructType(Seq(
      idField("row_id", start, step, allowExplicit),
      StructField("k", LongType), StructField("tag", StringType)))
    DeltaInterop.writeDelta(
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema),
      dir, Nil)
    dir
  }

  private def hwm(dir: String): Option[Long] = {
    val fd = DeltaInterop.state(spark, dir).schema("row_id")
    if (fd.metadata.contains("delta.identity.highWaterMark"))
      Some(fd.metadata.getLong("delta.identity.highWaterMark")) else None
  }

  test("lifecycle: create → two generated appends → unique, monotone, watermarked") {
    val dir = createIdentityTable(start = 100L, step = 3L)
    // created protocol advertises the feature
    val st0 = DeltaInterop.state(spark, dir)
    assert(st0.protocol.writerFeatures.contains("identityColumns"))

    DeltaInterop.writeDelta(
      (0L until 500L).map(i => (i, s"a_$i")).toDF("k", "tag").repartition(4), dir, Nil)
    val b1 = DeltaInterop.readDelta(spark, dir).select("row_id").as[Long].collect()
    assert(b1.length == 500 && b1.distinct.length == 500)
    assert(b1.min == 100L, s"first batch starts AT start: ${b1.min}")
    assert(b1.forall(v => (v - 100L) % 3L == 0), "all values step-aligned")
    val w1 = hwm(dir).get
    assert(w1 == b1.max, s"watermark = max written, got $w1 vs ${b1.max}")

    DeltaInterop.writeDelta(
      (500L until 800L).map(i => (i, s"b_$i")).toDF("k", "tag").repartition(3), dir, Nil)
    val all = DeltaInterop.readDelta(spark, dir)
      .select("row_id", "k").as[(Long, Long)].collect()
    assert(all.length == 800 && all.map(_._1).distinct.length == 800)
    val b2 = all.filter(_._2 >= 500).map(_._1)
    assert(b2.min > b1.max, "second batch strictly after the first")
    assert(hwm(dir).get == all.map(_._1).max)
  }

  test("negative step descends; explicit insert needs allowExplicitInsert") {
    val dir = createIdentityTable(start = 0L, step = -2L)
    DeltaInterop.writeDelta(Seq((1L, "x"), (2L, "y")).toDF("k", "tag"), dir, Nil)
    val v1 = DeltaInterop.readDelta(spark, dir).select("row_id").as[Long].collect()
    assert(v1.max == 0L && v1.forall(_ % 2 == 0) && v1.distinct.length == 2)
    DeltaInterop.writeDelta(Seq((3L, "z")).toDF("k", "tag"), dir, Nil)
    val v2 = DeltaInterop.readDelta(spark, dir).select("row_id").as[Long].collect()
    assert(v2.min < v1.min, "negative step keeps descending")
    assert(hwm(dir).get == v2.min, "negative-step watermark is the MIN")

    // GENERATED ALWAYS refuses explicit values...
    val e = intercept[IllegalArgumentException](DeltaInterop.writeDelta(
      Seq((5L, 9L, "w")).toDF("row_id", "k", "tag"), dir, Nil))
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // ...but allowExplicitInsert accepts them and advances the watermark
    val dir2 = createIdentityTable(start = 1L, step = 1L, allowExplicit = true)
    DeltaInterop.writeDelta(Seq((50L, 1L, "e")).toDF("row_id", "k", "tag"), dir2, Nil)
    assert(hwm(dir2).get == 50L)
    DeltaInterop.writeDelta(Seq((2L, "g")).toDF("k", "tag"), dir2, Nil)
    val gen = DeltaInterop.readDelta(spark, dir2)
      .filter(col("k") === 2L).select("row_id").as[Long].head()
    assert(gen > 50L, s"generation resumes past the explicit watermark: $gen")
  }

  test("identity-corrupting ops refuse; benign row ops still work") {
    val dir = createIdentityTable(start = 10L, step = 5L)
    DeltaInterop.writeDelta((0L until 20L).map(i => (i, s"t_$i")).toDF("k", "tag"), dir, Nil)
    // SET on the identity column refuses (both rewrite and DV paths)
    val e1 = intercept[IllegalArgumentException](DeltaInterop.updateWhere(
      spark, dir, col("k") < 5, Map("row_id" -> lit(0L))))
    assert(e1.getMessage.contains("identity"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](DeltaInterop.updateWhereDV(
      spark, dir, col("k") < 5, Map("row_id" -> lit(0L))))
    assert(e2.getMessage.contains("identity"))
    // MERGE inserts refuse; upsert-all merge refuses
    val src = Seq((0L, 99L, "m")).toDF("k", "row_id", "tag")
    val e3 = intercept[IllegalArgumentException](
      DeltaInterop.merge(spark, dir, src, Seq("k")))
    assert(e3.getMessage.contains("IDENTITY"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](DeltaInterop.mergeClauses(
      spark, dir, Seq((0L, "m")).toDF("k", "tag"), Seq("k"),
      Seq(DeltaInterop.MatchedClause(None, Map("tag" -> lit("upd")))),
      notMatched = Some((None, Map("k" -> lit(77L))))))
    assert(e4.getMessage.contains("IDENTITY"))
    // matched-only merge, plain update, and delete all still work
    DeltaInterop.mergeClauses(spark, dir, Seq((0L, "m")).toDF("k", "tag"), Seq("k"),
      Seq(DeltaInterop.MatchedClause(None, Map("tag" -> lit("merged")))), None)
    DeltaInterop.updateWhere(spark, dir, col("k") === 1L, Map("tag" -> lit("upd")))
    DeltaInterop.deleteWhere(spark, dir, col("k") === 2L)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 19)
    assert(t.filter(col("k") === 0L).select("tag").as[String].head() == "merged")
    // row_ids survived every rewrite untouched
    assert(t.select("row_id").distinct().count() == 19)
  }

  test("a FOREIGN identity table (metadata with a live watermark) appends past it") {
    // the shape a delta-spark writer leaves: feature protocol + field
    // metadata carrying an existing highWaterMark
    val dir = Files.createTempDirectory("graft-identity-foreign").toString
    val fieldMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 2L)
      .putLong("delta.identity.highWaterMark", 1001L).build()
    val schema = StructType(Seq(
      StructField("row_id", LongType, nullable = true, fieldMeta),
      StructField("k", LongType)))
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["identityColumns"]}}""",
      s"""{"metaData":{"id":"id-fixture","format":{"provider":"parquet","options":{}},"schemaString":${M.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{},"createdTime":0}}""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    DeltaInterop.writeDelta(Seq(7L).toDF("k"), dir, Nil)
    val v = DeltaInterop.readDelta(spark, dir).select("row_id").as[Long].head()
    assert(v == 1003L, s"resumes from the foreign watermark: $v")
    assert(hwm(dir).get == 1003L)
  }
}
