package graft

import java.nio.file.{Files, Paths}
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** typeWidening tables (PROTOCOL.md "Type Widening"): files written
  * BEFORE a widen carry the old narrow physical type; readers must
  * upcast them to the current logical schema. Spark's vectorized
  * parquet reader performs the feature's allowed conversions natively
  * (probed: int→long, int/float→double, date→timestamp_ntz), so every
  * graft read — which always pins the LATEST schema on the scan —
  * handles such tables with no extra machinery; appends write the
  * current wide schema and are protocol-conforming (the typeChanges
  * bookkeeping obligation only binds type-ALTERing commits, which this
  * engine never issues). */
class DeltaTypeWideningSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val M = new com.fasterxml.jackson.databind.ObjectMapper()

  /** A foreign table shaped like delta-spark after
    * `ALTER TABLE t ALTER COLUMN v TYPE bigint`: v0 = int schema + an
    * int32-physical file; v1 = widened long schema carrying
    * delta.typeWidening.typeChanges metadata + an int64-physical file. */
  private def widenedFixture(): String = {
    val dir = Files.createTempDirectory("graft-typewiden").toString
    val f = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def stageOne(df: org.apache.spark.sql.DataFrame, name: String): Long = {
      val staging = s"$dir/.stage-$name"
      df.coalesce(1).write.parquet(staging)
      val part = f.listStatus(new org.apache.hadoop.fs.Path(staging))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      f.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
      f.delete(new org.apache.hadoop.fs.Path(staging), true)
      f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$name")).getLen
    }
    val sz0 = stageOne(Seq((1, 10), (2, 20)).toDF("id", "v"), "old-int.parquet") // int32 physical
    val sz1 = stageOne(Seq((3L, 30L), (4L, 40L)).toDF("id", "v"), "new-long.parquet")

    import org.apache.spark.sql.types._
    val narrow = StructType(Seq(StructField("id", IntegerType), StructField("v", IntegerType)))
    val changes = new MetadataBuilder().putMetadataArray("delta.typeWidening.typeChanges",
      Array(new MetadataBuilder().putString("fromType", "integer")
        .putString("toType", "long").putLong("tableVersion", 1L).build())).build()
    val wide = StructType(Seq(
      StructField("id", LongType, nullable = true, changes),
      StructField("v", LongType, nullable = true, changes)))
    def metaJson(schema: StructType) = {
      val n = M.createObjectNode(); val m = n.putObject("metaData")
      m.put("id", "tw-fixture")
      val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
      m.put("schemaString", schema.json)
      m.putArray("partitionColumns"); m.putObject("configuration"); m.put("createdTime", 0L)
      M.writeValueAsString(n)
    }
    def addJson(p: String, sz: Long) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":$sz,"modificationTime":0,"dataChange":true}}"""
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
        metaJson(narrow), addJson("old-int.parquet", sz0)).mkString("\n") + "\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000001.json"),
      (Seq(metaJson(wide), addJson("new-long.parquet", sz1)).mkString("\n") + "\n").getBytes("UTF-8"))
    dir
  }

  test("pre-widen int32 files upcast under the widened long schema") {
    val dir = widenedFixture()
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(t.count() == 4)
    assert(t.agg(sum("v")).head().getLong(0) == 100L)
    // time travel to v0 reads the NARROW schema
    val v0 = DeltaInterop.readDelta(spark, dir, version = Some(0L))
    assert(v0.schema("v").dataType == org.apache.spark.sql.types.IntegerType)
    assert(v0.count() == 2)
  }

  test("widened tables stay writable: append + DV delete through mixed physical types") {
    val dir = widenedFixture()
    DeltaInterop.writeDelta(Seq((5L, 50L)).toDF("id", "v"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() == 5)
    // a DV delete whose predicate spans old-physical and new-physical rows
    val (_, _, n) = DeltaInterop.deleteWhereDV(spark, dir, col("v") >= 20L && col("v") <= 30L)
    assert(n == 2)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.select("v").as[Long].collect().sorted.toSeq == Seq(10L, 40L, 50L))
  }
}
