package graft

import java.nio.file.Files
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** variantType tables: Spark's native VariantType round-trips the
  * parquet value+metadata binary encoding delta-spark writes, and the
  * schemaString spelling `"variant"` parses through the same
  * DataType.fromJson the log replay uses — so variant columns work
  * through every path (create, append, DV delete, update) with ONE
  * obligation handled at create: the protocol must ADVERTISE
  * variantType as a READER feature (minReader 3), since a reader that
  * does not know the encoding would misread the binary. Shredded
  * variant stays refused by name. */
class DeltaVariantSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("create advertises variantType (reader+writer); full lifecycle works") {
    val dir = Files.createTempDirectory("graft-variant").toString
    val df = spark.range(6).selectExpr(
      "id", """parse_json(concat('{"a":', id, ',"tag":"x"}')) AS v""")
    DeltaInterop.writeDelta(df, dir, Nil)
    val st = DeltaInterop.state(spark, dir)
    assert(st.protocol.minReader == 3, "variant forces the feature-listing reader")
    assert(st.protocol.readerFeatures.contains("variantType"))
    assert(st.protocol.writerFeatures.contains("variantType"))
    assert(st.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType)

    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.selectExpr("sum(cast(v:a AS LONG))").head().getLong(0) == 15L)

    DeltaInterop.writeDelta(
      spark.range(6, 8).selectExpr("id", """parse_json(concat('{"a":', id, '}')) AS v"""),
      dir, Nil)
    // DV delete through a variant-column predicate
    val (_, _, n) = DeltaInterop.deleteWhereDV(spark, dir,
      expr("cast(v:a AS LONG)") % 2 === 0)
    assert(n == 4)
    // update rewrites variant rows byte-faithfully
    DeltaInterop.updateWhere(spark, dir, col("id") === 1L,
      Map("v" -> expr("""parse_json('{"a":111}')""")))
    val vals = DeltaInterop.readDelta(spark, dir)
      .selectExpr("cast(v:a AS LONG)").as[Long].collect().sorted.toSeq
    assert(vals == Seq(3L, 5L, 7L, 111L), vals.toString)
  }

  test("a FOREIGN variant table (feature protocol + variant schemaString) reads") {
    val dir = Files.createTempDirectory("graft-variant-foreign").toString
    // stage a real variant parquet file under a known name
    val staging = s"$dir/.stage"
    spark.range(3).selectExpr("id", """parse_json(concat('[', id, ']')) AS v""")
      .coalesce(1).write.parquet(staging)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    f.rename(part, new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val size = f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet")).getLen
    val schemaJson =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"variant\",\"nullable\":true,\"metadata\":{}}]}"""
    val lines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType"],"writerFeatures":["variantType"]}}""",
      s"""{"metaData":{"id":"var-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":0}}""",
      s"""{"add":{"path":"data-0.parquet","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 3)
    assert(t.selectExpr("to_json(v)").as[String].collect().sorted.toSeq ==
      Seq("[0]", "[1]", "[2]"))
    // SHREDDED variant stays refused by name
    val dir2 = Files.createTempDirectory("graft-variant-shred").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir2, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantShredding-preview"],"writerFeatures":["variantShredding-preview"]}}""",
        lines(1)).mkString("\n") + "\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, dir2))
    assert(e.getMessage.contains("variantShredding"), e.getMessage)
  }
}
