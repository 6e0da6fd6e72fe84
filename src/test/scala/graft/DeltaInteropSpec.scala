package graft

import java.nio.file.Files
import graft.io.{DeltaInterop, PartitionedSnapshotStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DeltaInteropSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def table(n: Int, rev: String = "a") =
    (0 until n).map(i => (i.toLong, s"name_$i", rev, i % 4)).toDF("id", "name", "rev", "part")

  test("writeDelta/readDelta: append and overwrite commits round-trip exactly") {
    val dir = Files.createTempDirectory("graft-delta-rt").toString
    // v0: 20 rows
    assert(DeltaInterop.writeDelta(table(20), dir, Seq("part")) == 0L)
    // v1: append 20 more (ids 100+)
    val more = table(20).withColumn("id", col("id") + 100)
    assert(DeltaInterop.writeDelta(more, dir, Seq("part")) == 1L)
    val afterAppend = DeltaInterop.readDelta(spark, dir)
    assert(afterAppend.count() == 40)
    assert(afterAppend.schema.fieldNames.toSeq == Seq("id", "name", "rev", "part"))
    // v2: full overwrite with rev=b, 12 rows
    assert(DeltaInterop.writeDelta(table(12, "b"), dir, Seq("part"), overwrite = true) == 2L)
    val latest = DeltaInterop.readDelta(spark, dir)
    assert(latest.count() == 12)
    assert(latest.filter(col("rev") === "a").count() == 0)
    // time travel: every prior version still reconstructs
    assert(DeltaInterop.readDelta(spark, dir, Some(0L)).count() == 20)
    assert(DeltaInterop.readDelta(spark, dir, Some(1L)).count() == 40)
    // partition column round-trips typed (int), not as a string
    assert(latest.schema("part").dataType.typeName == "integer")
    assert(latest.filter(col("part") === 2).count() == 3)
  }

  test("writeDelta: unpartitioned tables and empty-result reads work") {
    val dir = Files.createTempDirectory("graft-delta-flat").toString
    DeltaInterop.writeDelta(table(10), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() == 10)
    DeltaInterop.writeDelta(table(10), dir, Nil, overwrite = true)
    assert(DeltaInterop.readDelta(spark, dir).count() == 10)
    assert(DeltaInterop.readDelta(spark, dir, Some(0L)).count() == 10)
  }

  test("writeDelta: additive schema evolution re-emits metaData; old files read as null") {
    val dir = Files.createTempDirectory("graft-delta-evo").toString
    DeltaInterop.writeDelta(table(8), dir, Seq("part"))
    val widened = table(8).withColumn("id", col("id") + 100)
      .withColumn("extra", col("id") * 2)
    DeltaInterop.writeDelta(widened, dir, Seq("part"))
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.schema.fieldNames.contains("extra"))
    assert(t.count() == 16)
    assert(t.filter(col("id") < 100 && col("extra").isNull).count() == 8)
    assert(t.filter(col("id") >= 100 && col("extra").isNotNull).count() == 8)
    // dropping a column is rejected (additive-only, like the store)
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.writeDelta(table(4).drop("rev"), dir, Seq("part"))
    }
    assert(e.getMessage.contains("additive-only"))
  }

  test("commit is put-if-absent: a racing writer gets a version conflict, not a corrupt log") {
    val dir = Files.createTempDirectory("graft-delta-race").toString
    DeltaInterop.writeDelta(table(4), dir, Seq("part"))
    // the loser's view: it computed prev=-1, but version 0 is already
    // committed — its put-if-absent create must fail, not clobber
    val e = intercept[IllegalStateException] {
      DeltaInterop.commit(spark, dir, 0L, Seq("""{"commitInfo":{}}"""))
    }
    assert(e.getMessage.contains("concurrent Delta commit"))
    // the winner's log is untouched
    assert(DeltaInterop.readDelta(spark, dir).count() == 4)
  }

  test("exportSnapshot: incremental — only partitions whose store dir changed are copied") {
    val warehouse = Files.createTempDirectory("graft-delta-store").toString
    val storeDir = s"$warehouse/store"
    val deltaDir = s"$warehouse/delta"
    val v1 = table(40)
    PartitionedSnapshotStore.commitDelta(v1, storeDir, "part")
    val (sv1, dv1, copied1) = DeltaInterop.exportSnapshot(spark, storeDir, deltaDir, "part")
    assert(sv1 == 1 && dv1 == 0L && copied1 > 0)
    assert(DeltaInterop.readDelta(spark, deltaDir).count() == 40)
    // store delta touches HALF the partitions
    PartitionedSnapshotStore.commitDelta(
      v1.filter(col("part") < 2).withColumn("rev", lit("b")), storeDir, "part")
    val (sv2, dv2, copied2) = DeltaInterop.exportSnapshot(spark, storeDir, deltaDir, "part")
    assert(sv2 == 2 && dv2 == 1L)
    val t = DeltaInterop.readDelta(spark, deltaDir)
    assert(t.count() == 40)
    assert(t.filter(col("rev") === "b").count() == 20)
    // incrementality: partitions 2/3 were NOT re-copied
    val full = copied1
    assert(copied2 < full, s"re-copied everything: $copied2 of $full")
    // idempotent re-export: nothing changed, no new commit, no copies
    val (_, dv3, copied3) = DeltaInterop.exportSnapshot(spark, storeDir, deltaDir, "part")
    assert(dv3 == dv2 && copied3 == 0)
  }

  test("stock spark-shell (no graft, no delta jars) reads the written table from the log alone") {
    val dir = Files.createTempDirectory("graft-delta-stock").toString
    DeltaInterop.writeDelta(table(30), dir, Seq("part"))
    DeltaInterop.writeDelta(table(30).withColumn("id", col("id") + 100), dir, Seq("part"))
    DeltaInterop.writeDelta(table(18, "b"), dir, Seq("part"), overwrite = true)
    // expected final state: 18 rows, all rev=b, id sum = 0+..+17
    val script =
      s"""
         |import org.apache.spark.sql.functions._
         |import org.apache.spark.sql.types.{DataType, StructType}
         |val dir = "$dir"
         |val logs = new java.io.File(dir + "/_delta_log").listFiles
         |  .filter(_.getName.endsWith(".json")).sortBy(_.getName)
         |val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
         |var schema: StructType = null
         |var partCols: Seq[String] = Nil
         |val live = scala.collection.mutable.LinkedHashSet[String]()
         |for (f <- logs; line <- scala.io.Source.fromFile(f, "UTF-8").getLines if line.nonEmpty) {
         |  val n = mapper.readTree(line)
         |  if (n.has("metaData")) {
         |    schema = DataType.fromJson(n.get("metaData").get("schemaString").asText).asInstanceOf[StructType]
         |    val it = n.get("metaData").get("partitionColumns").elements
         |    val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next.asText
         |    partCols = b.result()
         |  } else if (n.has("add")) live += n.get("add").get("path").asText
         |  else if (n.has("remove")) live -= n.get("remove").get("path").asText
         |}
         |val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))
         |val df = spark.read.option("basePath", dir).schema(dataSchema)
         |  .parquet(live.toSeq.map(p => dir + "/" + p): _*)
         |  .select(schema.fieldNames.map(col): _*)
         |println("DELTAREAD rows=" + df.count + " revb=" + df.filter(col("rev") === "b").count +
         |  " idsum=" + df.agg(sum("id")).head.getLong(0))
         |sys.exit(0)
         |""".stripMargin
    val scriptFile = Files.createTempFile("delta-stock-read", ".scala")
    Files.write(scriptFile, script.getBytes("UTF-8"))
    val cmd = Seq("/opt/spark/bin/spark-shell", "--master", "local[2]",
      "--conf", "spark.ui.enabled=false", "-i", scriptFile.toString)
    val out = new StringBuilder
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().remove("SPARK_HOME") // the stock launcher finds its own
    val proc = pb.start()
    scala.io.Source.fromInputStream(proc.getInputStream).getLines()
      .foreach(l => out.append(l).append('\n'))
    assert(proc.waitFor() == 0, s"stock spark-shell read failed:\n$out")
    val expectedSum = (0 until 18).sum
    assert(out.toString.contains(s"DELTAREAD rows=18 revb=18 idsum=$expectedSum"),
      s"unexpected stock-read output:\n$out")
  }
}
