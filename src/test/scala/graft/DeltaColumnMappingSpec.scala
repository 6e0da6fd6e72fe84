package graft

import java.nio.file.{Files, Paths}
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Column-mapping read (PROTOCOL.md "Column Mapping"): a table with
  * delta.columnMapping.mode = name|id stores parquet columns under each
  * field's delta.columnMapping.physicalName; the logical names exist
  * only in the log's schemaString metadata. The reader must scan the
  * PHYSICAL schema and rename back — including nested struct fields —
  * and resolve partitionValues keyed by physical name. */
class DeltaColumnMappingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fieldMeta(id: Long, phys: String) = new MetadataBuilder()
    .putLong("delta.columnMapping.id", id)
    .putString("delta.columnMapping.physicalName", phys).build()

  /** Hand-author a column-mapped table the way delta-spark lays it out:
    * parquet files named by physical columns, flat (non-Hive) paths,
    * partitionValues keyed by the partition column's PHYSICAL name. */
  private def buildMappedTable(dir: String, mode: String): Unit = {
    // physical rows: col-1=id, col-2=struct(col-3=score, col-4=tag), col-5=lang
    val physRows = Seq(
      (1L, (10.0, "a"), "en"), (2L, (20.0, "b"), "en"),
      (3L, (30.0, "c"), "de"), (4L, (40.0, "d"), "de"))
    def writeFile(lang: String, name: String): Long = {
      val staging = s"$dir/.stage-$name"
      physRows.filter(_._3 == lang)
        .map { case (i, (s, t), _) => (i, s, t) }
        .toDF("col-1", "col-3", "col-4")
        .select(col("col-1"), struct(col("col-3"), col("col-4")).as("col-2"))
        .coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(dir, name)
      Files.move(part.toPath, dst)
      Files.size(dst)
    }
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, fieldMeta(1, "col-1")),
      StructField("meta", StructType(Seq(
        StructField("score", DoubleType, nullable = true, fieldMeta(3, "col-3")),
        StructField("tag", StringType, nullable = true, fieldMeta(4, "col-4")))),
        nullable = true, fieldMeta(2, "col-2")),
      StructField("lang", StringType, nullable = true, fieldMeta(5, "col-5"))))
    val enSize = writeFile("en", "part-en.snappy.parquet")
    val deSize = writeFile("de", "part-de.snappy.parquet")
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val mdNode = M.createObjectNode()
    val md = mdNode.putObject("metaData")
    md.put("id", "cm-fixture")
    val fmt = md.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    md.put("schemaString", logical.json) // Jackson escapes the nested JSON
    md.putArray("partitionColumns").add("lang")
    val cfg = md.putObject("configuration")
    cfg.put("delta.columnMapping.mode", mode)
    cfg.put("delta.columnMapping.maxColumnId", "5")
    md.put("createdTime", 0L)
    val lines = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      M.writeValueAsString(mdNode),
      s"""{"add":{"path":"part-en.snappy.parquet","partitionValues":{"col-5":"en"},"size":$enSize,"modificationTime":0,"dataChange":true}}""",
      s"""{"add":{"path":"part-de.snappy.parquet","partitionValues":{"col-5":"de"},"size":$deSize,"modificationTime":0,"dataChange":true}}""")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  for (mode <- Seq("name", "id"))
    test(s"mode=$mode: physical parquet names resolve to logical schema, nested fields included") {
      val dir = Files.createTempDirectory(s"graft-delta-cm-$mode").toString
      buildMappedTable(dir, mode)
      val st = DeltaInterop.state(spark, dir)
      assert(st.configuration("delta.columnMapping.mode") == mode)
      val t = DeltaInterop.readDelta(spark, dir)
      assert(t.schema.fieldNames.toSeq == Seq("id", "meta", "lang"))
      assert(t.schema("meta").dataType.asInstanceOf[StructType]
        .fieldNames.toSeq == Seq("score", "tag"))
      val rows = t.select(col("id"), col("meta.score"), col("meta.tag"), col("lang"))
        .orderBy("id").collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3))).toSeq
      assert(rows == Seq((1L, 10.0, "a", "en"), (2L, 20.0, "b", "en"),
        (3L, 30.0, "c", "de"), (4L, 40.0, "d", "de")))
      // partition-value resolution went through the physical key
      assert(st.files.forall(_.partitionValues.contains("col-5")))
    }

  test("renameColumn upgrades a plain table and keeps every file readable") {
    val dir = Files.createTempDirectory("graft-rename").toString
    val df = (0L until 20L).map(i => (i, s"body $i", (i % 2).toString))
      .toDF("id", "body", "grp")
    DeltaInterop.writeDelta(df, dir, Seq("grp"))                      // v0
    val v = DeltaInterop.renameColumn(spark, dir, "body", "text")     // v1
    assert(v === 1L)
    val st = DeltaInterop.state(spark, dir)
    assert(st.configuration("delta.columnMapping.mode") === "name")
    assert(st.schema.fieldNames.toSeq === Seq("id", "text", "grp"))
    // old files resolve through the frozen physical name
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() === 20L)
    assert(t.filter(col("id") === 3L).select("text").as[String].head() === "body 3")
  }

  test("appends after a rename stage PHYSICAL column names") {
    val dir = Files.createTempDirectory("graft-rename-append").toString
    val df = (0L until 10L).map(i => (i, i * 10L, (i % 2).toString))
      .toDF("id", "n_chars", "grp")
    DeltaInterop.writeDelta(df, dir, Seq("grp"))
    DeltaInterop.renameColumn(spark, dir, "n_chars", "chars")
    val more = (10L until 16L).map(i => (i, i * 10L, (i % 2).toString))
      .toDF("id", "chars", "grp")
    DeltaInterop.writeDelta(more, dir, Seq("grp"))                    // append, mapped
    val st = DeltaInterop.state(spark, dir)
    // the appended file's raw parquet schema must carry the PHYSICAL name
    val newest = st.files.map(_.path).filterNot(
      DeltaInterop.state(spark, dir, Some(1L)).files.map(_.path).toSet).head
    val raw = spark.read.parquet(s"$dir/$newest")
    assert(raw.columns.contains("n_chars") && !raw.columns.contains("chars"),
      s"appended file columns: ${raw.columns.mkString(",")}")
    // and the logical view unifies old + new
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() === 16L)
    assert(t.agg(sum(col("chars"))).head().getLong(0) === (0L until 16L).map(_ * 10).sum)
  }

  test("renaming a partition column keeps pruning and paths coherent") {
    val dir = Files.createTempDirectory("graft-rename-part").toString
    val df = (0L until 12L).map(i => (i, (i % 3).toString)).toDF("id", "grp")
    DeltaInterop.writeDelta(df, dir, Seq("grp"))
    DeltaInterop.renameColumn(spark, dir, "grp", "bucket")
    val st = DeltaInterop.state(spark, dir)
    assert(st.partitionColumns === Seq("bucket"))
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.filter(col("bucket") === "1").count() === 4L)
    // appends land under the physical (original) path key and still read
    DeltaInterop.writeDelta(
      (12L until 15L).map(i => (i, "1")).toDF("id", "bucket"), dir, Seq("bucket"))
    assert(DeltaInterop.readDelta(spark, dir)
      .filter(col("bucket") === "1").count() === 7L)
  }

  test("Hive-pathed mapped tables read in ONE scan — no per-partition union") {
    val dir = Files.createTempDirectory("graft-cm-onescan").toString
    val df = (0L until 40L).map(i => (i, i * 10L, (i % 8).toString))
      .toDF("id", "n_chars", "grp")
    DeltaInterop.writeDelta(df, dir, Seq("grp"))
    DeltaInterop.renameColumn(spark, dir, "n_chars", "chars")
    DeltaInterop.renameColumn(spark, dir, "grp", "bucket")
    val t = DeltaInterop.readDelta(spark, dir)
    // 8 partitions, but the PLAN must carry exactly one parquet scan —
    // plan size stays O(1) in the partition count (a 10k-partition
    // mapped table must not plan 10k scans)
    val plan = t.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan for a Hive-pathed mapped table, got $scans:\n$plan")
    assert(!plan.contains("Union"), s"mapped read still unions per partition:\n$plan")
    assert(t.count() === 40L)
    assert(t.filter(col("bucket") === "3").agg(sum("chars")).head().getLong(0)
      === (0L until 40L).filter(_ % 8 == 3).map(_ * 10).sum)
    // partition pruning must reach the scan through the rename
    val pruned = DeltaInterop.readDeltaWhere(spark, dir,
      partitionEq = Map("bucket" -> "3"))
    assert(pruned.count() === 5L)
  }

  test("addColumn on a mapped table: fresh id, old files read NULL, appends carry it") {
    val dir = Files.createTempDirectory("graft-cm-addcol").toString
    val df = (0L until 10L).map(i => (i, s"body $i")).toDF("id", "body")
    DeltaInterop.writeDelta(df, dir, Nil)                              // v0
    DeltaInterop.renameColumn(spark, dir, "body", "text")              // v1: mapped
    val before = DeltaInterop.state(spark, dir)
    val maxId0 = before.configuration("delta.columnMapping.maxColumnId").toLong
    DeltaInterop.addColumn(spark, dir, "score", DoubleType)            // v2
    val st = DeltaInterop.state(spark, dir)
    // fresh id PAST maxColumnId, synthetic physical name
    val f = st.schema("score")
    assert(f.metadata.getLong("delta.columnMapping.id") === maxId0 + 1)
    assert(f.metadata.getString("delta.columnMapping.physicalName") === s"col-${maxId0 + 1}")
    assert(st.configuration("delta.columnMapping.maxColumnId").toLong === maxId0 + 1)
    // old files read the new column as NULL
    val t0 = DeltaInterop.readDelta(spark, dir)
    assert(t0.columns.toSeq === Seq("id", "text", "score"))
    assert(t0.filter(col("score").isNull).count() === 10L)
    // an append carrying the column stages it under the PHYSICAL name
    DeltaInterop.writeDelta(
      (10L until 14L).map(i => (i, s"body $i", i * 0.5)).toDF("id", "text", "score"),
      dir, Nil)                                                        // v3
    val newest = DeltaInterop.state(spark, dir).files.map(_.path)
      .filterNot(st.files.map(_.path).toSet).head
    val raw = spark.read.parquet(s"$dir/$newest")
    assert(raw.columns.contains(s"col-${maxId0 + 1}") && !raw.columns.contains("score"),
      s"appended file columns: ${raw.columns.mkString(",")}")
    // both epochs in one read: nulls below v3, values at v3
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() === 14L)
    assert(t.filter(col("score").isNotNull).count() === 4L)
    assert(t.agg(sum("score")).head().getDouble(0) === (10 until 14).map(_ * 0.5).sum)
    // renaming the ADDED column works too (id/physical frozen)
    DeltaInterop.renameColumn(spark, dir, "score", "quality")
    assert(DeltaInterop.readDelta(spark, dir)
      .filter(col("quality").isNotNull).count() === 4L)
  }

  test("addColumn on an UNMAPPED table appends a plain nullable field") {
    val dir = Files.createTempDirectory("graft-plain-addcol").toString
    DeltaInterop.writeDelta((0L until 5L).map(i => (i, s"n$i")).toDF("id", "name"), dir, Nil)
    DeltaInterop.addColumn(spark, dir, "score", DoubleType)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.columns.toSeq === Seq("id", "name", "score"))
    assert(t.filter(col("score").isNull).count() === 5L)
    intercept[IllegalArgumentException](
      DeltaInterop.addColumn(spark, dir, "score", DoubleType))
  }

  test("rename refuses collisions; evolution refuses mapped tables; compact works") {
    val dir = Files.createTempDirectory("graft-rename-guard").toString
    DeltaInterop.writeDelta(
      (0L until 5L).map(i => (i, s"b$i")).toDF("id", "body"), dir, Nil)
    intercept[IllegalArgumentException] {
      DeltaInterop.renameColumn(spark, dir, "body", "id")
    }
    DeltaInterop.renameColumn(spark, dir, "body", "text")
    // compact is a physical-passthrough rewrite — it works on mapped
    // tables and must not re-emit or rename anything
    DeltaInterop.writeDelta(
      (5L until 8L).map(i => (i, s"b$i")).toDF("id", "text"), dir, Nil)
    val (_, nIn, nOut) = DeltaInterop.compact(spark, dir)
    assert(nIn >= 2 && nOut >= 1)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() === 8L)
    assert(t.filter(col("id") === 6L).select("text").as[String].head() === "b6")
    val anyFile = DeltaInterop.state(spark, dir).files.head.path
    assert(spark.read.parquet(s"$dir/$anyFile").columns.contains("body"))
    // schema evolution on a mapped table is refused
    intercept[IllegalArgumentException] {
      DeltaInterop.writeDelta(
        (8L until 9L).map(i => (i, s"b$i", 1L)).toDF("id", "text", "extra"), dir, Nil)
    }
  }

  test("compact on a mapped PARTITIONED table keeps physical path keys") {
    val dir = Files.createTempDirectory("graft-mapped-compact-part").toString
    val df = (0L until 16L).map(i => (i, s"b$i", (i % 2).toString))
      .toDF("id", "body", "grp")
    DeltaInterop.writeDelta(df.repartition(2), dir, Seq("grp"))
    DeltaInterop.renameColumn(spark, dir, "grp", "bucket")
    DeltaInterop.writeDelta(
      (16L until 20L).map(i => (i, s"b$i", (i % 2).toString))
        .toDF("id", "body2", "bucket")
        .select(col("id"), col("body2").as("body"), col("bucket")), dir, Seq("bucket"))
    val (_, nIn, nOut) = DeltaInterop.compact(spark, dir)
    assert(nIn > nOut && nOut >= 2)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() === 20L)
    assert(t.filter(col("bucket") === "1").count() === 10L)
    // compacted files live under the PHYSICAL (original) partition key
    assert(DeltaInterop.state(spark, dir).files.forall(_.path.startsWith("grp=")))
  }

  test("row ops work on mapped tables: DELETE/UPDATE/MERGE through the mapping") {
    val dir = Files.createTempDirectory("graft-mapped-rowops").toString
    val df = (0L until 20L).map(i => (i, s"b$i", (i % 2).toString))
      .toDF("id", "body", "grp")
    DeltaInterop.writeDelta(df, dir, Seq("grp"))
    DeltaInterop.renameColumn(spark, dir, "body", "text")
    val (_, nDel) = DeltaInterop.deleteWhere(spark, dir, col("id") % 5 === 0L)
    assert(nDel > 0)
    assert(DeltaInterop.readDelta(spark, dir).count() === 16L)
    DeltaInterop.updateWhere(spark, dir, col("id") === 7L,
      Map("text" -> upper(col("text"))))
    assert(DeltaInterop.readDelta(spark, dir)
      .filter(col("id") === 7L).select("text").as[String].head() === "B7")
    val (_, _, nIns) = DeltaInterop.merge(spark, dir,
      Seq((7L, "merged", "1"), (100L, "new", "0")).toDF("id", "text", "grp"),
      Seq("id"))
    assert(nIns === 1L)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() === 17L)
    assert(t.filter(col("id") === 7L).select("text").as[String].head() === "merged")
    // the rewritten files still carry PHYSICAL names
    val anyFile = DeltaInterop.state(spark, dir).files.head.path
    assert(spark.read.parquet(s"$dir/$anyFile").columns.contains("body"))
  }

  test("DV ops and the change feed work on mapped tables too") {
    val dir = Files.createTempDirectory("graft-mapped-dv").toString
    DeltaInterop.writeDelta(
      (0L until 12L).map(i => (i, s"b$i")).toDF("id", "body"), dir, Nil)
    DeltaInterop.renameColumn(spark, dir, "body", "text")
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    val (v, touched, nDel) = DeltaInterop.deleteWhereDV(spark, dir, col("id") < 3L)
    assert(touched > 0 && nDel === 3L)
    assert(DeltaInterop.readDelta(spark, dir).count() === 9L)
    val ch = DeltaInterop.readChangeFeed(spark, dir, v, v)
    assert(ch.select("id").as[Long].collect().sorted === Array(0L, 1L, 2L))
    assert(ch.columns.contains("text"))
    val (v2, _, nUpd) = DeltaInterop.updateWhereDV(spark, dir, col("id") === 5L,
      Map("text" -> lit("X")))
    assert(nUpd === 1L)
    val ch2 = DeltaInterop.readChangeFeed(spark, dir, v2, v2)
      .select("_change_type", "text").as[(String, String)].collect().toMap
    assert(ch2("update_postimage") === "X")
  }

  test("mapping (and the rename) survives checkpoint + log cleanup") {
    val dir = Files.createTempDirectory("graft-rename-cp").toString
    DeltaInterop.writeDelta(
      (0L until 8L).map(i => (i, s"b$i")).toDF("id", "body"), dir, Nil)
    DeltaInterop.renameColumn(spark, dir, "body", "text")
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.columns.toSeq === Seq("id", "text") && t.count() === 8L)
    assert(DeltaInterop.state(spark, dir)
      .configuration("delta.columnMapping.mode") === "name")
  }

  test("DROP COLUMN is metadata-only; a re-added name does NOT resurrect the old data") {
    val dir = Files.createTempDirectory("graft-cm-drop").toString
    DeltaInterop.writeDelta(
      (0L until 20L).map(i => (i, s"n_$i", i * 1.0)).toDF("id", "name", "score"),
      dir, Nil)
    DeltaInterop.dropColumn(spark, dir, "name")
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.columns.toSeq == Seq("id", "score") && t.count() == 20)
    // the drop auto-upgraded to column mapping (physical bytes stay)
    assert(DeltaInterop.state(spark, dir)
      .configuration("delta.columnMapping.mode") == "name")
    // time travel below the drop still sees the column
    assert(DeltaInterop.readDelta(spark, dir, Some(0L)).columns.contains("name"))
    // re-adding the SAME name reads null — fresh physical name, no
    // resurrection of the dropped bytes
    DeltaInterop.addColumn(spark, dir, "name", StringType)
    val re = DeltaInterop.readDelta(spark, dir)
    assert(re.filter(col("name").isNotNull).count() == 0,
      "a re-added column must not resurrect dropped data")
    // the post-drop table keeps working: append + DV delete
    DeltaInterop.writeDelta(
      Seq((100L, 9.9, "fresh")).toDF("id", "score", "name"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir)
      .filter(col("name") === "fresh").count() == 1)
    DeltaInterop.deleteWhereDV(spark, dir, col("id") === 3L)
    assert(DeltaInterop.readDelta(spark, dir).count() == 20)
    // guards: partition / constraint / generated-column references refuse
    val pDir = Files.createTempDirectory("graft-cm-drop-p").toString
    DeltaInterop.writeDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), pDir, Seq("p"))
    val e1 = intercept[IllegalArgumentException](
      DeltaInterop.dropColumn(spark, pDir, "p"))
    assert(e1.getMessage.contains("partition"))
    val cDir = Files.createTempDirectory("graft-cm-drop-c").toString
    DeltaInterop.writeDelta(Seq((1L, 2L)).toDF("a", "b"), cDir, Nil)
    DeltaInterop.addConstraint(spark, cDir, "b_pos", "b > 0")
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.dropColumn(spark, cDir, "b"))
    assert(e2.getMessage.contains("b_pos"))
    // SQL spelling drives the same path
    val sDir = Files.createTempDirectory("graft-cm-drop-sql").toString
    DeltaInterop.writeDelta(Seq((1L, "x", 0.5)).toDF("id", "tag", "w"), sDir, Nil)
    spark.sql(s"ALTER TABLE delta.`$sDir` DROP COLUMN tag").collect()
    assert(DeltaInterop.readDelta(spark, sDir).columns.toSeq == Seq("id", "w"))
  }
}
