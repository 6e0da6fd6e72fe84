package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NATIVE Iceberg writes ([[graft.io.IcebergWrite]]): graft-authored
  * tables must read back through the FOREIGN-read path
  * ([[IcebergInterop]]) with snapshot history, time travel, and
  * manifest-bound file skipping intact — the proof that the writer
  * emits the published spec, not a private dialect. */
class IcebergWriteSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("snapshot summaries record the spec's standard counts across the lifecycle") {
    val dir = Files.createTempDirectory("graft-iceberg-summary").toString
    def sumOf(snapId: Long): Map[String, String] = {
      val M = new com.fasterxml.jackson.databind.ObjectMapper()
      val v = new java.io.File(s"$dir/metadata").list()
        .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
        .map(_.group(1).toInt).max
      import scala.jdk.CollectionConverters._
      val m = M.readTree(new java.io.File(s"$dir/metadata/v$v.metadata.json"))
      m.path("snapshots").elements().asScala
        .find(_.path("snapshot-id").asLong == snapId).get.path("summary")
        .properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
    val s1 = IcebergWrite.append(
      (0L until 40L).map(i => (i, s"a_$i")).toDF("id", "tag").coalesce(2), dir)
    val m1 = sumOf(s1)
    assert(m1("added-data-files") == "2" && m1("added-records") == "40")
    assert(m1("total-records") == "40" && m1("total-data-files") == "2")
    assert(m1("total-delete-files") == "0")
    val s2 = IcebergWrite.append(
      (40L until 50L).map(i => (i, s"b_$i")).toDF("id", "tag").coalesce(1), dir)
    val m2 = sumOf(s2)
    assert(m2("added-records") == "10" && m2("total-records") == "50")
    assert(m2("total-data-files") == "3")
    // a MoR delete adds delete content; data totals are untouched
    val (s3, _) = IcebergWrite.deleteWhere(spark, dir, col("id") < 5)
    val m3 = sumOf(s3)
    assert(m3("added-position-deletes") == "5" && m3("added-delete-files").toLong >= 1)
    assert(m3("total-records") == "50" && m3("total-position-deletes") == "5")
    // compact folds: data files swap, delete content drops, records shrink
    val (s4, _, _) = IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    val m4 = sumOf(s4)
    assert(m4("deleted-data-files").toLong >= 1 && m4("removed-delete-files").toLong >= 1)
    assert(m4("total-records") == "45" && m4("total-delete-files") == "0")
    assert(m4("total-position-deletes") == "0")
    // the counts surface on the history view (and its SQL twin)
    val hist = IcebergInterop.snapshots(spark, dir)
      .orderBy("sequence_number").collect()
    assert(hist.map(_.getLong(5)).take(2).toSeq == Seq(40L, 10L)) // added_records
    assert(hist.last.getLong(8) == 45L, "total_records after the fold")
    val sqlHist = spark.sql(s"DESCRIBE HISTORY iceberg.`$dir`")
    assert(sqlHist.columns.contains("total_records"))
    assert(sqlHist.orderBy("sequence_number").collect().last.getLong(8) == 45L)
    // DV REPLACEMENT counts replacement-aware: the second DV on the
    // same file is a merged superset — totals must NOT double-count
    // the first one, and the retired positions surface as removed
    val (s5, _) = IcebergWrite.deleteWhereDV(spark, dir, col("id") < 12) // 7 rows (5..11)
    val m5 = sumOf(s5)
    assert(m5("total-position-deletes") == "7", m5.toString)
    val (s6, _) = IcebergWrite.deleteWhereDV(spark, dir, col("id") < 15) // +3 rows
    val m6 = sumOf(s6)
    assert(m6("added-position-deletes") == "10", "the merged superset DV")
    assert(m6("removed-position-deletes") == "7", "the retired vector")
    assert(m6("total-position-deletes") == "10",
      s"replacement must not double-count: ${m6("total-position-deletes")}")
    assert(m6("total-delete-files") == "1", "one LIVE DV per file")
  }

  test("create + two appends + overwrite: read-back, history, time travel") {
    val dir = Files.createTempDirectory("graft-iceberg-write").toString
    val s1 = IcebergWrite.append(
      (0L until 50L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val s2 = IcebergWrite.append(
      (50L until 80L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
    assert(s1 != s2, "snapshot ids must be unique")

    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.columns.toSeq == Seq("id", "tag"))
    assert(t.count() == 80)
    assert(t.agg(sum("id")).head().getLong(0) == (0L until 80L).sum)
    // time travel to the first snapshot
    assert(IcebergInterop.readIceberg(spark, dir, Some(s1)).count() == 50)

    // overwrite replaces contents in one snapshot; history keeps all 3
    val s3 = IcebergWrite.overwrite(
      (100L until 110L).map(i => (i, s"c_$i")).toDF("id", "tag"), dir)
    val t3 = IcebergInterop.readIceberg(spark, dir)
    assert(t3.count() == 10)
    assert(t3.agg(min("id"), max("id")).head() match {
      case r => r.getLong(0) == 100L && r.getLong(1) == 109L
    })
    val hist = IcebergInterop.snapshots(spark, dir).collect()
    assert(hist.length == 3)
    val ops = hist.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(ops(s1) == "append" && ops(s2) == "append" && ops(s3) == "overwrite")
    // the pre-overwrite snapshots still read whole
    assert(IcebergInterop.readIceberg(spark, dir, Some(s2)).count() == 80)
  }

  test("graft-written bounds drive manifest file skipping on read-back") {
    val dir = Files.createTempDirectory("graft-iceberg-write-prune").toString
    IcebergWrite.append(
      (0L until 800L).map(i => (i, i % 7, s"r_$i")).toDF("id", "grp", "tag")
        .repartitionByRange(8, col("id")), dir)
    val t = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((100.0, 180.0))))
    assert(t.inputFiles.length < 8,
      s"bounds must prune the 8-file scan, got ${t.inputFiles.length}")
    assert(t.filter(col("id").between(100, 180)).count() == 81)
  }


  test("partitioned appends: per-value manifests, manifest-level skip, summaries survive carry-forward") {
    val dir = Files.createTempDirectory("graft-iceberg-write-part").toString
    val rows = (0L until 90L).map(i => (i, s"g${i % 3}", s"r_$i")).toDF("id", "grp", "tag")
    IcebergWrite.appendPartitioned(rows.filter(col("id") < 45), dir, "grp")
    // a single-value read opens ONLY that value's manifest
    val t1 = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g1"))
    assert(t1.count() === 15)
    val (r1, s1) = IcebergInterop.lastManifestScan
    assert(r1 == 1 && s1 == 2, s"read=$r1 skipped=$s1")
    // summaries carry FORWARD through a later partitioned append
    IcebergWrite.appendPartitioned(rows.filter(col("id") >= 45), dir, "grp")
    val t2 = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g1"))
    assert(t2.count() === 30)
    val (r2, s2) = IcebergInterop.lastManifestScan
    assert(r2 == 2 && s2 == 4, s"read=$r2 skipped=$s2")
    // ...and through a later UNPARTITIONED append (mixed specs)
    IcebergWrite.append(Seq((1000L, "g9", "x")).toDF("id", "grp", "tag"), dir)
    val t3 = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g1"))
    assert(t3.count() === 30)
    val (r3, s3) = IcebergInterop.lastManifestScan
    assert(s3 >= 4, s"partitioned summaries must still skip: read=$r3 skipped=$s3")
    // whole-table read sees every row, source column real in files
    assert(IcebergInterop.readIceberg(spark, dir).count() === 91)
  }

  test("append rebases across a version race; overwrite refuses") {
    val dir = Files.createTempDirectory("graft-iceberg-write-race").toString
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(dir, "metadata")
    // a RACING WRITER steals the next version slot between this
    // writer's staging and its commit (deterministic via the hook):
    // copy v1's metadata to v2 once, so attempt 1 collides and the
    // append must rebase onto the new head
    def stealOnce(from: Int, to: Int): Unit = {
      var fired = false
      IcebergWrite.onBeforeCommit = () => if (!fired) {
        fired = true
        org.apache.hadoop.fs.FileUtil.copy(f,
          new org.apache.hadoop.fs.Path(meta, s"v$from.metadata.json"), f,
          new org.apache.hadoop.fs.Path(meta, s"v$to.metadata.json"), false,
          spark.sparkContext.hadoopConfiguration)
      }
    }
    try {
      stealOnce(1, 2)
      IcebergWrite.append(Seq((2L, "b")).toDF("id", "tag"), dir)
      assert(f.exists(new org.apache.hadoop.fs.Path(meta, "v3.metadata.json")),
        "rebased append must land at v3")
      assert(IcebergInterop.readIceberg(spark, dir).count() == 2)

      // overwrite under the same race must refuse, not clobber
      stealOnce(3, 4)
      val e = intercept[IllegalArgumentException](
        IcebergWrite.overwrite(Seq((9L, "z")).toDF("id", "tag"), dir))
      assert(e.getMessage.contains("version race"), e.getMessage)
    } finally IcebergWrite.onBeforeCommit = () => ()
    // the failed overwrite left the table readable and unchanged
    assert(IcebergInterop.readIceberg(spark, dir).count() == 2)
  }

  test("merge-on-read DELETE: masks apply, deletes compose, no data file rewrites") {
    val dir = Files.createTempDirectory("graft-iceberg-write-del").toString
    val s1 = IcebergWrite.append(
      (0L until 60L).map(i => (i, s"r_$i")).toDF("id", "tag")
        .repartitionByRange(3, col("id")), dir)
    def dataFileSet() = IcebergInterop.readIceberg(spark, dir)
      .inputFiles.filter(p => !p.contains("/data/delete-")).toSet
    val files0 = dataFileSet()
    assert(files0.size == 3)
    val (_, n1) = IcebergWrite.deleteWhere(spark, dir, col("id") < 20,
      ranges = Map("id" -> ((0.0, 19.0))))
    assert(n1 == 20)
    val t1 = IcebergInterop.readIceberg(spark, dir)
    assert(t1.count() == 40 && t1.agg(min("id")).head().getLong(0) == 20L)
    // deletes COMPOSE: the second predicate scans the MASKED view, so
    // its hit set is disjoint by construction
    val (_, n2) = IcebergWrite.deleteWhere(spark, dir, col("id") % 10 === 5)
    assert(n2 == 4, s"ids 25,35,45,55: got $n2")
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 36)
    assert(t2.filter(col("id") % 10 === 5).count() == 0)
    // merge-on-read: the data file set never changed (a fully-masked
    // file still scans; its rows just never survive the anti-join)
    assert(dataFileSet() == files0)
    // time travel sees the pre-delete table; history records deletes
    assert(IcebergInterop.readIceberg(spark, dir, Some(s1)).count() == 60)
    assert(IcebergInterop.snapshots(spark, dir)
      .filter(col("operation") === "delete").count() == 2)
    // appends continue on the masked table
    IcebergWrite.append(Seq((100L, "new")).toDF("id", "tag"), dir)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 37)
    // a no-match delete commits nothing
    val before = IcebergInterop.snapshots(spark, dir).count()
    val (_, n3) = IcebergWrite.deleteWhere(spark, dir, col("id") === 99999L)
    assert(n3 == 0 && IcebergInterop.snapshots(spark, dir).count() == before)
  }

  test("schema evolution is metadata-only: rename keeps the field id, add allocates fresh") {
    val dir = Files.createTempDirectory("graft-iceberg-write-evo").toString
    IcebergWrite.append(
      (0L until 6L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val dataBefore = IcebergInterop.readIceberg(spark, dir)
      .inputFiles.toSet
    // RENAME: the old files keep reading through the stable field id
    IcebergWrite.renameColumn(spark, dir, "tag", "label")
    val t1 = IcebergInterop.readIceberg(spark, dir)
    assert(t1.columns.toSeq == Seq("id", "label"))
    assert(t1.filter(col("label").startsWith("a_")).count() == 6)
    // ADD: pre-add files surface NULL; the next append carries values
    IcebergWrite.addColumn(spark, dir, "score",
      org.apache.spark.sql.types.LongType)
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.columns.toSeq == Seq("id", "label", "score"))
    assert(t2.filter(col("score").isNull).count() == 6)
    IcebergWrite.append(Seq((6L, "b_6", 99L)).toDF("id", "label", "score"), dir)
    val t3 = IcebergInterop.readIceberg(spark, dir)
    assert(t3.count() == 7)
    assert(t3.filter(col("score") === 99L).count() == 1)
    // zero file work for the two evolutions
    assert((dataBefore -- t3.inputFiles.toSet).isEmpty,
      "evolution must not rewrite or drop any existing data file")
    // appends under the OLD column set refuse (schema moved on)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.append(Seq((7L, "x")).toDF("id", "tag"), dir))
    assert(e.getMessage.contains("must match current schema"), e.getMessage)
    // duplicate add / rename-to-existing refuse
    intercept[IllegalArgumentException](
      IcebergWrite.addColumn(spark, dir, "score",
        org.apache.spark.sql.types.LongType))
    intercept[IllegalArgumentException](
      IcebergWrite.renameColumn(spark, dir, "label", "score"))
  }

  test("schema mismatch on append refuses loudly") {
    val dir = Files.createTempDirectory("graft-iceberg-write-schema").toString
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.append(Seq((2L, "b", 3.0)).toDF("id", "tag", "extra"), dir))
    assert(e.getMessage.contains("must match current schema"), e.getMessage)
  }

  private def metaJson(dir: String, v: Int): com.fasterxml.jackson.databind.JsonNode = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    M.readTree(new java.io.File(s"$dir/metadata/v$v.metadata.json"))
  }

  test("creation emits the full v2-required metadata surface") {
    val dir = Files.createTempDirectory("graft-iceberg-write-v2req").toString
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    val m = metaJson(dir, 1)
    assert(m.path("format-version").asInt == 2)
    assert(m.path("last-partition-id").asInt == 999)
    assert(m.path("sort-orders").size == 1 &&
      m.path("sort-orders").get(0).path("order-id").asInt == 0)
    assert(m.path("default-sort-order-id").asInt == 0)
    assert(m.path("properties").isObject)
    assert(m.path("refs").path("main").path("snapshot-id").asLong ==
      m.path("current-snapshot-id").asLong)
    assert(m.path("refs").path("main").path("type").asText == "branch")
    assert(m.path("snapshot-log").size == 1 &&
      m.path("snapshot-log").get(0).path("snapshot-id").asLong ==
        m.path("current-snapshot-id").asLong)
    assert(m.path("metadata-log").isArray && m.path("metadata-log").size == 0)
    // second commit: logs grow, metadata-log names the superseded file
    IcebergWrite.append(Seq((2L, "b")).toDF("id", "tag"), dir)
    val m2 = metaJson(dir, 2)
    assert(m2.path("snapshot-log").size == 2)
    assert(m2.path("metadata-log").size == 1 &&
      m2.path("metadata-log").get(0).path("metadata-file").asText
        .endsWith("v1.metadata.json"))
    assert(m2.path("snapshots").get(1).path("parent-snapshot-id").asLong ==
      m2.path("snapshots").get(0).path("snapshot-id").asLong)
  }

  test("foreign metadata fields carry forward verbatim through a graft commit") {
    val dir = Files.createTempDirectory("graft-iceberg-write-foreign").toString
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    // dress v1 up as a FOREIGN writer's metadata: properties, a tag
    // ref, a real sort order, and an unknown future field
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = metaJson(dir, 1).deepCopy[com.fasterxml.jackson.databind.JsonNode]()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val curSnap = m.path("current-snapshot-id").asLong
    m.withObject("/properties").put("owner", "warehouse-team")
      .put("write.format.default", "parquet")
    val tag = m.withObject("/refs").putObject("v1.0-release")
    tag.put("snapshot-id", curSnap); tag.put("type", "tag")
    val so = M.createObjectNode()
    so.put("order-id", 7)
    val sf = so.putArray("fields").addObject()
    sf.put("transform", "identity"); sf.put("source-id", 1)
    sf.put("direction", "asc"); sf.put("null-order", "nulls-first")
    m.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("sort-orders").add(so)
    m.put("default-sort-order-id", 7)
    m.put("some-future-field", "must-survive")
    val out = new java.io.FileOutputStream(s"$dir/metadata/v2.metadata.json")
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    finally out.close()

    // a graft append (v3), a delete (v4), and an evolution (v5) must
    // each carry the foreign surface forward
    IcebergWrite.append(Seq((2L, "b")).toDF("id", "tag"), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    IcebergWrite.addColumn(spark, dir, "note", org.apache.spark.sql.types.StringType)
    val m5 = metaJson(dir, 5)
    assert(m5.path("properties").path("owner").asText == "warehouse-team")
    assert(m5.path("properties").path("write.format.default").asText == "parquet")
    assert(m5.path("refs").path("v1.0-release").path("snapshot-id").asLong == curSnap)
    assert(m5.path("refs").path("v1.0-release").path("type").asText == "tag")
    assert(m5.path("refs").path("main").path("snapshot-id").asLong ==
      m5.path("current-snapshot-id").asLong, "main ref must track the head")
    assert(m5.path("default-sort-order-id").asInt == 7)
    assert(m5.path("sort-orders").size == 2)
    assert(m5.path("some-future-field").asText == "must-survive")
    assert(m5.path("last-partition-id").asInt == 999)
    // the table still reads correctly (append landed, delete masked)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 1 && t.agg(min("id")).head().getLong(0) == 2L)
  }

  test("delete rebases across a concurrent APPEND but refuses across an overwrite") {
    val dir = Files.createTempDirectory("graft-iceberg-write-delrace").toString
    IcebergWrite.append((0L until 30L).map(i => (i, s"r_$i")).toDF("id", "tag"), dir)
    // concurrent APPEND between the delete's staging and commit: the
    // referenced data files are still live ⇒ rebase succeeds
    var fired = false
    IcebergWrite.onBeforeCommit = () => if (!fired) {
      fired = true
      IcebergWrite.onBeforeCommit = () => ()
      IcebergWrite.append(Seq((100L, "x")).toDF("id", "tag"), dir)
    }
    try {
      val (_, n) = IcebergWrite.deleteWhere(spark, dir, col("id") < 10)
      assert(n == 10)
    } finally IcebergWrite.onBeforeCommit = () => ()
    assert(IcebergInterop.readIceberg(spark, dir).count() == 21)

    // concurrent OVERWRITE: the staged position deletes reference
    // files the new head no longer holds ⇒ loud failure, no commit
    var fired2 = false
    IcebergWrite.onBeforeCommit = () => if (!fired2) {
      fired2 = true
      IcebergWrite.onBeforeCommit = () => ()
      IcebergWrite.overwrite(Seq((200L, "y")).toDF("id", "tag"), dir)
    }
    try {
      val e = intercept[IllegalStateException](
        IcebergWrite.deleteWhere(spark, dir, col("id") >= 10))
      assert(e.getMessage.contains("replaced"), e.getMessage)
    } finally IcebergWrite.onBeforeCommit = () => ()
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 1 && t.agg(min("id")).head().getLong(0) == 200L,
      "the failed delete must not mask anything in the overwritten table")
  }

  test("hidden-transform writes: bucket point-skip, day range-skip, truncate, spec reuse") {
    // bucket[4] over long keys: a point read opens exactly ONE bucket
    val dir = Files.createTempDirectory("graft-iceberg-write-bucket").toString
    val rows = (0L until 80L).map(i => (i, s"r_$i")).toDF("id", "tag")
    IcebergWrite.appendPartitioned(rows, dir, "id", "bucket[4]")
    val t = IcebergInterop.readIcebergWhere(spark, dir, Map("id" -> ((17.0, 17.0))))
    assert(t.count() == 1 && t.head().getLong(0) == 17L)
    val (r1, s1) = IcebergInterop.lastManifestScan
    assert(r1 == 1 && r1 + s1 == 4,
      s"point read must open exactly the key's bucket: read=$r1 skipped=$s1")
    // a SECOND bucket append reuses the spec (no new spec id) and the
    // point read still opens one manifest per append
    IcebergWrite.appendPartitioned(
      (80L until 160L).map(i => (i, s"r_$i")).toDF("id", "tag"), dir, "id", "bucket[4]")
    val m = metaJson(dir, 2)
    assert(m.path("partition-specs").size == 2, "spec 0 + ONE bucket spec")
    assert(m.path("last-partition-id").asInt == 1000)
    val t2 = IcebergInterop.readIcebergWhere(spark, dir, Map("id" -> ((17.0, 17.0))))
    assert(t2.count() == 1)
    val (r2, s2) = IcebergInterop.lastManifestScan
    assert(r2 == 2 && r2 + s2 == 8, s"read=$r2 skipped=$s2")
    // a DIFFERENT transform on the same table registers a fresh spec
    // with a fresh partition field id; both prune independently
    IcebergWrite.appendPartitioned(
      (160L until 200L).map(i => (i, s"r_$i")).toDF("id", "tag"), dir, "id",
      "truncate[50]")
    val m3 = metaJson(dir, 3)
    assert(m3.path("partition-specs").size == 3)
    assert(m3.path("last-partition-id").asInt == 1001)
    val t3 = IcebergInterop.readIcebergWhere(spark, dir, Map("id" -> ((17.0, 17.0))))
    assert(t3.count() == 1)
    val (r3, _) = IcebergInterop.lastManifestScan
    // the truncate manifest's band [150,199] EXCLUDES 17 — only the two
    // bucket manifests open (both specs prune independently)
    assert(r3 == 2, s"id 17's bucket per bucket append, truncate band skips: $r3")

    // day(ts) over TimestampNTZ: a 1-day range read opens 1 of 3 days
    val dir2 = Files.createTempDirectory("graft-iceberg-write-day").toString
    val base = java.time.LocalDateTime.of(2024, 1, 10, 0, 0)
    val tsRows = (0 until 72).map(h => (base.plusHours(h.toLong), h.toLong))
      .toDF("ts", "v")
    IcebergWrite.appendPartitioned(tsRows, dir2, "ts", "day")
    val d0 = base.toLocalDate.toEpochDay * 86400000000L
    val oneDay = IcebergInterop.readIcebergWhere(spark, dir2,
      Map("ts" -> ((d0.toDouble, (d0 + 86399999999L).toDouble))))
    assert(oneDay.count() == 24)
    val (rd, sd) = IcebergInterop.lastManifestScan
    assert(rd == 1 && sd == 2, s"1 of 3 day manifests: read=$rd skipped=$sd")

    // string truncate[2]: equality read prunes by prefix band
    val dir3 = Files.createTempDirectory("graft-iceberg-write-trunc").toString
    val sRows = Seq("aardvark", "abacus", "zebra", "zephyr", "mango")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "word")
    IcebergWrite.appendPartitioned(sRows, dir3, "word", "truncate[2]")
    val tz = IcebergInterop.readIcebergWhere(spark, dir3, Map.empty,
      stringEq = Map("word" -> "zebra"))
    assert(tz.count() == 1)
    val (rz, sz) = IcebergInterop.lastManifestScan
    assert(rz == 1 && sz == 3, s"only the 'ze' band opens: read=$rz skipped=$sz")
  }

  test("multi-field partition spec: (day(ts), bucket(id)) writes, 2-D skip, compact preserves") {
    val dir = Files.createTempDirectory("graft-iceberg-write-multi").toString
    val base = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    val rows = (0 until 72).map(h =>
      (base.plusHours(h.toLong), h.toLong, s"r_$h")).toDF("ts", "id", "tag")
    IcebergWrite.appendPartitioned(rows, dir,
      Seq(("ts", "day"), ("id", "bucket[4]")))
    // ONE spec with TWO fields, partition field ids allocated past 999
    val m = metaJson(dir, 1)
    val spec = {
      import scala.jdk.CollectionConverters._
      m.path("partition-specs").elements().asScala
        .find(_.path("spec-id").asInt == 1).get.path("fields")
    }
    assert(spec.size == 2)
    assert(spec.get(0).path("transform").asText == "day" &&
      spec.get(1).path("transform").asText == "bucket[4]")
    assert(spec.get(0).path("field-id").asInt == 1000 &&
      spec.get(1).path("field-id").asInt == 1001)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 72)
    val total = {
      val (r0, s0) = IcebergInterop.lastManifestScan; r0 + s0
    }
    assert(total >= 8, s"one manifest per (day,bucket) tuple: $total")
    // TWO-DIMENSIONAL skip: one day AND one key → exactly ONE manifest
    val d0 = base.toLocalDate.toEpochDay * 86400000000L
    val hit = IcebergInterop.readIcebergWhere(spark, dir,
      Map("ts" -> ((d0.toDouble, (d0 + 86399999999L).toDouble)),
          "id" -> ((17.0, 17.0))))
    assert(hit.count() == 1 && hit.select("id").head().getLong(0) == 17L)
    val (r1, s1) = IcebergInterop.lastManifestScan
    assert(r1 == 1 && s1 == total - 1,
      s"day × bucket must prune to ONE manifest: read=$r1 skipped=$s1")
    // one dimension alone still prunes to that day's bucket manifests
    val day1 = IcebergInterop.readIcebergWhere(spark, dir,
      Map("ts" -> (((d0 + 86400000000L).toDouble, (d0 + 2 * 86400000000L - 1).toDouble))))
    assert(day1.count() == 24)
    val (r2, _) = IcebergInterop.lastManifestScan
    assert(r2 <= 4, s"a day range opens at most that day's buckets: $r2")
    // compact PRESERVES both dimensions
    IcebergWrite.deleteWhere(spark, dir, col("id") < 2)
    val (_, rewritten, _) = IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    assert(rewritten >= 1)
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 70 && !t2.inputFiles.exists(_.contains("/data/delete-")))
    val hit2 = IcebergInterop.readIcebergWhere(spark, dir,
      Map("ts" -> ((d0.toDouble, (d0 + 86399999999L).toDouble)),
          "id" -> ((17.0, 17.0))))
    assert(hit2.count() == 1)
    val (r3, s3) = IcebergInterop.lastManifestScan
    assert(r3 == 1, s"2-D skip must survive the compact: read=$r3 skipped=$s3")
    // a second multi-field append REUSES the spec (no new spec id)
    IcebergWrite.appendPartitioned(
      Seq((base.plusDays(10), 500L, "late")).toDF("ts", "id", "tag"), dir,
      Seq(("ts", "day"), ("id", "bucket[4]")))
    val m2 = metaJson(dir, currentMetaVersion(dir))
    assert(m2.path("partition-specs").size == 2, "spec 0 + ONE (day,bucket) spec")
  }

  private def currentMetaVersion(dir: String): Int =
    new java.io.File(s"$dir/metadata").list()
      .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).max

  test("appendSorted: WRITE ORDERED BY registers the order, stamps entries, tightens pruning") {
    val dir = Files.createTempDirectory("graft-iceberg-sorted").toString
    val twin = Files.createTempDirectory("graft-iceberg-unsorted").toString
    val rnd = new scala.util.Random(7)
    val df = rnd.shuffle((0L until 4000L).toVector)
      .map(i => (i, s"p_$i")).toDF("id", "payload").repartition(8)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false") // keep the sort's range files apart
    try {
      IcebergWrite.appendSorted(df, dir, Seq(("id", true)))
      IcebergWrite.append(df, twin)
    } finally spark.conf.set(coalesceKey, prev)
    // metadata: ONE new sort order, identity asc nulls-first, default
    val m = metaJson(dir, 1)
    import scala.jdk.CollectionConverters._
    val order = m.path("sort-orders").elements().asScala
      .find(_.path("order-id").asInt == 1).get
    assert(order.path("fields").size == 1)
    val fd = order.path("fields").get(0)
    assert(fd.path("transform").asText == "identity" &&
      fd.path("direction").asText == "asc" &&
      fd.path("null-order").asText == "nulls-first")
    assert(m.path("default-sort-order-id").asInt == 1)
    // every data-file entry stamps sort_order_id = 1
    val manPath = new java.io.File(s"$dir/metadata").listFiles()
      .find(_.getName.startsWith("manifest-")).get
    val stamped = graft.io.IcebergFormat.readAvro(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(manPath.toString))
      .map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
      .map(df0 => Option(df0.get("sort_order_id")).map(_.asInstanceOf[Number].intValue))
    assert(stamped.nonEmpty && stamped.forall(_.contains(1)),
      s"every file stamps the order: $stamped")
    // rows round-trip exactly; the sorted table PRUNES a range read to
    // a fraction of the files while the unsorted twin scans them all
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 4000)
    val hit = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((0.0, 299.0))))
    assert(hit.count() == 300)
    val sortedFiles = hit.inputFiles.length
    val hitTwin = IcebergInterop.readIcebergWhere(spark, twin,
      Map("id" -> ((0.0, 299.0))))
    assert(hitTwin.count() == 300)
    val twinFiles = hitTwin.inputFiles.length
    assert(sortedFiles * 2 <= twinFiles,
      s"clustered bounds must prune: sorted=$sortedFiles unsorted=$twinFiles")
    // a second sorted append REUSES the order (no duplicate entry)
    IcebergWrite.appendSorted(
      Seq((9000L, "late")).toDF("id", "payload"), dir, Seq(("id", true)))
    val m2 = metaJson(dir, 2)
    assert(m2.path("sort-orders").size == 2, "order 0 (unsorted) + order 1 only")
    // a DIFFERENT order registers order-id 2 and becomes the default
    IcebergWrite.appendSorted(
      Seq((9001L, "z")).toDF("id", "payload"), dir, Seq(("payload", false)))
    val m3 = metaJson(dir, 3)
    assert(m3.path("sort-orders").size == 3 &&
      m3.path("default-sort-order-id").asInt == 2)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 4002)
  }

  test("merge-on-read UPDATE: one snapshot, postimages visible, no data file rewrites") {
    val dir = Files.createTempDirectory("graft-iceberg-write-upd").toString
    val s1 = IcebergWrite.append(
      (0L until 40L).map(i => (i, i * 10L, s"r_$i")).toDF("id", "score", "tag")
        .repartitionByRange(4, col("id")), dir)
    def dataFileSet() = IcebergInterop.readIceberg(spark, dir)
      .inputFiles.filter(p => !p.contains("/data/delete-")).toSet
    val files0 = dataFileSet()
    val (_, n1) = IcebergWrite.updateWhere(spark, dir, col("id") < 10,
      Map("score" -> (col("score") + 1000L), "tag" -> lit("updated")),
      ranges = Map("id" -> ((0.0, 9.0))))
    assert(n1 == 10)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 40, "update must not change row count")
    assert(t.filter(col("tag") === "updated").count() == 10)
    assert(t.filter(col("id") < 10).agg(min("score")).head().getLong(0) == 1000L)
    // untouched data files never rewrite; postimage files are NEW
    assert(files0.subsetOf(dataFileSet()))
    // ONE snapshot for the whole row delta; time travel sees preimages
    assert(IcebergInterop.snapshots(spark, dir).count() == 2)
    assert(IcebergInterop.readIceberg(spark, dir, Some(s1))
      .filter(col("tag") === "updated").count() == 0)
    // updates COMPOSE on the masked view (no double-application)
    val (_, n2) = IcebergWrite.updateWhere(spark, dir, col("tag") === "updated",
      Map("score" -> (col("score") + 1L)))
    assert(n2 == 10)
    assert(IcebergInterop.readIceberg(spark, dir)
      .filter(col("id") < 10).agg(min("score")).head().getLong(0) == 1001L)
    // a no-match update commits nothing
    val before = IcebergInterop.snapshots(spark, dir).count()
    val (_, n3) = IcebergWrite.updateWhere(spark, dir, col("id") === 9999L,
      Map("score" -> lit(0L)))
    assert(n3 == 0 && IcebergInterop.snapshots(spark, dir).count() == before)
  }

  test("merge-on-read MERGE: clause arbitration, inserts, one snapshot, race paths") {
    val dir = Files.createTempDirectory("graft-iceberg-write-merge").toString
    IcebergWrite.append(
      (0L until 20L).map(i => (i, i * 10L, s"r_$i")).toDF("id", "score", "tag"), dir)
    val source = Seq(
      (5L, 999L, "upd"),    // matched, first clause (score<70 → update)
      (15L, 999L, "del"),   // matched, second clause (delete)
      (100L, 1L, "ins"),    // not matched → insert
      (101L, 2L, "ins")     // not matched → insert
    ).toDF("id", "score", "tag")
    val (_, nDel, nIns) = IcebergWrite.mergeInto(spark, dir, source, Seq("id"),
      matched = Seq(
        graft.io.DeltaInterop.MatchedClause(Some(col("t.score") < 70L),
          Map("score" -> col("s.score"), "tag" -> lit("merged"))),
        graft.io.DeltaInterop.MatchedClause(None, Map.empty, delete = true)),
      notMatched = Some((None, Map.empty)))
    assert(nDel == 2, s"both matched rows fire (one update, one delete): $nDel")
    assert(nIns == 2, s"two inserts: $nIns")
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 21, "20 - 1 delete + 2 inserts")
    assert(t.filter(col("id") === 5L).select("score", "tag").head() ==
      org.apache.spark.sql.Row(999L, "merged"))
    assert(t.filter(col("id") === 15L).count() == 0, "second clause deleted id 15")
    assert(t.filter(col("id") >= 100L).count() == 2)
    // the whole row delta landed as ONE snapshot
    assert(IcebergInterop.snapshots(spark, dir).count() == 2)

    // race path 1: concurrent APPEND between staging and commit —
    // referenced files still live ⇒ the mixed delete+append rebases
    var fired = false
    IcebergWrite.onBeforeCommit = () => if (!fired) {
      fired = true
      IcebergWrite.onBeforeCommit = () => ()
      IcebergWrite.append(Seq((500L, 0L, "race")).toDF("id", "score", "tag"), dir)
    }
    try {
      val (_, d2, i2) = IcebergWrite.mergeInto(spark, dir,
        Seq((5L, 1L, "again"), (600L, 6L, "new")).toDF("id", "score", "tag"),
        Seq("id"),
        matched = Seq(graft.io.DeltaInterop.MatchedClause(None,
          Map("tag" -> lit("again")))),
        notMatched = Some((None, Map.empty)))
      assert(d2 == 1 && i2 == 1)
    } finally IcebergWrite.onBeforeCommit = () => ()
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 23) // 21 + race append + merge insert
    assert(t2.filter(col("tag") === "again").count() == 1)

    // race path 2: concurrent OVERWRITE replaced the referenced files
    // ⇒ the merge fails loudly, nothing masks in the new table
    var fired2 = false
    IcebergWrite.onBeforeCommit = () => if (!fired2) {
      fired2 = true
      IcebergWrite.onBeforeCommit = () => ()
      IcebergWrite.overwrite(Seq((700L, 7L, "ow")).toDF("id", "score", "tag"), dir)
    }
    try {
      val e = intercept[IllegalStateException](
        IcebergWrite.mergeInto(spark, dir,
          Seq((5L, 2L, "x")).toDF("id", "score", "tag"), Seq("id"),
          matched = Seq(graft.io.DeltaInterop.MatchedClause(None, Map.empty,
            delete = true)),
          notMatched = None))
      assert(e.getMessage.contains("replaced"), e.getMessage)
    } finally IcebergWrite.onBeforeCommit = () => ()
    val t3 = IcebergInterop.readIceberg(spark, dir)
    assert(t3.count() == 1 && t3.head().getLong(0) == 700L)
  }

  test("merge WHEN NOT MATCHED BY SOURCE: unmatched target rows update/delete, unpruned") {
    val dir = Files.createTempDirectory("graft-iceberg-write-bysrc").toString
    IcebergWrite.append(
      (0L until 20L).map(i => (i, i * 10L, s"r_$i")).toDF("id", "score", "tag")
        .repartitionByRange(4, col("id")), dir)
    // source covers only ids 5..7 — the key-range prune would drop the
    // by-source rows' files, so the by-source scan must be UNPRUNED
    val source = (5L to 7L).map(i => (i, 0L, "src")).toDF("id", "score", "tag")
    val (_, nDel, nIns) = IcebergWrite.mergeInto(spark, dir, source, Seq("id"),
      matched = Seq(graft.io.DeltaInterop.MatchedClause(None,
        Map("tag" -> lit("m")))),
      notMatched = None,
      notMatchedBySource = Seq(
        graft.io.DeltaInterop.MatchedClause(Some(col("t.id") < 3),
          Map.empty, delete = true),
        graft.io.DeltaInterop.MatchedClause(Some(col("t.id") >= 15),
          Map("tag" -> lit("stale")))))
    assert(nDel == 3 + 3 + 5, s"3 matched updates + 3 bs-deletes + 5 bs-updates: $nDel")
    assert(nIns == 0)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 17, "ids 0,1,2 deleted by the by-source clause")
    assert(t.filter(col("tag") === "m").count() == 3)
    assert(t.filter(col("tag") === "stale").count() == 5)
    assert(t.filter(col("id") === 10L).head().getString(2) == "r_10",
      "unclaimed rows stay untouched")
    // ONE atomic snapshot for the whole three-way delta
    assert(IcebergInterop.snapshots(spark, dir).count() == 2)
    // ...and the same shape as SQL
    val dir2 = Files.createTempDirectory("graft-iceberg-write-bysrc2").toString
    IcebergWrite.append(
      (0L until 20L).map(i => (i, i * 10L, s"r_$i")).toDF("id", "score", "tag"), dir2)
    source.createOrReplaceTempView("bysrc_src")
    val res = spark.sql(
      s"""MERGE INTO iceberg.`$dir2` AS t USING bysrc_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET tag = 'm'
         |WHEN NOT MATCHED BY SOURCE AND t.id < 3 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 15 THEN UPDATE SET tag = 'stale'
         |""".stripMargin).head()
    assert(res.getLong(0) == 11 && res.getLong(1) == 0)
    val t2 = IcebergInterop.readIceberg(spark, dir2)
    assert(t2.count() == 17 && t2.filter(col("tag") === "stale").count() == 5)
    spark.catalog.dropTempView("bysrc_src")
  }

  test("refs: tags pin snapshots across commits and expiry, branches move, main is protected") {
    val dir = Files.createTempDirectory("graft-iceberg-write-refs").toString
    val s1 = IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    IcebergWrite.createTag(spark, dir, "v1.0") // defaults to current
    val s2 = IcebergWrite.append(Seq((2L, "b")).toDF("id", "tag"), dir)
    IcebergWrite.createBranch(spark, dir, "audit", Some(s2))
    IcebergWrite.append(Seq((3L, "c")).toDF("id", "tag"), dir)
    // read BY REF: the tag still reads the v1 state after later commits
    assert(IcebergInterop.snapshotOfRef(spark, dir, "v1.0") == s1)
    assert(IcebergInterop.readIceberg(spark, dir,
      Some(IcebergInterop.snapshotOfRef(spark, dir, "v1.0"))).count() == 1)
    assert(IcebergInterop.readIceberg(spark, dir,
      Some(IcebergInterop.snapshotOfRef(spark, dir, "audit"))).count() == 2)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 3)
    // expiry keeps BOTH pinned snapshots; only unpinned history ages out
    Thread.sleep(5)
    val (expired, _) = IcebergWrite.expireSnapshots(spark, dir, 0L)
    assert(expired == 0, "every snapshot here is head- or ref-pinned")
    // a branch MOVES; dropping the tag releases its snapshot to expiry
    IcebergWrite.createBranch(spark, dir, "audit", Some(s1))
    assert(IcebergInterop.snapshotOfRef(spark, dir, "audit") == s1)
    IcebergWrite.dropRef(spark, dir, "v1.0")
    Thread.sleep(5)
    val (expired2, _) = IcebergWrite.expireSnapshots(spark, dir, 0L)
    assert(expired2 == 1, s"s2 (no longer pinned) expires: $expired2")
    assert(IcebergInterop.readIceberg(spark, dir,
      Some(IcebergInterop.snapshotOfRef(spark, dir, "audit"))).count() == 1)
    // SQL read-by-ref + metadata TVFs
    assert(spark.sql(s"SELECT count(*) FROM graft_iceberg_ref('$dir', 'audit')")
      .head().getLong(0) == 1)
    assert(spark.sql(s"SELECT sum(record_count) FROM graft_iceberg_files('$dir') " +
      "WHERE content = 0").head().getLong(0) == 3)
    assert(spark.sql(s"SELECT sum(record_count) FROM graft_iceberg_partitions('$dir')")
      .head().getLong(0) == 3)
    // guardrails: main refuses, dead snapshots refuse, unknown refs refuse
    intercept[IllegalArgumentException](
      IcebergWrite.createBranch(spark, dir, "main", Some(s1)))
    intercept[IllegalArgumentException](
      IcebergWrite.createTag(spark, dir, "ghost", Some(99999L)))
    intercept[IllegalArgumentException](
      IcebergInterop.snapshotOfRef(spark, dir, "nope"))
    intercept[IllegalArgumentException](
      IcebergWrite.dropRef(spark, dir, "nope"))
  }

  test("deletion-vector deletes: v3 upgrade, replacement union, compose, compact folds") {
    val dir = Files.createTempDirectory("graft-iceberg-write-dv").toString
    val s1 = IcebergWrite.append(
      (0L until 60L).map(i => (i, s"r_$i")).toDF("id", "tag")
        .repartitionByRange(3, col("id")), dir)
    val (_, n1) = IcebergWrite.deleteWhereDV(spark, dir, col("id") < 20,
      ranges = Map("id" -> ((0.0, 19.0))))
    assert(n1 == 20)
    assert(metaJson(dir, 2).path("format-version").asInt == 3,
      "a DV commit upgrades the table to v3 (one-way)")
    val t1 = IcebergInterop.readIceberg(spark, dir)
    assert(t1.count() == 40 && t1.agg(min("id")).head().getLong(0) == 20L)
    // the mask is a Puffin blob applied by the codegen bitmap filter —
    // no parquet delete file ever joins the scan
    assert(!t1.inputFiles.exists(_.contains("delete-")))
    assert(new java.io.File(s"$dir/data").list().exists(_.endsWith(".puffin")))
    // a second DV delete touching the SAME files: the replacement DV
    // unions the prior one (spec superset rule); deletes compose
    val (_, n2) = IcebergWrite.deleteWhereDV(spark, dir, col("id") % 10 === 5)
    assert(n2 == 4, s"ids 25,35,45,55 on the masked view: $n2")
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 36 && t2.filter(col("id") % 10 === 5).count() == 0)
    // time travel reads the pre-delete corpus; appends keep working
    assert(IcebergInterop.readIceberg(spark, dir, Some(s1)).count() == 60)
    IcebergWrite.append(Seq((100L, "new")).toDF("id", "tag"), dir)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 37)
    // compact folds the DVs physically; expiry reclaims the puffins
    IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    val t3 = IcebergInterop.readIceberg(spark, dir)
    assert(t3.count() == 37 && t3.filter(col("id") < 20).count() == 0)
    Thread.sleep(5)
    IcebergWrite.expireSnapshots(spark, dir, 0L)
    assert(!new java.io.File(s"$dir/data").list().exists(_.endsWith(".puffin")),
      "folded DV puffins must reclaim")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 37)
  }

  test("updateWhereDV: DV preimage mask + postimage append in one v3 snapshot") {
    val dir = Files.createTempDirectory("graft-iceberg-write-updv").toString
    IcebergWrite.append(
      (0L until 40L).map(i => (i, i * 10L, s"r_$i")).toDF("id", "score", "tag")
        .repartitionByRange(4, col("id")), dir)
    val (_, n1) = IcebergWrite.updateWhereDV(spark, dir, col("id") < 10,
      Map("score" -> (col("score") + 1000L)),
      ranges = Map("id" -> ((0.0, 9.0))))
    assert(n1 == 10)
    assert(metaJson(dir, 2).path("format-version").asInt == 3)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 40)
    assert(t.filter(col("id") < 10).agg(min("score")).head().getLong(0) == 1000L)
    // no parquet delete files anywhere — the preimage mask is a DV
    assert(!t.inputFiles.exists(_.contains("delete-")))
    assert(new java.io.File(s"$dir/data").list().exists(_.endsWith(".puffin")))
    // DV updates COMPOSE with DV deletes on the same files (union rule)
    val (_, n2) = IcebergWrite.deleteWhereDV(spark, dir, col("id") === 5L)
    assert(n2 == 1)
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 39 && t2.filter(col("id") === 5L).count() == 0)
    assert(t2.filter(col("id") < 10).agg(min("score")).head().getLong(0) == 1000L)
    // ONE snapshot per row delta
    assert(IcebergInterop.snapshots(spark, dir).count() == 3)
  }

  test("equality deletes: mask strictly-older data, re-appends survive, compact folds") {
    val dir = Files.createTempDirectory("graft-iceberg-write-eqdel").toString
    IcebergWrite.append(
      (0L until 30L).map(i => (i, s"r_$i")).toDF("id", "tag"), dir)
    def dataFileSet() = IcebergInterop.readIceberg(spark, dir)
      .inputFiles.filterNot(p => p.contains("/data/eqdelete-")).toSet
    val files0 = dataFileSet()
    // O(|keys|): no table scan, no data file rewrites
    val (_, nk) = IcebergWrite.equalityDelete(spark, dir,
      Seq(5L, 7L, 100L).toDF("id"))
    assert(nk == 3)
    val t1 = IcebergInterop.readIceberg(spark, dir)
    assert(t1.count() == 28, "ids 5 and 7 mask; 100 was never there")
    assert(t1.filter(col("id").isin(5L, 7L)).count() == 0)
    assert(dataFileSet() == files0, "equality delete must not touch data files")
    // a LATER append of a deleted key SURVIVES (data seq > delete seq)
    IcebergWrite.append(Seq((5L, "reborn")).toDF("id", "tag"), dir)
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 29)
    assert(t2.filter(col("id") === 5L).head().getString(1) == "reborn")
    // multi-column keys: (id, tag) tuple equality, null-safe
    val (_, nk2) = IcebergWrite.equalityDelete(spark, dir,
      Seq((3L, "r_3"), (4L, "not-the-tag")).toDF("id", "tag"))
    assert(nk2 == 2)
    val t3 = IcebergInterop.readIceberg(spark, dir)
    assert(t3.count() == 28, "only the exact (3, r_3) tuple masks")
    assert(t3.filter(col("id") === 4L).count() == 1)
    // compaction folds equality deletes physically
    IcebergWrite.compact(spark, dir)
    val t4 = IcebergInterop.readIceberg(spark, dir)
    assert(t4.count() == 28)
    assert(!t4.inputFiles.exists(_.contains("/data/eqdelete-")))
    assert(t4.filter(col("id") === 5L).head().getString(1) == "reborn")
    // unknown key column refuses loudly
    val e = intercept[IllegalArgumentException](
      IcebergWrite.equalityDelete(spark, dir, Seq(1L).toDF("nope")))
    assert(e.getMessage.contains("not in the table schema"), e.getMessage)
  }

  test("NULL partition values: sentinel decodes to null, contains_null summary, int column safe") {
    val dir = Files.createTempDirectory("graft-iceberg-write-nullpart").toString
    val rows = Seq((1L, "en", "a"), (2L, null, "b"), (3L, "de", "c"),
      (4L, null, "d")).toDF("id", "lang", "tag")
    IcebergWrite.appendPartitioned(rows, dir, "lang")
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 4)
    assert(t.filter(col("lang").isNull).count() == 2)
    // a value-targeted read still skips the OTHER value's manifest;
    // the null manifest never prunes (contains_null ⇒ no evidence)
    val en = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("lang" -> "en"))
    assert(en.count() == 1)
    val (read, skipped) = IcebergInterop.lastManifestScan
    assert(skipped >= 1, s"the de manifest must skip, read=$read skipped=$skipped")
    // int partition column with nulls: no NumberFormatException, reads whole
    val dir2 = Files.createTempDirectory("graft-iceberg-write-nullpart2").toString
    val rows2 = Seq((1L, java.lang.Integer.valueOf(7), "a"),
      (2L, null.asInstanceOf[java.lang.Integer], "b")).toDF("id", "bucket", "tag")
    IcebergWrite.appendPartitioned(rows2, dir2, "bucket")
    val t2 = IcebergInterop.readIceberg(spark, dir2)
    assert(t2.count() == 2 && t2.filter(col("bucket").isNull).count() == 1)
  }
}
