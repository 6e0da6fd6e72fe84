package graft

import java.nio.file.{Files, Paths}
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row tracking WRITE support (delta-io PROTOCOL.md "Row Tracking").
  *
  * The engine's contract: every NEW data file gets a fresh
  * `baseRowId` past the table's `delta.rowTracking` high watermark
  * and a `defaultRowCommitVersion`; files that merely gain a deletion
  * vector (or ride RESTORE/CLONE/checkpoint) keep their ids via the
  * round-tripped add fields. Merge-on-read makes this sound
  * everywhere: new files only ever hold logically NEW or MODIFIED
  * rows (the spec's fresh-id case); unmodified rows never change
  * files. DELETE/UPDATE/MERGE automatically route to the DV
  * merge-on-read paths on row-tracked tables, and compaction/ZORDER —
  * which genuinely move unmodified rows — MATERIALIZE the ids as
  * physical columns instead. */
class DeltaRowTrackingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** A foreign row-tracked table: one 3-row file with baseRowId 0,
    * watermark 2 — the shape a delta-spark writer leaves. */
  private def foreignFixture(): String = {
    val dir = Files.createTempDirectory("graft-rt").toString
    val staging = s"$dir/.stage"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .coalesce(1).write.parquet(staging)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    f.rename(part, new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val size = f.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet")).getLen
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}""",
      s"""{"metaData":{"id":"rt-spec","format":{"provider":"parquet","options":{}},"schemaString":${M.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},"createdTime":0}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":2}","removed":false}}""",
      s"""{"add":{"path":"data-0.parquet","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true,"baseRowId":0,"defaultRowCommitVersion":0,"stats":"{\\"numRecords\\":3,\\"minValues\\":{\\"id\\":1},\\"maxValues\\":{\\"id\\":3}}"}}""")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    dir
  }

  private def hwm(dir: String): Long = {
    val cfg = DeltaInterop.state(spark, dir)
      .domains(DeltaInterop.RowTrackingDomain)
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(cfg).path("rowIdHighWaterMark").asLong(-1L)
  }

  test("appends assign fresh contiguous row ids and advance the watermark") {
    val dir = foreignFixture()
    val v1 = DeltaInterop.writeDelta(
      (10L until 14L).map(i => (i, s"x$i")).toDF("id", "tag"), dir, Nil)
    val st1 = DeltaInterop.state(spark, dir)
    val newAdds = st1.files.filter(_.path != "data-0.parquet")
    assert(newAdds.nonEmpty)
    // every new add has a base past the fixture watermark of 2 and
    // stamps the commit version it landed in
    assert(newAdds.forall(_.baseRowId.exists(_ >= 3L)))
    assert(newAdds.forall(_.defaultRowCommitVersion.contains(v1)))
    // ranges are disjoint and contiguous: bases sorted, each next base
    // = previous base + previous numRecords
    val ranges = newAdds.map(a => (a.baseRowId.get, a.numRecords)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((b1, n1), (b2, _)) => assert(b2 == b1 + n1)
      case _ =>
    }
    assert(hwm(dir) == 2L + 4L)
    // the untouched original keeps its foreign base
    assert(st1.files.find(_.path == "data-0.parquet")
      .get.baseRowId.contains(0L))
    // a second append continues past the new watermark
    DeltaInterop.writeDelta(Seq((99L, "z")).toDF("id", "tag"), dir, Nil)
    assert(hwm(dir) == 7L)
    val last = DeltaInterop.state(spark, dir).files
      .maxBy(_.baseRowId.getOrElse(-1L))
    assert(last.baseRowId.contains(7L) && last.numRecords == 1L)
  }

  test("DELETE routes merge-on-read: the DV'd file keeps its row ids") {
    val dir = foreignFixture()
    val (v, files) = DeltaInterop.deleteWhere(spark, dir, col("id") === 2L)
    assert(v > 0 && files == 1)
    val st = DeltaInterop.state(spark, dir)
    val a = st.files.find(_.path == "data-0.parquet").get
    // merge-on-read: same path, DV attached, foreign base PRESERVED
    assert(a.deletionVector != null)
    assert(a.baseRowId.contains(0L) && a.defaultRowCommitVersion.contains(0L))
    assert(DeltaInterop.readDelta(spark, dir).count() == 2)
    // no new data files → watermark unchanged
    assert(hwm(dir) == 2L)
  }

  test("UPDATE routes merge-on-read: postimage files get fresh ids") {
    val dir = foreignFixture()
    val (v, _) = DeltaInterop.updateWhere(spark, dir, col("id") === 3L,
      Map("tag" -> lit("upd")))
    assert(v > 0)
    val st = DeltaInterop.state(spark, dir)
    val orig = st.files.find(_.path == "data-0.parquet").get
    assert(orig.deletionVector != null && orig.baseRowId.contains(0L))
    val post = st.files.filter(_.path != "data-0.parquet")
    assert(post.nonEmpty && post.forall(_.baseRowId.exists(_ >= 3L)))
    assert(post.forall(_.defaultRowCommitVersion.contains(v)))
    assert(hwm(dir) == 2L + post.map(_.numRecords).sum)
    val rows = DeltaInterop.readDelta(spark, dir).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("a", "b", "upd"))
  }

  test("MERGE routes merge-on-read: matched rows DV-mask, postimages+inserts get fresh ids") {
    val dir = foreignFixture()
    val (v, masked, inserted) = DeltaInterop.merge(spark, dir,
      Seq((2L, "m2"), (9L, "i9")).toDF("id", "tag"), Seq("id"))
    assert(v > 0 && masked == 1 && inserted == 1)
    val st = DeltaInterop.state(spark, dir)
    val orig = st.files.find(_.path == "data-0.parquet").get
    // the matched row is MASKED in place — foreign base preserved, the
    // unmodified neighbours (1, 3) never moved files
    assert(orig.deletionVector != null && orig.baseRowId.contains(0L))
    val fresh = st.files.filter(_.path != "data-0.parquet")
    assert(fresh.nonEmpty && fresh.forall(_.baseRowId.exists(_ >= 3L)))
    assert(fresh.forall(_.defaultRowCommitVersion.contains(v)))
    assert(hwm(dir) == 2L + fresh.map(_.numRecords).sum)
    assert(DeltaInterop.readDelta(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "m2"), (3L, "c"), (9L, "i9")))
  }

  test("clause MERGE merge-on-read: delete/update/insert/by-source; full file death drops the add") {
    val dir = foreignFixture()
    // id 2 deletes (matched+cond), id 3 updates, id 9 inserts, id 1
    // deletes by-source → every original row fires a clause, so
    // data-0.parquet dies outright (remove, no DV'd re-add)
    val (v, masked, inserted) = DeltaInterop.mergeClauses(spark, dir,
      Seq((2L, "s2"), (3L, "s3"), (9L, "s9")).toDF("id", "tag"), Seq("id"),
      matched = Seq(
        DeltaInterop.MatchedClause(Some(col("t.tag") === "b"), Map.empty, delete = true),
        DeltaInterop.MatchedClause(None, Map("tag" -> lit("u")))),
      notMatched = Some((None, Map.empty)),
      notMatchedBySource = Seq(
        DeltaInterop.MatchedClause(Some(col("t.tag") === "a"), Map.empty, delete = true)))
    assert(v > 0 && masked == 1 && inserted == 1)
    val st = DeltaInterop.state(spark, dir)
    assert(!st.files.exists(_.path == "data-0.parquet"))
    assert(st.files.forall(_.deletionVector == null))
    assert(st.files.forall(_.baseRowId.exists(_ >= 3L)))
    assert(hwm(dir) == 2L + st.files.map(_.numRecords).sum)
    assert(DeltaInterop.readDelta(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((3L, "u"), (9L, "s9")))
  }

  test("checkpoint round-trips ids after cleanup") {
    val dir = foreignFixture()
    DeltaInterop.writeDelta(Seq((50L, "y")).toDF("id", "tag"), dir, Nil)
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    val st = DeltaInterop.state(spark, dir)
    assert(st.files.find(_.path == "data-0.parquet").get.baseRowId.contains(0L))
    assert(st.files.exists(_.baseRowId.contains(3L)))
    assert(hwm(dir) == 3L)
  }

  test("compaction MATERIALIZES row ids: moved rows keep them, readers unaffected") {
    val dir = foreignFixture()
    val vApp = DeltaInterop.writeDelta(Seq((50L, "y")).toDF("id", "tag"), dir, Nil)
    val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
    val (vOpt, rewritten, created) = DeltaInterop.compact(spark, dir)
    assert(vOpt > vApp && rewritten == 2 && created == 1)
    val st = DeltaInterop.state(spark, dir)
    // the column names registered once in the table config
    val ridCol = st.configuration("delta.rowTracking.materializedRowIdColumnName")
    val rverCol = st.configuration("delta.rowTracking.materializedRowCommitVersionColumnName")
    // graft reads pin the logical schema — the physical extras invisible
    val after = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
    assert(after == before)
    assert(DeltaInterop.readDelta(spark, dir).columns.toSeq == Seq("id", "tag"))
    // the compacted file PHYSICALLY carries the original ids: fixture
    // rows had 0..2 (base 0), the appended row 3
    val compacted = st.files.filterNot(_.path == "data-0.parquet")
    assert(compacted.length == 1)
    val phys = spark.read.parquet(s"$dir/${compacted.head.path}")
    assert(phys.columns.contains(ridCol) && phys.columns.contains(rverCol))
    assert(phys.select(ridCol).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
    assert(phys.filter(col(ridCol) === 3L).select(rverCol)
      .head().getLong(0) == vApp)
    // the compacted ADD still takes a fresh base past the watermark —
    // readers prefer the materialized ids; the watermark advanced
    assert(compacted.head.baseRowId.exists(_ >= 4L))
    assert(hwm(dir) == 7L) // 4 prior ids + 4 fresh compacted-range ids
    // a SECOND compact keeps the materialized ids (coalesce prefers
    // the existing column over base+index)
    DeltaInterop.writeDelta(Seq((60L, "z")).toDF("id", "tag"), dir, Nil)
    DeltaInterop.compact(spark, dir)
    val st2 = DeltaInterop.state(spark, dir)
    val phys2 = spark.read.parquet(s"$dir/${st2.files.head.path}")
    assert(phys2.filter(col("id") <= 3L).select(ridCol)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("compaction PURGES deletion vectors on row-tracked tables; surviving ids keep their gaps") {
    val dir = foreignFixture()
    DeltaInterop.writeDelta(Seq((50L, "y")).toDF("id", "tag"), dir, Nil)
    DeltaInterop.deleteWhere(spark, dir, col("id") === 2L) // DV on data-0, rid 1 dies
    assert(DeltaInterop.state(spark, dir).files.exists(_.deletionVector != null))
    val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
    DeltaInterop.compact(spark, dir)
    val st = DeltaInterop.state(spark, dir)
    // the vector is GONE — merge-on-read tables can only purge here
    assert(st.files.forall(_.deletionVector == null),
      "compaction must purge the deletion vectors")
    assert(DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq == before)
    // survivors keep their ORIGINAL ids — the deleted row's id 1 is a
    // permanent gap (ids are never reused)
    val ridCol = st.configuration("delta.rowTracking.materializedRowIdColumnName")
    val phys = spark.read.parquet(s"$dir/${st.files.head.path}")
    assert(phys.select(ridCol).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 2L, 3L))
  }

  test("SET TBLPROPERTIES delta.enableRowTracking=true backfills existing files") {
    val dir = Files.createTempDirectory("graft-rt-enable").toString + "/t"
    DeltaInterop.writeDelta((0L until 6L).map(i => (i, s"v$i")).toDF("id", "tag"),
      dir, Nil)
    DeltaInterop.writeDelta(Seq((6L, "v6")).toDF("id", "tag"), dir, Nil)
    val before = DeltaInterop.state(spark, dir)
    assert(before.files.forall(_.baseRowId.isEmpty))
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableRowTracking" -> "true"))
    val st = DeltaInterop.state(spark, dir)
    assert(st.protocol.writerFeatures.contains("rowTracking"))
    assert(st.protocol.writerFeatures.contains("domainMetadata"))
    // every live file backfilled with a disjoint contiguous range
    assert(st.files.forall(_.baseRowId.isDefined))
    val ranges = st.files.map(a => (a.baseRowId.get, a.numRecords)).sortBy(_._1)
    assert(ranges.head._1 == 0L)
    ranges.sliding(2).foreach {
      case Seq((b1, n1), (b2, _)) => assert(b2 == b1 + n1)
      case _ =>
    }
    assert(hwm(dir) == 6L) // 7 rows → ids 0..6
    // data unchanged; appends continue past the backfilled watermark
    assert(DeltaInterop.readDelta(spark, dir).count() == 7)
    DeltaInterop.writeDelta(Seq((7L, "v7")).toDF("id", "tag"), dir, Nil)
    assert(hwm(dir) == 7L)
  }

  test("ZORDER on a row-tracked table materializes ids through the re-layout") {
    val dir = foreignFixture()
    DeltaInterop.writeDelta((100L until 140L).map(i => (i, s"t$i")).toDF("id", "tag"),
      dir, Nil)
    DeltaInterop.deleteWhere(spark, dir, col("id") === 3L) // DV; rid 2 dies
    val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
    val (v, rewritten, _) = DeltaInterop.optimizeZOrder(spark, dir, Seq("id"))
    assert(v > 0 && rewritten >= 2)
    val st = DeltaInterop.state(spark, dir)
    assert(st.files.forall(_.deletionVector == null), "ZORDER must purge DVs on rt tables")
    assert(DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq == before)
    val ridCol = st.configuration("delta.rowTracking.materializedRowIdColumnName")
    // fixture rows (ids 0,1 surviving; 2 deleted) + appended 3..42 —
    // materialized ids cover them all with the gap at 2
    val ids = st.files.map(a => spark.read.parquet(s"$dir/${a.path}")
      .select(ridCol).collect().map(_.getLong(0)).toSeq).reduce(_ ++ _).sorted
    assert(ids == ((0L to 42L).filterNot(_ == 2L)))
  }

  test("shallow clone preserves row ids and the watermark domain") {
    val dir = foreignFixture()
    DeltaInterop.writeDelta(Seq((10L, "x")).toDF("id", "tag"), dir, Nil)
    val dst = Files.createTempDirectory("graft-rt-clone").toString + "/c"
    DeltaInterop.shallowClone(spark, dir, dst)
    val st = DeltaInterop.state(spark, dst)
    assert(st.files.forall(_.baseRowId.isDefined))
    assert(st.files.map(_.baseRowId.get).sorted == Seq(0L, 3L))
    assert(hwm(dst) == 3L)
    // appends to the CLONE continue its watermark independently
    DeltaInterop.writeDelta(Seq((20L, "c")).toDF("id", "tag"), dst, Nil)
    assert(hwm(dst) == 4L)
    assert(hwm(dir) == 3L)
  }

  test("zero-record adds in one commit get UNIQUE base row ids") {
    // an empty postimage/insert file in a row-tracked MERGE must not
    // share its baseRowId with the next add in the same commit —
    // per-file bases stay unique, not merely disjoint-because-empty
    import graft.io.DeltaInterop.{AddFile, DeltaState}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val st = DeltaState(0L, StructType(Seq(StructField("id", LongType))),
      Nil, Nil, domains = Map(DeltaInterop.RowTrackingDomain ->
        """{"rowIdHighWaterMark":9}"""))
    def add(p: String, n: Long) =
      AddFile(p, Map.empty, 1L, n, Map.empty)
    val (stamped, domain) = DeltaInterop.assignFreshRowIds(
      st, Seq(add("e0.parquet", 0L), add("e1.parquet", 0L),
              add("d.parquet", 5L), add("e2.parquet", 0L)), 1L)
    val bases = stamped.map(_.baseRowId.get)
    assert(bases.distinct.length == bases.length, s"duplicate bases: $bases")
    assert(bases.head == 10L, "first fresh id is hwm+1")
    // the watermark advanced past every assigned base
    val hwmOut = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(domain.head).path("domainMetadata").path("configuration").asText())
      .path("rowIdHighWaterMark").asLong(-1L)
    assert(hwmOut >= bases.max)
  }
}
