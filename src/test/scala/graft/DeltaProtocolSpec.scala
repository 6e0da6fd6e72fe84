package graft

import java.nio.file.{Files, Paths}
import graft.io.DeltaInterop
import graft.io.DeltaInterop.Protocol
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// hand-emitted V2-checkpoint fixture shapes (top-level for Encoder
// derivation; the PRODUCTION CpRow stays classic — graft never WRITES v2)
case class V2Format(provider: String, options: Map[String, String])
case class V2Meta(id: String, format: V2Format, schemaString: String,
                  partitionColumns: Seq[String],
                  configuration: Map[String, String], createdTime: Long)
case class V2Protocol(minReaderVersion: Int, minWriterVersion: Int,
                      readerFeatures: Seq[String], writerFeatures: Seq[String])
case class V2Add(path: String, partitionValues: Map[String, String], size: Long,
                 modificationTime: Long, dataChange: Boolean, stats: String)
case class V2CpMeta(version: Long)
case class V2Sidecar(path: String, sizeInBytes: Long, modificationTime: Long)
case class V2Row(checkpointMetadata: V2CpMeta = null, protocol: V2Protocol = null,
                 metaData: V2Meta = null, add: V2Add = null, sidecar: V2Sidecar = null)
case class V2SideRow(add: V2Add = null, remove: V2Add = null)

/** Protocol-evolution tracking (PROTOCOL.md "Protocol Evolution"):
  * replay is last-protocol-wins, so every upgrade graft emits must be
  * max(current, required) — a CDF enable on a deletion-vector table
  * that re-emitted the CDF floor (1,4) would DOWNGRADE the table and
  * let a spec-compliant foreign reader resurrect DV-deleted rows.
  * Also the read/write gates: reader/writer requirements this engine
  * does not implement are refused BY NAME, never silently misread. */
class DeltaProtocolSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("Protocol.merge: version max, legacy features made explicit at v7") {
    // legacy ∪ legacy stays legacy
    assert(Protocol(1, 2).merge(Protocol.Cdf) == Protocol(1, 4))
    assert(Protocol.ColumnMapping.merge(Protocol.Cdf) == Protocol(2, 5))
    // CDF floor merged into a v7 table lists changeDataFeed explicitly
    val dvThenCdf = Protocol.DeletionVectors.merge(Protocol.Cdf)
    assert(dvThenCdf.minReader == 3 && dvThenCdf.minWriter == 7)
    assert(dvThenCdf.writerFeatures.contains("changeDataFeed"))
    assert(dvThenCdf.writerFeatures.contains("deletionVectors"))
    assert(dvThenCdf.readerFeatures == Set("deletionVectors"))
    // column mapping merged into v7 lands in BOTH feature lists
    val dvThenCm = Protocol.DeletionVectors.merge(Protocol.ColumnMapping)
    assert(dvThenCm.readerFeatures == Set("deletionVectors", "columnMapping"))
    assert(dvThenCm.writerFeatures.contains("columnMapping"))
    // merge never downgrades, in either argument order
    assert(Protocol.Cdf.merge(Protocol.DeletionVectors).minWriter == 7)
    // idempotent
    assert(dvThenCdf.merge(Protocol.Cdf) == dvThenCdf)
  }

  test("enabling CDF on a DV table upgrades, never downgrades") {
    val dir = Files.createTempDirectory("graft-proto-cdf-dv").toString
    DeltaInterop.writeDelta((0L until 20L).map(i => (i, s"n_$i")).toDF("id", "name"),
      dir, Nil)
    DeltaInterop.deleteWhereDV(spark, dir, col("id") < 5L)
    val before = DeltaInterop.state(spark, dir).protocol
    assert(before.minReader == 3 && before.minWriter == 7)
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    val after = DeltaInterop.state(spark, dir).protocol
    assert(after.minReader == 3 && after.minWriter == 7,
      s"CDF enable downgraded the protocol to $after")
    assert(after.readerFeatures.contains("deletionVectors"))
    assert(after.writerFeatures.contains("changeDataFeed"),
      "v7 features are explicit — enabling CDF must list it")
    // the DV mask must survive the property commit
    assert(DeltaInterop.readDelta(spark, dir).count() == 15)
  }

  test("enabling CDF on a column-mapped table keeps (2,5) — writer 5 already covers CDF") {
    val dir = Files.createTempDirectory("graft-proto-cdf-cm").toString
    DeltaInterop.writeDelta((0L until 10L).map(i => (i, s"n_$i")).toDF("id", "name"),
      dir, Nil)
    DeltaInterop.renameColumn(spark, dir, "name", "label")
    assert(DeltaInterop.state(spark, dir).protocol == Protocol(2, 5))
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    val after = DeltaInterop.state(spark, dir).protocol
    assert(after == Protocol(2, 5), s"CDF enable changed (2,5) to $after")
    assert(DeltaInterop.readDelta(spark, dir).columns.contains("label"))
  }

  test("DV ops on a column-mapped table carry columnMapping into the v7 features") {
    val dir = Files.createTempDirectory("graft-proto-dv-cm").toString
    DeltaInterop.writeDelta((0L until 20L).map(i => (i, s"n_$i")).toDF("id", "name"),
      dir, Nil)
    DeltaInterop.renameColumn(spark, dir, "name", "label")
    DeltaInterop.deleteWhereDV(spark, dir, col("id") < 5L)
    val p = DeltaInterop.state(spark, dir).protocol
    assert(p.minReader == 3 && p.minWriter == 7)
    assert(p.readerFeatures == Set("columnMapping", "deletionVectors"),
      s"reader features dropped a requirement: $p")
    assert(p.writerFeatures.contains("columnMapping") &&
      p.writerFeatures.contains("deletionVectors"))
    // and the read still resolves: mapping + mask together
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.columns.contains("label") && t.count() == 15)
  }

  test("checkpoints persist the replayed protocol — the only source after cleanup") {
    val dir = Files.createTempDirectory("graft-proto-cp").toString
    DeltaInterop.writeDelta((0L until 20L).map(i => (i, s"n_$i")).toDF("id", "name"),
      dir, Nil, overwrite = false, checkpointInterval = 0)
    DeltaInterop.renameColumn(spark, dir, "name", "label")
    DeltaInterop.deleteWhereDV(spark, dir, col("id") < 5L)
    val before = DeltaInterop.state(spark, dir).protocol
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    // drop the checkpoint version's own JSON too: replay can ONLY come
    // from the checkpoint parquet
    val st0 = DeltaInterop.state(spark, dir)
    Files.deleteIfExists(Paths.get(dir, "_delta_log", f"${st0.version}%020d.json"))
    val replayed = DeltaInterop.state(spark, dir)
    assert(replayed.protocol == before,
      s"checkpoint lost the protocol: $before -> ${replayed.protocol}")
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.columns.contains("label") && t.count() == 15,
      "a checkpoint-resumed reader must still honor column mapping AND the DV mask")
  }

  private def writeForeignLog(dir: String, protocolJson: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = M.createObjectNode(); val m = md.putObject("metaData")
    m.put("id", "foreign-fixture")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns"); m.putObject("configuration"); m.put("createdTime", 0L)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (Seq(protocolJson, M.writeValueAsString(md)).mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("unsupported reader features are refused BY NAME (variantShredding)") {
    val dir = Files.createTempDirectory("graft-proto-vs").toString
    writeForeignLog(dir,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantShredding-preview","deletionVectors"],"writerFeatures":["variantShredding-preview","deletionVectors"]}}""")
    val e = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, dir))
    assert(e.getMessage.contains("variantShredding-preview"),
      s"error must name the missing feature: ${e.getMessage}")
    // the supported deletionVectors feature must not be in the BLAMED list
    assert(e.getMessage.contains("feature(s): variantShredding-preview —"),
      s"supported features must not be blamed: ${e.getMessage}")
  }

  test("a minReaderVersion beyond 3 is refused with the version named") {
    val dir = Files.createTempDirectory("graft-proto-r4").toString
    writeForeignLog(dir, """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}""")
    val e = intercept[IllegalArgumentException](DeltaInterop.readDelta(spark, dir))
    assert(e.getMessage.contains("minReaderVersion=4"))
  }

  test("unsupported writer features refuse WRITES by name but allow reads") {
    val dir = Files.createTempDirectory("graft-proto-unkfeat").toString
    writeForeignLog(dir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["someFutureFeature","appendOnly","invariants"]}}""")
    // reads are fine: an unknown WRITER feature gates writers only
    assert(DeltaInterop.readDelta(spark, dir).count() == 0)
    val e = intercept[IllegalArgumentException](
      DeltaInterop.writeDelta(Seq(1L).toDF("id"), dir, Nil))
    assert(e.getMessage.contains("someFutureFeature"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.deleteWhere(spark, dir, col("id") === 1L))
    assert(e2.getMessage.contains("someFutureFeature"))
    // a checkpoint is a WRITE of state: the fixed checkpoint schema
    // would silently drop feature-required add fields — refuse by name
    val e3 = intercept[IllegalArgumentException](
      DeltaInterop.checkpoint(spark, dir))
    assert(e3.getMessage.contains("someFutureFeature"), e3.getMessage)
  }

  test("a REALISTIC rowTracking table reads green: baseRowId adds + domainMetadata tolerated") {
    // the shape a delta-spark ≥3.x writer leaves with
    // delta.enableRowTracking=true: writer features rowTracking +
    // domainMetadata, a delta.rowTracking domain-metadata action (row-id
    // high watermark), and per-add baseRowId/defaultRowCommitVersion
    // fields. None of it changes PLAIN-scan semantics — reads must work,
    // writes must keep refusing by name (graft assigns no row ids).
    val dir = Files.createTempDirectory("graft-proto-rowtrack-real").toString
    // a real data file, moved into place under a known name
    val staging = s"$dir/.stage"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .coalesce(1).write.parquet(staging)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    f.rename(part, new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val size = f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet")).getLen
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}""",
      s"""{"metaData":{"id":"rt-fixture","format":{"provider":"parquet","options":{}},"schemaString":${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},"createdTime":0}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":2}","removed":false}}""",
      s"""{"add":{"path":"data-0.parquet","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true,"baseRowId":0,"defaultRowCommitVersion":0,"stats":"{\\"numRecords\\":3,\\"minValues\\":{\\"id\\":1},\\"maxValues\\":{\\"id\\":3}}"}}""")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    // plain reads work: row tracking is a WRITER concern
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 3 && t.columns.toSeq == Seq("id", "tag"))
    // stats-pruned reads work too (the extra add fields ride along)
    assert(DeltaInterop.readDeltaWhere(spark, dir,
      ranges = Map("id" -> ((2.0, 3.0)))).count() == 2)
    assert(DeltaInterop.history(spark, dir).count() == 1)
    // writes WORK and assign fresh row ids (DeltaRowTrackingSpec has
    // the full matrix); the watermark advances past the fixture's 2
    DeltaInterop.writeDelta(Seq((9L, "z")).toDF("id", "tag"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() == 4)
  }

  test("icebergCompat tables READ green (writer-side feature); FOREIGN uniform writes refuse") {
    // delta-spark's UniForm tables carry icebergCompatV1/V2 as WRITER
    // features — the obligation (keeping the Iceberg mirror in sync)
    // is honored only for tables whose mirror THIS engine seeded
    // (IcebergUniformSpec); a FOREIGN uniform table's metadata/ is
    // owned by delta-spark's converter, so plain reads must work and
    // writes must refuse rather than let the mirror go stale
    val dir = Files.createTempDirectory("graft-proto-icebergcompat").toString
    writeForeignLog(dir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV2"]}}""")
    DeltaInterop.readDelta(spark, dir) // schema-only empty table reads
    val e = intercept[IllegalArgumentException](
      DeltaInterop.writeDelta(Seq(1L).toDF("id"), dir, Nil))
    assert(e.getMessage.contains("foreign icebergCompat"), e.getMessage)
  }

  test("clustered tables: CLUSTER BY domain survives checkpoint+cleanup and clone; OPTIMIZE clusters") {
    val dir = Files.createTempDirectory("graft-proto-cluster").toString
    DeltaInterop.writeDelta(
      (0L until 300L).map(i => (i, i % 7, s"t_$i")).toDF("id", "grp", "tag")
        .repartition(3), dir, Nil)
    DeltaInterop.setClusteringColumns(spark, dir, Seq("id", "grp"))
    var st = DeltaInterop.state(spark, dir)
    assert(st.clusteringColumns == Seq("id", "grp"))
    assert(st.protocol.writerFeatures.contains("clustering") &&
      st.protocol.writerFeatures.contains("domainMetadata"))
    // appends need not cluster (spec) — they just commit
    DeltaInterop.writeDelta(
      (300L until 350L).map(i => (i, i % 7, s"t_$i")).toDF("id", "grp", "tag"), dir, Nil)
    // plain OPTIMIZE on a clustered table clusters by the DECLARED cols
    val (_, removed, added) = DeltaInterop.optimizeClustered(spark, dir)
    assert(removed > 0 && added > 0)
    st = DeltaInterop.state(spark, dir)
    assert(st.files.nonEmpty && st.files.forall(_.clusteringProvider == "graft-zorder"),
      "rewritten files record the clustering implementation")
    // the domain must survive the checkpoint becoming the ONLY state source
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    st = DeltaInterop.state(spark, dir)
    assert(st.clusteringColumns == Seq("id", "grp"),
      "clustering domain must survive checkpoint + log cleanup")
    assert(st.files.forall(_.clusteringProvider == "graft-zorder"),
      "clusteringProvider must survive checkpoint re-serialization")
    assert(DeltaInterop.readDelta(spark, dir).count() == 350)
    // a shallow clone is still a clustered table
    val clone = Files.createTempDirectory("graft-proto-cluster-clone").toString + "/c"
    DeltaInterop.shallowClone(spark, dir, clone)
    assert(DeltaInterop.state(spark, clone).clusteringColumns == Seq("id", "grp"))
    // row ops stay legal on clustered tables
    DeltaInterop.deleteWhereDV(spark, dir, col("id") === 5L)
    assert(DeltaInterop.readDelta(spark, dir).count() == 349)
    // clustering refuses on partitioned tables (mutually exclusive)
    val pDir = Files.createTempDirectory("graft-proto-cluster-part").toString
    DeltaInterop.writeDelta(
      Seq((1L, "a"), (2L, "b")).toDF("id", "p"), pDir, Seq("p"))
    val e = intercept[IllegalArgumentException](
      DeltaInterop.setClusteringColumns(spark, pDir, Seq("id")))
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("a FOREIGN liquid-clustered table appends green; the foreign domain + provider are preserved") {
    val dir = Files.createTempDirectory("graft-proto-cluster-foreign").toString
    // a real data file under a known name, like a delta-spark writer leaves
    val staging = s"$dir/.stage"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .coalesce(1).write.parquet(staging)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    f.rename(part, new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val size = f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/data-0.parquet")).getLen
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["clustering","domainMetadata"]}}""",
      s"""{"metaData":{"id":"cl-fixture","format":{"provider":"parquet","options":{}},"schemaString":${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{},"createdTime":0}}""",
      """{"domainMetadata":{"domain":"delta.clustering","configuration":"{\"clusteringColumns\":[[\"id\"]]}","removed":false}}""",
      s"""{"add":{"path":"data-0.parquet","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true,"clusteringProvider":"liquid","stats":"{\\"numRecords\\":3}"}}""")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    assert(DeltaInterop.readDelta(spark, dir).count() == 3)
    val st0 = DeltaInterop.state(spark, dir)
    assert(st0.clusteringColumns == Seq("id"))
    assert(st0.files.head.clusteringProvider == "liquid")
    // graft appends to the foreign clustered table
    DeltaInterop.writeDelta(Seq((4L, "d")).toDF("id", "tag"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() == 4)
    // checkpoint preserves the FOREIGN provider string and the domain
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    val st = DeltaInterop.state(spark, dir)
    assert(st.clusteringColumns == Seq("id"))
    assert(st.files.find(_.path == "data-0.parquet")
      .exists(_.clusteringProvider == "liquid"))
    assert(DeltaInterop.readDelta(spark, dir).count() == 4)
  }

  test("in-commit timestamps are MONOTONE and preferred by time travel") {
    val dir = Files.createTempDirectory("graft-proto-ict").toString
    // rapid commits: wall-clock ms can collide; ICTs must still
    // strictly increase
    (0 until 5).foreach { i =>
      DeltaInterop.writeDelta(Seq((i.toLong, s"n_$i")).toDF("id", "name"), dir, Nil)
    }
    val icts = (0L to 4L).map(v => DeltaInterop.commitMeta(spark, dir, v))
    assert(icts.forall(_.ict.isDefined), "every graft commit carries an ICT")
    val ts = icts.map(_.ict.get)
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b },
      s"ICTs must strictly increase: $ts")
    // timestamp time travel resolves by ICT
    assert(DeltaInterop.versionAtTimestamp(spark, dir, ts(2)) == 2L)
    // a FOREIGN table carrying the feature accepts graft appends
    val fDir = Files.createTempDirectory("graft-proto-ict-foreign").toString
    writeForeignLog(fDir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["inCommitTimestamp"]}}""")
    DeltaInterop.writeDelta(Seq(1L).toDF("id"), fDir, Nil)
    assert(DeltaInterop.readDelta(spark, fDir).count() == 1)
    assert(DeltaInterop.commitMeta(spark, fDir, 1L).ict.isDefined)
  }

  test("vacuumProtocolCheck tables read, write, and vacuum (the check IS the gate)") {
    val dir = Files.createTempDirectory("graft-proto-vpc").toString
    writeForeignLog(dir,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["vacuumProtocolCheck"]}}""")
    DeltaInterop.writeDelta((0L until 10L).toDF("id"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() == 10)
    // overwrite orphans the first files; once the log horizon passes
    // them, vacuum (with its protocol check) reclaims them
    DeltaInterop.writeDelta((0L until 5L).toDF("id"), dir, Nil, overwrite = true)
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    val n = DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
    assert(n > 0, "vacuum reclaimed the overwritten files")
    assert(DeltaInterop.readDelta(spark, dir).count() == 5)
  }

  test("delta.appendOnly blocks row-removing ops; appends and compaction stay legal") {
    val dir = Files.createTempDirectory("graft-proto-appendonly").toString
    DeltaInterop.writeDelta((0L until 20L).toDF("id").repartition(2), dir, Nil)
    DeltaInterop.setTableProperties(spark, dir, Map("delta.appendOnly" -> "true"))
    def blocked(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("delta.appendOnly"), e.getMessage)
    }
    blocked(DeltaInterop.deleteWhere(spark, dir, col("id") < 5L))
    blocked(DeltaInterop.deleteWhereDV(spark, dir, col("id") < 5L))
    blocked(DeltaInterop.updateWhere(spark, dir, col("id") < 5L, Map("id" -> lit(99L))))
    blocked(DeltaInterop.updateWhereDV(spark, dir, col("id") < 5L, Map("id" -> lit(99L))))
    blocked(DeltaInterop.merge(spark, dir, Seq(1L).toDF("id"), Seq("id")))
    blocked(DeltaInterop.writeDelta(Seq(100L).toDF("id"), dir, Nil, overwrite = true))
    // appends and dataChange=false layout rewrites remain legal
    DeltaInterop.writeDelta((20L until 30L).toDF("id"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() == 30)
    val (_, in, out) = DeltaInterop.compact(spark, dir)
    assert(in > 0 && out > 0, s"compaction should stay legal ($in -> $out)")
    blocked(DeltaInterop.restore(spark, dir, 0L))
    assert(DeltaInterop.readDelta(spark, dir).count() == 30)
  }

  // ---- V2 checkpoints (reader feature `v2Checkpoint`) ----

  private def writeSingleParquet(df: org.apache.spark.sql.DataFrame,
                                 target: java.nio.file.Path): Long = {
    val staging = Files.createTempDirectory("v2cp-stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(target.getParent)
    Files.move(part.toPath, target)
    Files.size(target)
  }

  /** A minimal v2Checkpoint table: one 3-row data file, a v2 checkpoint
    * at v0 in the requested form (`inline` actions, `sidecar` files, or
    * a `json` main file), and the v0 commit JSON DELETED — the v2
    * checkpoint is the only way in. */
  private def v2Fixture(kind: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-v2cp-$kind").toString
    val rel = "part-v2cp-0.parquet"
    val size = writeSingleParquet(Seq(1L, 2L, 3L).toDF("id"), Paths.get(dir, rel))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val proto = V2Protocol(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint"))
    val meta = V2Meta("v2cp-fixture", V2Format("parquet", Map.empty), schema.json,
      Nil, Map.empty, 0L)
    val add = V2Add(rel, Map.empty, size, 0L, dataChange = true, """{"numRecords":3}""")
    // v0 commit (deleted below — written so the layout is a real table)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    def addJson: String = {
      val n = M.createObjectNode(); val a = n.putObject("add")
      a.put("path", rel); a.putObject("partitionValues"); a.put("size", size)
      a.put("modificationTime", 0L); a.put("dataChange", true)
      a.put("stats", """{"numRecords":3}""")
      M.writeValueAsString(n)
    }
    def metaJson: String = {
      val n = M.createObjectNode(); val m = n.putObject("metaData")
      m.put("id", "v2cp-fixture")
      val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
      m.put("schemaString", schema.json)
      m.putArray("partitionColumns"); m.putObject("configuration"); m.put("createdTime", 0L)
      M.writeValueAsString(n)
    }
    val protoJson =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.writeString(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      Seq(protoJson, metaJson, addJson).mkString("", "\n", "\n"))
    val uuid = java.util.UUID.randomUUID().toString
    val cpBase = f"${0L}%020d.checkpoint.$uuid"
    kind match {
      case "inline" =>
        writeSingleParquet(Seq(
          V2Row(checkpointMetadata = V2CpMeta(0L)), V2Row(protocol = proto),
          V2Row(metaData = meta), V2Row(add = add)).toDF(),
          Paths.get(dir, "_delta_log", s"$cpBase.parquet"))
      case "sidecar" =>
        val scSize = writeSingleParquet(Seq(V2SideRow(add = add)).toDF(),
          Paths.get(dir, "_delta_log", "_sidecars", "sc-1.parquet"))
        writeSingleParquet(Seq(
          V2Row(checkpointMetadata = V2CpMeta(0L)), V2Row(protocol = proto),
          V2Row(metaData = meta),
          V2Row(sidecar = V2Sidecar("sc-1.parquet", scSize, 0L))).toDF(),
          Paths.get(dir, "_delta_log", s"$cpBase.parquet"))
      case "json" =>
        Files.writeString(Paths.get(dir, "_delta_log", s"$cpBase.json"),
          Seq("""{"checkpointMetadata":{"version":0}}""",
            protoJson, metaJson, addJson).mkString("", "\n", "\n"))
    }
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":0,"size":4}""")
    Files.delete(Paths.get(dir, "_delta_log", "00000000000000000000.json"))
    dir
  }

  test("sidecar-less v2 checkpoints: full lifecycle — read, mutate, v2 re-checkpoint") {
    val dir = v2Fixture("inline")
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val st = DeltaInterop.state(spark, dir)
    assert(st.protocol.readerFeatures.contains("v2Checkpoint"))
    assert(st.files.head.numRecords == 3L)
    // the feature is HONORED on write: mutations commit, and a
    // checkpoint on this table must come out in the v2 spelling —
    // a classic-named file would strand v2-expecting readers
    DeltaInterop.writeDelta(Seq(9L, 10L).toDF("id"), dir, Nil)         // v1
    DeltaInterop.deleteWhere(spark, dir, col("id") === 2L)             // v2
    val cpV = DeltaInterop.checkpoint(spark, dir)
    assert(cpV == 2L)
    val names = new java.io.File(s"$dir/_delta_log").listFiles().map(_.getName)
    assert(!names.contains(f"${2L}%020d.checkpoint.parquet"),
      "a v2Checkpoint table must not get a classic-named checkpoint")
    assert(names.exists(n => n.startsWith(f"${2L}%020d.checkpoint.") &&
      n.endsWith(".parquet")), names.mkString(","))
    // the v2 checkpoint is the only way in after cleanup
    DeltaInterop.cleanupLog(spark, dir)
    assert(!new java.io.File(s"$dir/_delta_log/${"0" * 19}1.json").exists())
    assert(DeltaInterop.readDelta(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 9L, 10L))
    // and the re-read checkpoint carries the replayed v7 protocol
    assert(DeltaInterop.state(spark, dir)
      .protocol.readerFeatures.contains("v2Checkpoint"))
  }

  test("v2 checkpoints with SIDECAR files read; vacuum keeps sidecar-referenced data") {
    val dir = v2Fixture("sidecar")
    assert(DeltaInterop.readDelta(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // reachability must traverse the sidecar indirection — otherwise
    // this reclaims the table's only data file
    val reclaimed = DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
    assert(reclaimed == 0, s"vacuum reclaimed $reclaimed live file(s)")
    assert(DeltaInterop.readDelta(spark, dir).count() == 3L)
  }

  test("MULTI-PART classic checkpoints read (all parts); a partial set degrades, not corrupts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cp-multipart").toString
    // two data files
    val relA = "part-mp-a.parquet"; val relB = "part-mp-b.parquet"
    val sizeA = writeSingleParquet(Seq(1L, 2L).toDF("id"), Paths.get(dir, relA))
    val sizeB = writeSingleParquet(Seq(3L, 4L, 5L).toDF("id"), Paths.get(dir, relB))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val proto = V2Protocol(1, 2, null, null)
    val meta = V2Meta("mp-fixture", V2Format("parquet", Map.empty), schema.json,
      Nil, Map.empty, 0L)
    def add(rel: String, size: Long, n: Int) =
      V2Add(rel, Map.empty, size, 0L, dataChange = true, s"""{"numRecords":$n}""")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    // part 1 of 2: protocol + metaData + addA; part 2 of 2: addB
    val base = f"${0L}%020d.checkpoint"
    writeSingleParquet(Seq(
      V2Row(protocol = proto), V2Row(metaData = meta),
      V2Row(add = add(relA, sizeA, 2))).toDF(),
      Paths.get(dir, "_delta_log", f"$base.${1}%010d.${2}%010d.parquet"))
    writeSingleParquet(Seq(V2Row(add = add(relB, sizeB, 3))).toDF(),
      Paths.get(dir, "_delta_log", f"$base.${2}%010d.${2}%010d.parquet"))
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":0,"size":4,"parts":2}""")
    assert(DeltaInterop.readDelta(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(DeltaInterop.state(spark, dir).files.map(_.numRecords).sum == 5L)
    // drop a part: the set is incomplete — the reader must NOT trust the
    // remainder (half a snapshot is corruption); with no JSON either,
    // the table reads as absent rather than as half its files
    Files.delete(Paths.get(dir, "_delta_log", f"$base.${2}%010d.${2}%010d.parquet"))
    val e = intercept[Exception](DeltaInterop.readDelta(spark, dir))
    assert(e.getMessage.contains("no Delta log") || e.getMessage.contains("missing log"),
      e.getMessage)
  }

  test("v2 JSON checkpoints read through the same replay") {
    val dir = v2Fixture("json")
    assert(DeltaInterop.readDelta(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(DeltaInterop.state(spark, dir).version == 0L)
  }

  test("generated columns are enforced on write; identity columns refuse by name") {
    def fixture(metaKey: String, metaVal: Any): String = {
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      metaVal match {
        case s: String => mb.putString(metaKey, s)
        case l: Long => mb.putLong(metaKey, l)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "twice", org.apache.spark.sql.types.LongType,
          nullable = true, mb.build())))
      val dir = Files.createTempDirectory("graft-proto-gen").toString
      val M = new com.fasterxml.jackson.databind.ObjectMapper()
      val md = M.createObjectNode(); val m = md.putObject("metaData")
      m.put("id", "gen-fixture")
      val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
      m.put("schemaString", schema.json)
      m.putArray("partitionColumns"); m.putObject("configuration"); m.put("createdTime", 0L)
      Files.createDirectories(Paths.get(dir, "_delta_log"))
      Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
        (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}""",
          M.writeValueAsString(md)).mkString("\n") + "\n").getBytes("UTF-8"))
      dir
    }
    // generated column: conforming write lands, violating write refused
    val gDir = fixture("delta.generationExpression", "id * 2")
    DeltaInterop.writeDelta(Seq((1L, 2L), (3L, 6L)).toDF("id", "twice"), gDir, Nil)
    val e = intercept[IllegalArgumentException](
      DeltaInterop.writeDelta(Seq((4L, 9L)).toDF("id", "twice"), gDir, Nil))
    assert(e.getMessage.contains("id * 2"), e.getMessage)
    assert(DeltaInterop.readDelta(spark, gDir).count() == 2)
    // identity column: ANY write refused by name (no value generation here)
    val iDir = fixture("delta.identity.start", 1L)
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.writeDelta(Seq((1L, 1L)).toDF("id", "twice"), iDir, Nil))
    assert(e2.getMessage.contains("IDENTITY") && e2.getMessage.contains("twice"), e2.getMessage)
    // reads of the identity table stay fine
    assert(DeltaInterop.readDelta(spark, iDir).count() == 0)
  }

  test("delta.invariants column metadata is enforced on write") {
    val dir = Files.createTempDirectory("graft-proto-invariant").toString
    // a foreign table whose `id` column carries an invariant id >= 0
    val fieldMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.invariants",
        """{"expression":{"expression":"id >= 0"}}""").build()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "id", org.apache.spark.sql.types.LongType, nullable = true, fieldMeta)))
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = M.createObjectNode(); val m = md.putObject("metaData")
    m.put("id", "invariant-fixture")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns"); m.putObject("configuration"); m.put("createdTime", 0L)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        M.writeValueAsString(md)).mkString("\n") + "\n").getBytes("UTF-8"))
    // a conforming append lands; a violating one is refused with the expression
    DeltaInterop.writeDelta(Seq(1L, 2L).toDF("id"), dir, Nil)
    val e = intercept[IllegalArgumentException](
      DeltaInterop.writeDelta(Seq(3L, -1L).toDF("id"), dir, Nil))
    assert(e.getMessage.contains("id >= 0"), e.getMessage)
    assert(DeltaInterop.readDelta(spark, dir).count() == 2)
  }
}
