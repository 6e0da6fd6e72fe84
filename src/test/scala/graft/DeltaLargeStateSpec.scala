package graft

import java.nio.file.{Files, Paths}
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataFrame-backed snapshot state for HUGE logs (VERDICT r11 #3): a
  * 100k-add checkpoint reconstructs WITHOUT materializing adds on the
  * driver — metadata replays from a column-pruned scan, file pruning
  * runs in-plan, and only survivors collect. The driver path stays for
  * small logs (threshold-gated). */
class DeltaLargeStateSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val N = 100000

  /** A synthetic 100k-add parquet checkpoint (log only — state
    * reconstruction never opens data files, so none exist). Each add:
    * path part=p<i%50>/f<i>.parquet, stats id∈[i*10, i*10+9]. */
  private lazy val bigFixture: String = {
    val dir = Files.createTempDirectory("graft-large-log").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.StringType)))
    val meta = DeltaInterop.CpRow(metaData = DeltaInterop.CpMetaData(
      "large-fixture", DeltaInterop.CpFormat("parquet", Map.empty),
      schema.json, Seq("part"), Map.empty, 0L))
    val proto = DeltaInterop.CpRow(protocol = DeltaInterop.CpProtocol(1, 2))
    val metaDf = spark.createDataset(Seq(meta, proto))(
      org.apache.spark.sql.Encoders.product[DeltaInterop.CpRow])
    val addsDf = spark.range(N).map { i =>
      DeltaInterop.CpRow(add = DeltaInterop.CpAdd(
        path = s"part=p${i % 50}/f$i.parquet",
        partitionValues = Map("part" -> s"p${i % 50}"),
        size = 1024L, modificationTime = 0L, dataChange = true,
        stats = s"""{"numRecords":10,"minValues":{"id":${i * 10}},"maxValues":{"id":${i * 10 + 9}}}""",
        tags = Map.empty))
    }(org.apache.spark.sql.Encoders.product[DeltaInterop.CpRow])
    val staging = s"$dir/_cp_staging"
    metaDf.unionByName(addsDf.toDF().as[DeltaInterop.CpRow](
      org.apache.spark.sql.Encoders.product[DeltaInterop.CpRow]))
      .coalesce(1).write.parquet(staging)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val part = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    f.rename(part, new org.apache.hadoop.fs.Path(
      s"$dir/_delta_log/00000000000000000000.checkpoint.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      s"""{"version":0,"size":${N + 2}}""".getBytes("UTF-8"))
    dir
  }

  test("a 100k-add log is detected large; metadata replays without the adds") {
    assert(DeltaInterop.isLargeLog(spark, bigFixture))
    val t0 = System.nanoTime()
    val st = DeltaInterop.stateMetaLarge(spark, bigFixture)
    val metaSec = (System.nanoTime() - t0) / 1e9
    assert(st.schema.fieldNames.toSeq == Seq("id", "part"))
    assert(st.partitionColumns == Seq("part"))
    assert(st.files.isEmpty, "metadata replay must NOT materialize adds")
    info(f"metadata replay: $metaSec%.2f s")
  }

  test("liveFilesDF reconstructs 100k adds distributed; tail commits patch it") {
    val t0 = System.nanoTime()
    assert(DeltaInterop.liveFilesDF(spark, bigFixture).count() == N)
    val fullSec = (System.nanoTime() - t0) / 1e9
    info(f"full live-set count over $N%d adds: $fullSec%.2f s")
    // tail: v1 removes f0, re-adds f1 with new stats, adds a fresh file
    // (remove+add of f2 in ONE commit must resolve to the add)
    val v1 = Seq(
      """{"remove":{"path":"part=p0/f0.parquet","deletionTimestamp":1,"dataChange":true}}""",
      """{"add":{"path":"part=p1/f1.parquet","partitionValues":{"part":"p1"},"size":2048,"modificationTime":1,"dataChange":true,"stats":"{\"numRecords\":99}"}}""",
      """{"remove":{"path":"part=p2/f2.parquet","deletionTimestamp":1,"dataChange":true}}""",
      """{"add":{"path":"part=p2/f2.parquet","partitionValues":{"part":"p2"},"size":4096,"modificationTime":1,"dataChange":true,"stats":"{\"numRecords\":7}"}}""",
      """{"add":{"path":"part=p0/fresh.parquet","partitionValues":{"part":"p0"},"size":512,"modificationTime":1,"dataChange":true,"stats":"{\"numRecords\":3}"}}""")
    Files.write(Paths.get(bigFixture, "_delta_log", "00000000000000000001.json"),
      (v1.mkString("\n") + "\n").getBytes("UTF-8"))
    try {
      val live = DeltaInterop.liveFilesDF(spark, bigFixture)
      assert(live.count() == N) // -1 removed, +1 fresh
      val byPath = live.filter(col("path").isin(
        "part=p0/f0.parquet", "part=p1/f1.parquet", "part=p2/f2.parquet",
        "part=p0/fresh.parquet"))
        .select("path", "numRecords").as[(String, Long)].collect().toMap
      assert(!byPath.contains("part=p0/f0.parquet"), "removed file must drop")
      assert(byPath("part=p1/f1.parquet") == 99L, "tail re-add must win over the checkpoint")
      assert(byPath("part=p2/f2.parquet") == 7L, "same-commit remove+add must resolve to the add")
      assert(byPath("part=p0/fresh.parquet") == 3L)
    } finally Files.delete(Paths.get(bigFixture, "_delta_log", "00000000000000000001.json"))
  }

  test("file pruning runs IN-PLAN: only survivors reach the driver") {
    val st = DeltaInterop.stateMetaLarge(spark, bigFixture)
    val live = DeltaInterop.liveFilesDF(spark, bigFixture)
    // range prune: id ∈ [500005, 500008] lives in exactly file f50000
    val t0 = System.nanoTime()
    val pruned = DeltaInterop.pruneFilesDF(live, st,
      Map.empty, Map("id" -> ((500005.0, 500008.0))))
    val rows = pruned.collect()
    val pruneSec = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 1 && rows.head.getAs[String]("path") == "part=p0/f50000.parquet")
    info(f"in-plan range prune + survivor collect: $pruneSec%.2f s")
    // partition prune: one of 50 partitions
    val part = DeltaInterop.pruneFilesDF(live, st, Map("part" -> "p7"), Map.empty)
    assert(part.count() == N / 50)
    // the pruning predicate is INSIDE the plan (a Filter over the
    // checkpoint scan), not a driver-side post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"expected an in-plan Filter:\n$plan")
    // combined: partition + range must intersect
    val both = DeltaInterop.pruneFilesDF(live, st,
      Map("part" -> "p0"), Map("id" -> ((500005.0, 500008.0))))
    assert(both.count() == 1)
  }

  test("large-path reads equal the classic driver replay on a real table") {
    val dir = Files.createTempDirectory("graft-large-equiv").toString
    val df = (0L until 2000L).map(i => (i, s"p${i % 4}", s"v$i")).toDF("id", "part", "payload")
    DeltaInterop.writeDelta(df.repartitionByRange(8, col("id")), dir, Seq("part"))
    DeltaInterop.deleteWhere(spark, dir, col("id") % 17 === 0)
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.writeDelta(
      Seq((9999L, "p1", "tail")).toDF("id", "part", "payload"), dir, Seq("part"))
    val classic = DeltaInterop.readDeltaWhere(spark, dir,
      partitionEq = Map("part" -> "p1"), ranges = Map("id" -> ((100.0, 1500.0))))
      .orderBy("id").collect().toSeq
    // force the large path on the same table
    spark.conf.set(DeltaInterop.LargeLogThresholdConf, "1")
    try {
      assert(DeltaInterop.isLargeLog(spark, dir))
      val large = DeltaInterop.readDeltaWhere(spark, dir,
        partitionEq = Map("part" -> "p1"), ranges = Map("id" -> ((100.0, 1500.0))))
        .orderBy("id").collect().toSeq
      assert(large == classic, "large-path read diverged from the classic replay")
      // full read equivalence too (tail add included)
      val largeFull = DeltaInterop.readDelta(spark, dir).count()
      spark.conf.unset(DeltaInterop.LargeLogThresholdConf)
      assert(largeFull == DeltaInterop.readDelta(spark, dir).count())
    } finally spark.conf.unset(DeltaInterop.LargeLogThresholdConf)
  }

  test("large-log checkpoint writes MULTI-PART classic, adds never on the driver") {
    val dir = Files.createTempDirectory("graft-large-cp").toString
    val df = (0L until 3000L).map(i => (i, s"p${i % 4}", s"v$i")).toDF("id", "part", "payload")
    DeltaInterop.writeDelta(df.repartitionByRange(8, col("id")), dir, Seq("part"))
    DeltaInterop.deleteWhereDV(spark, dir, col("id") % 13 === 0) // DVs in the mix
    DeltaInterop.checkpoint(spark, dir)                          // classic, v1
    DeltaInterop.writeDelta(
      Seq((8888L, "p2", "tail")).toDF("id", "part", "payload"), dir, Seq("part"))
    val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
    spark.conf.set(DeltaInterop.LargeLogThresholdConf, "1")
    try {
      val cpV = DeltaInterop.checkpoint(spark, dir) // dispatches to checkpointLarge
      assert(cpV == 2L)
      val names = new java.io.File(s"$dir/_delta_log").listFiles().map(_.getName)
      val partRe = f"^${2L}%020d\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet$$".r
      val parts = names.flatMap(n => partRe.findFirstMatchIn(n))
      assert(parts.nonEmpty, s"expected multi-part checkpoint files in ${names.mkString(",")}")
      assert(parts.length == parts.head.group(2).toInt, "all parts must land")
      // the multi-part checkpoint is the only state source after cleanup
      DeltaInterop.cleanupLog(spark, dir)
      val after = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
      assert(after == before, "multi-part large checkpoint lost state")
      // DV descriptors survived the distributed rewrite
      assert(DeltaInterop.state(spark, dir).files.exists(_.deletionVector != null))
    } finally spark.conf.unset(DeltaInterop.LargeLogThresholdConf)
  }

  test("checkpointLarge over 100k adds: bounded driver, state survives") {
    // a COPY of the shared fixture — checkpointLarge rewrites
    // _last_checkpoint and adds part files
    val dir = Files.createTempDirectory("graft-large-cp100k").toString
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Seq("00000000000000000000.checkpoint.parquet", "_last_checkpoint").foreach { n =>
      Files.copy(Paths.get(bigFixture, "_delta_log", n),
        Paths.get(dir, "_delta_log", n))
    }
    val t0 = System.nanoTime()
    assert(DeltaInterop.checkpointLarge(spark, dir) == 0L)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"distributed checkpoint of $N%d adds: $sec%.2f s")
    // the rewritten checkpoint resolves (multi-part beats nothing; the
    // original classic file still wins resolution at v0, so assert the
    // parts landed and the live set they carry is intact)
    val names = new java.io.File(s"$dir/_delta_log").listFiles().map(_.getName)
    val partRe = f"^${0L}%020d\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet$$".r
    val parts = names.filter(n => partRe.findFirstMatchIn(n).isDefined)
    assert(parts.nonEmpty)
    assert(spark.read.parquet(parts.map(n => s"$dir/_delta_log/$n"): _*)
      .filter(col("add").isNotNull).count() == N)
  }

  test("vacuumLarge: distributed reachability — orphans die, live data and DV sidecars survive") {
    val dir = Files.createTempDirectory("graft-large-vac").toString
    val df = (0L until 3000L).map(i => (i, s"p${i % 3}", s"v$i")).toDF("id", "part", "payload")
    DeltaInterop.writeDelta(df.repartitionByRange(6, col("id")), dir, Seq("part"))
    DeltaInterop.deleteWhereDV(spark, dir, col("id") % 11 === 0)  // live DVs
    DeltaInterop.checkpoint(spark, dir)
    spark.conf.set(DeltaInterop.LargeLogThresholdConf, "1")
    try {
      // compact rewrites the DV-less files; after checkpoint+cleanup the
      // originals are unreferenced
      val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
      DeltaInterop.compact(spark, dir, smallFileBytes = 1L << 30)
      DeltaInterop.checkpoint(spark, dir) // multi-part (large path)
      DeltaInterop.cleanupLog(spark, dir)
      // an orphan from a crashed writer
      val orphan = Paths.get(dir, "part=p0", "orphan-dead.parquet")
      Files.write(orphan, Array[Byte](1, 2, 3))
      val dvSidecars = new java.io.File(dir).listFiles()
        .filter(f0 => f0.getName.startsWith("deletion_vector_")).map(_.getName).toSet
      assert(dvSidecars.nonEmpty, "fixture must carry live DV sidecars")
      val deleted = DeltaInterop.vacuum(spark, dir, retainMillis = 0L) // dispatches large
      assert(deleted > 0, "compaction originals + orphan must reclaim")
      assert(!Files.exists(orphan), "orphan must die")
      val after = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
      assert(after == before, "vacuumLarge reclaimed live data")
      val dvAfter = new java.io.File(dir).listFiles()
        .filter(f0 => f0.getName.startsWith("deletion_vector_")).map(_.getName).toSet
      assert(dvAfter == dvSidecars, "live DV sidecars must survive")
    } finally spark.conf.unset(DeltaInterop.LargeLogThresholdConf)
  }


  test("vacuumLarge distributes the partition-dir walk past the threshold; reclaim unchanged") {
    val dir = Files.createTempDirectory("graft-large-vac-dist").toString
    // 12 partition dirs — more than the lowered walk threshold
    val df = (0L until 1200L).map(i => (i, s"p${i % 12}", s"v$i")).toDF("id", "part", "payload")
    DeltaInterop.writeDelta(df, dir, Seq("part"))
    DeltaInterop.checkpoint(spark, dir)
    spark.conf.set(DeltaInterop.LargeLogThresholdConf, "1")
    val prevThreshold = DeltaInterop.VacuumDriverWalkMaxDirs
    DeltaInterop.VacuumDriverWalkMaxDirs = 4
    try {
      val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
      // compaction originals become unreferenced after checkpoint+cleanup
      DeltaInterop.compact(spark, dir, smallFileBytes = 1L << 30)
      DeltaInterop.checkpoint(spark, dir)
      DeltaInterop.cleanupLog(spark, dir)
      val orphan = Paths.get(dir, "part=p3", "orphan-dead.parquet")
      Files.write(orphan, Array[Byte](9, 9))
      val deleted = DeltaInterop.vacuumLarge(spark, dir, retainMillis = 0L)
      assert(DeltaInterop.lastVacuumWalk == "distributed",
        s"12 partition dirs over threshold 4 must distribute the walk, took '${DeltaInterop.lastVacuumWalk}'")
      assert(deleted > 0, "compaction originals + orphan must reclaim")
      assert(!Files.exists(orphan), "orphan must die")
      val after = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
      assert(after == before, "distributed-walk vacuum reclaimed live data")
      // the small fixture from the sibling test keeps the driver walk
      DeltaInterop.VacuumDriverWalkMaxDirs = prevThreshold
      DeltaInterop.vacuumLarge(spark, dir, retainMillis = 0L)
      assert(DeltaInterop.lastVacuumWalk == "driver")
    } finally {
      DeltaInterop.VacuumDriverWalkMaxDirs = prevThreshold
      spark.conf.unset(DeltaInterop.LargeLogThresholdConf)
    }
  }

  test("large-log checkpoint on a v2Checkpoint table writes SIDECARS") {
    val dir = Files.createTempDirectory("graft-large-cpv2").toString
    val df = (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "payload")
    DeltaInterop.writeDelta(df.repartitionByRange(6, col("id")), dir, Nil)
    // advertise v2Checkpoint (the shape a delta-spark table carries)
    DeltaInterop.commit(spark, dir, 1L, Seq(DeltaInterop.Protocol(
      3, 7, Set("v2Checkpoint"), Set("v2Checkpoint")).json), op = "UPGRADE")
    DeltaInterop.checkpoint(spark, dir)                          // classic v2 form
    DeltaInterop.writeDelta(Seq((7777L, "tail")).toDF("id", "payload"), dir, Nil)
    val before = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
    spark.conf.set(DeltaInterop.LargeLogThresholdConf, "1")
    try {
      val cpV = DeltaInterop.checkpoint(spark, dir)
      assert(cpV == 2L)
      val names = new java.io.File(s"$dir/_delta_log").listFiles().map(_.getName)
      assert(names.exists(n => n.startsWith(f"${2L}%020d.checkpoint.") &&
        n.endsWith(".parquet") &&
        n.stripPrefix(f"${2L}%020d.checkpoint.").count(_ == '.') == 1),
        s"expected a UUID-named v2 main file in ${names.mkString(",")}")
      val sidecars = new java.io.File(s"$dir/_delta_log/_sidecars").listFiles()
      assert(sidecars != null && sidecars.nonEmpty, "expected add-bearing sidecars")
      DeltaInterop.cleanupLog(spark, dir)
      val after = DeltaInterop.readDelta(spark, dir).orderBy("id").collect().toSeq
      assert(after == before, "sidecar'd large checkpoint lost state")
    } finally spark.conf.unset(DeltaInterop.LargeLogThresholdConf)
  }
}
