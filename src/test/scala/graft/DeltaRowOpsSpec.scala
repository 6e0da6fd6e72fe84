package graft

import java.nio.file.{Files, Paths}
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write row-level ops on Delta tables: DELETE / UPDATE / MERGE
  * must touch ONLY the files holding affected rows — untouched files
  * survive by path identity in the log — and every pre-op version stays
  * time-travelable. */
class DeltaRowOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def table(n: Int, rev: String = "a") =
    (0 until n).map(i => (i.toLong, s"name_$i", rev, i % 4)).toDF("id", "name", "rev", "part")

  private def paths(dir: String) =
    DeltaInterop.state(spark, dir).files.map(_.path).toSet

  test("deleteWhere rewrites only files containing matches; old version time-travels") {
    val dir = Files.createTempDirectory("graft-delta-del").toString
    // two appends ⇒ 2 files per partition value (8 files total)
    // one file per partition value per append (deterministic file layout)
    DeltaInterop.writeDelta(table(20).repartition(4, col("part")),
      dir, Seq("part"), overwrite = false, checkpointInterval = 0)
    DeltaInterop.writeDelta(
      table(20).withColumn("id", col("id") + 100).repartition(4, col("part")),
      dir, Seq("part"), overwrite = false, checkpointInterval = 0)
    val before = paths(dir)
    assert(before.size == 8)
    // delete ids ≥ 100 AND part = 2: exactly ONE file holds such rows
    val (v, rewritten) = DeltaInterop.deleteWhere(spark, dir,
      col("id") >= 100 && col("part") === 2,
      partitionEq = Map("part" -> "2"))
    assert(v == 2L && rewritten == 1)
    val after = paths(dir)
    // the 7 untouched files survive by identity — no needless rewrite
    assert((before intersect after).size == 7)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 35) // 40 - 5 (ids 102,106,110,114,118)
    assert(t.filter(col("id") >= 100 && col("part") === 2).count() == 0)
    assert(t.filter(col("id") < 100 && col("part") === 2).count() == 5)
    // pre-delete version intact
    assert(DeltaInterop.readDelta(spark, dir, Some(1L)).count() == 40)
    // no-match delete: version unchanged, nothing rewritten
    val (v2, r2) = DeltaInterop.deleteWhere(spark, dir, col("id") === 99999L)
    assert(v2 == 2L && r2 == 0)
  }

  test("deleteWhere: NULL predicate rows survive (SQL DELETE semantics)") {
    val dir = Files.createTempDirectory("graft-delta-delnull").toString
    Seq((1L, "x"), (2L, null.asInstanceOf[String]), (3L, "y"))
      .toDF("id", "tag").write.parquet(s"$dir/seed")
    DeltaInterop.writeDelta(spark.read.parquet(s"$dir/seed"), s"$dir/t", Nil,
      overwrite = false, checkpointInterval = 0)
    // tag = 'x' is NULL for id 2 — only id 1 deletes
    DeltaInterop.deleteWhere(spark, s"$dir/t", col("tag") === "x")
    val left = DeltaInterop.readDelta(spark, s"$dir/t")
      .select("id").as[Long].collect().sorted.toSeq
    assert(left == Seq(2L, 3L))
  }

  test("updateWhere rewrites matched rows in touched files only; rejects partition-column SET") {
    val dir = Files.createTempDirectory("graft-delta-upd").toString
    // one file per partition value per append (deterministic file layout)
    DeltaInterop.writeDelta(table(20).repartition(4, col("part")),
      dir, Seq("part"), overwrite = false, checkpointInterval = 0)
    DeltaInterop.writeDelta(
      table(20).withColumn("id", col("id") + 100).repartition(4, col("part")),
      dir, Seq("part"), overwrite = false, checkpointInterval = 0)
    val before = paths(dir)
    val (v, rewritten) = DeltaInterop.updateWhere(spark, dir,
      col("id") % 2 === 0 && col("part") === 0,
      Map("rev" -> lit("UPDATED"), "name" -> concat(col("name"), lit("!"))),
      partitionEq = Map("part" -> "0"))
    // part=0 rows all have even ids ⇒ both part=0 files touched
    assert(v == 2L && rewritten == 2)
    assert((before intersect paths(dir)).size == 6)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.filter(col("rev") === "UPDATED").count() == 10)
    // updates evaluated against the OLD row
    assert(t.filter(col("id") === 4L).select("name").as[String].head() == "name_4!")
    // untouched rows keep rev=a
    assert(t.filter(col("part") =!= 0 && col("rev") =!= "a").count() == 0)
    // row count invariant
    assert(t.count() == 40)
    intercept[IllegalArgumentException] {
      DeltaInterop.updateWhere(spark, dir, lit(true), Map("part" -> lit(9)))
    }
  }

  test("merge upserts: matched rows replaced, new keys inserted, untouched files preserved") {
    val dir = Files.createTempDirectory("graft-delta-merge").toString
    // one file per partition value per append (deterministic file layout)
    DeltaInterop.writeDelta(table(20).repartition(4, col("part")),
      dir, Seq("part"), overwrite = false, checkpointInterval = 0)
    DeltaInterop.writeDelta(
      table(20).withColumn("id", col("id") + 100).repartition(4, col("part")),
      dir, Seq("part"), overwrite = false, checkpointInterval = 0)
    val before = paths(dir)
    // source: update ids 0..4 (files of part 0..3 from append 1), insert 1000..1002
    val source = (0 until 5).map(i => (i.toLong, s"upd_$i", "m", i % 4))
      .toDF("id", "name", "rev", "part")
      .unionByName((0 until 3).map(i => (1000L + i, s"new_$i", "m", i % 4))
        .toDF("id", "name", "rev", "part"))
    val (v, rewritten, inserted) = DeltaInterop.merge(spark, dir, source, Seq("id"))
    assert(v == 2L && rewritten == 4 && inserted == 3)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 43)
    assert(t.filter(col("rev") === "m").count() == 8)
    assert(t.filter(col("id") === 3L).select("name").as[String].head() == "upd_3")
    assert(t.filter(col("id") === 1001L).select("name").as[String].head() == "new_1")
    // the 4 files without matched keys survive by identity
    assert((before intersect paths(dir)).size == 4)
    // unmatched old rows intact
    assert(t.filter(col("id") === 7L).select("name").as[String].head() == "name_7")
    // duplicate source keys rejected
    intercept[IllegalArgumentException] {
      DeltaInterop.merge(spark, dir, source.unionByName(source), Seq("id"))
    }
    // pre-merge version intact
    assert(DeltaInterop.readDelta(spark, dir, Some(1L)).count() == 40)
  }

  test("versionAtTimestamp prefers in-commit timestamps; mtime is the foreign fallback") {
    val dir = Files.createTempDirectory("graft-delta-ts").toString
    DeltaInterop.writeDelta(table(5), dir, Nil, overwrite = false, checkpointInterval = 0)
    DeltaInterop.writeDelta(table(5).withColumn("id", col("id") + 10),
      dir, Nil, overwrite = false, checkpointInterval = 0)
    // push the IN-COMMIT timestamps apart deterministically (v0 at
    // t-60s, v1 at t-30s) by rewriting each commitInfo line — and set
    // the file mtimes to a LIE (both now-5s): resolution must follow
    // the commitInfo, proving ICT survives file copies/rsyncs
    val now = System.currentTimeMillis()
    def stamp(v: Int, ts: Long): Unit = {
      val p = Paths.get(dir, "_delta_log", f"$v%020d.json")
      val fixed = new String(Files.readAllBytes(p), "UTF-8").linesIterator.map { l =>
        if (l.startsWith("{\"commitInfo\""))
          l.replaceAll("\"timestamp\":\\d+", s""""timestamp":$ts""")
            .replaceAll("\"inCommitTimestamp\":\\d+", s""""inCommitTimestamp":$ts""")
        else l
      }.mkString("\n") + "\n"
      Files.write(p, fixed.getBytes("UTF-8"))
      // the raw rewrite invalidates Hadoop LocalFS's checksum sidecar
      Files.deleteIfExists(Paths.get(dir, "_delta_log", ".%020d.json.crc".format(v)))
      assert(p.toFile.setLastModified(now - 5000))
    }
    stamp(0, now - 60000)
    stamp(1, now - 30000)
    assert(DeltaInterop.versionAtTimestamp(spark, dir, now - 45000) == 0L)
    assert(DeltaInterop.versionAtTimestamp(spark, dir, now) == 1L)
    assert(DeltaInterop.readDeltaAsOf(spark, dir, now - 45000).count() == 5)
    assert(DeltaInterop.readDeltaAsOf(spark, dir, now).count() == 10)
    intercept[IllegalArgumentException] {
      DeltaInterop.versionAtTimestamp(spark, dir, now - 120000)
    }
    // foreign fallback: strip commitInfo entirely → mtimes take over
    (0 to 1).foreach { v =>
      val p = Paths.get(dir, "_delta_log", f"$v%020d.json")
      val noInfo = new String(Files.readAllBytes(p), "UTF-8").linesIterator
        .filterNot(_.startsWith("{\"commitInfo\"")).mkString("\n") + "\n"
      Files.write(p, noInfo.getBytes("UTF-8"))
      Files.deleteIfExists(Paths.get(dir, "_delta_log", ".%020d.json.crc".format(v)))
    }
    assert(Paths.get(dir, "_delta_log", "%020d.json".format(0)).toFile.setLastModified(now - 60000))
    assert(Paths.get(dir, "_delta_log", "%020d.json".format(1)).toFile.setLastModified(now - 30000))
    assert(DeltaInterop.versionAtTimestamp(spark, dir, now - 45000) == 0L)
  }
}
