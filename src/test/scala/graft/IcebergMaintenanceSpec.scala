package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Iceberg TABLE MAINTENANCE ([[IcebergWrite.compact]] /
  * [[IcebergWrite.expireSnapshots]]): compaction folds row-level
  * deletes into rewritten files while untouched manifests carry
  * forward verbatim; expiry bounds `metadata/` reference-counted and
  * reclaims unreferenced data/delete files — the pair that keeps a
  * long-running streaming sink's table from accumulating unbounded
  * metadata (the same contract Delta's OPTIMIZE + VACUUM give). */
class IcebergMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def metaFiles(dir: String): Seq[String] =
    new java.io.File(s"$dir/metadata").list().toSeq.filterNot(_.startsWith("."))

  private def dataFiles(dir: String): Seq[String] =
    Option(new java.io.File(s"$dir/data").list()).map(_.toSeq).getOrElse(Nil)

  test("compact folds position deletes; clean manifests carry verbatim") {
    val dir = Files.createTempDirectory("graft-iceberg-compact").toString
    IcebergWrite.append(
      (0L until 80L).map(i => (i, s"r_$i")).toDF("id", "tag")
        .repartitionByRange(4, col("id")), dir)
    IcebergWrite.append(
      (80L until 120L).map(i => (i, s"r_$i")).toDF("id", "tag")
        .repartitionByRange(2, col("id")), dir)
    val (_, nDel) = IcebergWrite.deleteWhere(spark, dir, col("id") < 15,
      ranges = Map("id" -> ((0.0, 14.0))))
    assert(nDel == 15)
    val preCompactSnap = IcebergInterop.snapshots(spark, dir)
      .orderBy(desc("sequence_number")).head().getLong(0)
    val liveBefore = IcebergInterop.readIceberg(spark, dir)
      .select("id").as[Long].collect().sorted
    val cleanFiles = IcebergInterop.readIceberg(spark, dir).inputFiles
      .filter(p => !p.contains("/data/delete-")).toSet
    // only the delete-referenced file(s) are dirty (smallFileBytes=0)
    val (snap, rewritten, folded) = IcebergWrite.compact(spark, dir,
      smallFileBytes = 0L)
    assert(rewritten >= 1 && folded >= 1, s"rewritten=$rewritten folded=$folded")
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.select("id").as[Long].collect().sorted.toSeq == liveBefore.toSeq,
      "compaction must not change the live rows")
    // the masks are now PHYSICAL: no delete file participates
    assert(!t.inputFiles.exists(_.contains("/data/delete-")))
    // clean data files survive under their ORIGINAL paths (carried)
    val after = t.inputFiles.toSet
    assert(cleanFiles.count(after) >= 4,
      s"clean files must carry forward, kept ${cleanFiles.count(after)}")
    // the compaction snapshot is a `replace`; pre-compact state still
    // time travels WITH its masks
    assert(IcebergInterop.snapshots(spark, dir)
      .filter(col("operation") === "replace").count() == 1)
    val pre = IcebergInterop.readIceberg(spark, dir, Some(preCompactSnap))
    assert(pre.count() == liveBefore.length,
      "time travel to the pre-compact delete snapshot keeps the masks")
    assert(snap != preCompactSnap)
    // an already-compact table no-ops (no new snapshot)
    val nSnaps = IcebergInterop.snapshots(spark, dir).count()
    val (_, r2, f2) = IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    assert(r2 == 0 && f2 == 0)
    assert(IcebergInterop.snapshots(spark, dir).count() == nSnaps)
  }

  test("compact bin-packs small files to the target size") {
    val dir = Files.createTempDirectory("graft-iceberg-binpack").toString
    (0 until 5).foreach(k => IcebergWrite.append(
      (k * 20L until (k + 1) * 20L).map(i => (i, s"r_$i")).toDF("id", "tag"), dir))
    assert(dataFiles(dir).count(_.endsWith(".parquet")) >= 5)
    val (_, rewritten, _) = IcebergWrite.compact(spark, dir) // default: all small
    assert(rewritten >= 5)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.inputFiles.length == 1, s"bin-pack to ONE file, got ${t.inputFiles.length}")
    assert(t.count() == 100 &&
      t.agg(sum("id")).head().getLong(0) == (0L until 100L).sum)
    // updates/merges continue on the compacted table
    val (_, n) = IcebergWrite.updateWhere(spark, dir, col("id") === 50L,
      Map("tag" -> lit("post-compact")))
    assert(n == 1)
    assert(IcebergInterop.readIceberg(spark, dir)
      .filter(col("tag") === "post-compact").count() == 1)
  }

  test("compact preserves partitioning: rewritten files keep manifest-level skipping") {
    val dir = Files.createTempDirectory("graft-iceberg-compact-part").toString
    val rows = (0L until 90L).map(i => (i, s"g${i % 3}", s"r_$i"))
      .toDF("id", "grp", "tag")
    IcebergWrite.appendPartitioned(rows.filter(col("id") < 45), dir, "grp")
    IcebergWrite.appendPartitioned(rows.filter(col("id") >= 45), dir, "grp")
    val (_, nDel) = IcebergWrite.deleteWhere(spark, dir, col("id") % 5 === 0)
    assert(nDel == 18)
    // every data file is dirty (tiny) — full rewrite, but PARTITIONED
    val (_, rewritten, folded) = IcebergWrite.compact(spark, dir)
    assert(rewritten >= 6 && folded >= 1, s"rewritten=$rewritten folded=$folded")
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 72 && t.filter(col("id") % 5 === 0).count() == 0)
    assert(!t.inputFiles.exists(_.contains("/data/delete-")))
    // the REWRITTEN layout still skips at the manifest level
    val one = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g1"))
    assert(one.count() == 24)
    val (read, skipped) = IcebergInterop.lastManifestScan
    assert(read == 1 && skipped == 2,
      s"compacted per-value manifests must keep skipping: read=$read skipped=$skipped")
    // bucket transforms preserve too
    val dir2 = Files.createTempDirectory("graft-iceberg-compact-bucket").toString
    IcebergWrite.appendPartitioned(
      (0L until 60L).map(i => (i, s"r_$i")).toDF("id", "tag"), dir2, "id", "bucket[4]")
    IcebergWrite.deleteWhere(spark, dir2, col("id") < 6)
    IcebergWrite.compact(spark, dir2)
    val t2 = IcebergInterop.readIcebergWhere(spark, dir2, Map("id" -> ((17.0, 17.0))))
    assert(t2.count() == 1)
    val (r2, s2) = IcebergInterop.lastManifestScan
    assert(r2 == 1 && r2 + s2 == 4,
      s"compacted bucket manifests keep point-skipping: read=$r2 skipped=$s2")
  }

  test("expireSnapshots bounds metadata, reclaims reference-counted, refuses expired travel") {
    val dir = Files.createTempDirectory("graft-iceberg-expire").toString
    val s1 = IcebergWrite.append(
      (0L until 30L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    (1 to 6).foreach(k => IcebergWrite.appendOnce(
      Seq((100L + k, s"b_$k")).toDF("id", "tag"), dir, "app", k.toLong))
    IcebergWrite.deleteWhere(spark, dir, col("id") < 5)
    IcebergWrite.compact(spark, dir) // folds the delete physically
    val filesBefore = (metaFiles(dir).length, dataFiles(dir).length)
    assert(IcebergInterop.snapshots(spark, dir).count() == 9)
    Thread.sleep(5)
    val (expired, reclaimed) = IcebergWrite.expireSnapshots(spark, dir,
      retainMillis = 0L)
    assert(expired == 8, s"everything but the head expires: $expired")
    assert(reclaimed > 0)
    // live reads are untouched; history is just the head now
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 31 && !t.inputFiles.exists(_.contains("/data/delete-")))
    assert(IcebergInterop.snapshots(spark, dir).count() == 1)
    // time travel to an expired snapshot fails LOUDLY
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, dir, Some(s1)).count())
    assert(e.getMessage.contains("not found"), e.getMessage)
    // the folded delete's parquet files physically reclaimed
    assert(!dataFiles(dir).exists(_.startsWith("delete-")),
      s"delete files must reclaim: ${dataFiles(dir).filter(_.startsWith("delete-"))}")
    // metadata/ and data/ both SHRANK
    assert(metaFiles(dir).length < filesBefore._1)
    assert(dataFiles(dir).length < filesBefore._2)
    // no-op expiry returns zero and leaves the table readable
    assert(IcebergWrite.expireSnapshots(spark, dir, Long.MaxValue / 4)._1 == 0)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 31)
  }

  test("a sink + periodic maintenance keeps metadata/ bounded") {
    val dir = Files.createTempDirectory("graft-iceberg-bounded").toString
    var maxMeta = 0
    (1 to 12).foreach { k =>
      IcebergWrite.appendOnce(Seq((k.toLong, s"b_$k")).toDF("id", "tag"),
        dir, "sink", k.toLong)
      if (k % 4 == 0) {
        IcebergWrite.compact(spark, dir)
        Thread.sleep(2)
        IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
      }
      maxMeta = math.max(maxMeta, metaFiles(dir).length)
    }
    // without maintenance: 12 snapshots × (manifest + list + json) ≈ 36+
    // files and growing; with it the count stays bounded by the window
    val end = metaFiles(dir).length
    assert(end <= 16, s"metadata/ must stay bounded, got $end")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 12)
    // the exactly-once ledger must survive expiry for retained txns:
    // replaying the LAST batch after maintenance writes nothing
    val before = IcebergInterop.snapshots(spark, dir).count()
    IcebergWrite.appendOnce(Seq((12L, "dup")).toDF("id", "tag"), dir, "sink", 12L)
    assert(IcebergInterop.snapshots(spark, dir).count() == before,
      "replayed txn must be recognized after maintenance")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 12)
  }

  test("expiry respects refs: a tag-pinned snapshot survives age-out") {
    val dir = Files.createTempDirectory("graft-iceberg-expire-refs").toString
    val s1 = IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    IcebergWrite.append(Seq((2L, "b")).toDF("id", "tag"), dir)
    IcebergWrite.append(Seq((3L, "c")).toDF("id", "tag"), dir)
    // pin s1 with a tag, as a foreign client would
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val mf = new java.io.File(s"$dir/metadata/v3.metadata.json")
    val m = M.readTree(mf).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val tag = m.withObject("/refs").putObject("audit-2026")
    tag.put("snapshot-id", s1); tag.put("type", "tag")
    val out = new java.io.FileOutputStream(s"$dir/metadata/v4.metadata.json")
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    finally out.close()
    Thread.sleep(5)
    val (expired, _) = IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    assert(expired == 1, s"only the middle snapshot expires: $expired")
    // the tagged snapshot still time travels; the untagged middle is gone
    assert(IcebergInterop.readIceberg(spark, dir, Some(s1)).count() == 1)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 3)
  }

  test("expiry sweeps crash-orphaned staging directories") {
    val dir = Files.createTempDirectory("graft-iceberg-orphans").toString
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "tag"), dir)
    val orphan = new java.io.File(s"$dir/.staging-deadbeef")
    orphan.mkdirs()
    new java.io.FileOutputStream(s"$dir/.staging-deadbeef/part-0.parquet").close()
    orphan.setLastModified(System.currentTimeMillis() - 86400000L)
    val (_, reclaimed) = IcebergWrite.expireSnapshots(spark, dir,
      retainMillis = 3600000L)
    assert(reclaimed >= 1)
    assert(!orphan.exists(), "the aged orphan staging dir must sweep")
    // a YOUNG staging dir (an in-flight writer) survives
    val young = new java.io.File(s"$dir/.staging-young")
    young.mkdirs()
    IcebergWrite.expireSnapshots(spark, dir, retainMillis = 3600000L)
    assert(young.exists(), "an in-flight staging dir must survive")
  }

  private def manifestCount(dir: String): Int = {
    IcebergInterop.readIceberg(spark, dir).count() // refresh lastManifestScan
    val (read, skipped) = IcebergInterop.lastManifestScan
    read + skipped
  }

  test("compact prunes equality deletes by key bounds: excluded files never rewrite") {
    val dir = Files.createTempDirectory("graft-iceberg-eqprune").toString
    // two disjoint-range files: A holds ids 0-49, B holds ids 1000-1049
    IcebergWrite.append(
      (0L until 50L).map(i => (i, s"a_$i")).toDF("id", "tag").coalesce(1), dir)
    IcebergWrite.append(
      (1000L until 1050L).map(i => (i, s"b_$i")).toDF("id", "tag").coalesce(1), dir)
    val filesBefore = IcebergInterop.readIceberg(spark, dir).inputFiles.toSet
    assert(filesBefore.size == 2)
    val fileA = filesBefore.find { p =>
      spark.read.parquet(p).agg(min("id")).head().getLong(0) == 0L
    }.get
    // GDPR-shaped equality delete: 5 keys, all inside B's range
    val (_, nk) = IcebergWrite.equalityDelete(spark, dir,
      (1000L until 1005L).toDF("id").coalesce(1))
    assert(nk == 5)
    // a LATER append overlapping the deleted keys: seq ABOVE the
    // delete — never masked, never dirty
    IcebergWrite.append(
      Seq((1000L, "re"), (1002L, "re")).toDF("id", "tag").coalesce(1), dir)
    val fileC = (IcebergInterop.readIceberg(spark, dir).inputFiles.toSet
      -- filesBefore).head
    val (_, rewritten, folded) = IcebergWrite.compact(spark, dir,
      smallFileBytes = 0L)
    assert(rewritten == 1 && folded == 1,
      s"ONLY the bounds-overlapping older file rewrites: $rewritten/$folded")
    val after = IcebergInterop.readIceberg(spark, dir)
    val paths = after.inputFiles.toSet
    assert(paths.contains(fileA), "file A (bounds-excluded) must carry verbatim")
    assert(paths.contains(fileC), "file C (sequence-excluded) must carry verbatim")
    assert(after.count() == 97, s"50 + 45 + 2 rows: ${after.count()}")
    assert(after.filter(col("id").isin(1000L, 1002L)).count() == 2,
      "re-appended keys survive the fold")
    assert(after.filter(col("tag").startsWith("b_") &&
      col("id") < 1005L).count() == 0, "older masked rows folded away")
    // the delete manifests dropped: the masks are physical now
    assert(!paths.exists(_.contains("eqdelete-")))
  }

  test("rewriteManifests bin-packs 50 appendOnce batches; reads identical") {
    val dir = Files.createTempDirectory("graft-iceberg-rwman").toString
    (1 to 50).foreach { k =>
      IcebergWrite.appendOnce(Seq((k.toLong, s"b_$k")).toDF("id", "tag"),
        dir, "sink", k.toLong)
    }
    assert(manifestCount(dir) == 50, "one manifest per append before merge")
    val before = IcebergInterop.readIceberg(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    val preSnap = IcebergInterop.snapshots(spark, dir)
      .orderBy(desc("sequence_number")).head().getLong(0)
    val (snap, merged, after) = IcebergWrite.rewriteManifests(spark, dir,
      targetEntriesPerManifest = 10)
    assert(merged > 0 && after <= math.ceil(50.0 / 10).toInt,
      s"<= ceil(files/target) manifests after merge: merged=$merged after=$after")
    assert(manifestCount(dir) == after)
    // reads IDENTICAL; the rewrite is one `replace` snapshot on the log
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.select("id").as[Long].collect().sorted.toSeq == before)
    assert(IcebergInterop.snapshots(spark, dir)
      .filter(col("operation") === "replace").count() == 1)
    // pre-rewrite state still time travels through its own manifest list
    assert(IcebergInterop.readIceberg(spark, dir, Some(preSnap)).count() == 50)
    assert(snap != preSnap)
    // the exactly-once ledger rides the summaries — replay still refuses
    IcebergWrite.appendOnce(Seq((50L, "dup")).toDF("id", "tag"), dir, "sink", 50L)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 50)
    // idempotent: an already-packed list is a no-op (no new snapshot)
    val snaps0 = IcebergInterop.snapshots(spark, dir).count()
    val (_, merged2, _) = IcebergWrite.rewriteManifests(spark, dir,
      targetEntriesPerManifest = 10)
    assert(merged2 == 0 && IcebergInterop.snapshots(spark, dir).count() == snaps0)
  }

  test("rewriteManifests merges partitioned manifests with a MERGED field summary") {
    val dir = Files.createTempDirectory("graft-iceberg-rwman-part").toString
    // 4 partitioned appends × 4 buckets = 16 manifests, 4 per bucket value
    (0 until 4).foreach { k =>
      IcebergWrite.appendPartitioned(
        (0L until 40L).map(i => (i, s"r$k-$i")).toDF("id", "tag"),
        dir, "id", "bucket[4]")
    }
    assert(manifestCount(dir) == 16)
    val (_, merged, after) = IcebergWrite.rewriteManifests(spark, dir,
      targetEntriesPerManifest = 1000)
    assert(merged == 15 && after == 1, s"merged=$merged after=$after")
    // the merged summary spans bucket values 0..3 — a point read still
    // prunes NOTHING here (one manifest holds all buckets), but the
    // values must all still be reachable and correct
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 160)
    assert(IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((17.0, 17.0)))).count() == 4)
    // delete + compact after a manifest merge still works end-to-end
    IcebergWrite.deleteWhere(spark, dir, col("id") < 5)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 140)
  }

  test("rewriteManifests keeps skipping when bins align with values") {
    val dir = Files.createTempDirectory("graft-iceberg-rwman-skip").toString
    // two single-value appends per partition value, in value order →
    // the manifest list carries per-value ADJACENT pairs
    Seq("g1", "g2", "g3").foreach { g =>
      (0 until 2).foreach { k =>
        IcebergWrite.appendPartitioned(
          Seq((g.last.toLong * 10 + k, g)).toDF("id", "grp"), dir, "grp")
      }
    }
    assert(manifestCount(dir) == 6)
    // target 2 entries/manifest: bins align with values — each merged
    // manifest covers exactly one value, and its MERGED summary keeps
    // the point read pruning to one manifest
    val (_, merged, after) = IcebergWrite.rewriteManifests(spark, dir,
      targetEntriesPerManifest = 2)
    assert(merged == 3 && after == 3, s"merged=$merged after=$after")
    val hit = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g2"))
    assert(hit.count() == 2)
    val (read, skipped) = IcebergInterop.lastManifestScan
    assert(read == 1 && skipped == 2,
      s"merged summaries must still skip: read=$read skipped=$skipped")
  }

  test("optimizeZOrder: 2-D prune after the rewrite; deletes fold; lineage holds") {
    val dir = Files.createTempDirectory("graft-iceberg-zorder").toString
    // 64x64 grid landed hash-scattered: every file spans BOTH dims, so
    // nothing prunes before the re-layout
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    IcebergWrite.appendLineage(grid.repartition(8, col("id")), dir)
    IcebergWrite.deleteWhereDV(spark, dir, col("id") % 17 === 0)
    val box = Map("x" -> ((0.0, 15.0)), "y" -> ((0.0, 15.0)))
    assert(IcebergInterop.readIcebergWhere(spark, dir, box)
      .inputFiles.length == 8, "scattered layout: no file prunes")
    val before = IcebergInterop.readIceberg(spark, dir, withLineage = true)
      .select("id", "x", "y", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val totalBytes = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // SQL surface, target ~8 output files
    val res = spark.sql(s"OPTIMIZE iceberg.`$dir` ZORDER BY (x, y)")
    assert(res.columns.toSeq == Seq("files_rewritten", "files_written"))
    assert(res.head().getLong(0) == 8L)
    val zres = graft.io.IcebergWrite.optimizeZOrder(spark, dir, Seq("x", "y"),
      targetFileSizeBytes = math.max(totalBytes / 8, 1L))
    assert(zres._3 > 1, s"want multiple clustered files, got ${zres._3}")
    val after = IcebergInterop.readIceberg(spark, dir, withLineage = true)
      .select("id", "x", "y", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(after == before, "z-order must not change rows or identities")
    val pruned = IcebergInterop.readIcebergWhere(spark, dir, box)
    assert(pruned.inputFiles.length < zres._3,
      s"z layout must prune the 2-D box: ${pruned.inputFiles.length} of ${zres._3}")
    assert(pruned.count() == before.count(t => t._2 <= 15 && t._3 <= 15))
    // delete content folded away: a fresh compact sees nothing dirty
    val (_, rew, folded) = IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    assert(rew == 0 && folded == 0, "no delete files may survive the z rewrite")
    // partitioned tables refuse
    val part = Files.createTempDirectory("graft-iceberg-zorder-part").toString
    IcebergWrite.appendPartitioned(grid.select(col("id"), col("x")), part, "x")
    intercept[IllegalArgumentException](
      IcebergWrite.optimizeZOrder(spark, part, Seq("id")))
  }

  test("rewritePositionDeletes folds delete files; data untouched; reads identical") {
    val dir = Files.createTempDirectory("graft-ice-rpd").toString
    import spark.implicits._
    IcebergWrite.append((0L until 30L).map(i => (i, i % 3, s"t$i"))
      .toDF("id", "k", "tag").repartition(3), dir)
    // accumulate a MoR-heavy delete history: 2 parquet position-delete
    // commits, 2 DV commits (the second REPLACES the first's vectors on
    // shared files → a stale blob), 1 equality delete
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.deleteWhereDV(spark, dir, col("id") === 10L)
    IcebergWrite.deleteWhereDV(spark, dir, col("id") === 11L)
    IcebergWrite.equalityDelete(spark, dir, Seq(20L).toDF("id").coalesce(1))
    val dataBefore = IcebergInterop.liveDataPaths(spark, dir).sorted
    def rows(): Set[String] = IcebergInterop.readIceberg(spark, dir)
      .collect().map(_.toString).toSet
    val maskedBefore = rows()
    assert(maskedBefore.size == 25)
    val (snap, before, after) = IcebergWrite.rewritePositionDeletes(spark, dir)
    assert(before == 5 && after == 3, s"fold $before -> $after") // dv+pos+eq
    // data files untouched BY PATH IDENTITY; masked reads identical
    assert(IcebergInterop.liveDataPaths(spark, dir).sorted == dataBefore)
    assert(rows() == maskedBefore)
    // the rewrite is a replace: changelog-silent, tailer-passable
    val ch = graft.io.IcebergChangelog.readChangesBetween(spark, dir)
    assert(!ch.select("_commit_snapshot_id").distinct()
      .as[Long].collect().contains(snap), "the rewrite emits no changes")
    assert(IcebergInterop.streamAddedFiles(spark, dir, snap).isEmpty,
      "an incremental tailer passes the rewrite silently")
    // idempotent: a second run has nothing to fold — through SQL too
    val sqlRow = spark.sql(s"OPTIMIZE iceberg.`$dir` REWRITE POSITION DELETES")
      .head()
    assert(sqlRow.getLong(0) == sqlRow.getLong(1), "second fold is a no-op")
    val (snap2, b2, a2) = IcebergWrite.rewritePositionDeletes(spark, dir)
    assert(snap2 == snap && b2 == a2)
    // deletes still COMPOSE after the fold: a new delete + compact work
    IcebergWrite.deleteWhereDV(spark, dir, col("id") === 12L)
    assert(rows().size == 24)
    IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    assert(rows().size == 24)
    // a graft-PARTITIONED table folds too (its delete manifests ride
    // the empty spec 0; the data manifests keep their own spec)
    val pdir = Files.createTempDirectory("graft-ice-rpd-part").toString + "/t"
    IcebergWrite.appendPartitioned((0L until 20L).map(i => (i, s"g${i % 4}"))
      .toDF("id", "grp"), pdir, "grp")
    IcebergWrite.deleteWhereDV(spark, pdir, col("id") === 3L)
    IcebergWrite.deleteWhereDV(spark, pdir, col("id") === 4L)
    val pBefore = IcebergInterop.readIceberg(spark, pdir)
      .collect().map(_.toString).toSet
    val (_, pb, pa) = IcebergWrite.rewritePositionDeletes(spark, pdir)
    assert(pb == 2 && pa == 1)
    assert(IcebergInterop.readIceberg(spark, pdir)
      .collect().map(_.toString).toSet == pBefore)
    // manifest-level partition skipping SURVIVES (data manifests verbatim)
    IcebergInterop.readIceberg(spark, pdir, stringEq = Map("grp" -> "g1"))
      .collect()
    assert(IcebergInterop.lastManifestScan._2 > 0,
      "partition pruning must survive the delete fold")
  }
}
