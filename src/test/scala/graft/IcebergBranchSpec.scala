package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch writes / WRITE-AUDIT-PUBLISH (iceberg.apache.org/spec/
  * "References"): commits inside [[IcebergWrite.onBranch]] advance a
  * named ref with parentage off the BRANCH head while `main` /
  * `current-snapshot-id` stay untouched; audits read the branch by
  * ref; [[IcebergWrite.fastForward]] publishes (pure fast-forward
  * only); the SQL front-end reads `VERSION AS OF '<ref>'`. */
class IcebergBranchSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ids(dir: String, snap: Option[Long] = None): Set[Long] =
    IcebergInterop.readIceberg(spark, dir, snap)
      .select("id").as[Long].collect().toSet
  private def branchIds(dir: String, ref: String): Set[Long] =
    ids(dir, Some(IcebergInterop.snapshotOfRef(spark, dir, ref)))

  test("WAP: stage on a branch, main pinned, fast-forward publishes") {
    val dir = Files.createTempDirectory("graft-wap").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val meta0 = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    val logLen0 = meta0.path("snapshot-log").size
    // two staged commits — implicit fork from main on the first
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((10L, "n10")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((11L, "n11")).toDF("id", "name"), dir)
    }
    assert(ids(dir) == (0L until 4L).toSet, "main must not move")
    assert(branchIds(dir, "audit") == (0L until 4L).toSet + 10L + 11L,
      "the branch sees the staged commits")
    val meta1 = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    assert(meta1.path("snapshot-log").size == logLen0,
      "branch commits never touch main's snapshot-log")
    assert(meta1.path("current-snapshot-id").asLong ==
      meta0.path("current-snapshot-id").asLong)
    // SQL audit read by ref name, pre-publish
    val sqlN = spark.sql(
      s"SELECT count(*) AS n FROM iceberg.`$dir` VERSION AS OF 'audit'")
      .head().getLong(0)
    assert(sqlN == 6L)
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`")
      .head().getLong(0) == 4L)
    // publish through the SQL front-end
    val published = spark.sql(
      s"ALTER TABLE iceberg.`$dir` FAST FORWARD BRANCH audit")
      .head().getLong(0)
    assert(ids(dir) == (0L until 4L).toSet + 10L + 11L)
    assert(published == IcebergInterop.snapshotOfRef(spark, dir, "audit"))
    // idempotent when nothing staged
    assert(IcebergWrite.fastForward(spark, dir, "audit") == published)
  }

  test("staged branch snapshots never leak into main consumers; expiry keeps the chain") {
    val tmp = Files.createTempDirectory("graft-wap-leak").toString
    val dir = s"$tmp/t"
    IcebergWrite.append((0L until 3L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    // a main-table stream running while a branch stages
    val buf = scala.collection.mutable.ListBuffer.empty[Long]
    val q = spark.readStream.format("graft-iceberg").load(dir)
      .writeStream.option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id").as[Long].collect()
        if (rows.nonEmpty) buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      q.processAllAvailable()
      IcebergWrite.onBranch("audit") {
        IcebergWrite.append(Seq((10L, "staged")).toDF("id", "name"), dir)
        IcebergWrite.append(Seq((11L, "staged")).toDF("id", "name"), dir)
      }
      IcebergWrite.append(Seq((5L, "main")).toDF("id", "name"), dir)
      q.processAllAvailable()
      assert(buf.synchronized(buf.toSet) == Set(0L, 1L, 2L, 5L),
        "un-published branch rows must never reach a main consumer")
      // the batch changelog is main-history only too
      assert(graft.io.IcebergChangelog.readChangesBetween(spark, dir)
        .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L, 5L))
      // expiry keeps the branch's ANCESTRY chain while the ref exists,
      // so the publish still fast-forwards after maintenance...
      IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
      val ex = intercept[IllegalArgumentException] {
        IcebergWrite.fastForward(spark, dir, "audit")
      } // main advanced past the fork — the DIVERGENCE refusal, not a
        // broken-chain one
      assert(ex.getMessage.contains("not an ancestor"))
      // ...and the branch itself still reads whole
      assert(branchIds(dir, "audit") == Set(0L, 1L, 2L, 10L, 11L))
      // the stream consumed across the expiry without a false
      // sequence-gap failure (branch seqs legitimately absent on main)
      IcebergWrite.append(Seq((6L, "late")).toDF("id", "name"), dir)
      q.processAllAvailable()
      assert(buf.synchronized(buf.toSet) == Set(0L, 1L, 2L, 5L, 6L))
    } finally q.stop()
  }

  test("expiry keeps main's post-fork segment: attribution survives maintenance") {
    val dir = Files.createTempDirectory("graft-wap-seg").toString + "/t"
    IcebergWrite.append(Seq((1L, "s1")).toDF("id", "name"), dir)      // fork point
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((10L, "b1")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((11L, "b2")).toDF("id", "name"), dir)
    }
    IcebergWrite.append(Seq((2L, "m2")).toDF("id", "name"), dir)      // post-fork
    IcebergWrite.append(Seq((3L, "m3")).toDF("id", "name"), dir)      // head
    IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    // the post-fork main intermediate (m2) must have survived, or the
    // attribution walk breaks and staged rows leak into main consumers
    assert(graft.io.IcebergChangelog.readChangesBetween(spark, dir)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "staged branch rows must stay invisible after maintenance")
    val refs = spark.sql(s"SELECT * FROM graft_iceberg_refs('$dir')")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(refs("audit") == 2L, "the audit view survives expiry")
  }

  test("expiry-then-publish: a clean (undiverged) staged branch survives") {
    val dir = Files.createTempDirectory("graft-wap-exp").toString + "/t"
    IcebergWrite.append((0L until 3L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((10L, "b1")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((11L, "b2")).toDF("id", "name"), dir)
    }
    val (_, _) = IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    // the intermediate branch snapshot b1 must have survived (the
    // ancestry walk needs it) — publish succeeds
    IcebergWrite.fastForward(spark, dir, "audit")
    assert(ids(dir) == Set(0L, 1L, 2L, 10L, 11L))
  }

  test("graft_iceberg_refs: the audit view of staged branches") {
    val dir = Files.createTempDirectory("graft-wap-refs").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWrite.createTag(spark, dir, "v1")
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((2L, "b")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((3L, "c")).toDF("id", "name"), dir)
    }
    val refs = spark.sql(s"SELECT * FROM graft_iceberg_refs('$dir')")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(3)))).toMap
    assert(refs("main") == (("branch", 0L)))
    assert(refs("v1") == (("tag", 0L)))
    assert(refs("audit") == (("branch", 2L)), "two staged commits ahead")
    IcebergWrite.fastForward(spark, dir, "audit")
    val after = spark.sql(s"SELECT * FROM graft_iceberg_refs('$dir')")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(after("audit") == 0L, "published: nothing staged anymore")
  }

  test("branch delete + merge leave main untouched until publish") {
    val dir = Files.createTempDirectory("graft-wap-dm").toString + "/t"
    IcebergWrite.append((0L until 10L).map(i => (i, i * 100L)).toDF("id", "v"), dir)
    IcebergWrite.createBranch(spark, dir, "fix")
    IcebergWrite.onBranch("fix") {
      val (_, nDel) = IcebergWrite.deleteWhereDV(spark, dir, col("id") >= 8L)
      assert(nDel == 2L)
      val src = Seq((0L, 9999L), (100L, 1L)).toDF("id", "v")
      val (_, upd, ins) = IcebergWrite.mergeInto(spark, dir, src, Seq("id"),
        Seq(graft.io.DeltaInterop.MatchedClause(None,
          Map("v" -> col("s.v")), delete = false)),
        Some((None, Map("id" -> col("s.id"), "v" -> col("s.v")))))
      assert(upd == 1L && ins == 1L)
    }
    assert(ids(dir) == (0L until 10L).toSet, "main pinned through delete+merge")
    val fixed = IcebergInterop.readIceberg(spark, dir,
        Some(IcebergInterop.snapshotOfRef(spark, dir, "fix")))
      .select("id", "v").as[(Long, Long)].collect().toMap
    assert(!fixed.contains(8L) && !fixed.contains(9L))
    assert(fixed(0L) == 9999L && fixed(100L) == 1L && fixed(5L) == 500L)
    IcebergWrite.fastForward(spark, dir, "fix")
    assert(ids(dir) == (0L until 8L).toSet + 100L)
  }

  test("fastForward refuses a diverged main; tags refuse writes") {
    val dir = Files.createTempDirectory("graft-wap-div").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((2L, "b")).toDF("id", "name"), dir)
    }
    // main advances independently → no longer an ancestor
    IcebergWrite.append(Seq((3L, "c")).toDF("id", "name"), dir)
    val ex = intercept[IllegalArgumentException] {
      IcebergWrite.fastForward(spark, dir, "audit")
    }
    assert(ex.getMessage.contains("not an ancestor"))
    IcebergWrite.createTag(spark, dir, "v1")
    val ex2 = intercept[IllegalArgumentException] {
      IcebergWrite.onBranch("v1") {
        IcebergWrite.append(Seq((4L, "d")).toDF("id", "name"), dir)
      }
    }
    assert(ex2.getMessage.contains("immutable"))
  }

  test("max-ref-age-ms: an abandoned branch ages out and releases the fork segment") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-wap-refage").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((10L, "x")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((11L, "y")).toDF("id", "name"), dir)
    }
    val stagedHead = IcebergInterop.snapshotOfRef(spark, dir, "audit")
    // declare the ref abandoned after 0 ms (re-point at its own head)
    IcebergWrite.createBranch(spark, dir, "audit", Some(stagedHead),
      maxRefAgeMs = Some(0L))
    // a FRESH branch inside its age window must survive the same expiry
    IcebergWrite.onBranch("fresh") {
      IcebergWrite.append(Seq((20L, "f")).toDF("id", "name"), dir)
    }
    val freshHead = IcebergInterop.snapshotOfRef(spark, dir, "fresh")
    IcebergWrite.createBranch(spark, dir, "fresh", Some(freshHead),
      maxRefAgeMs = Some(3600000L))
    IcebergWrite.append(Seq((2L, "b")).toDF("id", "name"), dir) // main advances
    Thread.sleep(15)
    val (nExp, _) = IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    assert(nExp > 0)
    val meta = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    assert(!meta.path("refs").has("audit"), "the aged ref must drop")
    assert(meta.path("refs").has("fresh"), "a ref inside its window survives")
    val remaining = meta.path("snapshots").elements().asScala
      .map(_.path("snapshot-id").asLong).toSet
    assert(!remaining.contains(stagedHead),
      "the aged branch's staged snapshots reclaim")
    assert(remaining.contains(freshHead), "the fresh branch's chain survives")
    assert(ids(dir) == Set(1L, 2L), "main reads on")
    assert(branchIds(dir, "fresh") == Set(1L, 20L))
  }

  test("min-snapshots-to-keep trims a declared branch tail; undeclared keeps all") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-wap-tailkeep").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((10L, "x")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((11L, "y")).toDF("id", "name"), dir)
      IcebergWrite.append(Seq((12L, "z")).toDF("id", "name"), dir)
    }
    val head = IcebergInterop.snapshotOfRef(spark, dir, "audit")
    // undeclared: expiry pins the whole staged chain (publishability)
    Thread.sleep(15)
    IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    val after1 = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
      .path("snapshots").elements().asScala.map(_.path("snapshot-id").asLong).toSet
    assert(after1.size >= 4, s"undeclared branch keeps its chain: $after1")
    // declare: keep only the newest staged snapshot, age the tail
    IcebergWrite.createBranch(spark, dir, "audit", Some(head),
      minSnapshotsToKeep = Some(1), maxSnapshotAgeMs = Some(0L))
    Thread.sleep(15)
    val (nExp, _) = IcebergWrite.expireSnapshots(spark, dir, retainMillis = 0L)
    assert(nExp >= 2, s"the staged tail beyond the head must expire (got $nExp)")
    val after2 = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
      .path("snapshots").elements().asScala.map(_.path("snapshot-id").asLong).toSet
    assert(after2.contains(head), "the branch head survives")
    // the branch still READS at head (its manifest list is self-contained
    // and the reference diff keeps every file the head references)
    assert(branchIds(dir, "audit") == Set(1L, 10L, 11L, 12L))
    assert(ids(dir) == Set(1L))
  }

  test("branch commits preserve declared ref retention properties") {
    val dir = Files.createTempDirectory("graft-wap-refprops").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWrite.createBranch(spark, dir, "audit", None,
      maxRefAgeMs = Some(12345L), minSnapshotsToKeep = Some(7))
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((2L, "b")).toDF("id", "name"), dir)
    }
    val r = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir)).path("refs").path("audit")
    assert(r.path("max-ref-age-ms").asLong == 12345L,
      "the commit advanced the ref without dropping its retention")
    assert(r.path("min-snapshots-to-keep").asInt == 7)
  }

  test("cherry-pick publishes a staged branch past a diverged main") {
    val dir = Files.createTempDirectory("graft-wap-cp").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    // stage an append AND a row-level delete on the branch
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((10L, "n10"), (11L, "n11")).toDF("id", "name"), dir)
      IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    }
    // main takes an UNRELATED append mid-audit → fast-forward refuses
    IcebergWrite.append(Seq((20L, "n20")).toDF("id", "name"), dir)
    intercept[IllegalArgumentException] {
      IcebergWrite.fastForward(spark, dir, "audit")
    }
    val published = IcebergWrite.cherryPickPublish(spark, dir, "audit")
    assert(ids(dir) == Set(0L, 2L, 3L, 10L, 11L, 20L),
      "main holds its own append, the staged rows, and the staged delete")
    val meta = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    assert(meta.path("current-snapshot-id").asLong == published)
    // the publish is ONE new snapshot parented off main's head, not a
    // head move onto the branch lineage
    val snap = {
      import scala.jdk.CollectionConverters._
      meta.path("snapshots").elements().asScala
        .find(_.path("snapshot-id").asLong == published).get
    }
    assert(snap.path("parent-snapshot-id").asLong != -1L)
    assert(ids(dir, Some(snap.path("parent-snapshot-id").asLong))
      .contains(20L), "parent is main's diverged head")
    // idempotent: a SECOND publish of the unchanged branch is a no-op —
    // its staged manifests are already on main, so nothing replays and
    // no row duplicates
    val again = IcebergWrite.cherryPickPublish(spark, dir, "audit")
    assert(again == published)
    assert(ids(dir) == Set(0L, 2L, 3L, 10L, 11L, 20L), "no duplication")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 6L)
    // the branch ref still points at the pre-publish lineage
    assert(branchIds(dir, "audit") == Set(0L, 2L, 3L, 10L, 11L))
  }

  test("cherry-pick refuses when main's changes conflict with the staged diff") {
    // (a) staged equality delete overlapping a key main appended
    val d1 = Files.createTempDirectory("graft-wap-cpc1").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), d1)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.equalityDelete(spark, d1, Seq(7L).toDF("id").coalesce(1))
    }
    IcebergWrite.append(Seq((7L, "nx")).toDF("id", "name"), d1) // main adds key 7
    val ex1 = intercept[IllegalArgumentException] {
      IcebergWrite.cherryPickPublish(spark, d1, "audit")
    }
    assert(ex1.getMessage.contains("equality delete") &&
      ex1.getMessage.contains("rebase"), ex1.getMessage)
    // (b) staged position delete whose target main rewrote away
    val d2 = Files.createTempDirectory("graft-wap-cpc2").toString + "/t"
    IcebergWrite.append((0L until 8L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), d2)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.deleteWhere(spark, d2, col("id") === 3L)
    }
    // main deletes a row then compacts → the original file is rewritten
    IcebergWrite.deleteWhere(spark, d2, col("id") === 0L)
    IcebergWrite.compact(spark, d2, smallFileBytes = 0L)
    val ex2 = intercept[IllegalArgumentException] {
      IcebergWrite.cherryPickPublish(spark, d2, "audit")
    }
    assert(ex2.getMessage.contains("no longer carries"), ex2.getMessage)
    // (c) staged data overlapping an equality delete main committed
    val d3 = Files.createTempDirectory("graft-wap-cpc3").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), d3)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((9L, "n9")).toDF("id", "name"), d3)
    }
    IcebergWrite.equalityDelete(spark, d3, Seq(9L).toDF("id").coalesce(1))
    val ex3 = intercept[IllegalArgumentException] {
      IcebergWrite.cherryPickPublish(spark, d3, "audit")
    }
    assert(ex3.getMessage.contains("masked by an equality delete"),
      ex3.getMessage)
    // (c2) the conflict survives main FOLDING the delete via compaction
    // — conflicts resolve by history, not by the live delete inventory
    val d3b = Files.createTempDirectory("graft-wap-cpc3b").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), d3b)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((2L, "resurrect")).toDF("id", "name"), d3b)
    }
    IcebergWrite.equalityDelete(spark, d3b, Seq(2L).toDF("id").coalesce(1))
    IcebergWrite.compact(spark, d3b, smallFileBytes = 0L) // folds the delete
    val ex3b = intercept[IllegalArgumentException] {
      IcebergWrite.cherryPickPublish(spark, d3b, "audit")
    }
    assert(ex3b.getMessage.contains("equality delete"), ex3b.getMessage)
    // (d) disjoint key bands DON'T conflict: same shape as (c) but the
    // staged keys sit outside the delete's bounds → publishes
    val d4 = Files.createTempDirectory("graft-wap-cpc4").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name"), d4)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((100L, "n100")).toDF("id", "name"), d4)
    }
    IcebergWrite.equalityDelete(spark, d4, Seq(2L).toDF("id").coalesce(1))
    IcebergWrite.cherryPickPublish(spark, d4, "audit")
    assert(ids(d4) == Set(0L, 1L, 3L, 100L))
  }

  test("cherry-pick refuses dueling deletion vectors on one file") {
    val dir = Files.createTempDirectory("graft-wap-cpdv").toString + "/t"
    IcebergWrite.append((0L until 8L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.deleteWhereDV(spark, dir, col("id") === 1L)
    }
    // main re-vectors the SAME file mid-audit
    IcebergWrite.deleteWhereDV(spark, dir, col("id") === 2L)
    val ex = intercept[IllegalArgumentException] {
      IcebergWrite.cherryPickPublish(spark, dir, "audit")
    }
    assert(ex.getMessage.contains("deletion vector"), ex.getMessage)
    // but a DV against the branch's OWN staged file publishes fine even
    // when main re-vectors a different file
    val d2 = Files.createTempDirectory("graft-wap-cpdv2").toString + "/t"
    IcebergWrite.append((0L until 4L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), d2)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append((10L until 14L).map(i => (i, s"s$i")).toDF("id", "name")
        .coalesce(1), d2)
      IcebergWrite.deleteWhereDV(spark, d2, col("id") === 11L)
    }
    IcebergWrite.deleteWhereDV(spark, d2, col("id") === 2L) // main, other file
    IcebergWrite.cherryPickPublish(spark, d2, "audit")
    assert(ids(d2) == Set(0L, 1L, 3L, 10L, 12L, 13L))
  }

  test("cherry-pick fast-forwards trivially when main never diverged") {
    val dir = Files.createTempDirectory("graft-wap-cpff").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((2L, "b")).toDF("id", "name"), dir)
    }
    val published = IcebergWrite.cherryPickPublish(spark, dir, "audit")
    assert(published == IcebergInterop.snapshotOfRef(spark, dir, "audit"),
      "undiverged main takes the branch head itself (pure fast-forward)")
    assert(ids(dir) == Set(1L, 2L))
  }

  test("the WAP loop drives end-to-end from SQL: retention DDL + PUBLISH") {
    val dir = Files.createTempDirectory("graft-wap-sql").toString + "/t"
    IcebergWrite.append(Seq((1L, "a")).toDF("id", "name"), dir)
    // declare the branch with retention, entirely in SQL
    spark.sql(s"ALTER TABLE iceberg.`$dir` CREATE BRANCH audit " +
      "RETAIN 7 DAYS WITH SNAPSHOT RETENTION 3 SNAPSHOTS 12 HOURS").collect()
    val r = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir)).path("refs").path("audit")
    assert(r.path("max-ref-age-ms").asLong == 7L * 86400000L)
    assert(r.path("min-snapshots-to-keep").asInt == 3)
    assert(r.path("max-snapshot-age-ms").asLong == 12L * 3600000L)
    // stage, diverge main, publish past the divergence — all checkable
    // from SQL
    IcebergWrite.onBranch("audit") {
      IcebergWrite.append(Seq((2L, "b")).toDF("id", "name"), dir)
    }
    IcebergWrite.append(Seq((3L, "c")).toDF("id", "name"), dir)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE iceberg.`$dir` FAST FORWARD BRANCH audit").collect()
    }
    spark.sql(s"ALTER TABLE iceberg.`$dir` PUBLISH BRANCH audit").collect()
    assert(ids(dir) == Set(1L, 2L, 3L))
    spark.sql(s"ALTER TABLE iceberg.`$dir` DROP BRANCH audit").collect()
    assert(!IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir)).path("refs").has("audit"))
  }

  test("branch-scoped stream tails staged commits; main consumers see none") {
    val tmp = Files.createTempDirectory("graft-wap-brstream").toString
    val dir = s"$tmp/t"
    IcebergWrite.append(Seq((0L, "seed")).toDF("id", "name"), dir)
    IcebergWrite.createBranch(spark, dir, "audit") // pin at the seed
    def tail(ckpt: String, opts: Map[String, String]) = {
      val buf = scala.collection.mutable.ListBuffer.empty[Long]
      var r = spark.readStream.format("graft-iceberg")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(dir).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = b.select("id").as[Long].collect()
          buf.synchronized { buf ++= rows }; ()
        }.start()
      (buf, q)
    }
    val (brBuf, brQ) = tail(s"$tmp/ckpt-br", Map("branch" -> "audit"))
    val (mainBuf, mainQ) = tail(s"$tmp/ckpt-main", Map.empty)
    try {
      brQ.processAllAvailable(); mainQ.processAllAvailable()
      IcebergWrite.onBranch("audit") {
        IcebergWrite.append(Seq((10L, "s1")).toDF("id", "name"), dir)
        IcebergWrite.append(Seq((11L, "s2")).toDF("id", "name"), dir)
      }
      brQ.processAllAvailable(); mainQ.processAllAvailable()
      assert(brBuf.synchronized(brBuf.sorted.toSeq) == Seq(0L, 10L, 11L),
        "the branch stream tails the staged commits")
      assert(mainBuf.synchronized(mainBuf.sorted.toSeq) == Seq(0L),
        "a main consumer of the same table sees no staged rows")
    } finally { brQ.stop(); mainQ.stop() }
    // batch changelog, branch-scoped vs main-scoped
    val brCh = graft.io.IcebergChangelog.readChangesBetween(spark, dir,
      branch = Some("audit"))
    assert(brCh.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet == Set(0L, 10L, 11L))
    val mainCh = graft.io.IcebergChangelog.readChangesBetween(spark, dir)
    assert(mainCh.select("id").as[Long].collect().toSet == Set(0L))
  }

  test("checkpointed origin pins the branch: restart with another refuses") {
    val tmp = Files.createTempDirectory("graft-wap-brpin").toString
    val dir = s"$tmp/t"
    IcebergWrite.append(Seq((0L, "seed")).toDF("id", "name"), dir)
    IcebergWrite.createBranch(spark, dir, "audit")
    def run(opts: Map[String, String]): Unit = {
      var r = spark.readStream.format("graft-iceberg")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(dir).writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => () }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run(Map("branch" -> "audit"))
    // same branch restarts cleanly on the same checkpoint
    run(Map("branch" -> "audit"))
    // a different ancestry against the stored offsets must refuse:
    // dropping the option (main) and naming another branch both fail
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Map.empty)
    }
    assert(e1.getMessage.contains("branch") ||
      Option(e1.getCause).exists(_.getMessage.contains("branch")))
    IcebergWrite.createBranch(spark, dir, "other")
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Map("branch" -> "other"))
    }
    assert(e2.getMessage.contains("ancestry-specific") ||
      Option(e2.getCause).exists(_.getMessage.contains("ancestry-specific")))
  }

  test("streaming sink lands batches on a branch, exactly-once") {
    val tmp = Files.createTempDirectory("graft-wap-stream").toString
    val dir = s"$tmp/t"
    IcebergWrite.append(Seq((0L, "seed")).toDF("id", "name"), dir)
    val src = s"$tmp/src"
    Seq((1L, "s1"), (2L, "s2")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = graft.streaming.IcebergStream.sink(spark,
      spark.readStream.schema(schema).parquet(src),
      dir, "wap-sink", s"$tmp/ckpt", branch = Some("staged"))
    try q.processAllAvailable() finally q.stop()
    assert(ids(dir) == Set(0L), "main untouched by the branch sink")
    assert(branchIds(dir, "staged") == Set(0L, 1L, 2L))
    // replay the same batch under the same appId: ledger recognizes it
    val q2 = graft.streaming.IcebergStream.sink(spark,
      spark.readStream.schema(schema).parquet(src),
      dir, "wap-sink", s"$tmp/ckpt", branch = Some("staged"))
    try q2.processAllAvailable() finally q2.stop()
    assert(branchIds(dir, "staged") == Set(0L, 1L, 2L))
    IcebergWrite.fastForward(spark, dir, "staged")
    assert(ids(dir) == Set(0L, 1L, 2L))
    // the CDC upsert sink stages on a branch too
    val src2 = s"$tmp/src2"
    Seq((1L, "fixed"), (9L, "new")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(src2)
    val q3 = graft.streaming.IcebergStream.upsertSink(spark,
      spark.readStream.schema(spark.read.parquet(src2).schema).parquet(src2),
      dir, Seq("id"), "wap-upsert", s"$tmp/ckpt2", branch = Some("cdc"))
    try q3.processAllAvailable() finally q3.stop()
    assert(ids(dir) == Set(0L, 1L, 2L), "main untouched by the branch upsert")
    val cdc = IcebergInterop.readIceberg(spark, dir,
        Some(IcebergInterop.snapshotOfRef(spark, dir, "cdc")))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(cdc(1L) == "fixed" && cdc(9L) == "new" && cdc.size == 4)
  }
}
