package graft

import java.nio.file.Files
import graft.io.{IcebergChangelog, IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg CHANGELOG reads ([[IcebergChangelog]]): "what changed
  * between snapshot A and B" with deletes resolved to preimage rows —
  * position deletes, DV diffs (new ∖ prior), equality deletes, true
  * overwrites — plus the `readChanges` streaming mode that CONSUMES
  * delete snapshots instead of refusing them. */
class IcebergChangelogSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Multiset of full-row strings for net-state reconstruction. */
  private def bag(rows: Seq[String]): Map[String, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  test("mixed history: inserts/deletes reconstruct the final state exactly") {
    val dir = Files.createTempDirectory("graft-ice-changelog").toString
    val s1 = IcebergWrite.append(
      (0L until 20L).map(i => (i, i * 10L, s"a_$i")).toDF("id", "score", "tag")
        .repartitionByRange(2, col("id")), dir)
    IcebergWrite.append(
      (20L until 30L).map(i => (i, i * 10L, s"b_$i")).toDF("id", "score", "tag"), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") < 5) // position deletes
    IcebergWrite.updateWhereDV(spark, dir, // DV masks + postimages
      col("id") >= 10 && col("id") < 13, Map("score" -> lit(999L)))
    IcebergWrite.equalityDelete(spark, dir, // strictly-older key masks
      Seq(7L, 10L, 25L).toDF("id").coalesce(1))
    IcebergWrite.compact(spark, dir, smallFileBytes = 0L) // replace: silent

    val ch = IcebergChangelog.readChangesBetween(spark, dir)
    val byType = ch.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts: 20 + 10 + 3 postimages; deletes: 5 pos + 3 DV preimages
    // + 3 equality (ids 7, 10@999, 25)
    assert(byType("insert") == 33, s"$byType")
    assert(byType("delete") == 11, s"$byType")
    // ordinals are the commit order; the compact emitted NOTHING
    assert(ch.select("_change_ordinal").distinct().count() == 5)
    // net reconstruction: inserts ∖ deletes == the final live table
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("id", "score", "tag").collect().map(_.toString).toSeq
    val ins = bag(rowsOf(ch.filter(col("_change_type") === "insert")))
    val del = bag(rowsOf(ch.filter(col("_change_type") === "delete")))
    val net = ins.map { case (k, n) => k -> (n - del.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(del.forall { case (k, n) => ins.getOrElse(k, 0) >= n },
      "every delete preimage must have been inserted earlier")
    val actual = bag(rowsOf(IcebergInterop.readIceberg(spark, dir)))
    assert(net == actual, s"changelog must reconstruct the table\nnet=$net\nactual=$actual")
    // a bounded range: changes strictly after s1 = everything but the
    // first append's 20 inserts
    val tail = IcebergChangelog.readChangesBetween(spark, dir, Some(s1))
    assert(tail.count() == 33 + 11 - 20)
    // DV diff discipline: the update emitted ONLY the 3 newly-masked
    // preimages even though masks compose
    val updDeletes = ch.filter(col("_change_type") === "delete" &&
      col("id").isin(10L, 11L, 12L) && col("score") =!= 999L)
    assert(updDeletes.count() == 3)
  }

  test("true overwrite emits parent-live deletes + fresh inserts") {
    val dir = Files.createTempDirectory("graft-ice-changelog-ovr").toString
    IcebergWrite.append((0L until 8L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    IcebergWrite.overwrite((100L until 103L).map(i => (i, s"n_$i")).toDF("id", "tag"), dir)
    val ch = IcebergChangelog.readChangesBetween(spark, dir)
    assert(ch.filter(col("_change_type") === "delete").count() == 8)
    assert(ch.filter(col("_change_type") === "insert").count() == 8 + 3)
    val net = ch.filter(col("_change_type") === "insert").count() -
      ch.filter(col("_change_type") === "delete").count()
    assert(net == IcebergInterop.readIceberg(spark, dir).count())
  }

  test("streaming readChanges consumes delete snapshots without flags") {
    val dir = Files.createTempDirectory("graft-ice-changelog-stream").toString
    IcebergWrite.append(
      (0L until 10L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    val buf = scala.collection.mutable.ListBuffer.empty[(Long, String, String)]
    val q = spark.readStream.format("graft-iceberg")
      .option("readChanges", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id", "tag", "_change_type")
          .as[(Long, String, String)].collect()
        if (rows.nonEmpty) buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(buf.synchronized(buf.count(_._3 == "insert")) == 10,
        "origin backfill arrives as inserts")
      // a DELETE snapshot mid-stream: CONSUMED as preimage rows — the
      // raw mode refuses this without ignoreDeletes
      IcebergWrite.deleteWhere(spark, dir, col("id") < 3)
      // an UPDATE: preimage deletes + postimage inserts
      IcebergWrite.updateWhere(spark, dir, col("id") === 5L,
        Map("tag" -> lit("updated")))
      // a manifest merge: silent
      IcebergWrite.rewriteManifests(spark, dir, targetEntriesPerManifest = 100)
      IcebergWrite.append(Seq((50L, "late")).toDF("id", "tag"), dir)
      q.processAllAvailable()
    } finally q.stop()
    val all = buf.synchronized(buf.toList)
    assert(all.count(_._3 == "delete") == 4, s"3 deletes + 1 update preimage: $all")
    assert(all.count(_._3 == "insert") == 12, "10 origin + postimage + late append")
    assert(all.exists(r => r._1 == 5L && r._2 == "updated" && r._3 == "insert"))
    assert(all.exists(r => r._1 == 5L && r._2 == "a_5" && r._3 == "delete"))
    // exactly-once across a restart
    val buf2 = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    IcebergWrite.append(Seq((60L, "post")).toDF("id", "tag"), dir)
    val q2 = spark.readStream.format("graft-iceberg")
      .option("readChanges", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id", "_change_type").as[(Long, String)].collect()
        if (rows.nonEmpty) buf2.synchronized { buf2 ++= rows }
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(buf2.synchronized(buf2.toList) == List((60L, "insert")),
      s"restart resumes past consumed change sets: ${buf2.toList}")
  }

  test("streaming readChanges consumes a rollback as its net diff") {
    val dir = Files.createTempDirectory("graft-ice-changelog-rbs").toString
    IcebergWrite.append((0L until 6L).map(i => (i, s"a_$i")).toDF("id", "tag")
      .coalesce(1), dir)
    val buf = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-iceberg")
      .option("readChanges", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id", "_change_type").as[(Long, String)].collect()
        if (rows.nonEmpty) buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val pre = IcebergInterop.readJson(spark,
        IcebergInterop.currentMetadataPath(spark, dir))
        .path("current-snapshot-id").asLong
      IcebergWrite.append((10L until 13L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
      q.processAllAvailable()
      // an operator restores mid-stream: the consumer receives the
      // NET diff instead of the stream dying
      IcebergWrite.rollbackTo(spark, dir, pre)
      q.processAllAvailable()
    } finally q.stop()
    val all = buf.synchronized(buf.toList)
    assert(all.filter(_._2 == "delete").map(_._1).toSet == Set(10L, 11L, 12L),
      s"the rollback nets out the dropped append: $all")
    assert(all.count(_._2 == "insert") == 9, "6 origin + 3 appended")
  }

  test("rollback emits the net diff: dropped appends delete, undeletes insert") {
    val dir = Files.createTempDirectory("graft-ice-changelog-rb").toString
    IcebergWrite.append((0L until 10L).map(i => (i, s"a_$i")).toDF("id", "tag")
      .coalesce(1), dir)
    IcebergWrite.deleteWhereDV(spark, dir, col("id") < 3)         // masks 0,1,2
    val preAppend = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
      .path("current-snapshot-id").asLong
    IcebergWrite.append((20L until 25L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
    // roll back past the append AND past the delete: the appended rows
    // net out as deletes, nothing else moved
    IcebergWrite.rollbackTo(spark, dir, preAppend)
    val ch = IcebergChangelog.readChangesBetween(spark, dir).localCheckpoint(false)
    val rb = ch.filter(col("_change_ordinal") === 4L) // the rollback's seq
    assert(rb.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet == (20L until 25L).toSet,
      "the rolled-back append nets out as deletes")
    assert(rb.filter(col("_change_type") === "insert").count() == 0)
    // net reconstruction across the WHOLE history incl. the rollback
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("id", "tag").collect().map(_.toString).toSeq
    val ins = bag(rowsOf(ch.filter(col("_change_type") === "insert")))
    val del = bag(rowsOf(ch.filter(col("_change_type") === "delete")))
    val net = ins.map { case (k, n) => k -> (n - del.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(net == bag(rowsOf(IcebergInterop.readIceberg(spark, dir))))
    // now a rollback that UNDELETES: restore the pre-delete snapshot
    val first = IcebergChangelog.readChangesBetween(spark, dir)
      .select("_commit_snapshot_id").orderBy(col("_change_ordinal"))
      .as[Long].head()
    IcebergWrite.rollbackTo(spark, dir, first)
    val ch2 = IcebergChangelog.readChangesBetween(spark, dir).localCheckpoint(false)
    val rb2 = ch2.filter(col("_change_ordinal") === 5L)
    assert(rb2.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L),
      "a rollback past a delete UNDELETES — the masked rows insert back")
    assert(rb2.filter(col("_change_type") === "delete").count() == 0)
    val ins2 = bag(rowsOf(ch2.filter(col("_change_type") === "insert")))
    val del2 = bag(rowsOf(ch2.filter(col("_change_type") === "delete")))
    val net2 = ins2.map { case (k, n) => k -> (n - del2.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(net2 == bag(rowsOf(IcebergInterop.readIceberg(spark, dir))),
      "the fold survives an operator's restore")
  }

  test("lineage attach: driver map and distributed join give identical ids") {
    val dir = Files.createTempDirectory("graft-ice-changelog-lmap").toString
    // the q213 op mix: sorted lineage appends, a DV update, a DV delete
    IcebergWrite.appendLineage((0L until 12L).map(i => (i, i * 10L))
      .toDF("id", "score").repartition(1).sortWithinPartitions("id"), dir)
    IcebergWrite.append((12L until 20L).map(i => (i, i * 10L))
      .toDF("id", "score").repartition(1).sortWithinPartitions("id"), dir)
    IcebergWrite.updateWhereDV(spark, dir, col("id") % 4 === 0L,
      Map("score" -> (col("score") + 1000L)))
    IcebergWrite.deleteWhereDV(spark, dir, col("id") % 5 === 0L)
    def rows(): Set[String] = IcebergChangelog
      .readChangesBetween(spark, dir, withLineage = true)
      .select("id", "score", "_row_id", "_change_type", "_change_ordinal")
      .collect().map(_.toString).toSet
    val viaMap = rows()
    spark.conf.set(IcebergChangelog.LineageDriverManifestsConf, "0")
    try {
      val viaJoin = rows()
      assert(viaJoin == viaMap,
        "the distributed manifest-entries join must produce bit-identical ids")
      // the strict no-first_row_id refusal fires on the executor path too
      val plainDir = Files.createTempDirectory("graft-ice-lmap-plain").toString
      IcebergWrite.append(Seq((1L, "x")).toDF("id", "tag"), plainDir)
      val ex = intercept[Exception] {
        IcebergChangelog.firstRowIdsDF(spark,
          IcebergInterop.manifestListOf(spark, plainDir,
            IcebergInterop.readJson(spark,
              IcebergInterop.currentMetadataPath(spark, plainDir))
              .path("current-snapshot-id").asLong)).collect()
      }
      assert(ex.getMessage.contains("first_row_id") ||
        Option(ex.getCause).exists(_.getMessage.contains("first_row_id")))
    } finally spark.conf.unset(IcebergChangelog.LineageDriverManifestsConf)
  }

  test("rollback past parquet position / equality deletes emits undeletes") {
    val dir = Files.createTempDirectory("graft-ice-changelog-rbp").toString
    IcebergWrite.append((0L until 8L).map(i => (i, s"a_$i")).toDF("id", "tag")
      .coalesce(1), dir)
    val pre = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
      .path("current-snapshot-id").asLong
    IcebergWrite.deleteWhere(spark, dir, col("id") < 2)          // parquet pos
    IcebergWrite.equalityDelete(spark, dir, Seq(5L).toDF("id").coalesce(1))
    IcebergWrite.rollbackTo(spark, dir, pre)                     // undelete all
    val ch = IcebergChangelog.readChangesBetween(spark, dir).localCheckpoint(false)
    val rb = ch.filter(col("_change_ordinal") === 4L)
    assert(rb.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 5L),
      "position AND equality masks roll back as undelete inserts")
    assert(rb.filter(col("_change_type") === "delete").count() == 0)
    // fold reconstructs the restored table
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("id", "tag").collect().map(_.toString).toSeq
    val ins = bag(rowsOf(ch.filter(col("_change_type") === "insert")))
    val del = bag(rowsOf(ch.filter(col("_change_type") === "delete")))
    val net = ins.map { case (k, n) => k -> (n - del.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(net == bag(rowsOf(IcebergInterop.readIceberg(spark, dir))))
  }

  test("rollback past an equality delete re-diffs only bounds-admitted files") {
    val dir = Files.createTempDirectory("graft-ice-rb-eqprune").toString
    // three disjoint key-band files, committed separately
    IcebergWrite.append((0L until 10L).map(i => (i, s"a_$i")).toDF("id", "tag")
      .coalesce(1), dir)
    IcebergWrite.append((100L until 110L).map(i => (i, s"b_$i")).toDF("id", "tag")
      .coalesce(1), dir)
    IcebergWrite.append((200L until 210L).map(i => (i, s"c_$i")).toDF("id", "tag")
      .coalesce(1), dir)
    val pre = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
      .path("current-snapshot-id").asLong
    IcebergWrite.equalityDelete(spark, dir, Seq(105L).toDF("id").coalesce(1))
    IcebergWrite.rollbackTo(spark, dir, pre) // restore past the eq delete
    val ch = IcebergChangelog.readChangesBetween(spark, dir).localCheckpoint(false)
    val rbOrd = ch.agg(max(col("_change_ordinal"))).head().getLong(0)
    val rb = ch.filter(col("_change_ordinal") === rbOrd)
    assert(rb.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet == Set(105L),
      "the rollback undeletes exactly the masked key")
    assert(rb.filter(col("_change_type") === "delete").count() == 0)
    // scanned-file introspection: all three files are common between the
    // states, but only the 100–109 file's bounds admit key 105 — the
    // 0–9 and 200–209 files must never be re-read by the diff
    val (common, reMasked) = IcebergChangelog.lastRollbackReMask
    assert(common.size == 3, s"common=$common")
    assert(reMasked.size == 1,
      s"bounds must exclude the disjoint-key files from the re-diff: $reMasked")
    // and the fold still reconstructs the restored table exactly
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("id", "tag").collect().map(_.toString).toSeq
    val ins = bag(rowsOf(ch.filter(col("_change_type") === "insert")))
    val del = bag(rowsOf(ch.filter(col("_change_type") === "delete")))
    val net = ins.map { case (k, n) => k -> (n - del.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(net == bag(rowsOf(IcebergInterop.readIceberg(spark, dir))))
  }

  test("lineage changelog: an update's delete/insert pair shares one _row_id") {
    val dir = Files.createTempDirectory("graft-changelog-lineage").toString
    IcebergWrite.appendLineage((0L until 20L).map(i => (i, i * 10))
      .toDF("id", "v").repartition(1).sortWithinPartitions("id"), dir) // seq 1
    IcebergWrite.updateWhereDV(spark, dir, col("id") % 4 === 1,
      Map("v" -> (col("v") + 100L)))                                   // seq 2
    IcebergWrite.deleteWhereDV(spark, dir, col("id") === 2L)           // seq 3
    IcebergWrite.compact(spark, dir, smallFileBytes = 0L)              // seq 4: silent
    val ch = IcebergChangelog.readChangesBetween(spark, dir,
      withLineage = true).localCheckpoint(false)
    assert(ch.columns.contains("_row_id"))
    assert(ch.agg(max(col("_change_ordinal"))).head().getLong(0) == 3L,
      "compaction emits nothing")
    // seq 1 inserts: sorted single-file append => _row_id == id
    val ins1 = ch.filter(col("_change_ordinal") === 1)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ins1 == (0L until 20L).map(i => i -> i).toMap)
    // seq 2: the update's delete/insert PAIR shares one _row_id per key
    val updDel = ch.filter(col("_change_ordinal") === 2 &&
        col("_change_type") === "delete")
      .select("id", "_row_id", "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val updIns = ch.filter(col("_change_ordinal") === 2 &&
        col("_change_type") === "insert")
      .select("id", "_row_id", "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(updDel.keySet == (0L until 20L).filter(_ % 4 == 1).toSet)
    assert(updIns.keySet == updDel.keySet)
    updDel.foreach { case (id, (rid, vOld)) =>
      assert(updIns(id)._1 == rid, s"id $id: pair must share _row_id")
      assert(vOld == id * 10 && updIns(id)._2 == id * 10 + 100)
    }
    // seq 3: the plain delete's preimage keeps its id too
    val del3 = ch.filter(col("_change_ordinal") === 3)
      .select("id", "_row_id", "_change_type").collect()
    assert(del3.length == 1 && del3.head.getLong(0) == 2L &&
      del3.head.getLong(1) == 2L && del3.head.getString(2) == "delete")
    // non-lineage reads stay shaped as before
    assert(!IcebergChangelog.readChangesBetween(spark, dir)
      .columns.contains("_row_id"))
  }
}
