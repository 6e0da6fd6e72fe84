package graft

import java.nio.file.Files
import graft.io.IcebergInterop
import graft.tools.IcebergFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Foreign Apache Iceberg tables (spec-shaped v2 fixtures:
  * metadata.json + Avro manifest list + Avro manifests + parquet
  * data): append-only tables read green with schema, snapshot
  * history, and time travel; v2 row-level deletes (position and
  * equality) apply in-plan, and v3 DELETION VECTORS (Puffin
  * `deletion-vector-v1` blobs) mask through the same codegen
  * broadcast-bitmap filter the Delta DV reads use. */
class IcebergInteropSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("append-only v2 table: two snapshots read, time travel, history") {
    val dir = Files.createTempDirectory("graft-iceberg").toString
    val b1 = (0L until 100L).map(i => (i, s"a_$i", i * 1.5)).toDF("id", "tag", "v")
    val b2 = (100L until 150L).map(i => (i, s"b_$i", i * 1.5)).toDF("id", "tag", "v")
    val s1 = IcebergFixture.append(b1.repartition(3), dir)
    val s2 = IcebergFixture.append(b2.repartition(2), dir)

    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.columns.toSeq == Seq("id", "tag", "v"))
    assert(t.count() == 150)
    assert(t.agg(sum("id")).head().getLong(0) == (0L until 150L).sum)

    // time travel to the first snapshot
    val old = IcebergInterop.readIceberg(spark, dir, snapshotId = Some(s1))
    assert(old.count() == 100 && old.agg(max("id")).head().getLong(0) == 99L)

    val hist = IcebergInterop.snapshots(spark, dir)
      .orderBy("snapshot_id").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(s1, s2))
    assert(hist.forall(_.getString(3) == "append"))

    // filters and pruning ride the plain parquet scan
    assert(t.filter(col("id") < 10).count() == 10)
  }

  test("POSITION deletes apply in-plan; time travel sees the pre-delete rows") {
    val dir = Files.createTempDirectory("graft-iceberg-posdel").toString
    val s1 = IcebergFixture.append(
      (0L until 60L).map(i => (i, s"r_$i", i * 0.5)).toDF("id", "tag", "v")
        .repartition(2), dir)
    // find which physical file holds each row ordinal, then delete the
    // first two rows of each data file by (path, pos)
    val withMeta = IcebergInterop.readIceberg(spark, dir)
      .select(col("id"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("pos"))
    val victims = withMeta.filter(col("pos") < 2)
      .select("fp", "pos", "id").collect()
    assert(victims.length == 4, s"2 files × 2 rows: ${victims.length}")
    IcebergFixture.deletePositions(spark, dir,
      victims.map(r => (r.getString(0).stripPrefix("file:"), r.getLong(1))).toSeq)

    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 56)
    val deletedIds = victims.map(_.getLong(2)).toSet
    assert(t.filter(col("id").isin(deletedIds.toSeq: _*)).count() == 0,
      "exactly the targeted rows are gone")
    // the pre-delete snapshot still reads all 60
    assert(IcebergInterop.readIceberg(spark, dir, Some(s1)).count() == 60)
    // history shows the delete operation
    assert(IcebergInterop.snapshots(spark, dir)
      .filter(col("operation") === "delete").count() == 1)
  }

  test("EQUALITY deletes respect sequence ordering: only OLDER rows die") {
    val dir = Files.createTempDirectory("graft-iceberg-eqdel").toString
    // seq 1: ids 0..9; seq 2: ids 10..19
    IcebergFixture.append((0L until 10L).map(i => (i, s"a_$i", 0.0)).toDF("id", "tag", "v"), dir)
    IcebergFixture.append((10L until 20L).map(i => (i, s"b_$i", 0.0)).toDF("id", "tag", "v"), dir)
    // seq 3: equality-delete ids {3, 12, 77} — 77 matches nothing
    IcebergFixture.deleteEqualities(spark, dir, Seq(3L, 12L, 77L).toDF("id"))
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 18)
    assert(t.filter(col("id").isin(3L, 12L)).count() == 0)
    // seq 4: RE-APPEND id 3 — newer than the delete, so it SURVIVES
    IcebergFixture.append(Seq((3L, "reborn", 9.9)).toDF("id", "tag", "v"), dir)
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 19)
    assert(t2.filter(col("id") === 3L).select("tag").as[String].head() == "reborn",
      "a row appended AFTER the equality delete must not be re-deleted")
    // multi-column equality set: (id, tag) — null-safe match
    IcebergFixture.deleteEqualities(spark, dir,
      Seq((5L, "a_5"), (3L, "NOT-the-tag")).toDF("id", "tag"))
    val t3 = IcebergInterop.readIceberg(spark, dir)
    assert(t3.count() == 18)
    assert(t3.filter(col("id") === 5L).count() == 0)
    assert(t3.filter(col("id") === 3L).count() == 1, "tag mismatch → not deleted")
    // position + equality deletes COMPOSE on one table
    val victim = IcebergInterop.readIceberg(spark, dir)
      .select(col("id"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("pos"))
      .filter(col("id") === 7L).head()
    IcebergFixture.deletePositions(spark, dir,
      Seq((victim.getString(1).stripPrefix("file:"), victim.getLong(2))))
    val t4 = IcebergInterop.readIceberg(spark, dir)
    assert(t4.count() == 17 && t4.filter(col("id") === 7L).count() == 0)
  }

  test("v3 DELETION VECTORS from Puffin blobs mask rows; highest sequence wins; travel sees pre-DV") {
    val dir = Files.createTempDirectory("graft-iceberg-dv").toString
    val b1 = (0L until 50L).map(i => (i, s"a_$i")).toDF("id", "tag")
    val b2 = (50L until 80L).map(i => (i, s"b_$i")).toDF("id", "tag")
    IcebergFixture.append(b1.coalesce(1), dir)  // data file 1: row i holds id i
    IcebergFixture.append(b2.coalesce(1), dir)  // data file 2
    val meta = IcebergInterop.snapshots(spark, dir).count()
    assert(meta == 2)
    val files = {
      import org.apache.hadoop.fs.Path
      val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(new Path(dir, "data")).map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).sorted.toSeq
    }
    // identify which physical file holds the 0..49 batch
    val file1 = files.find(p0 =>
      spark.read.parquet(p0).agg(min("id")).head().getLong(0) == 0L).get
    // DV snapshot: mask row ordinals 0..9 of file 1 (ids depend on the
    // file's own row order — read them for the oracle)
    val masked = spark.read.parquet(file1).limit(10).collect().map(_.getLong(0)).toSet
    val sDv = IcebergFixture.deleteVectors(spark, dir,
      Seq((file1, (0L until 10L).toArray)))
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 70)
    assert(t.collect().map(_.getLong(0)).toSet ==
      ((0L until 80L).toSet -- masked))
    // pre-DV snapshot still reads all 80 (time travel)
    val snaps = IcebergInterop.snapshots(spark, dir).orderBy("snapshot_id").collect()
    val before = IcebergInterop.readIceberg(spark, dir,
      snapshotId = Some(snaps(1).getLong(0)))
    assert(before.count() == 80)
    // a LATER DV on the same file REPLACES the first (highest sequence
    // wins — never a union)
    IcebergFixture.deleteVectors(spark, dir, Seq((file1, Array(0L))))
    val t2 = IcebergInterop.readIceberg(spark, dir)
    assert(t2.count() == 79)
    assert(sDv > 0)
  }

  test("v3 ROW LINEAGE: _row_id = first_row_id + position; DV survivors keep their ids") {
    val dir = Files.createTempDirectory("graft-iceberg-lineage").toString
    val b1 = (0L until 50L).map(i => (i, s"a_$i")).toDF("id", "tag")
    val b2 = (50L until 80L).map(i => (i, s"b_$i")).toDF("id", "tag")
    IcebergFixture.append(b1.repartition(1).sortWithinPartitions("id"), dir, lineage = true)
    IcebergFixture.append(b2.repartition(1).sortWithinPartitions("id"), dir, lineage = true)
    val t = IcebergInterop.readIceberg(spark, dir, withLineage = true)
    assert(t.columns.toSeq ==
      Seq("id", "tag", "_row_id", "_last_updated_sequence_number"))
    // nothing rewrote these rows: every last-updated is the append's
    // own data sequence number
    assert(t.select("_last_updated_sequence_number").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    // sorted single-file appends: _row_id tracks id exactly (file 1
    // ranges 0..49 from watermark 0, file 2 ranges 50..79)
    assert(t.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted ==
      (0L until 80L).map(i => (i, i)))
    // a DV masks ordinals 0..9 of the first file; SURVIVORS keep their
    // ORIGINAL row ids — lineage attaches before masking
    val file1 = {
      import org.apache.hadoop.fs.Path
      val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(new Path(dir, "data")).map(_.getPath.toString)
        .filter(_.endsWith(".parquet"))
        .find(p0 => spark.read.parquet(p0).agg(min("id")).head().getLong(0) == 0L).get
    }
    IcebergFixture.deleteVectors(spark, dir, Seq((file1, (0L until 10L).toArray)))
    val t2 = IcebergInterop.readIceberg(spark, dir, withLineage = true)
    assert(t2.select("_row_id").collect().map(_.getLong(0)).toSet ==
      (10L until 80L).toSet)
    // non-lineage tables refuse the flag loudly
    val plain = Files.createTempDirectory("graft-iceberg-nolineage").toString
    IcebergFixture.append(b1, plain)
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, plain, withLineage = true).count())
    assert(e.getMessage.contains("first_row_id"))
  }

  test("SCHEMA EVOLUTION: rename + add + drop read by field id; time travel keeps the old shape") {
    val dir = Files.createTempDirectory("graft-iceberg-evolve").toString
    val s1 = IcebergFixture.append(
      (0L until 40L).map(i => (i, s"t_$i", i * 2.0)).toDF("id", "tag", "v"), dir)
    // rename tag->label: OLD files must keep reading (id resolution,
    // not name matching — a name-based read would return nulls)
    IcebergFixture.renameColumn(spark, dir, "tag", "label")
    val renamed = IcebergInterop.readIceberg(spark, dir)
    assert(renamed.columns.toSeq == Seq("id", "label", "v"))
    assert(renamed.filter(col("label").isNull).count() == 0,
      "pre-rename files must resolve the renamed column by field id")
    assert(renamed.filter(col("label") === "t_7").count() == 1)

    // add score: pre-add files read null; post-add appends carry it
    IcebergFixture.addColumn(spark, dir, "score", org.apache.spark.sql.types.DoubleType)
    IcebergFixture.append(
      (40L until 50L).map(i => (i, s"t_$i", i * 2.0, i * 0.1))
        .toDF("id", "label", "v", "score"), dir)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 50)
    assert(t.filter(col("score").isNull).count() == 40, "pre-add rows are null")
    assert(t.filter(col("score").isNotNull).count() == 10)

    // a NEW column must not capture a dropped column's bytes: drop v,
    // then add a fresh double column — ids never recycle
    IcebergFixture.dropColumn(spark, dir, "v")
    val dropped = IcebergInterop.readIceberg(spark, dir)
    assert(dropped.columns.toSeq == Seq("id", "label", "score"))
    IcebergFixture.addColumn(spark, dir, "v2", org.apache.spark.sql.types.DoubleType)
    val fresh = IcebergInterop.readIceberg(spark, dir)
    assert(fresh.filter(col("v2").isNotNull).count() == 0,
      "a re-added column with a new id must NOT resurrect dropped data")

    // snapshot time travel reads the shape the table had THEN
    val old = IcebergInterop.readIceberg(spark, dir, snapshotId = Some(s1))
    assert(old.columns.toSeq == Seq("id", "tag", "v"), "snapshot 1 pins its own schema")
    assert(old.filter(col("tag").isNull).count() == 0 && old.count() == 40)

    // filters on the renamed column still push down to the scan
    assert(fresh.filter(col("id") < 5).count() == 5)
  }

  test("SCHEMA EVOLUTION composes with equality deletes across a rename") {
    val dir = Files.createTempDirectory("graft-iceberg-evolve-eq").toString
    IcebergFixture.append(
      (0L until 10L).map(i => (i, s"k_$i")).toDF("id", "name"), dir)
    // delete BY the original column name, then rename it: the delete
    // file's ids must keep resolving (against the current names)
    IcebergFixture.deleteEqualities(spark, dir, Seq(2L, 4L).toDF("id"))
    IcebergFixture.renameColumn(spark, dir, "id", "key")
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.columns.toSeq == Seq("key", "name"))
    assert(t.count() == 8)
    assert(t.filter(col("key").isin(2L, 4L)).count() == 0,
      "pre-rename equality deletes still apply by field id")
  }

  test("FILE-LEVEL data skipping: manifest bounds prune the scan; results stay exact") {
    val dir = Files.createTempDirectory("graft-iceberg-prune").toString
    // range-partitioned files → disjoint id ranges → prunable bounds
    IcebergFixture.append(
      (0L until 1000L).map(i => (i, s"t_$i", i * 0.5)).toDF("id", "tag", "v")
        .repartitionByRange(8, col("id")), dir)
    val full = IcebergInterop.readIceberg(spark, dir)
    assert(full.inputFiles.length == 8)
    val pruned = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((100.0, 200.0))))
    assert(pruned.inputFiles.length < 8,
      s"bounds must drop non-overlapping files, scanned ${pruned.inputFiles.length}")
    assert(pruned.count() == 101)
    assert(pruned.agg(sum("id")).head().getLong(0) == (100L to 200L).sum)
    // a DOUBLE-typed range prunes too, and composes with the id range
    val both = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((100.0, 200.0)), "v" -> ((0.0, 60.0))))
    assert(both.count() == 21) // id 100..120 (v = id*0.5 ≤ 60)
    // a range with NO matching file reads empty without touching storage
    assert(IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((5000.0, 6000.0)))).count() == 0)
    // pruning respects deletes: delete one surviving row, re-read
    IcebergFixture.deleteEqualities(spark, dir, Seq(150L).toDF("id"))
    assert(IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((100.0, 200.0)))).count() == 100)
    // pruning by a RENAMED column still hits the old bounds (field ids)
    IcebergFixture.renameColumn(spark, dir, "id", "key")
    val renamed = IcebergInterop.readIcebergWhere(spark, dir,
      Map("key" -> ((100.0, 200.0))))
    assert(renamed.inputFiles.length < 8 && renamed.count() == 100)
  }

  test("STRING equality pruning from the manifests' string bounds") {
    val dir = Files.createTempDirectory("graft-iceberg-prune-str").toString
    // range-partitioned by id; lang changes every 125 ids → each of the
    // 8 files carries exactly one lang value (tight string bounds)
    IcebergFixture.append(
      (0L until 1000L).map(i => (i, f"l${i / 125}%02d")).toDF("id", "lang")
        .repartitionByRange(8, col("id")), dir)
    val one = IcebergInterop.readIcebergWhere(spark, dir,
      Map.empty, stringEq = Map("lang" -> "l03"))
    assert(one.inputFiles.length < 8,
      s"string bounds must prune, scanned ${one.inputFiles.length}")
    assert(one.count() == 125)
    assert(one.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(375L, 499L))
    // a value outside every bound reads empty without touching storage
    assert(IcebergInterop.readIcebergWhere(spark, dir,
      Map.empty, stringEq = Map("lang" -> "zz")).count() == 0)
    // composes with a numeric range on the same read
    val both = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((0.0, 400.0))), stringEq = Map("lang" -> "l03"))
    assert(both.count() == 26) // ids 375..400
  }

  test("MANIFEST-LEVEL skipping: partition summaries prune whole manifests; results stay exact") {
    val dir = Files.createTempDirectory("graft-iceberg-mlskip").toString
    val df = (0L until 600L).map(i => (i, s"g_${i % 6}", i * 2.0))
      .toDF("id", "grp", "v")
    IcebergFixture.appendPartitioned(df.repartition(4), dir, "grp")
    // unfiltered read: all 6 per-partition manifests open, none skip
    assert(IcebergInterop.readIceberg(spark, dir).count() == 600)
    assert(IcebergInterop.lastManifestScan == ((6, 0)))
    // a string-equality predicate on the partition column: ONE
    // manifest opens, five never read — and the rows are exact
    val one = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g_3"))
    assert(one.count() == 100)
    assert(one.agg(sum("id")).head().getLong(0) ==
      (0L until 600L).filter(_ % 6 == 3).sum)
    assert(IcebergInterop.lastManifestScan == ((1, 5)))
    // a second partitioned append doubles the manifests; skipping
    // still prunes to the matching pair
    IcebergFixture.appendPartitioned(
      (600L until 900L).map(i => (i, s"g_${i % 6}", i * 2.0))
        .toDF("id", "grp", "v"), dir, "grp")
    val two = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g_3"))
    assert(two.count() == 150)
    assert(IcebergInterop.lastManifestScan == ((2, 10)))
    // a range predicate on a NON-partition column cannot prune
    // manifests (no summary evidence) but file-level bounds still work
    val ranged = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((0.0, 99.0))))
    assert(ranged.count() == 100)
    assert(IcebergInterop.lastManifestScan._2 == 0)
  }

  test("HIDDEN partitioning day(ts): a timestamp range opens only the matching day manifests") {
    val dir = Files.createTempDirectory("graft-iceberg-dayskip").toString
    val base = 19723L * 86400000000L // 2024-01-01T00:00Z in epoch micros
    val rows = (0 until 960).map { i =>
      (i.toLong, base + i * 900000000L, (i % 7).toDouble) // 15-min grid, 10 days
    }.toDF("id", "m", "v")
      .select(col("id"), timestamp_micros(col("m")).as("ts"), col("v"))
    IcebergFixture.appendPartitioned(rows, dir, "ts", "day")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 960)
    assert(IcebergInterop.lastManifestScan == ((10, 0)))
    // days 3..4 (closed micros range): 2 of 10 manifests open
    val lo = (19726L * 86400000000L).toDouble
    val hi = (19728L * 86400000000L - 1).toDouble
    val got = IcebergInterop.readIcebergWhere(spark, dir, Map("ts" -> ((lo, hi))))
    assert(IcebergInterop.lastManifestScan == ((2, 8)))
    assert(got.count() == 192) // 96 rows/day × 2 days
    assert(got.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(288L, 479L))
    // the residual timestamp filter is EXACT at the boundary micro:
    // widening the hi by one micro pulls in exactly day 5's first row
    val plus = IcebergInterop.readIcebergWhere(spark, dir,
      Map("ts" -> ((lo, hi + 1))))
    assert(plus.count() == 193)
  }

  test("HIDDEN partitioning bucket(8, id): a point read opens exactly the value's bucket manifest") {
    val dir = Files.createTempDirectory("graft-iceberg-bucket").toString
    val df = (0L until 400L).map(i => (i, s"t_$i", i * 1.5)).toDF("id", "tag", "v")
    IcebergFixture.appendPartitioned(df, dir, "id", "bucket[8]")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 400)
    val manifests = IcebergInterop.lastManifestScan._1
    assert(manifests >= 7 && manifests <= 8) // 400 ids spread over 8 buckets
    // a point predicate hashes to one bucket — one manifest opens
    val one = IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((137.0, 137.0))))
    assert(IcebergInterop.lastManifestScan == ((1, manifests - 1)))
    assert(one.select("tag").head().getString(0) == "t_137")
    // a RANGE over a bucketed column has no order evidence: no skipping
    IcebergInterop.readIcebergWhere(spark, dir, Map("id" -> ((10.0, 20.0))))
      .count()
    assert(IcebergInterop.lastManifestScan._2 == 0)
  }

  test("HIDDEN partitioning truncate(2, tag): string equality prunes by prefix") {
    val dir = Files.createTempDirectory("graft-iceberg-trunc").toString
    val df = (0L until 300L).map(i => (i, f"p${i % 5}%s_x$i%03d", i * 1.0))
      .toDF("id", "tag", "v")
    IcebergFixture.appendPartitioned(df, dir, "tag", "truncate[2]")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 300)
    assert(IcebergInterop.lastManifestScan == ((5, 0))) // prefixes p0..p4
    val one = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("tag" -> "p3_x123"))
    assert(IcebergInterop.lastManifestScan == ((1, 4)))
    assert(one.count() == 1 && one.select("id").head().getLong(0) == 123L)
    // an equality with a prefix no partition carries reads nothing
    assert(IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("tag" -> "zz_none")).count() == 0)
    assert(IcebergInterop.lastManifestScan == ((0, 5)))
  }

  test("CONVERT TO DELTA: an append-only Iceberg table becomes a Delta table IN PLACE") {
    val dir = Files.createTempDirectory("graft-iceberg-convert").toString
    IcebergFixture.append(
      (0L until 80L).map(i => (i, s"t_$i", i * 2.0)).toDF("id", "tag", "v")
        .repartitionByRange(4, col("id")), dir)
    IcebergFixture.append(
      (80L until 100L).map(i => (i, s"t_$i", i * 2.0)).toDF("id", "tag", "v"), dir)
    // the SQL spelling drives the conversion
    val v = spark.sql(s"CONVERT TO DELTA iceberg.`$dir`").head().getLong(0)
    assert(v == 0L)
    val t = graft.io.DeltaInterop.readDelta(spark, dir)
    assert(t.columns.toSeq == Seq("id", "tag", "v") && t.count() == 100)
    assert(t.agg(sum("id")).head().getLong(0) == (0L until 100L).sum)
    // footer stats landed: the range read prunes files
    val pruned = graft.io.DeltaInterop.readDeltaWhere(spark, dir,
      ranges = Map("id" -> ((10.0, 20.0))))
    assert(pruned.inputFiles.length < 5 && pruned.count() == 11)
    // the converted table MUTATES as Delta
    graft.io.DeltaInterop.deleteWhereDV(spark, dir, col("id") === 7L)
    graft.io.DeltaInterop.writeDelta(
      Seq((200L, "new", 1.0)).toDF("id", "tag", "v"), dir, Nil)
    assert(graft.io.DeltaInterop.readDelta(spark, dir).count() == 100)
    // the Iceberg metadata is still there and still readable (pre-convert shape)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 100)

    // REFUSALS by name: row-level deletes, and renamed columns
    val dDir = Files.createTempDirectory("graft-iceberg-convert-del").toString
    IcebergFixture.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), dDir)
    IcebergFixture.deleteEqualities(spark, dDir, Seq(1L).toDF("id"))
    val e1 = intercept[IllegalArgumentException](
      graft.io.DeltaInterop.convertIcebergToDelta(spark, dDir))
    assert(e1.getMessage.contains("delete"), e1.getMessage)
    val rDir = Files.createTempDirectory("graft-iceberg-convert-ren").toString
    IcebergFixture.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), rDir)
    IcebergFixture.renameColumn(spark, rDir, "tag", "label")
    val e2 = intercept[IllegalArgumentException](
      graft.io.DeltaInterop.convertIcebergToDelta(spark, rDir))
    assert(e2.getMessage.contains("rename"), e2.getMessage)
  }

  test("missing snapshot ids are loud") {
    val dir = Files.createTempDirectory("graft-iceberg-del").toString
    IcebergFixture.append(Seq((1L, "x", 0.0)).toDF("id", "tag", "v"), dir)
    val e0 = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, dir, snapshotId = Some(999L)))
    assert(e0.getMessage.contains("snapshot 999"))
  }

  test("format-version 3 READS (plain v3 scan); v4 refuses by name; non-tables refuse") {
    val dir = Files.createTempDirectory("graft-iceberg-v3").toString
    IcebergFixture.append(Seq((1L, "x", 0.0)).toDF("id", "tag", "v"), dir)
    // bump format-version in place: v3 without DVs reads like v2
    val p = java.nio.file.Paths.get(dir, "metadata", "v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("\"format-version\" : 2", "\"format-version\" : 3")
    java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
    // the in-place edit invalidates the local FS checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "metadata", ".v1.metadata.json.crc"))
    assert(IcebergInterop.readIceberg(spark, dir).count() == 1)

    // an unknown FUTURE version refuses by name
    val txt4 = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("\"format-version\" : 3", "\"format-version\" : 4")
    java.nio.file.Files.write(p, txt4.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "metadata", ".v1.metadata.json.crc"))
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, dir))
    assert(e.getMessage.contains("format-version 4"), e.getMessage)

    val empty = Files.createTempDirectory("graft-not-iceberg").toString
    val e2 = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, empty))
    assert(e2.getMessage.contains("not an Iceberg table"))
  }

  test("v2 PARQUET position delete carrying referenced_data_file stays a position delete") {
    // the spec allows (and real writers set) the optional
    // referenced_data_file field on a position delete that targets a
    // single data file — it must NOT be mistaken for a v3 Puffin DV
    // (which is marked by file_format=PUFFIN + content_offset)
    val dir = Files.createTempDirectory("graft-iceberg-refposdel").toString
    IcebergFixture.append(
      (0L until 40L).map(i => (i, s"r_$i")).toDF("id", "tag").coalesce(1), dir)
    val victims = IcebergInterop.readIceberg(spark, dir)
      .select(col("id"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("pos"))
      .filter(col("pos") < 3).collect()
    assert(victims.length == 3)
    assert(victims.map(_.getString(1)).distinct.length == 1, "one data file")
    IcebergFixture.deletePositions(spark, dir,
      victims.map(r => (r.getString(1).stripPrefix("file:"), r.getLong(2))).toSeq,
      stampReferencedDataFile = true)
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 37)
    val gone = victims.map(_.getLong(0)).toSet
    assert(t.filter(col("id").isin(gone.toSeq: _*)).count() == 0)
  }
}
