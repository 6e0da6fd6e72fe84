package graft

import java.nio.file.{Files, Paths}
import graft.io.{DeletionVectors => DV, DeltaInterop}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion-vector reads (PROTOCOL.md "Deletion Vectors"): row indices
  * masked out of `add`ed files via Z85 + RoaringBitmapArray portable
  * bitmaps, inline or sidecar-stored. graft writes none (row ops are
  * copy-on-write) but must read any delta-spark table that ran a
  * DV-enabled DELETE/MERGE. */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("Z85 round-trips arbitrary 4-byte-aligned payloads") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { n =>
      val bytes = Array.fill(n * 4)(rnd.nextInt().toByte)
      val enc = DV.z85Encode(bytes)
      assert(enc.length == n * 5)
      assert(DV.z85Decode(enc).toSeq == bytes.toSeq)
    }
    intercept[IllegalArgumentException](DV.z85Encode(Array[Byte](1, 2, 3)))
  }

  test("RoaringBitmapArray round-trips array, bitmap, and multi-word shapes") {
    // array containers (small), bitmap container (>4096 per 64k block),
    // values above 2^32 (multiple 32-bit bitmaps), multiple 16-bit keys
    val shapes = Seq[Array[Long]](
      Array(0L, 1L, 5L, 100L),
      (0L until 5000L).toArray,                      // bitmap container
      Array(1L, 65536L + 2, 131072L + 3),            // several container keys
      Array(7L, (1L << 32) + 9, (5L << 32) + 123),   // several high words
      Array.empty[Long],
      (0L until 70000L by 7).toArray)
    shapes.foreach { vs =>
      val back = DV.deserialize(DV.serialize(vs))
      assert(back.toSeq == vs.distinct.sorted.toSeq, s"shape ${vs.take(5).toSeq}...")
    }
  }

  test("sidecar write/load round-trips through the descriptor (offset, size, CRC)") {
    val dir = Files.createTempDirectory("graft-dv-sidecar").toString
    val positions = Array(0L, 2L, 5L, 4999L)
    val desc = DV.writeSidecar(spark, dir, positions)
    assert(desc.contains("\"storageType\":\"u\""))
    assert(DV.loadPositions(spark, dir, desc).toSeq == positions.toSeq)
    // corrupting a data byte breaks the CRC
    val bin = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).head
    val bytes = Files.readAllBytes(bin.toPath)
    bytes(7) = (bytes(7) ^ 0x55).toByte
    Files.write(bin.toPath, bytes)
    // either our payload CRC or Hadoop's own .crc sidecar flags it first
    val e = intercept[Exception](DV.loadPositions(spark, dir, desc))
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[org.apache.hadoop.fs.ChecksumException])
  }

  test("inline descriptors decode without any sidecar file") {
    val positions = Array(1L, 3L)
    val inline = DV.z85Encode {
      val data = DV.serialize(positions)
      // Z85 needs 4-byte alignment; inline DVs pad per the protocol
      data ++ Array.fill((4 - data.length % 4) % 4)(0.toByte)
    }
    val desc = s"""{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":0,"cardinality":2}"""
    assert(DV.loadPositions(spark, "/nonexistent", desc).toSeq == positions.toSeq)
  }

  /** A two-file table where file A carries a DV deleting ids 1 and 3
    * (row indices 1, 3 of the id-ordered file) and file B is unmasked. */
  private def buildDvTable(dir: String): Unit = {
    def writeFile(ids: Seq[Long], name: String): Long = {
      val staging = s"$dir/.stage-$name"
      ids.map(i => (i, s"name_$i")).toDF("id", "name")
        .coalesce(1).sortWithinPartitions("id").write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(dir, name)
      Files.move(part.toPath, dst)
      Files.size(dst)
    }
    val aSize = writeFile(0L to 4L, "part-a.snappy.parquet")
    val bSize = writeFile(10L to 14L, "part-b.snappy.parquet")
    val dvDesc = DV.writeSidecar(spark, dir, Array(1L, 3L))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = M.createObjectNode(); val m = md.putObject("metaData")
    m.put("id", "dv-fixture")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns"); m.putObject("configuration"); m.put("createdTime", 0L)
    val lines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      M.writeValueAsString(md),
      s"""{"add":{"path":"part-a.snappy.parquet","partitionValues":{},"size":$aSize,"modificationTime":0,"dataChange":true,"deletionVector":$dvDesc}}""",
      s"""{"add":{"path":"part-b.snappy.parquet","partitionValues":{},"size":$bSize,"modificationTime":0,"dataChange":true}}""")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log", "00000000000000000000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("reads mask DV'd row indices; un-DV'd files are untouched; checkpoint carries the DV") {
    val dir = Files.createTempDirectory("graft-dv-table").toString
    buildDvTable(dir)
    def ids() = DeltaInterop.readDelta(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    // file A lost row indices 1,3 (ids 1,3); file B intact
    assert(ids() == Seq(0L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
    // a checkpointed read must NOT resurrect the deleted rows: drop the
    // JSON commit so replay can ONLY come from the checkpoint parquet
    DeltaInterop.checkpoint(spark, dir)
    Files.delete(Paths.get(dir, "_delta_log", "00000000000000000000.json"))
    assert(ids() == Seq(0L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
    // row ops MATERIALIZE the DV: deleting id 0 rewrites file A from its
    // masked rows (0,2,4) → survivors (2,4); ids 1,3 must NOT resurrect
    val (_, rewrote) = DeltaInterop.deleteWhere(spark, dir, col("id") === 0L)
    assert(rewrote == 1)
    assert(ids() == Seq(2L, 4L, 10L, 11L, 12L, 13L, 14L))
    // the rewritten file carries no DV — the tombstones are materialized
    assert(DeltaInterop.state(spark, dir).files.forall(_.deletionVector == null))
    // update through the same path keeps the masked view
    DeltaInterop.updateWhere(spark, dir, col("id") === 2L,
      Map("name" -> lit("two")))
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.filter(col("id") === 2L).select("name").as[String].head() == "two")
    assert(t.count() == 7)
  }

  test("compact skips DV'd files instead of resurrecting their masked rows") {
    val dir = Files.createTempDirectory("graft-dv-compact").toString
    buildDvTable(dir)
    // both files are small; only the un-DV'd one (file B, alone in its
    // group) qualifies ⇒ nothing to do, and file A's DV stays intact
    val (v, rewritten, created) = DeltaInterop.compact(spark, dir, smallFileBytes = 1L << 20)
    assert(rewritten == 0 && created == 0, s"v=$v rewrote=$rewritten created=$created")
    val ids = DeltaInterop.readDelta(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
  }

  test("deleteWhereDV writes deletion vectors instead of rewriting files") {
    val dir = Files.createTempDirectory("graft-dv-write").toString
    val df = (0L until 100L).map(i => (i, s"n_$i")).toDF("id", "name")
    DeltaInterop.writeDelta(df.repartitionByRange(2, col("id")), dir, Nil)
    val before = DeltaInterop.state(spark, dir)
    assert(before.files.length == 2 && before.files.forall(_.deletionVector == null))
    val paths0 = before.files.map(_.path).toSet
    val (v1, touched, nDel) =
      DeltaInterop.deleteWhereDV(spark, dir, col("id") % 10 === 3L)
    assert(v1 == 1L && touched == 2 && nDel == 10L, s"($v1, $touched, $nDel)")
    val after = DeltaInterop.state(spark, dir)
    // the SAME data files — no rewrite — now carry descriptors
    assert(after.files.map(_.path).toSet == paths0)
    assert(after.files.forall(_.deletionVector != null))
    def t() = DeltaInterop.readDelta(spark, dir)
    assert(t().count() == 90 && t().filter(col("id") % 10 === 3L).count() == 0)
    // a second DV delete UNIONS into the existing descriptors (the
    // predicate scan runs on the masked view ⇒ disjoint position sets)
    val (v2, t2, n2) = DeltaInterop.deleteWhereDV(spark, dir, col("id") % 10 === 7L)
    assert(v2 == 2L && t2 == 2 && n2 == 10L)
    assert(t().count() == 80)
    // time travel still resolves every intermediate DV state
    assert(DeltaInterop.readDelta(spark, dir, Some(0L)).count() == 100)
    assert(DeltaInterop.readDelta(spark, dir, Some(1L)).count() == 90)
    // our checkpoint carries the DVs (CpDv write-through): drop every
    // JSON commit so replay can ONLY come from the checkpoint parquet
    DeltaInterop.checkpoint(spark, dir)
    (0L to 2L).foreach(v =>
      Files.deleteIfExists(Paths.get(dir, "_delta_log", f"$v%020d.json")))
    assert(t().count() == 80)
    // a copy-on-write row op then MATERIALIZES the touched file's DV
    val (_, rw) = DeltaInterop.deleteWhere(spark, dir, col("id") === 0L)
    assert(rw == 1)
    assert(DeltaInterop.state(spark, dir).files.count(_.deletionVector != null) == 1)
    assert(t().count() == 79 && t().filter(col("id") % 10 === 7L).count() == 0)
  }

  test("updateWhereDV masks old rows and appends postimages — no rewrite") {
    val dir = Files.createTempDirectory("graft-dv-update").toString
    val df = (0L until 100L).map(i => (i, s"n_$i")).toDF("id", "name")
    DeltaInterop.writeDelta(df.repartitionByRange(2, col("id")), dir, Nil)
    val paths0 = DeltaInterop.state(spark, dir).files.map(_.path).toSet
    val (v1, masked, nUpd) = DeltaInterop.updateWhereDV(spark, dir,
      col("id") % 10 === 3L, Map("name" -> concat(col("name"), lit("_upd"))))
    assert(v1 == 1L && masked == 2 && nUpd == 10L, s"($v1, $masked, $nUpd)")
    val st1 = DeltaInterop.state(spark, dir)
    // every ORIGINAL file survives by path (masked, not rewritten);
    // postimages arrive as fresh files on top
    assert(paths0.subsetOf(st1.files.map(_.path).toSet))
    assert(st1.files.filter(a => paths0(a.path)).forall(_.deletionVector != null))
    assert(st1.files.exists(a => !paths0(a.path)))
    def t() = DeltaInterop.readDelta(spark, dir)
    assert(t().count() == 100, "update must not change the row count")
    val upd = t().filter(col("id") % 10 === 3L).select("name").as[String].collect()
    assert(upd.length == 10 && upd.forall(_.endsWith("_upd")),
      "each updated row appears exactly once, with the new value")
    // a second update whose predicate matches the POSTIMAGE rows must
    // mask them in their NEW file (the masked scan sees current state)
    val (v2, _, n2) = DeltaInterop.updateWhereDV(spark, dir,
      col("name").endsWith("_upd"), Map("name" -> concat(col("name"), lit("2"))))
    assert(v2 == 2L && n2 == 10L)
    assert(t().count() == 100)
    assert(t().filter(col("name").endsWith("_upd2")).count() == 10)
    // time travel resolves both intermediate states
    assert(DeltaInterop.readDelta(spark, dir, Some(0L))
      .filter(col("name").endsWith("_upd")).count() == 0)
    assert(DeltaInterop.readDelta(spark, dir, Some(1L))
      .filter(col("name").endsWith("_upd2")).count() == 0)
  }

  test("updateWhereDV may move rows across partitions (SET on a partition column)") {
    val dir = Files.createTempDirectory("graft-dv-update-part").toString
    val df = (0L until 40L).map(i => (i, i % 2, s"n_$i")).toDF("id", "par", "name")
    DeltaInterop.writeDelta(df.repartition(1), dir, Seq("par"))
    val (_, _, n) = DeltaInterop.updateWhereDV(spark, dir,
      col("id") < 10L && col("par") === 0L, Map("par" -> lit(1L)))
    assert(n == 5L)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 40)
    assert(t.filter(col("par") === 1L).count() == 25)
    assert(t.filter(col("id") < 10L && col("id") % 2 === 0L)
      .select("par").as[Long].collect().forall(_ == 1L))
  }

  test("a 1M-position DV masks as a bitmap filter — no join, no positions-as-rows") {
    val dir = Files.createTempDirectory("graft-dv-scale").toString
    DeltaInterop.writeDelta(
      spark.range(2000000L).toDF("id").coalesce(1), dir, Nil)
    // DV-delete every even id: 1,000,000 positions in one descriptor
    val (_, _, nDel) = DeltaInterop.deleteWhereDV(spark, dir, col("id") % 2 === 0L)
    assert(nDel == 1000000L)
    val t = DeltaInterop.readDelta(spark, dir)
    val plan = t.queryExecution.executedPlan.toString
    // the mask is a codegen contains-FILTER on the scan — the plan must
    // carry NO join and NO million-row local relation of positions
    assert(!plan.toLowerCase.contains("join"), s"DV mask plans a join:\n$plan")
    assert(!plan.contains("LocalTableScan"), s"DV positions materialized as rows:\n$plan")
    assert(plan.contains("dv_deleted"), s"DV filter expression missing:\n$plan")
    assert(t.count() == 1000000L)
    assert(t.filter(col("id") % 2 === 0L).count() == 0)
    // the parsed bitmap answers membership without expanding: spot-check
    val a = DeltaInterop.state(spark, dir).files.head
    val bm = DV.loadBitmap(spark, dir, a.deletionVector)
    assert(bm.cardinality == 1000000L)
    assert(bm.contains(0L) && bm.contains(999998L) && !bm.contains(1L))
  }

  test("parse/contains agree with deserialize across container shapes") {
    val shapes = Seq[Array[Long]](
      Array(0L, 1L, 5L, 100L),
      (0L until 5000L).toArray,                      // bitmap container
      Array(1L, 65536L + 2, 131072L + 3),            // several container keys
      Array(7L, (1L << 32) + 9, (5L << 32) + 123),   // several high words
      (0L until 70000L by 7).toArray)
    shapes.foreach { vs =>
      val bm = DV.parse(DV.serialize(vs))
      assert(bm.cardinality == vs.distinct.length.toLong)
      assert(bm.toPositions.toSeq == vs.distinct.sorted.toSeq)
      vs.foreach(v => assert(bm.contains(v), s"missing $v"))
      // near-misses around every set bit
      vs.foreach { v =>
        if (!vs.contains(v + 1)) assert(!bm.contains(v + 1), s"phantom ${v + 1}")
      }
    }
  }

  test("RoaringBitmapBuilder round-trips, merges, and ORs canonically") {
    val rnd = new scala.util.Random(7)
    val a = (Array.fill(50000)(math.abs(rnd.nextLong()) % (1L << 40)) ++
      (100000L until 110000L)).distinct // sparse spread + a dense bitmap container
    val b1 = new graft.io.RoaringBitmapBuilder
    a.foreach(b1.add)
    val (bytes, card) = b1.result()
    assert(card == a.length.toLong)
    assert(DV.parse(bytes).toPositions.toSeq == a.sorted.toSeq)
    // merging two half-builders yields byte-identical canonical form
    val (h1, h2) = a.splitAt(a.length / 2)
    val m1 = new graft.io.RoaringBitmapBuilder; h1.foreach(m1.add)
    val m2 = new graft.io.RoaringBitmapBuilder; h2.foreach(m2.add)
    m1.merge(m2)
    assert(m1.result()._1.toSeq == bytes.toSeq)
    // OR-ing a parsed bitmap (the old-DV merge) agrees too
    val o = graft.io.RoaringBitmapBuilder.fromBytes(m1.result()._1)
    o.or(DV.parse(DV.serialize(Array(1L, 999L, (3L << 32) + 4))))
    assert(o.result()._2 == card + 3)
    assert(DV.parse(o.result()._1).contains((3L << 32) + 4))
  }

  test("DV authoring is DISTRIBUTED: bitmap aggregate in the plan, driver rows == touched files") {
    val dir = Files.createTempDirectory("graft-dv-author").toString
    DeltaInterop.writeDelta(
      spark.range(2000000L).toDF("id").repartition(4), dir, Nil)
    val st = DeltaInterop.state(spark, dir)
    val ds = DeltaInterop.dvDescriptorsPerFile(
      spark, dir, st, st.files, col("id") % 2 === 0L)
    val plan = ds.queryExecution.executedPlan.toString
    // positions fold into per-file roaring bitmaps via a typed-imperative
    // aggregate (hash-based both sides) — never a collect_list of rows
    assert(plan.contains("dv_bitmap"), s"bitmap aggregate missing:\n$plan")
    assert(!plan.contains("collect_list"), s"positions-as-rows aggregation:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected hash agg:\n$plan")
    val rows = ds.collect()
    assert(rows.length == st.files.length,
      s"driver saw ${rows.length} rows for ${st.files.length} files")
    assert(rows.map(_._4).sum == 1000000L)
    rows.foreach { case (_, desc, mergedCard, newCount) =>
      assert(desc != null && mergedCard == newCount)
    }
    // end-to-end: the real delete masks 1M rows and reads stay correct
    val (_, touched, nDel) = DeltaInterop.deleteWhereDV(spark, dir, col("id") % 2 === 0L)
    assert(touched == st.files.length && nDel == 1000000L)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 1000000L)
    assert(t.filter(col("id") % 2 === 0L).count() == 0L)
  }

  test("deleteWhereDV drops fully-dead files; vacuum GCs orphaned sidecars") {
    val dir = Files.createTempDirectory("graft-dv-gc").toString
    val df = (0L until 100L).map(i => (i, i / 50, s"n_$i")).toDF("id", "half", "name")
    DeltaInterop.writeDelta(df.repartition(1), dir, Seq("half"))
    assert(DeltaInterop.state(spark, dir).files.length == 2)
    // half=0 dies entirely (remove, no DV); half=1 loses ids 50-59 (DV)
    val (v1, touched, nDel) = DeltaInterop.deleteWhereDV(spark, dir,
      col("half") === 0L || col("id") < 60L)
    assert(v1 == 1L && touched == 2 && nDel == 60L, s"($v1, $touched, $nDel)")
    val st1 = DeltaInterop.state(spark, dir)
    assert(st1.files.length == 1 && st1.files.head.deletionVector != null)
    assert(DeltaInterop.readDelta(spark, dir).count() == 40)
    // replacing the surviving DV orphans its previous sidecar
    DeltaInterop.deleteWhereDV(spark, dir, col("id") < 70L)
    def bins() = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("deletion_vector_"))
    assert(bins() == 2)
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    val reclaimed = DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
    // the dead data file + the orphaned sidecar go; the live one stays
    assert(reclaimed == 2, s"vacuum reclaimed $reclaimed")
    assert(bins() == 1)
    assert(DeltaInterop.readDelta(spark, dir).count() == 30)
  }
}
