package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NATIVE v3 ROW LINEAGE (iceberg.apache.org/spec/ "Row Lineage"):
  * the graft write plane assigns `first_row_id` ranges from the
  * table's `next-row-id` watermark on every data-file-adding commit,
  * keeps ids STABLE through merge-on-read deletes/updates and
  * compaction (materialize-on-rewrite), and gives merge-inserted rows
  * fresh ids. `_last_updated_sequence_number` tracks the commit that
  * last changed each row. Reference behavior: the reference engine has
  * no lineage concept (/root/reference has no spec surface for it) —
  * this is the training-data-pipeline provenance layer a 100 TB
  * warehouse needs for incremental reprocessing. */
class IcebergLineageSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) =
    df.repartition(1).sortWithinPartitions("id")

  private def meta(dir: String): com.fasterxml.jackson.databind.JsonNode = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val v = new java.io.File(s"$dir/metadata").list()
      .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).max
    M.readTree(new java.io.File(s"$dir/metadata/v$v.metadata.json"))
  }

  private def lineageRows(dir: String): Map[Long, (Long, Long)] =
    IcebergInterop.readIceberg(spark, dir, withLineage = true)
      .select(col("id"), col("_row_id"), col("_last_updated_sequence_number"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("appendLineage: watermark advances, ids are file ranges, v3 stamped") {
    val dir = Files.createTempDirectory("graft-lineage-append").toString
    IcebergWrite.appendLineage(one((0L until 20L).map(i => (i, s"a$i"))
      .toDF("id", "tag")), dir)
    val m1 = meta(dir)
    assert(m1.path("format-version").asInt == 3)
    assert(m1.path("next-row-id").asLong == 20L)
    IcebergWrite.append(one((20L until 30L).map(i => (i, s"b$i"))
      .toDF("id", "tag")), dir) // plain append MAINTAINS lineage
    assert(meta(dir).path("next-row-id").asLong == 30L)
    val rows = lineageRows(dir)
    assert(rows.size == 30)
    // single sorted files: id i landed at position i of its file
    assert((0L until 20L).forall(i => rows(i)._1 == i))
    assert((20L until 30L).forall(i => rows(i)._1 == i), "second range continues")
    assert(rows.values.map(_._1).toSeq.distinct.size == 30, "ids unique")
    // creating lineage on an existing plain table per-append is refused
    val plain = Files.createTempDirectory("graft-lineage-plain").toString
    IcebergWrite.append(Seq((1L, "x")).toDF("id", "tag"), plain)
    intercept[IllegalArgumentException](
      IcebergWrite.appendLineage(Seq((2L, "y")).toDF("id", "tag"), plain))
  }

  test("DV delete and MoR update keep ids; update bumps last-updated") {
    val dir = Files.createTempDirectory("graft-lineage-dml").toString
    IcebergWrite.appendLineage(one((0L until 40L).map(i => (i, i * 10))
      .toDF("id", "v")), dir)
    val before = IcebergInterop.readIceberg(spark, dir, withLineage = true)
      .select(col("id"), col("_row_id"), col("_last_updated_sequence_number"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(before.values.forall(_._2 == 1L), "all rows last-updated at seq 1")
    IcebergWrite.deleteWhereDV(spark, dir, col("id") < 5)       // seq 2
    IcebergWrite.updateWhereDV(spark, dir, col("id") >= 30,
      Map("v" -> (col("v") + 1)))                               // seq 3
    val after = IcebergInterop.readIceberg(spark, dir, withLineage = true)
      .select(col("id"), col("v"), col("_row_id"),
        col("_last_updated_sequence_number"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(after.size == 35, "5 rows DV-deleted")
    after.foreach { case (id, (v, rid, lus)) =>
      assert(rid == before(id)._1, s"id $id must keep its _row_id")
      if (id >= 30) { assert(v == id * 10 + 1); assert(lus == 3L) }
      else { assert(v == id * 10); assert(lus == 1L) }
    }
    assert(meta(dir).path("next-row-id").asLong >= 40L)
  }

  test("merge: updates keep ids, inserts get fresh ids past the watermark") {
    val dir = Files.createTempDirectory("graft-lineage-merge").toString
    IcebergWrite.appendLineage(one((0L until 30L).map(i => (i, i * 10))
      .toDF("id", "v")), dir)
    val before = lineageRows(dir)
    val w0 = meta(dir).path("next-row-id").asLong
    val src = Seq((5L, 555L), (6L, 666L), (100L, 1000L), (101L, 1010L))
      .toDF("id", "v")
    IcebergWrite.mergeInto(spark, dir, src, Seq("id"),
      matched = Seq(graft.io.DeltaInterop.MatchedClause(None,
        Map("v" -> col("s.v")), delete = false)),
      notMatched = Some((None, Map.empty)))
    val after = lineageRows(dir)
    assert(after.size == 32)
    assert(after(5L)._1 == before(5L)._1 && after(6L)._1 == before(6L)._1,
      "updated rows keep their ids")
    assert(after(100L)._1 >= w0 && after(101L)._1 >= w0,
      "inserted rows draw ids past the pre-merge watermark")
    assert(after.values.map(_._1).toSeq.distinct.size == 32, "no id collisions")
    assert(meta(dir).path("next-row-id").asLong > w0)
  }

  test("compact preserves ids and last-updated through the rewrite") {
    val dir = Files.createTempDirectory("graft-lineage-compact").toString
    IcebergWrite.appendLineage(one((0L until 25L).map(i => (i, i * 10))
      .toDF("id", "v")), dir)
    IcebergWrite.append(one((25L until 50L).map(i => (i, i * 10))
      .toDF("id", "v")), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") % 10 === 3)  // MoR positions
    IcebergWrite.updateWhereDV(spark, dir, col("id") === 7L,
      Map("v" -> lit(777L)))
    val before = lineageRows(dir)
    val (_, rewritten, folded) = IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    assert(rewritten > 0 && folded > 0, "compact folded the delete content")
    val after = lineageRows(dir)
    assert(after == before,
      "compaction must not move a single (_row_id, last_updated) pair")
    // and a SECOND compaction round-trips the materialized columns
    IcebergWrite.deleteWhereDV(spark, dir, col("id") === 11L)
    IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    assert(lineageRows(dir) == before - 11L, "re-compaction keeps identities")
  }

  test("enableRowLineage retrofits an existing table; later appends continue") {
    val dir = Files.createTempDirectory("graft-lineage-enable").toString
    IcebergWrite.append(one((0L until 15L).map(i => (i, s"a$i"))
      .toDF("id", "tag")), dir)
    IcebergWrite.append(one((15L until 25L).map(i => (i, s"b$i"))
      .toDF("id", "tag")), dir)
    intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, dir, withLineage = true).count())
    val s1 = IcebergWrite.enableRowLineage(spark, dir)
    assert(IcebergWrite.enableRowLineage(spark, dir) == s1, "idempotent")
    val m = meta(dir)
    assert(m.path("format-version").asInt == 3)
    assert(m.path("next-row-id").asLong == 25L)
    val rows = lineageRows(dir)
    assert(rows.values.map(_._1).toSeq.sorted == (0L until 25L).toSeq,
      "every existing row got exactly one id")
    IcebergWrite.append(one((25L until 30L).map(i => (i, s"c$i"))
      .toDF("id", "tag")), dir)
    val rows2 = lineageRows(dir)
    assert(rows2.size == 30 && rows2.values.map(_._1).toSeq.distinct.size == 30)
    assert((25L until 30L).map(rows2(_)._1).forall(_ >= 25L))
    // reads identical through the plain path (lineage is invisible there)
    assert(IcebergInterop.readIceberg(spark, dir).columns.toSeq == Seq("id", "tag"))
    // ...and DESCRIBE DETAIL surfaces the watermark
    val det = spark.sql(s"DESCRIBE DETAIL iceberg.`$dir`").head()
    assert(det.getLong(det.fieldIndex("next_row_id")) == 30L)
  }

  test("partitioned lineage appends: disjoint ranges across manifests") {
    val dir = Files.createTempDirectory("graft-lineage-part").toString
    // create unpartitioned-lineage, then partitioned appends maintain it
    IcebergWrite.appendLineage(one((0L until 8L).map(i => (i, i % 3))
      .toDF("id", "k")), dir)
    IcebergWrite.appendPartitioned((8L until 32L).map(i => (i, i % 3))
      .toDF("id", "k"), dir, "k")
    val rows = lineageRows(dir)
    assert(rows.size == 32 && rows.values.map(_._1).toSeq.distinct.size == 32,
      "one id per row across partitioned manifests")
    assert(meta(dir).path("next-row-id").asLong == 32L)
    // native append to a FIXTURE-created lineage table continues its watermark
    val fx = Files.createTempDirectory("graft-lineage-fixture").toString + "/t"
    graft.tools.IcebergFixture.append(
      one((0L until 10L).map(i => (i, s"f$i")).toDF("id", "tag")),
      fx, lineage = true)
    IcebergWrite.append(one((10L until 14L).map(i => (i, s"g$i"))
      .toDF("id", "tag")), fx)
    val fxRows = lineageRows(fx)
    assert(fxRows.size == 14 && fxRows.values.map(_._1).toSeq.distinct.size == 14)
    assert(meta(fx).path("next-row-id").asLong == 14L)
  }
}
