package graft

import java.nio.file.Files
import graft.io.{DeltaInterop, IcebergInterop}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized lifecycle agreement: a fixed-seed random walk of table
  * operations on a uniform table, asserting after EVERY commit that
  * the Delta plane and the Iceberg mirror read the exact same rows.
  * This is the property the whole UniForm layer exists to provide —
  * any missed sync, stale manifest carry, bad bound translation, or
  * dropped materialized partition value shows up as a plane mismatch
  * at the step that introduced it. */
class IcebergUniformFuzzSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def agree(dir: String, valCol: String): Unit = {
    val d = DeltaInterop.readDelta(spark, dir)
    val i = IcebergInterop.readIceberg(spark, dir)
    assert(d.columns.toSeq == i.columns.toSeq,
      s"column mismatch: ${d.columns.toSeq} vs ${i.columns.toSeq}")
    val dr = d.orderBy("id").collect().map(_.toSeq).toSeq
    val ir = i.orderBy("id").collect().map(_.toSeq).toSeq
    assert(dr == ir, s"plane mismatch on $valCol:\n delta=$dr\n ice  =$ir")
  }

  private def walk(partitioned: Boolean): Unit = {
    val rnd = new scala.util.Random(if (partitioned) 20260815 else 42)
    val dir = Files.createTempDirectory("graft-uni-fuzz").toString
    val parts = if (partitioned) Seq("p") else Nil
    def rows(n: Int, from: Long) =
      (from until from + n).map(i => (i, rnd.nextLong(1000), s"p${i % 3}"))
        .toDF("id", "v", "p")
    DeltaInterop.writeDelta(rows(20, 0), dir, parts)
    DeltaInterop.enableUniform(spark, dir)
    var nextId = 20L
    var valCol = "v"
    agree(dir, valCol)
    (1 to 18).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // append
          val n = 1 + rnd.nextInt(10)
          DeltaInterop.writeDelta(
            rows(n, nextId).withColumnRenamed("v", valCol), dir, parts)
          nextId += n
        case 3 => // copy-on-write delete
          val r = rnd.nextInt(5)
          DeltaInterop.deleteWhere(spark, dir, col("id") % 5 === r.toLong)
        case 4 => // copy-on-write update
          val r = rnd.nextInt(3)
          DeltaInterop.updateWhere(spark, dir, col("id") % 3 === r.toLong,
            Map(valCol -> (col(valCol) + 7L)))
        case 5 => // compaction (full rewrite sync; materialization kept)
          DeltaInterop.compact(spark, dir)
        case 6 => // schema evolution: rename the value column
          val to = s"${valCol}x"
          DeltaInterop.renameColumn(spark, dir, valCol, to)
          valCol = to
        case 7 => // vacuum + mirror snapshot expiry mid-walk
          DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
        case 8 => // full-snapshot OVERWRITE (removes + adds in one commit)
          val n = 5 + rnd.nextInt(10)
          DeltaInterop.writeDelta(
            rows(n, nextId).withColumnRenamed("v", valCol), dir, parts,
            overwrite = true)
          nextId += n
        case 9 => // column default flip: future inserts only — the
          // planes must agree on every historical row regardless
          DeltaInterop.setColumnDefault(spark, dir, valCol,
            String.valueOf(rnd.nextInt(100)))
      }
      agree(dir, valCol)
    }
  }

  test("18 random ops on an UNPARTITIONED uniform table: planes agree after every commit") {
    walk(partitioned = false)
  }

  test("18 random ops on a PARTITIONED uniform table: planes agree after every commit") {
    walk(partitioned = true)
  }
}
