package graft

import graft.io.{DeltaInterop, TempDirs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE TABLE ... VERSION AS OF: a metadata-sized diff commit that
  * re-points the head at an old snapshot without moving data. */
class DeltaRestoreSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docs(n: Int, from: Int = 0): DataFrame =
    (from until from + n).map(i => (i.toLong, s"doc $i", (i % 3).toString))
      .toDF("id", "body", "grp")

  test("restore rewinds deletes and appends; history stays travelable") {
    val dir = TempDirs.scratch("restore-basic")
    DeltaInterop.writeDelta(docs(20).repartition(2), dir, Seq("grp")) // v0
    DeltaInterop.deleteWhere(spark, dir, col("id") % 4 === 0L)        // v1
    DeltaInterop.writeDelta(docs(5, from = 20), dir, Seq("grp"))      // v2
    assert(DeltaInterop.readDelta(spark, dir).count() === 20L)

    val (v, added, removed) = DeltaInterop.restore(spark, dir, 0L)    // v3
    assert(v === 3L && added > 0 && removed > 0)
    val now = DeltaInterop.readDelta(spark, dir)
    val want = DeltaInterop.readDelta(spark, dir, Some(0L))
    assert(now.exceptAll(want).isEmpty && want.exceptAll(now).isEmpty)
    // the pre-restore head is still reachable by time travel
    assert(DeltaInterop.readDelta(spark, dir, Some(2L)).count() === 20L)
    // restoring to the current head is a no-op, no empty commit
    assert(DeltaInterop.restore(spark, dir, 3L) === ((3L, 0, 0)))
  }

  test("restore reinstates deletion-vector state in both directions") {
    val dir = TempDirs.scratch("restore-dv")
    DeltaInterop.writeDelta(docs(30).repartition(1), dir, Nil)        // v0
    DeltaInterop.deleteWhereDV(spark, dir, col("id") < 10L)           // v1
    assert(DeltaInterop.readDelta(spark, dir).count() === 20L)
    DeltaInterop.restore(spark, dir, 0L)                              // v2: un-mask
    assert(DeltaInterop.readDelta(spark, dir).count() === 30L)
    DeltaInterop.restore(spark, dir, 1L)                              // v3: re-mask
    assert(DeltaInterop.readDelta(spark, dir).count() === 20L)
    assert(DeltaInterop.state(spark, dir).files.exists(_.deletionVector != null))
  }

  test("restore with a reclaimed data file fails loudly before committing") {
    val dir = TempDirs.scratch("restore-vacuumed")
    DeltaInterop.writeDelta(docs(10).repartition(1), dir, Nil)        // v0
    DeltaInterop.writeDelta(docs(10).withColumn("body", upper(col("body")))
      .repartition(1), dir, Nil, overwrite = true)                    // v1
    // our vacuum keeps any file referenced by a retained JSON commit, so
    // simulate the horizon (checkpoint + cleanup + vacuum elsewhere
    // would do this) by reclaiming the v0 file directly
    val v0file = DeltaInterop.state(spark, dir, Some(0L)).files.head.path
    assert(new java.io.File(dir, v0file).delete())
    val before = DeltaInterop.latestVersion(spark, dir)
    val ex = intercept[IllegalArgumentException] {
      DeltaInterop.restore(spark, dir, 0L)
    }
    assert(ex.getMessage.contains("vacuumed"))
    assert(DeltaInterop.latestVersion(spark, dir) === before, "no partial commit")
  }

  test("DESCRIBE HISTORY names every lifecycle operation, newest first") {
    val dir = TempDirs.scratch("history")
    DeltaInterop.writeDelta(docs(10).repartition(1), dir, Nil)            // WRITE
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))                        // SET TBLPROPERTIES
    DeltaInterop.deleteWhere(spark, dir, col("id") === 0L)                // DELETE
    DeltaInterop.updateWhere(spark, dir, col("id") === 5L,
      Map("body" -> upper(col("body"))))                                  // UPDATE
    DeltaInterop.merge(spark, dir,
      docs(2, from = 100), Seq("id"))                                     // MERGE
    DeltaInterop.compact(spark, dir)                                      // OPTIMIZE (maybe no-op)
    DeltaInterop.restore(spark, dir, 1L)                                  // RESTORE
    val h = DeltaInterop.history(spark, dir)
      .select("version", "operation").as[(Long, String)].collect().toSeq
    assert(h.map(_._1) === h.map(_._1).sorted.reverse, "newest first")
    val byV = h.toMap
    assert(byV(0L) === "WRITE" && byV(1L) === "SET TBLPROPERTIES" &&
      byV(2L) === "DELETE" && byV(3L) === "UPDATE" && byV(4L) === "MERGE")
    assert(byV(byV.keys.max) === "RESTORE")
    // timestamps are the in-commit ones and never null for our commits
    assert(DeltaInterop.history(spark, dir)
      .filter(col("timestamp").isNull).count() === 0L)
  }

  test("CHECK constraints gate every write path; NULL passes (SQL CHECK)") {
    val dir = TempDirs.scratch("constraints")
    DeltaInterop.writeDelta(docs(10), dir, Nil)
    val v = DeltaInterop.addConstraint(spark, dir, "id_nonneg", "id >= 0")
    assert(v === 1L)
    assert(DeltaInterop.history(spark, dir)
      .select("operation").as[String].head() === "ADD CONSTRAINT")
    // a violating append fails BEFORE committing; the table is untouched
    val before = DeltaInterop.latestVersion(spark, dir)
    val ex = intercept[IllegalArgumentException] {
      DeltaInterop.writeDelta(
        Seq((-1L, "bad", "0")).toDF("id", "body", "grp"), dir, Nil)
    }
    assert(ex.getMessage.contains("id_nonneg"))
    assert(DeltaInterop.latestVersion(spark, dir) === before)
    // a clean append passes; NULL evaluates the check to NULL → passes
    DeltaInterop.writeDelta(
      Seq((Some(20L), "ok", "1"), (None: Option[Long], "nullid", "1"))
        .toDF("id", "body", "grp"), dir, Nil)
    assert(DeltaInterop.readDelta(spark, dir).count() === 12L)
    // UPDATE cannot smuggle a violation in either
    intercept[IllegalArgumentException] {
      DeltaInterop.updateWhere(spark, dir, col("id") === 20L,
        Map("id" -> lit(-5L)))
    }
    // adding a constraint existing rows violate is refused
    intercept[IllegalArgumentException] {
      DeltaInterop.addConstraint(spark, dir, "small", "id < 5")
    }
  }

  test("restore records CDC inserts/deletes when the feed is on") {
    val dir = TempDirs.scratch("restore-cdf")
    DeltaInterop.writeDelta(docs(12).repartition(1), dir, Nil)        // v0
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))                    // v1
    DeltaInterop.deleteWhere(spark, dir, col("id") < 4L)              // v2
    val (v, _, _) = DeltaInterop.restore(spark, dir, 1L)              // v3
    val ch = DeltaInterop.readChangeFeed(spark, dir, v, v)
    // the deleted file's survivors leave (delete) and the full original
    // file returns (insert): net = the 4 restored rows
    val net = ch.filter(col("_change_type") === "insert").select("id")
      .exceptAll(ch.filter(col("_change_type") === "delete").select("id"))
    assert(net.as[Long].collect().sorted === (0L until 4L).toArray)
    // and the whole feed range including the restore still reads clean
    assert(DeltaInterop.readChangeFeed(spark, dir, 0, v).count() > 0)
  }
}
