package graft

import graft.io.{DeltaInterop, TempDirs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change Data Feed: `delta.enableChangeDataFeed` table property,
  * `_change_data/` authoring by the row ops, `cdc` actions, and
  * [[DeltaInterop.readChangeFeed]]'s derive-or-read-or-refuse rules. */
class DeltaCdfSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docs(n: Int, from: Int = 0): DataFrame =
    (from until from + n).map(i => (i.toLong, s"doc $i", (i % 3).toString))
      .toDF("id", "body", "grp")

  private def feed(dir: String, from: Long, to: Long): DataFrame =
    DeltaInterop.readChangeFeed(spark, dir, from, to)

  private def newCdfTable(name: String, df: DataFrame,
                          partCols: Seq[String] = Seq("grp")): String = {
    val dir = TempDirs.scratch(name)
    DeltaInterop.writeDelta(df, dir, partCols) // v0
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true")) // v1
    dir
  }

  test("table properties persist through commits, checkpoints, and cleanup") {
    val dir = newCdfTable("cdf-props", docs(10))
    assert(DeltaInterop.cdfEnabled(DeltaInterop.state(spark, dir)))
    DeltaInterop.writeDelta(docs(5, from = 10), dir, Seq("grp")) // append
    assert(DeltaInterop.cdfEnabled(DeltaInterop.state(spark, dir)))
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    assert(DeltaInterop.cdfEnabled(DeltaInterop.state(spark, dir)),
      "configuration must survive checkpoint + log cleanup")
  }

  test("appends derive as inserts — no CDC files written") {
    val dir = newCdfTable("cdf-append", docs(6))
    DeltaInterop.writeDelta(docs(4, from = 6), dir, Seq("grp")) // v2
    val f = new org.apache.hadoop.fs.Path(dir, "_change_data")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(dir, "_change_data")),
      "appends must not write change-data files")
    val ch = feed(dir, 2, 2)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq === Seq("insert"))
    assert(ch.select("id").as[Long].collect().sorted === (6L until 10L).toArray)
    // the whole feed from v0: creation inserts + append inserts
    assert(feed(dir, 0, 2).count() === 10L)
  }

  test("copy-on-write DELETE records its rows as CDC deletes") {
    val dir = newCdfTable("cdf-delete", docs(12))
    val (v, _) = DeltaInterop.deleteWhere(spark, dir, col("id") % 4 === 1L)
    val ch = feed(dir, v, v)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq === Seq("delete"))
    assert(ch.select("id").as[Long].collect().sorted === Array(1L, 5L, 9L))
    assert(ch.select("_commit_version").distinct().as[Long].collect().toSeq === Seq(v))
    // data readers see the post-delete table, never CDC rows
    assert(DeltaInterop.readDelta(spark, dir).count() === 9L)
  }

  test("UPDATE records pre- and post-images") {
    val dir = newCdfTable("cdf-update", docs(10))
    val (v, _) = DeltaInterop.updateWhere(spark, dir, col("id") < 3L,
      Map("body" -> concat(col("body"), lit("!"))))
    val ch = feed(dir, v, v).select("_change_type", "id", "body")
      .as[(String, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(ch.map(_._1).distinct === Seq("update_postimage", "update_preimage"))
    val pre = ch.filter(_._1 == "update_preimage")
    val post = ch.filter(_._1 == "update_postimage")
    assert(pre.map(_._2) === Seq(0L, 1L, 2L) && post.map(_._2) === Seq(0L, 1L, 2L))
    assert(pre.forall(r => !r._3.endsWith("!")) && post.forall(_._3.endsWith("!")))
  }

  test("MERGE records pre/post-images for matches and inserts for the rest") {
    val dir = newCdfTable("cdf-merge", docs(8))
    val source = Seq((2L, "two v2", "2"), (5L, "five v2", "2"), (100L, "new", "1"))
      .toDF("id", "body", "grp")
    val (v, _, nIns) = DeltaInterop.merge(spark, dir, source, Seq("id"))
    assert(nIns === 1L)
    val ch = feed(dir, v, v).select("_change_type", "id", "body")
      .as[(String, Long, String)].collect().toSeq
    assert(ch.filter(_._1 == "insert").map(_._2) === Seq(100L))
    assert(ch.filter(_._1 == "update_preimage").map(_._2).sorted === Seq(2L, 5L))
    val post = ch.filter(_._1 == "update_postimage").sortBy(_._2)
    assert(post.map(_._2) === Seq(2L, 5L) && post.forall(_._3.endsWith("v2")))
  }

  test("DV delete (merge-on-read) records CDC deletes too") {
    val dir = newCdfTable("cdf-dv", docs(10), partCols = Nil)
    val (v, touched, nDel) = DeltaInterop.deleteWhereDV(spark, dir, col("id") >= 7L)
    assert(touched > 0 && nDel === 3L)
    val ch = feed(dir, v, v)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq === Seq("delete"))
    assert(ch.select("id").as[Long].collect().sorted === Array(7L, 8L, 9L))
    // a second DV delete must record ONLY the newly-deleted rows
    val (v2, _, nDel2) = DeltaInterop.deleteWhereDV(spark, dir, col("id") >= 5L)
    assert(nDel2 === 2L)
    assert(feed(dir, v2, v2).select("id").as[Long].collect().sorted === Array(5L, 6L))
  }

  test("DV update (merge-on-read) records pre/post-images too") {
    val dir = newCdfTable("cdf-dv-upd", docs(10), partCols = Nil)
    val (v, _, nUpd) = DeltaInterop.updateWhereDV(spark, dir, col("id") < 2L,
      Map("body" -> concat(col("body"), lit("!"))))
    assert(nUpd === 2L)
    val ch = feed(dir, v, v).select("_change_type", "id", "body")
      .as[(String, Long, String)].collect().toSeq
    assert(ch.filter(_._1 == "update_preimage").map(_._2).sorted === Seq(0L, 1L))
    val post = ch.filter(_._1 == "update_postimage")
    assert(post.map(_._2).sorted === Seq(0L, 1L) && post.forall(_._3.endsWith("!")))
  }

  test("row-op commits without CDF refuse a change-feed read, naming the version") {
    val dir = TempDirs.scratch("cdf-off")
    DeltaInterop.writeDelta(docs(10), dir, Nil) // CDF never enabled
    val (v, _) = DeltaInterop.deleteWhere(spark, dir, col("id") === 0L)
    val ex = intercept[IllegalStateException] { feed(dir, 0, v).count() }
    assert(ex.getMessage.contains(s"version $v") &&
      ex.getMessage.contains("enableChangeDataFeed"))
    // ranges before the row op still derive fine
    assert(feed(dir, 0, v - 1).count() === 10L)
  }

  test("OPTIMIZE commits contribute nothing to the feed; vacuum spares CDC files") {
    val dir = newCdfTable("cdf-compact", docs(16), partCols = Nil)
    val (vDel, _) = DeltaInterop.deleteWhere(spark, dir, col("id") === 3L)
    val (vC, nIn, _) = DeltaInterop.compact(spark, dir)
    assert(nIn > 0)
    assert(feed(dir, vC, vC).count() === 0L, "dataChange=false commit must feed nothing")
    val reclaimed = DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
    // the delete's CDC file must survive vacuum: the feed still replays
    assert(feed(dir, vDel, vDel).select("id").as[Long].collect() === Array(3L))
    assert(reclaimed >= 0)
  }

  test("vacuum reclaims CDC files once their commit ages out of the log") {
    val dir = newCdfTable("cdf-vacuum", docs(10), partCols = Nil)
    val (vDel, _) = DeltaInterop.deleteWhere(spark, dir, col("id") === 4L)
    def cdcFiles(): Int = {
      val cd = new java.io.File(dir, "_change_data")
      if (!cd.exists()) 0
      else {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(cd)
      }
    }
    assert(cdcFiles() === 1)
    // while the delete's JSON survives, the CDC file is referenced
    DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
    assert(cdcFiles() === 1)
    assert(feed(dir, vDel, vDel).count() === 1L)
    // cleanupLog drops commits strictly BELOW the checkpoint, so the
    // delete's JSON only ages out once a LATER commit exists
    DeltaInterop.writeDelta(docs(2, from = 10), dir, Nil)
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    DeltaInterop.vacuum(spark, dir, retainMillis = 0L)
    assert(cdcFiles() === 0, "aged-out CDC files must reclaim")
  }

  test("the feed sums: replaying all changes reconstructs the table") {
    val dir = newCdfTable("cdf-replay", docs(20))
    DeltaInterop.deleteWhere(spark, dir, col("id") % 5 === 0L)
    DeltaInterop.updateWhere(spark, dir, col("id") % 7 === 1L,
      Map("body" -> upper(col("body"))))
    DeltaInterop.writeDelta(docs(4, from = 20), dir, Seq("grp"))
    val st = DeltaInterop.state(spark, dir)
    val ch = feed(dir, 0, st.version)
    // inserts − deletes − preimages + postimages == current table
    val reconstructed = ch.filter(col("_change_type").isin("insert", "update_postimage"))
      .select("id", "body", "grp")
      .exceptAll(ch.filter(col("_change_type").isin("delete", "update_preimage"))
        .select("id", "body", "grp"))
    val want = DeltaInterop.readDelta(spark, dir).select("id", "body", "grp")
    assert(reconstructed.exceptAll(want).isEmpty && want.exceptAll(reconstructed).isEmpty)
  }

  test("a wide feed range plans TWO scans, not O(versions x partitions)") {
    val dir = newCdfTable("cdf-compact", docs(30))   // 3 grp partitions
    // 6 more versions: row ops (cdc files) interleaved with appends
    DeltaInterop.deleteWhere(spark, dir, col("id") % 5 === 0L)               // v2
    DeltaInterop.updateWhere(spark, dir, col("id") % 7 === 1L,
      Map("body" -> upper(col("body"))))                                     // v3
    DeltaInterop.writeDelta(docs(6, from = 30), dir, Seq("grp"))             // v4
    DeltaInterop.deleteWhereDV(spark, dir, col("id") % 11 === 2L)            // v5
    DeltaInterop.writeDelta(docs(6, from = 36), dir, Seq("grp"))             // v6
    DeltaInterop.updateWhereDV(spark, dir, col("id") === 3L,
      Map("body" -> lit("dv-upd")))                                          // v7
    val st = DeltaInterop.state(spark, dir)
    val ch = feed(dir, 0, st.version)
    val plan = ch.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2, s"feed over ${st.version + 1} versions planned $scans scans:\n" +
      plan.linesIterator.take(40).mkString("\n"))
    // the version stamps ride a BROADCAST join — no shuffle anywhere
    assert(!plan.contains("ShuffleExchange") && !plan.contains("SortMergeJoin"),
      s"feed stamping must broadcast, not shuffle:\n$plan")
    // and the compacted read agrees with per-version change sets
    val perVersion = (0L to st.version).flatMap { v =>
      DeltaInterop.changeSet(spark, dir, st, v)
    }.reduce(_ unionByName _).select(ch.columns.map(col).toIndexedSeq: _*)
    assert(ch.exceptAll(perVersion).isEmpty && perVersion.exceptAll(ch).isEmpty,
      "batched feed must equal the per-version union")
  }
}
