package graft

import java.nio.file.Files
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Protocol DOWNGRADES (PROTOCOL.md feature removal, delta-spark's
  * `ALTER TABLE ... DROP FEATURE` surface): the lifecycle direction
  * upgrades alone leave open. REORG PURGE rewrites DV-carrying files
  * with their masks applied; DROP FEATURE then shrinks the protocol's
  * feature lists — with TRUNCATE HISTORY checkpointing the post-drop
  * head and dropping the log prefix, so no retained action carries the
  * removed feature. */
class DeltaDropFeatureSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("REORG PURGE applies DV masks into clean files; DROP FEATURE deletionVectors downgrades") {
    val dir = Files.createTempDirectory("graft-dropfeat").toString
    DeltaInterop.writeDelta((1L to 10L).map(i => (i, s"t$i")).toDF("id", "tag"), dir, Nil)
    DeltaInterop.deleteWhereDV(spark, dir, col("id") <= 3L)
    var st = DeltaInterop.state(spark, dir)
    assert(st.protocol.impliedReaderFeatures.contains("deletionVectors"))
    assert(st.files.exists(_.deletionVector != null))

    // live DVs block the drop, loudly
    val e1 = intercept[IllegalArgumentException](
      DeltaInterop.dropFeature(spark, dir, "deletionVectors", truncateHistory = true))
    assert(e1.getMessage.contains("reorgPurge"))

    val (_, purged) = DeltaInterop.reorgPurge(spark, dir)
    assert(purged == 1)
    st = DeltaInterop.state(spark, dir)
    assert(st.files.forall(_.deletionVector == null))
    assert(DeltaInterop.readDelta(spark, dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == (4L to 10L))

    // without TRUNCATE HISTORY the drop refuses (retained history
    // still carries DV actions)
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.dropFeature(spark, dir, "deletionVectors"))
    assert(e2.getMessage.contains("TRUNCATE HISTORY"))

    // the SQL surface, end-to-end
    spark.sql(s"ALTER TABLE delta.`$dir` DROP FEATURE deletionVectors TRUNCATE HISTORY")
    st = DeltaInterop.state(spark, dir)
    assert(!st.protocol.impliedReaderFeatures.contains("deletionVectors"))
    assert(!st.protocol.impliedWriterFeatures.contains("deletionVectors"))
    assert(DeltaInterop.readDelta(spark, dir).count() == 7)
    // history below the drop is truncated: the earliest version is the
    // drop commit (replay from the post-drop checkpoint)
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val jsons = f.listStatus(new org.apache.hadoop.fs.Path(dir, "_delta_log"))
      .map(_.getPath.getName)
      .filter(n => n.matches("^\\d+\\.json$"))
    assert(jsons.map(_.stripSuffix(".json").toLong).min == st.version)
    // writes keep working; a NEW DV op legally re-upgrades
    DeltaInterop.writeDelta(Seq((99L, "z")).toDF("id", "tag"), dir, Nil)
    DeltaInterop.deleteWhereDV(spark, dir, col("id") === 99L)
    assert(DeltaInterop.state(spark, dir)
      .protocol.impliedReaderFeatures.contains("deletionVectors"))
  }

  test("DROP FEATURE changeDataFeed and rowTracking clear their config; unknown refuses") {
    val dir = Files.createTempDirectory("graft-dropfeat2").toString
    DeltaInterop.writeDelta(Seq((1L, "a")).toDF("id", "tag"), dir, Nil)
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableRowTracking" -> "true"))
    var st = DeltaInterop.state(spark, dir)
    assert(st.domains.contains(DeltaInterop.RowTrackingDomain))

    DeltaInterop.dropFeature(spark, dir, "rowTracking")
    st = DeltaInterop.state(spark, dir)
    assert(!st.protocol.impliedWriterFeatures.contains("rowTracking"))
    assert(!st.configuration.contains("delta.enableRowTracking"))
    assert(!st.domains.contains(DeltaInterop.RowTrackingDomain))
    // the per-add id fields are inert extras now; reads unaffected
    assert(DeltaInterop.readDelta(spark, dir).count() == 1)

    DeltaInterop.dropFeature(spark, dir, "changeDataFeed")
    st = DeltaInterop.state(spark, dir)
    assert(!st.configuration.contains("delta.enableChangeDataFeed"))

    val e = intercept[IllegalArgumentException](
      DeltaInterop.dropFeature(spark, dir, "invariants"))
    assert(e.getMessage.contains("not supported"))
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.dropFeature(spark, dir, "deletionVectors", truncateHistory = true))
    assert(e2.getMessage.contains("does not carry"))
  }
}
