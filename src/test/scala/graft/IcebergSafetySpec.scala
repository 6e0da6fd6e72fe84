package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency / hygiene hardening of the native Iceberg write plane:
  * expiry must never reclaim a racing writer's files (reference-diff
  * + age-guarded orphan sweep, never a bare listing sweep), a DV
  * commit that loses a version race must re-union against the NEW
  * head's live DVs (the spec's superset replacement rule), partition
  * directory names decode with Hive semantics (`%XX` only — a literal
  * `+` in a string partition value must survive), and expiry prunes
  * the `metadata-log` entries whose files it deletes. */
class IcebergSafetySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("expiry never reclaims a concurrent in-flight commit's fresh files") {
    val dir = Files.createTempDirectory("graft-iceberg-inflight").toString
    IcebergWrite.append((0L until 20L).map(i => (i, s"a_$i")).toDF("id", "tag"), dir)
    IcebergWrite.append((20L until 40L).map(i => (i, s"b_$i")).toDF("id", "tag"), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") < 3)
    IcebergWrite.compact(spark, dir) // expired history now owns dead files
    // a RACING writer mid-commit: data file + manifest renamed into
    // place, metadata JSON not yet committed — referenced by NOTHING
    val inflightData = new java.io.File(s"$dir/data/${java.util.UUID.randomUUID()}.parquet")
    val inflightMan = new java.io.File(s"$dir/metadata/manifest-inflight-test.avro")
    Seq((99L, "inflight")).toDF("id", "tag").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/.staging-inflight-probe")
    val part = new java.io.File(s"$dir/.staging-inflight-probe").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, inflightData.toPath)
    java.nio.file.Files.write(inflightMan.toPath, Array[Byte](1, 2, 3))
    val stagingDir = new java.io.File(s"$dir/.staging-inflight-probe")

    Thread.sleep(5)
    val (expired, reclaimed) = IcebergWrite.expireSnapshots(spark, dir, 0L)
    assert(expired >= 3 && reclaimed > 0, s"expired=$expired reclaimed=$reclaimed")
    // the dead committed history reclaimed …
    assert(!new java.io.File(s"$dir/data").list().exists(_.startsWith("delete-")),
      "folded delete files (referenced only by expired snapshots) reclaim")
    // … but the racer's seconds-old files are untouchable, even RETAIN 0
    assert(inflightData.exists(), "in-flight data file must survive RETAIN 0 expiry")
    assert(inflightMan.exists(), "in-flight manifest must survive RETAIN 0 expiry")
    assert(stagingDir.exists(), "an active .staging dir must survive RETAIN 0 expiry")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 37)
    // cleanup so later listings in this suite stay sane
    inflightData.delete(); inflightMan.delete()
  }

  test("expiry prunes metadata-log entries whose files it deletes") {
    val dir = Files.createTempDirectory("graft-iceberg-mlog").toString
    (1 to 5).foreach(k =>
      IcebergWrite.append(Seq((k.toLong, s"r_$k")).toDF("id", "tag"), dir))
    Thread.sleep(5)
    IcebergWrite.expireSnapshots(spark, dir, 0L)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val v = new java.io.File(s"$dir/metadata").list()
      .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).max
    val head = M.readTree(new java.io.File(s"$dir/metadata/v$v.metadata.json"))
    import scala.jdk.CollectionConverters._
    val entries = head.path("metadata-log").elements().asScala.toSeq
    assert(entries.nonEmpty, "the undo step keeps its entry")
    entries.foreach { e =>
      val p = new java.io.File(new java.net.URI(
        e.path("metadata-file").asText).getPath match {
          case s if s.nonEmpty => s
          case _ => e.path("metadata-file").asText
        })
      assert(p.exists(), s"metadata-log entry must resolve: $p")
    }
    assert(IcebergInterop.readIceberg(spark, dir).count() == 5)
  }

  test("DV delete losing a race re-unions the racer's DV (superset rule)") {
    val dir = Files.createTempDirectory("graft-iceberg-dv-race").toString
    IcebergWrite.append(
      (0L until 40L).map(i => (i, s"r_$i")).toDF("id", "tag").coalesce(1), dir)
    var fired = false
    IcebergWrite.onBeforeCommit = () => if (!fired) {
      fired = true
      IcebergWrite.onBeforeCommit = () => ()
      // the RACER: lands a DV for the same data file first
      val (_, n) = IcebergWrite.deleteWhereDV(spark, dir, col("id") < 5)
      assert(n == 5)
    }
    try {
      val (_, n) = IcebergWrite.deleteWhereDV(spark, dir,
        col("id") >= 10 && col("id") < 20)
      assert(n == 10, s"rebased delete reports OUR rows only: $n")
    } finally IcebergWrite.onBeforeCommit = () => ()
    val t = IcebergInterop.readIceberg(spark, dir)
    // without the re-union, the stale pre-race union would REPLACE the
    // racer's DV and resurrect ids 0–4
    assert(t.count() == 25, s"both deletions must survive: ${t.count()}")
    assert(t.filter(col("id") < 5).count() == 0, "the racer's rows stay deleted")
    assert(t.filter(col("id") >= 10 && col("id") < 20).count() == 0)
  }

  test("DV update losing a race re-unions the racer's DV") {
    val dir = Files.createTempDirectory("graft-iceberg-updv-race").toString
    IcebergWrite.append(
      (0L until 30L).map(i => (i, i, s"r_$i")).toDF("id", "score", "tag")
        .coalesce(1), dir)
    var fired = false
    IcebergWrite.onBeforeCommit = () => if (!fired) {
      fired = true
      IcebergWrite.onBeforeCommit = () => ()
      IcebergWrite.deleteWhereDV(spark, dir, col("id") < 4)
    }
    try {
      val (_, n) = IcebergWrite.updateWhereDV(spark, dir,
        col("id") >= 10 && col("id") < 15, Map("score" -> lit(777L)))
      assert(n == 5)
    } finally IcebergWrite.onBeforeCommit = () => ()
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 26, s"4 racer deletes + 5 updates in place: ${t.count()}")
    assert(t.filter(col("id") < 4).count() == 0)
    assert(t.filter(col("score") === 777L).count() == 5)
  }

  test("a literal '+' in a string partition value survives the round trip") {
    val dir = Files.createTempDirectory("graft-iceberg-plus").toString
    IcebergWrite.appendPartitioned(
      Seq((1L, "g+1"), (2L, "g+1"), (3L, "g%2"), (4L, "plain"))
        .toDF("id", "grp"), dir, "grp")
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.count() == 4)
    // the point read PRUNES to one manifest and returns the right rows —
    // a URL-decoded summary ("g 1") would prune the real manifest away
    val hit = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g+1"))
    assert(hit.count() == 2, s"'+' partition value must match: ${hit.count()}")
    val (read, skipped) = IcebergInterop.lastManifestScan
    assert(read == 1 && skipped == 2,
      s"manifest skip must survive '+' values: read=$read skipped=$skipped")
    assert(IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g%2")).count() == 1)
    // compact's partition-preserving rewrite shares the same decoder
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.compact(spark, dir, smallFileBytes = 0L)
    val hit2 = IcebergInterop.readIcebergWhere(spark, dir, Map.empty,
      stringEq = Map("grp" -> "g+1"))
    assert(hit2.count() == 1, "post-compact '+' partition still reads")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 3)
  }
}
