package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets

/** Versioned snapshot table with an atomic latest-pointer — the
  * snapshot-isolation pattern Delta/Iceberg formalize, in plain parquet:
  *
  *   table/
  *     v=1/  v=2/  ...          immutable snapshot directories
  *     _LATEST                  one-line pointer file, swapped atomically
  *
  * Writers produce a NEW `v=N+1` directory (never touching live files),
  * then swap `_LATEST` via write-temp + rename — a single-object atomic
  * commit, so readers resolve either the old or the new snapshot, never a
  * half-written mix. This is what makes the reference's
  * overwrite-the-whole-table SCD2 sink safe to run while readers are
  * active, and it gives time travel (any past version stays readable until
  * vacuumed) for free. At 100 TB the commit cost is independent of table
  * size: one directory of new files plus one tiny pointer swap.
  */
object SnapshotStore {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointerPath(dir: String) = new Path(dir, "_LATEST")

  /** Latest committed version, 0 if none. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = pointerPath(dir)
    if (!f.exists(p)) 0
    else {
      val in = f.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    }
  }

  /** Commit `df` as the next snapshot version; returns the new version. */
  def commit(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val next = latestVersion(spark, dir) + 1
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/v=$next")
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_LATEST.tmp.$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename is the atomic commit point (single object on HDFS-likes)
    if (!f.rename(tmp, pointerPath(dir))) {
      // pointer exists (first commit race or retry): replace via delete+rename
      f.delete(pointerPath(dir), false)
      require(f.rename(tmp, pointerPath(dir)), s"could not commit pointer for v=$next")
    }
    next
  }

  /** Read the latest snapshot (empty Option when nothing committed). */
  def readLatest(spark: SparkSession, dir: String): Option[DataFrame] = {
    val v = latestVersion(spark, dir)
    if (v == 0) None else Some(read(spark, dir, v))
  }

  /** Time travel: read a specific committed version. */
  def read(spark: SparkSession, dir: String, version: Int): DataFrame =
    spark.read.parquet(s"$dir/v=$version")

  /** Drop snapshots older than `keep` versions (vacuum). Never touches the
    * latest pointer or any version ≥ latest-keep+1. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2): Unit = {
    val latest = latestVersion(spark, dir)
    val f = fs(spark, dir)
    (1 to latest - keep).foreach { v =>
      f.delete(new Path(dir, s"v=$v"), true)
    }
  }
}
