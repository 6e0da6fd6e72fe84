package graft.io

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Snapshot isolation AND partition-pruned rewrite together — the manifest
  * idea Iceberg/Delta formalize, in plain parquet:
  *
  *   table/
  *     data/v=3/part=7/...parquet    immutable file sets, written once,
  *                                   SHARED by every later version whose
  *                                   manifest still references them
  *     manifest/v=3.json             partition value -> data dir (absolute
  *                                   over versions: untouched partitions
  *                                   keep pointing at old data dirs)
  *     _LATEST                       atomic pointer (same swap as
  *                                   [[SnapshotStore]])
  *
  * A delta commit writes new files ONLY for the partitions it touches; the
  * new manifest carries every other partition's entry forward verbatim.
  * Readers resolve a manifest and never see a half-written mix; old
  * versions stay time-travelable; [[vacuum]] deletes a data dir only when
  * no retained manifest references it. At 100 TB a 1-day delta commit
  * costs O(touched partitions) writes + one pointer swap, while plain
  * [[SnapshotStore]] pays a full-table rewrite per version.
  *
  * Partition values are ints (graft uses the deterministic key-hash bucket
  * from `Scd2.partitionFor`). The per-partition read path re-attaches the
  * partition column from the manifest, so the table round-trips exactly.
  */
object PartitionedSnapshotStore {

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

  /** partition value → data directory (absolute path), for one version. */
  def readManifest(spark: SparkSession, dir: String, version: Int): Map[Int, String] = {
    val f = fs(spark, dir)
    val in = f.open(new Path(dir, s"manifest/v=$version.json"))
    val json = try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
               finally in.close()
    val root = new ObjectMapper().readTree(json)
    root.properties().asScala.map(e => e.getKey.toInt -> e.getValue.asText()).toMap
  }

  private def writeManifest(spark: SparkSession, dir: String, version: Int,
                            m: Map[Int, String]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    val f = fs(spark, dir)
    val out = f.create(new Path(dir, s"manifest/v=$version.json"), false)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def swapPointer(spark: SparkSession, dir: String, next: Int): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_LATEST.tmp.$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!f.rename(tmp, pointerPath(dir))) {
      f.delete(pointerPath(dir), false)
      require(f.rename(tmp, pointerPath(dir)), s"could not commit pointer for v=$next")
    }
  }

  /** Commit a delta: `df` must contain COMPLETE content for every partition
    * value in its `partCol` (the merge output), and nothing else. New files
    * are written only for those partitions; all other entries of the
    * previous manifest carry forward. Returns the committed version. */
  def commitDelta(df: DataFrame, dir: String, partCol: String): Int = {
    val spark = df.sparkSession
    val prev = latestVersion(spark, dir)
    val next = prev + 1
    val dataDir = s"$dir/data/v=$next"
    df.write.mode(SaveMode.ErrorIfExists)
      .partitionBy(partCol).parquet(dataDir)
    // the partitions this commit actually wrote (from the output layout —
    // no second pass over the data)
    val written = fs(spark, dir).listStatus(new Path(dataDir))
      .map(_.getPath.getName).filter(_.startsWith(s"$partCol="))
      .map(n => n.substring(partCol.length + 1).toInt)
    val carried = if (prev == 0) Map.empty[Int, String] else readManifest(spark, dir, prev)
    val manifest = carried ++ written.map(p => p -> s"$dataDir/$partCol=$p").toMap
    writeManifest(spark, dir, next, manifest)
    swapPointer(spark, dir, next)
    next
  }

  /** Read one version (all partitions, or `parts` only). The partition
    * column is re-attached from the manifest key. Partitions carried
    * forward from BEFORE a schema-widening commit may lack newer columns
    * — they read as null (unionByName with missing-column fill), the
    * standard parquet-evolution semantics, so a delta commit can add
    * columns without rewriting untouched partitions. */
  def read(spark: SparkSession, dir: String, version: Int, partCol: String,
           parts: Option[Seq[Int]] = None): DataFrame = {
    val manifest = readManifest(spark, dir, version)
    val selected = parts.fold(manifest)(ps => manifest.view.filterKeys(ps.toSet).toMap)
    selected.toSeq.sortBy(_._1).map { case (p, path) =>
      spark.read.parquet(path).withColumn(partCol, lit(p))
    }.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(throw new IllegalStateException(
        s"no manifest entries for ${parts.getOrElse("any")} in v=$version at $dir"))
  }

  def readLatest(spark: SparkSession, dir: String, partCol: String,
                 parts: Option[Seq[Int]] = None): Option[DataFrame] = {
    val v = latestVersion(spark, dir)
    if (v == 0) None else Some(read(spark, dir, v, partCol, parts))
  }

  /** Drop manifests older than `keep` versions, then delete any `data/v=K`
    * dir that no RETAINED manifest references — shared file sets survive as
    * long as a live version still points at them. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2): Unit = {
    val latest = latestVersion(spark, dir)
    val f = fs(spark, dir)
    val keepVersions = (math.max(1, latest - keep + 1) to latest).toSeq
    // manifest entries look like <dir>/data/v=K/<partCol>=p — a data dir is
    // live iff some retained manifest references its v=K segment
    val referenced = keepVersions
      .flatMap(v => readManifest(spark, dir, v).values)
      .flatMap(_.split('/').find(s => s.startsWith("v=")))
      .toSet
    (1 until keepVersions.min).foreach { v =>
      f.delete(new Path(dir, s"manifest/v=$v.json"), false)
    }
    val dataRoot = new Path(dir, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      if (!referenced.contains(st.getPath.getName)) f.delete(st.getPath, true)
    }
  }
}
