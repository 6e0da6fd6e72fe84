package graft.io

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** File-level zone maps: a manifest of per-file min/max for chosen
  * columns, used to skip whole files before Spark ever opens them.
  *
  * Parquet footers already carry row-group stats, but the scan must still
  * LIST and OPEN every file to read them; a manifest-level zone map prunes
  * at planning time from one small JSON — at 100 TB with ~100k files
  * that is the difference between touching 100k footers and touching the
  * ~hundreds of files a selective range predicate actually needs. The
  * payoff multiplies with a [[graft.functions.ZOrder]] layout: z-ordered
  * files have TIGHT bounding boxes on every interleaved dimension, so
  * range predicates on ANY of them skip most files (a linearly-sorted
  * layout only skips on its leading column).
  *
  * Pruning is a superset by construction (box overlap); callers apply the
  * exact predicate on what remains — results are identical to a full
  * scan, only cheaper, which is how q103 oracle-verifies the path.
  *
  * Same storage idioms as [[PartitionedSnapshotStore]]: Hadoop FS for
  * portability, Jackson (a Spark dependency) for the manifest.
  */
object ZoneMap {

  private val ManifestFile = "_zonemap.json"

  /** Index an existing parquet directory: ONE scan computes per-file
    * min/max for `statsCols` (numeric-castable), written as
    * `<dir>/_zonemap.json`. Composes with any layout writer — call after
    * `ZOrder.writeZOrdered` (or any parquet write). */
  def index(spark: SparkSession, dir: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "need at least one stats column")
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val rows = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    rows.foreach { r =>
      val node = root.putObject(r.getString(0))
      statsCols.foreach { c =>
        val arr = node.putArray(c)
        arr.add(r.getDouble(r.fieldIndex(s"min_$c")))
        arr.add(r.getDouble(r.fieldIndex(s"max_$c")))
      }
    }
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, ManifestFile), true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
  }

  /** Files whose bounding box overlaps EVERY requested `(col, lo, hi)`
    * range, plus the total file count — the planning-time decision,
    * driver-side, from the manifest alone. */
  def pruneFiles(spark: SparkSession, dir: String,
                 ranges: Seq[(String, Double, Double)]): (Seq[String], Int) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(dir, ManifestFile))
    val json = try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
               finally in.close()
    val root = new ObjectMapper().readTree(json)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      total += 1
      val keep = ranges.forall { case (c, lo, hi) =>
        val b = e.getValue.get(c)
        // A column absent from the manifest means "no stats" — the file
        // CANNOT be pruned on it (pruning must stay a superset of the
        // exact predicate). Only a present, non-overlapping box skips.
        b == null || (b.get(1).asDouble >= lo && b.get(0).asDouble <= hi)
      }
      if (keep) files += e.getKey
    }
    (files.toSeq, total)
  }

  /** Read only the overlapping files. The returned relation is a SUPERSET
    * of the range predicate — apply the exact filter downstream (it also
    * pushes into the per-file parquet scan as usual). Empty selection →
    * empty relation with the table's schema. */
  def readPruned(spark: SparkSession, dir: String,
                 ranges: Seq[(String, Double, Double)]): DataFrame = {
    val (files, _) = pruneFiles(spark, dir, ranges)
    if (files.isEmpty)
      spark.read.parquet(dir).limit(0)
    else spark.read.parquet(files: _*)
  }
}
