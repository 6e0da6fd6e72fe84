package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Layer/path conventions + partition discovery.
  *
  * The reference lays data out as `<layer>/<yyyy-MM-dd>/<table>/...` and
  * discovers "the" snapshot by taking the max date-named folder with driver
  * code (reference: Source_Raw_Dynamic.py:51-57, Raw_To_Staging.py:148-152,
  * Patient_datamart.py:34-43). We keep that contract but route it through the
  * Hadoop FileSystem API so the same code runs on local FS, HDFS or S3A.
  *
  * Scale note: listing one directory level is O(partitions), not O(files) —
  * this is safe at 100 TB as long as layouts stay `layer/date/table`. The
  * idiomatic alternative (used by the scale-mode writers) is a real
  * `load_date` partition column, where Catalyst's PruneFileSourcePartitions
  * does the pruning without any driver-side listing.
  */
final class FileCatalog(root: String, conf: Configuration = new Configuration()) {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def layerPath(layer: String): String = s"$root/$layer"

  def tablePath(layer: String, date: String, table: String): String =
    s"$root/$layer/$date/$table"

  /** Date-named subfolders of a layer (sorted ascending). */
  def datePartitions(layer: String): Seq[String] = {
    val p = new Path(layerPath(layer))
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p)
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.matches("""\d{4}-\d{2}-\d{2}"""))
        .sorted
        .toSeq
  }

  /** Latest date partition, if any (reference's `max()` over folder names). */
  def latestDate(layer: String): Option[String] = datePartitions(layer).lastOption

  /** Table folders under one layer/date. */
  def listTables(layer: String, date: String): Seq[String] = {
    val p = new Path(s"${layerPath(layer)}/$date")
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
  }

  /** Files (non-recursive) under a prefix matching an extension filter. */
  def listFiles(prefix: String, suffix: String = ""): Seq[String] = {
    val p = new Path(prefix)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
        .map(_.getPath.toString)
        .sorted
        .toSeq
  }
}
