package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** K3 — landing-zone file mover (stage 1 of the reference pipeline).
  *
  * The reference copies each CSV object under `datasource/` to
  * `source/<date>/<table>/` and `archive/<date>/<table>/`, then deletes the
  * original (reference: Datasource_To_Source.py:24-55). Pure file-system
  * work — no DataFrame involved — so we use the Hadoop FS API directly,
  * which maps 1:1 onto S3A server-side copies on a real cluster.
  */
final class Mover(conf: Configuration = new Configuration()) {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  /** Derive the table name from a landing file name: `patients.csv` →
    * `patients` (reference derives it the same way from the object key). */
  def tableNameOf(fileName: String): String =
    fileName.stripSuffix(".csv")

  /** Move one landing file into source + archive for the given date.
    * Returns the destination source path. */
  def ingest(file: String, root: String, date: String): String = {
    val src = new Path(file)
    val f = fs(src)
    val table = tableNameOf(src.getName)
    val sourceDst = new Path(s"$root/source/$date/$table/${src.getName}")
    val archiveDst = new Path(s"$root/archive/$date/$table/${src.getName}")
    f.mkdirs(sourceDst.getParent)
    f.mkdirs(archiveDst.getParent)
    // delete the landing file ONLY after both copies report success —
    // FileUtil.copy can fail with a false return instead of throwing
    val copiedSource = FileUtil.copy(f, src, f, sourceDst, false, conf)
    val copiedArchive = FileUtil.copy(f, src, f, archiveDst, false, conf)
    require(copiedSource && copiedArchive,
      s"ingest copy failed for $src (source=$copiedSource, archive=$copiedArchive)")
    f.delete(src, false)
    sourceDst.toString
  }

  /** Ingest every `*.csv` under a landing prefix. Returns moved paths. */
  def ingestAll(landing: String, root: String, date: String): Seq[String] = {
    val catalog = new FileCatalog(root, conf)
    catalog.listFiles(landing, ".csv").map(ingest(_, root, date))
  }

  /** The reference's 18-file completeness barrier (Automation/Lambda:102-104)
    * as an explicit check: did all expected tables land for this date? */
  def isComplete(root: String, date: String, expectedTables: Set[String]): Boolean = {
    val catalog = new FileCatalog(root, conf)
    expectedTables.subsetOf(catalog.listTables("source", date).toSet)
  }
}
