package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interop bridge: make [[PartitionedSnapshotStore]] tables readable by
  * STOCK Spark — no graft classes anywhere on the read path.
  *
  * The store's manifest (partition value → immutable data dir) is exactly
  * the shape of a catalog-partitioned external table, so the bridge is a
  * metadata-only publish: one catalog partition per manifest entry,
  * each LOCATION pointing at the manifest's data dir. Any engine on the
  * same metastore then reads the committed snapshot BY NAME
  * (`spark.table("t")`, `SELECT ... FROM t`) with partition pruning from
  * the catalog — the reference's end-user surface (arbitrary SQL over a
  * shared catalog — `/root/reference/README.md:32-33`), and Iceberg's
  * catalog idea expressed through plain Hive-style partition metadata.
  *
  * Costs are O(partitions) catalog calls and ZERO data movement;
  * re-publishing after a delta commit repoints only the partitions whose
  * manifest entries changed. Readers of the published table see the
  * version that was latest at publish time (publish after each commit to
  * track HEAD — the same cadence as Iceberg's commit+catalog-swap).
  *
  * Two more escape hatches for engines without the shared metastore:
  *   - [[exportFileManifest]]: a text manifest of every live parquet
  *     file (the Athena/Presto `symlink_format_manifest` pattern) —
  *     metadata-only; stock Spark reads it with
  *     `spark.read.parquet(spark.read.textFile(m).collect().toSeq: _*)`.
  *   - [[exportHive]]: full materialization into one plain
  *     Hive-partitioned directory (`spark.read.parquet(dir)`) — costs a
  *     copy, needs nothing but a filesystem.
  */
object SnapshotInterop {

  /** Publish the latest committed version as a catalog-partitioned
    * external table named `tableName`. Idempotent: creates the table on
    * first publish, then adds/repoints/drops partitions to mirror the
    * manifest exactly. Returns the published store version. */
  def publishToCatalog(spark: SparkSession, tableDir: String, tableName: String,
                       partCol: String): Int = {
    val v = PartitionedSnapshotStore.latestVersion(spark, tableDir)
    require(v > 0, s"no committed version under $tableDir")
    val manifest = PartitionedSnapshotStore.readManifest(spark, tableDir, v)
    require(manifest.nonEmpty, s"empty manifest at v=$v under $tableDir")
    // data files carry every column EXCEPT the partition column (stripped
    // by partitionBy on write) — the catalog re-attaches it, exactly like
    // the store's own read path. The schema is the UNION over manifest
    // dirs (a widening delta commit leaves untouched partitions on the
    // old shape; their files read the newer columns as null).
    val dataSchema = manifest.values.toSeq.sorted
      .map(p => spark.read.parquet(p).schema)
      .reduce((a, b) => org.apache.spark.sql.types.StructType(
        a.fields ++ b.fields.filterNot(f => a.fieldNames.contains(f.name))))
    require(!dataSchema.fieldNames.contains(partCol),
      s"$partCol must be the partition column, not a data column")
    if (!spark.catalog.tableExists(tableName)) {
      val cols = (dataSchema.fields.map(f => s"`${f.name}` ${f.dataType.sql}") :+
        s"`$partCol` INT").mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$tableName` ($cols) USING parquet
           |PARTITIONED BY (`$partCol`) LOCATION '${new Path(tableDir, "data")}'""".stripMargin)
    } else {
      // schema evolution on republish: widen the catalog with any columns
      // this version's data added (additive-only, like the store itself)
      val known = spark.table(tableName).schema.fieldNames.toSet
      val added = dataSchema.fields.filterNot(f => known.contains(f.name))
      if (added.nonEmpty) {
        val cols = added.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"ALTER TABLE `$tableName` ADD COLUMNS ($cols)")
      }
    }
    // mirror the manifest: add new partitions, repoint existing ones
    manifest.toSeq.sortBy(_._1).foreach { case (p, path) =>
      spark.sql(s"ALTER TABLE `$tableName` ADD IF NOT EXISTS PARTITION (`$partCol`=$p) " +
        s"LOCATION '$path'")
      spark.sql(s"ALTER TABLE `$tableName` PARTITION (`$partCol`=$p) SET LOCATION '$path'")
    }
    // drop partitions no longer present in the manifest
    val live = manifest.keySet
    spark.sql(s"SHOW PARTITIONS `$tableName`").collect()
      .map(_.getString(0).stripPrefix(s"$partCol=").toInt)
      .filterNot(live.contains)
      .foreach(p => spark.sql(
        s"ALTER TABLE `$tableName` DROP IF EXISTS PARTITION (`$partCol`=$p)"))
    v
  }

  /** Write a text manifest listing every parquet data file of the latest
    * version, one absolute path per line (sorted — deterministic). Returns
    * (version, fileCount). Metadata-only: lists the manifest's dirs, moves
    * no data. Stock-Spark recipe (basePath recovers the partition columns
    * from the `part=p` path segments; the `v=K` segment surfaces as a
    * bonus `v` column — the snapshot version each file belongs to):
    * {{{
    *   val files = spark.read.textFile(m).collect().toSeq
    *   spark.read.option("basePath", s"\$tableDir/data").parquet(files: _*)
    * }}} */
  def exportFileManifest(spark: SparkSession, tableDir: String,
                         manifestOut: String): (Int, Int) = {
    val v = PartitionedSnapshotStore.latestVersion(spark, tableDir)
    require(v > 0, s"no committed version under $tableDir")
    val manifest = PartitionedSnapshotStore.readManifest(spark, tableDir, v)
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = manifest.toSeq.sortBy(_._1).flatMap { case (_, dir) =>
      fs.listStatus(new Path(dir))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    }.sorted
    val outPath = new Path(manifestOut)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outFs.create(outPath, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    (v, files.length)
  }

  /** Materialize the latest version into a plain Hive-partitioned parquet
    * directory at `outDir` — `spark.read.parquet(outDir)` recovers the
    * table (partition column included) on any stock Spark. Full copy; use
    * the metadata-only paths above when a shared catalog exists. */
  def exportHive(spark: SparkSession, tableDir: String, outDir: String,
                 partCol: String): Int = {
    val v = PartitionedSnapshotStore.latestVersion(spark, tableDir)
    require(v > 0, s"no committed version under $tableDir")
    PartitionedSnapshotStore.read(spark, tableDir, v, partCol)
      .write.mode("overwrite").partitionBy(partCol).parquet(outDir)
    v
  }
}
