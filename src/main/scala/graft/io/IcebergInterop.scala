package graft.io

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** READ-ONLY interop for FOREIGN Apache Iceberg tables (format spec at
  * iceberg.apache.org/spec/): a migration-path reader so an
  * append-only Iceberg v1/v2 table can join graft pipelines without a
  * rewrite — the same role the Delta log replay plays for delta-spark
  * tables.
  *
  * Scope is deliberate and loud:
  *   - APPEND-ONLY tables read green: current (or time-traveled)
  *     snapshot → manifest list → data manifests → live parquet files.
  *   - Row-level deletes REFUSE BY NAME: a v2 delete manifest
  *     (`content=1`) or delete data file (position/equality deletes)
  *     changes row visibility in ways a plain scan must not ignore.
  *   - format-version 3 refuses by name (deletion vectors, row
  *     lineage — unmodeled here).
  *
  * Scale shape: metadata work is manifest-file-count-bounded (the
  * Avro manifests are read driver-side like the Delta JSON log; each
  * is a bounded list of file descriptors), and the data scan is one
  * Spark parquet read over the live file set with the table schema
  * pinned from metadata — Catalyst prunes columns and pushes filters
  * exactly as for any parquet scan. Iceberg data files materialize
  * identity-partition columns as real columns, so no partition-value
  * reconstruction is needed. */
object IcebergInterop {

  private val M = new ObjectMapper()

  /** Latest metadata JSON under `dir/metadata`: `version-hint.text`
    * when present (the file-system-catalog convention), else the
    * highest `v<N>.metadata.json`. */
  private def currentMetadataPath(spark: SparkSession, dir: String): Path = {
    val meta = new Path(dir, "metadata")
    val f = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(meta), s"$dir has no metadata/ dir — not an Iceberg table")
    val hint = new Path(meta, "version-hint.text")
    if (f.exists(hint)) {
      val in = f.open(hint)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      val p = new Path(meta, s"v$v.metadata.json")
      require(f.exists(p), s"version-hint names $v but $p is missing")
      p
    } else {
      val vs = f.listStatus(meta).map(_.getPath.getName)
        .flatMap { n =>
          val m = """v(\d+)\.metadata\.json""".r.findFirstMatchIn(n)
          m.map(_.group(1).toLong -> n)
        }
      require(vs.nonEmpty, s"no v*.metadata.json under $meta")
      new Path(meta, vs.maxBy(_._1)._2)
    }
  }

  private def readJson(spark: SparkSession, p: Path): JsonNode = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    try M.readTree(in) finally in.close()
  }

  /** Iceberg type string/node → Spark type. Unsupported types refuse
    * by name rather than misread. */
  private def toSparkType(t: JsonNode): DataType =
    if (t.isTextual) t.asText match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case "binary" => BinaryType
      case "date" => DateType
      case "timestamp" => TimestampNTZType   // no zone in the spec's "timestamp"
      case "timestamptz" => TimestampType
      case d if d.startsWith("decimal(") =>
        val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(',')
        DecimalType(p.trim.toInt, s.trim.toInt)
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg type: $other")
    } else t.path("type").asText match {
      case "struct" =>
        StructType(fieldsOf(t.path("fields")))
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg nested type: $other (struct only)")
    }

  private def fieldsOf(fields: JsonNode): Seq[StructField] = {
    import scala.jdk.CollectionConverters._
    fields.elements().asScala.map { fd =>
      StructField(fd.path("name").asText, toSparkType(fd.path("type")),
        nullable = !fd.path("required").asBoolean(false))
    }.toSeq
  }

  /** The current schema as a Spark StructType (v2 `schemas` +
    * `current-schema-id`; v1 singular `schema`). */
  private def tableSchema(meta: JsonNode): StructType = {
    import scala.jdk.CollectionConverters._
    val schemaNode =
      if (meta.has("schemas")) {
        val cur = meta.path("current-schema-id").asInt(0)
        meta.path("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == cur)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $cur not in schemas"))
      } else meta.path("schema")
    StructType(fieldsOf(schemaNode.path("fields")))
  }

  /** All records of one Avro container file (manifests are metadata:
    * file descriptor lists, read where the Delta JSON log is read). */
  private def avroRecords(spark: SparkSession, p: Path): Seq[GenericRecord] = {
    val in = new FsInput(p, spark.sparkContext.hadoopConfiguration)
    val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (r.hasNext) out += r.next()
      out.result()
    } finally r.close()
  }

  private def str(r: GenericRecord, field: String): String = {
    val v = r.get(field); require(v != null, s"manifest record lacks $field")
    v.toString
  }
  private def intOr(r: GenericRecord, field: String, dflt: Int): Int =
    Option(r.getSchema.getField(field)).flatMap(_ => Option(r.get(field)))
      .map(_.asInstanceOf[Number].intValue).getOrElse(dflt)

  /** Resolve a manifest's possibly-absolute file URI against this
    * table (file: URIs strip to paths; relative stays relative). */
  private def resolve(uri: String): String =
    if (uri.startsWith("file:")) new java.net.URI(uri).getPath else uri

  /** Live data-file paths of `snapshot`, refusing any delete content. */
  private def liveFiles(spark: SparkSession, dir: String,
                        snapshot: JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val manifestPaths: Seq[(String, Int)] =
      if (snapshot.has("manifest-list")) {
        avroRecords(spark, new Path(resolve(snapshot.path("manifest-list").asText)))
          .map(m => (str(m, "manifest_path"), intOr(m, "content", 0)))
      } else // v1: inline manifest path array
        snapshot.path("manifests").elements().asScala
          .map(p => (p.asText, 0)).toSeq
    val deleteManifests = manifestPaths.filter(_._2 == 1)
    require(deleteManifests.isEmpty,
      s"Iceberg table at $dir carries DELETE manifest(s) " +
      s"(e.g. ${deleteManifests.head._1}) — row-level deletes are not " +
      "supported; compact/rewrite the table to data-only first")
    manifestPaths.flatMap { case (mp, _) =>
      avroRecords(spark, new Path(resolve(mp))).flatMap { e =>
        val status = intOr(e, "status", 0)
        if (status == 2) None // DELETED entry: file dropped in this snapshot
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val content = intOr(df, "content", 0)
          require(content == 0,
            s"Iceberg table at $dir references a delete file " +
            s"(content=$content, ${str(df, "file_path")}) — position/equality " +
            "deletes are not supported")
          val fmt = str(df, "file_format")
          require(fmt.equalsIgnoreCase("parquet"),
            s"Iceberg data file format $fmt is not supported (parquet only)")
          Some(resolve(str(df, "file_path")))
        }
      }
    }
  }

  /** Read an Iceberg table's current — or `snapshotId`'s — rows. */
  def readIceberg(spark: SparkSession, dir: String,
                  snapshotId: Option[Long] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    val meta = readJson(spark, currentMetadataPath(spark, dir))
    val fv = meta.path("format-version").asInt(1)
    require(fv <= 2,
      s"Iceberg format-version $fv is not supported (v1/v2 append-only only)")
    val snaps = meta.path("snapshots").elements().asScala.toSeq
    val wanted = snapshotId.getOrElse(meta.path("current-snapshot-id").asLong(-1L))
    val snap = snaps.find(_.path("snapshot-id").asLong(-2L) == wanted)
    val schema = tableSchema(meta)
    snap match {
      case None if snaps.isEmpty && snapshotId.isEmpty =>
        // a created-but-never-written table: empty frame, real schema
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      case None =>
        throw new IllegalArgumentException(
          s"snapshot $wanted not found in ${snaps.length} snapshot(s) at $dir")
      case Some(s0) =>
        val files = liveFiles(spark, dir, s0)
        if (files.isEmpty)
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        else spark.read.schema(schema).parquet(files: _*)
    }
  }

  /** The table's snapshot log (id, sequence number, timestamp,
    * operation) — the DESCRIBE HISTORY analogue. */
  def snapshots(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val meta = readJson(spark, currentMetadataPath(spark, dir))
    meta.path("snapshots").elements().asScala.toSeq.map { s0 =>
      (s0.path("snapshot-id").asLong, s0.path("sequence-number").asLong(0L),
        s0.path("timestamp-ms").asLong(0L),
        s0.path("summary").path("operation").asText(""))
    }.toDF("snapshot_id", "sequence_number", "timestamp_ms", "operation")
  }
}
