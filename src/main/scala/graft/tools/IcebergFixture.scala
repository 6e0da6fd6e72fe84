package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** FIXTURE writer: a minimal spec-shaped Apache Iceberg v2 table
  * (iceberg.apache.org/spec/ — data parquet + Avro manifest + Avro
  * manifest list + `v<N>.metadata.json` + `version-hint.text`), the
  * foreign-table shape [[graft.io.IcebergInterop]] reads. Test/oracle
  * support ONLY — graft does not write Iceberg as a product feature;
  * this exists so reads are exercised against a table laid out by the
  * published spec rather than by the reader's own assumptions. */
object IcebergFixture {

  private val M = new ObjectMapper()

  private val EntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private val ManifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private def writeAvro(path: java.io.File, schema: Schema,
                        records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    try records.foreach(w.append) finally w.close()
  }

  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(s"fixture: unmapped type $other")
  }

  /** Append `df` as a NEW snapshot of the Iceberg table at `dir`
    * (creating the table on first call). Returns the snapshot id. */
  def append(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val f = root.getFileSystem(conf)
    f.mkdirs(new Path(root, "metadata")); f.mkdirs(new Path(root, "data"))

    // previous state (fixture-local convention: version-hint + vN file)
    val hintP = new Path(root, "metadata/version-hint.text")
    val prevVersion: Int =
      if (!f.exists(hintP)) 0
      else {
        val in = f.open(hintP)
        try scala.io.Source.fromInputStream(in).mkString.trim.toInt finally in.close()
      }
    val prevMeta =
      if (prevVersion == 0) None
      else {
        val in = f.open(new Path(root, s"metadata/v$prevVersion.metadata.json"))
        try Some(M.readTree(in)) finally in.close()
      }

    // stage the data files, then move under data/ with unique names
    val staging = new Path(root, s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.parquet(staging.toString)
    val dataFiles = f.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dst = new Path(root, s"data/${java.util.UUID.randomUUID()}.parquet")
        require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
        (dst, f.getFileStatus(dst).getLen)
      }.toSeq
    f.delete(staging, true)

    val snapshotId = prevVersion + 1L
    val seqNo = prevVersion + 1L

    // one data manifest for this snapshot's files
    val entries = dataFiles.map { case (p, size) =>
      val rows = spark.read.parquet(p.toString).count()
      val dfRec = new GenericData.Record(EntrySchema.getField("data_file").schema())
      dfRec.put("content", 0)
      dfRec.put("file_path", p.toString)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("record_count", rows)
      dfRec.put("file_size_in_bytes", size)
      val e = new GenericData.Record(EntrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      e.put("data_file", dfRec)
      e
    }
    val manifestP = new Path(root, s"metadata/manifest-$snapshotId.avro")
    writeAvro(new java.io.File(manifestP.toUri.getPath), EntrySchema, entries)

    // manifest list = every prior snapshot's manifest + the new one
    import scala.jdk.CollectionConverters._
    val priorManifests: Seq[(String, Int)] = prevMeta.toSeq.flatMap { m =>
      (1L to prevVersion.toLong).map(v =>
        (new Path(root, s"metadata/manifest-$v.avro").toString, 0))
    }
    val listRecords = (priorManifests :+ (manifestP.toString, 0)).map {
      case (mp, content) =>
        val r = new GenericData.Record(ManifestFileSchema)
        r.put("manifest_path", mp)
        r.put("manifest_length",
          f.getFileStatus(new Path(mp)).getLen)
        r.put("partition_spec_id", 0)
        r.put("content", content)
        r.put("added_snapshot_id", snapshotId)
        r
    }
    val listP = new Path(root, s"metadata/snap-$snapshotId.avro")
    writeAvro(new java.io.File(listP.toUri.getPath), ManifestFileSchema, listRecords)

    // vN metadata json
    val n = M.createObjectNode()
    n.put("format-version", 2)
    n.put("table-uuid", java.util.UUID.nameUUIDFromBytes(dir.getBytes).toString)
    n.put("location", dir)
    n.put("last-sequence-number", seqNo)
    val schemas = n.putArray("schemas")
    val sc = schemas.addObject()
    sc.put("schema-id", 0); sc.put("type", "struct")
    val fields = sc.putArray("fields")
    df.schema.fields.zipWithIndex.foreach { case (fd, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1); fn.put("name", fd.name)
      fn.put("required", !fd.nullable)
      fn.put("type", icebergType(fd.dataType))
    }
    n.put("current-schema-id", 0)
    val specs = n.putArray("partition-specs")
    val sp = specs.addObject(); sp.put("spec-id", 0); sp.putArray("fields")
    n.put("default-spec-id", 0)
    n.put("current-snapshot-id", snapshotId)
    val snaps = n.putArray("snapshots")
    prevMeta.foreach(_.path("snapshots").elements().asScala.foreach(snaps.add))
    val s0 = snaps.addObject()
    s0.put("snapshot-id", snapshotId)
    s0.put("sequence-number", seqNo)
    s0.put("timestamp-ms", 1700000000000L + snapshotId)
    s0.put("manifest-list", listP.toString)
    s0.putObject("summary").put("operation", "append")
    val out = f.create(new Path(root, s"metadata/v${prevVersion + 1}.metadata.json"), true)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    val hint = f.create(hintP, true)
    try hint.write(String.valueOf(prevVersion + 1).getBytes) finally hint.close()
    snapshotId
  }

  /** Corrupt-on-purpose variant: rewrite the CURRENT snapshot's
    * manifest list with an extra DELETE manifest record (content=1) so
    * refusal paths can be exercised. */
  def addDeleteManifest(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir); val f = root.getFileSystem(conf)
    val in = f.open(new Path(root, "metadata/version-hint.text"))
    val v = try scala.io.Source.fromInputStream(in).mkString.trim.toInt finally in.close()
    val metaIn = f.open(new Path(root, s"metadata/v$v.metadata.json"))
    val meta = try M.readTree(metaIn) finally metaIn.close()
    import scala.jdk.CollectionConverters._
    val cur = meta.path("current-snapshot-id").asLong
    val listPath = meta.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong == cur).get
      .path("manifest-list").asText
    // a well-formed but EMPTY delete manifest
    val delManifest = new Path(root, s"metadata/delete-manifest-$cur.avro")
    writeAvro(new java.io.File(delManifest.toUri.getPath), EntrySchema, Nil)
    val existing = {
      val fin = new org.apache.avro.mapred.FsInput(new Path(listPath), conf)
      val r = new DataFileReader[GenericRecord](fin,
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try { val b = Seq.newBuilder[GenericRecord]; while (r.hasNext) b += r.next(); b.result() }
      finally r.close()
    }
    val del = new GenericData.Record(ManifestFileSchema)
    del.put("manifest_path", delManifest.toString)
    del.put("manifest_length", f.getFileStatus(delManifest).getLen)
    del.put("partition_spec_id", 0)
    del.put("content", 1) // DELETES
    del.put("added_snapshot_id", cur)
    val rebuilt = existing.map { e =>
      val r = new GenericData.Record(ManifestFileSchema)
      ManifestFileSchema.getFields.asScala.foreach(fd => r.put(fd.name, e.get(fd.name)))
      r
    } :+ del
    writeAvro(new java.io.File(new Path(listPath).toUri.getPath),
      ManifestFileSchema, rebuilt)
  }
}
