package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

/** Spec-level building blocks of the Apache Iceberg v2 FILE FORMAT
  * (iceberg.apache.org/spec/ — the Avro manifest / manifest-list
  * record shapes, the binary single-value bound serialization, and
  * the Iceberg type names), shared by the two writers in this repo:
  * [[graft.tools.IcebergFixture]] (test fixtures laid out by the
  * published spec) and [[IcebergUniform]] (the product-side Iceberg
  * metadata a uniform-enabled Delta table maintains on every commit).
  * Nothing here is graft-specific — it is a direct rendering of the
  * spec's published schemas. */
private[graft] object IcebergFormat {

  val EntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
      |  {"name":"lower_bounds","type":["null",{"type":"array","items":
      |    {"type":"record","name":"k_v","fields":[
      |      {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
      |  {"name":"upper_bounds","type":["null",{"type":"array","items":"k_v"}],"default":null}
      |]}}]}""".stripMargin)

  val ManifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"added_snapshot_id","type":"long"},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |  {"type":"record","name":"field_summary","fields":[
      |    {"name":"contains_null","type":"boolean"},
      |    {"name":"lower_bound","type":["null","bytes"],"default":null},
      |    {"name":"upper_bound","type":["null","bytes"],"default":null}]}}],
      | "default":null}]}""".stripMargin)

  /** Write one Avro container file through the Hadoop FileSystem (so
    * the same code serves local tests and object-store tables). */
  def writeAvro(f: FileSystem, path: Path, schema: Schema,
                records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    val out = f.create(path, true)
    w.create(schema, out) // DataFileWriter.close() closes the stream
    try records.foreach(w.append) finally w.close()
  }

  /** Spark type → Iceberg primitive type name. Unsupported types
    * refuse by name rather than misdeclare. */
  def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampNTZType => "timestamp"  // no zone in the spec's "timestamp"
    case TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"type $other has no Iceberg mapping")
  }

  /** The spec's binary single-value serialization (little-endian) for
    * the bound-able primitive types. Strings bound only when short
    * (spec truncation must round the UPPER bound up — only exact
    * short values get bounds here). */
  def serializeBound(dt: DataType, v: Any): Option[Array[Byte]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    (dt, v) match {
      case (_, null) => None
      case (IntegerType, x: Int) => Some(le(4).putInt(x).array())
      case (LongType, x: Long) => Some(le(8).putLong(x).array())
      case (FloatType, x: Float) => Some(le(4).putFloat(x).array())
      case (DoubleType, x: Double) => Some(le(8).putDouble(x).array())
      case (DateType, x: java.sql.Date) =>
        Some(le(4).putInt(x.toLocalDate.toEpochDay.toInt).array())
      case (TimestampType, x: java.sql.Timestamp) =>
        val i = x.toInstant
        Some(le(8).putLong(i.getEpochSecond * 1000000L + i.getNano / 1000L).array())
      case (TimestampType, x: java.time.Instant) =>
        Some(le(8).putLong(x.getEpochSecond * 1000000L + x.getNano / 1000L).array())
      case (TimestampNTZType, x: java.time.LocalDateTime) =>
        val i = x.toInstant(java.time.ZoneOffset.UTC)
        Some(le(8).putLong(i.getEpochSecond * 1000000L + i.getNano / 1000L).array())
      case (StringType, x: String) =>
        val b = x.getBytes("UTF-8")
        if (b.length <= 32) Some(b) else None
      case _ => None // binaries/nested: skipped (no bound, no pruning)
    }
  }

  /** Build one manifest_entry record for a file descriptor. `bounds`
    * are per-field-id (lower, upper) single-value serializations. */
  def entry(content: Int, path: String, rows: Long, size: Long,
            snapshotId: Long, sequenceNumber: Long,
            equalityIds: Seq[Int] = Nil,
            bounds: Map[Int, (Array[Byte], Array[Byte])] = Map.empty): GenericRecord = {
    val dfSchema = EntrySchema.getField("data_file").schema()
    val dfRec = new GenericData.Record(dfSchema)
    dfRec.put("content", content)
    dfRec.put("file_path", path)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("record_count", rows)
    dfRec.put("file_size_in_bytes", size)
    if (equalityIds.nonEmpty) {
      val arr = new GenericData.Array[Integer](equalityIds.length,
        dfSchema.getField("equality_ids").schema().getTypes.get(1))
      equalityIds.foreach(i => arr.add(Integer.valueOf(i)))
      dfRec.put("equality_ids", arr)
    }
    if (bounds.nonEmpty) {
      def kvArray(fieldName: String, pick: ((Array[Byte], Array[Byte])) => Array[Byte]) = {
        val arrT = dfSchema.getField(fieldName).schema().getTypes.get(1)
        val kvT = arrT.getElementType
        val arr = new GenericData.Array[GenericRecord](bounds.size, arrT)
        bounds.toSeq.sortBy(_._1).foreach { case (id, b) =>
          val kv = new GenericData.Record(kvT)
          kv.put("key", id)
          kv.put("value", java.nio.ByteBuffer.wrap(pick(b)))
          arr.add(kv)
        }
        arr
      }
      dfRec.put("lower_bounds", kvArray("lower_bounds", _._1))
      dfRec.put("upper_bounds", kvArray("upper_bounds", _._2))
    }
    val e = new GenericData.Record(EntrySchema)
    e.put("status", 1) // ADDED
    e.put("snapshot_id", snapshotId)
    e.put("sequence_number", sequenceNumber)
    e.put("data_file", dfRec)
    e
  }
}
