package graft.model

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** External declared-schema loader.
  *
  * The reference drives its staging cast from one JSON file per table shaped
  * as `[{"name": ..., "type": ...}, ...]` with type names
  * `string|int|date|long|double|timestamp` and *everything nullable*; unknown
  * type names silently fall back to string
  * (reference: Glue_Scripts/Raw_To_Staging.py:72-98).
  *
  * We reproduce those semantics exactly, plus accept Spark's own
  * `StructType.json` format for schemas we persist ourselves.
  */
object SchemaJson {

  /** Map a reference type name to a Spark type; unknown → StringType. */
  def typeFor(name: String): DataType = name.trim.toLowerCase match {
    case "string"    => StringType
    case "int"       => IntegerType
    case "integer"   => IntegerType
    case "long"      => LongType
    case "bigint"    => LongType
    case "double"    => DoubleType
    case "date"      => DateType
    case "timestamp" => TimestampType
    case "boolean"   => BooleanType
    case "float"     => FloatType
    case "binary"    => BinaryType
    case _           => StringType // reference fallback (Raw_To_Staging.py:93-94)
  }

  /** Parse the `[{"name","type"}]` format into a StructType (all nullable). */
  def parse(json: String): StructType = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    require(root.isArray, s"schema json must be an array, got: ${root.getNodeType}")
    val fields = root.elements().asScala.map { node =>
      val name = node.get("name").asText()
      val tpe = Option(node.get("type")).map(_.asText()).getOrElse("string")
      StructField(name, typeFor(tpe), nullable = true)
    }.toArray
    StructType(fields)
  }

  /** Load from a file path (local or any Hadoop-visible FS via java.nio). */
  def load(path: String): StructType =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Load a schema packaged on the classpath under `graft/schemas/`.
    *
    * The reference keeps its per-table declarations in an S3 `schemas/`
    * folder the operator must populate by hand (Raw_To_Staging.py:72-76,
    * with types from `Documentation/Tables_Description.xlsx`); we ship the
    * full 18-table Synthea dictionary as jar resources so a fresh install
    * gets typed staging tables with zero setup. Returns None for unknown
    * tables (callers decide the fallback).
    */
  def loadResource(table: String): Option[StructType] = {
    val in = getClass.getResourceAsStream(s"/graft/schemas/$table.json")
    Option(in).map { stream =>
      try parse(new String(stream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally stream.close()
    }
  }

  /** Render a StructType back to the reference's JSON format. */
  def render(schema: StructType): String = {
    def nameOf(dt: DataType): String = dt match {
      case StringType    => "string"
      case IntegerType   => "int"
      case LongType      => "long"
      case DoubleType    => "double"
      case DateType      => "date"
      case TimestampType => "timestamp"
      case BooleanType   => "boolean"
      case FloatType     => "float"
      case BinaryType    => "binary"
      case other         => other.simpleString
    }
    schema.fields
      .map(f => s"""{"name": "${f.name}", "type": "${nameOf(f.dataType)}"}""")
      .mkString("[", ", ", "]")
  }
}
