package graft

import graft.io.Readers
import graft.model.SchemaJson
import graft.pipeline.FixedClock
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The packaged 18-table Synthea schema dictionary (resources
  * `graft/schemas/`, types per the reference's
  * Documentation/Tables_Description.xlsx) driven through all four pipeline
  * stages: every table lands in staging TYPED — date/int/long/double columns
  * cast, declared timestamps formatted to the reference's T1 string — with
  * the 18-file completeness barrier enforced and the mart built on top.
  */
class SyntheaSchemasSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  /** Deterministic CSV cell for a declared type; row index varies values so
    * the full-row dedup keeps both rows. */
  private def cell(dt: DataType, col: String, i: Int): String = dt match {
    case DateType      => s"2020-01-0${i + 1}"
    case TimestampType => s"2020-01-0${i + 1}T03:04:0${i}Z" // millis-free ISO input
    case IntegerType   => s"${i + 7}"
    case LongType      => s"${4000000000L + i}"             // > Int.MaxValue: long-only
    case DoubleType    => s"${i}.5"
    case _             => s"${col}_v$i"
  }

  /** Synthea exports use ALL-CAPS headers; the cleaner snake-cases them back
    * to the schema names (T3). */
  private def writeFixture(landing: String, table: String, schema: StructType): Unit = {
    val header = schema.fields.map(_.name.toUpperCase).mkString(",")
    val rows = (0 until 2).map { i =>
      schema.fields.map(f => cell(f.dataType, f.name, i)).mkString(",")
    }
    Files.writeString(Paths.get(s"$landing/$table.csv"),
      (header +: rows).mkString("", "\n", "\n"))
  }

  test("all 18 packaged schemas resolve without the all-string fallback") {
    val root = Files.createTempDirectory("graft-schemas").toString // no schemas/ dir
    SyntheaEtl.ExpectedTables.foreach { t =>
      val schema = SyntheaEtl.schemaFor(root, t)
      assert(schema.fields.nonEmpty, s"$t fell back to all-string")
      assert(schema == SchemaJson.loadResource(t).get)
      // reference type vocabulary only (Raw_To_Staging.py:81-94)
      assert(schema.fields.forall(f => Set[DataType](StringType, IntegerType,
        DateType, LongType, DoubleType, TimestampType).contains(f.dataType)))
    }
    // a user schemas/ file still wins over the packaged resource
    Files.createDirectories(Paths.get(s"$root/schemas"))
    Files.writeString(Paths.get(s"$root/schemas/patients.json"),
      """[{"name":"id","type":"string"},{"name":"zip","type":"string"}]""")
    assert(SyntheaEtl.schemaFor(root, "patients").fields.map(_.name).toSeq ==
      Seq("id", "zip"))
  }

  test("4-stage pipeline over all 18 typed tables: staging lands typed") {
    val root = Files.createTempDirectory("graft-18").toString
    val landing = s"$root/datasource"
    Files.createDirectories(Paths.get(landing))
    val declared = SyntheaEtl.ExpectedTables.toSeq.sorted
      .map(t => t -> SchemaJson.loadResource(t).get).toMap
    declared.foreach { case (t, s) => writeFixture(landing, t, s) }

    val date = "2024-01-01"
    val ran = SyntheaEtl.run(spark, landing, root, date,
      FixedClock("2024-01-01 00:00:00"), requireAll = true)
    assert(ran == Seq("ingest", "repair", "clean", "mart"))

    declared.foreach { case (t, schema) =>
      val staged = Readers.parquet(spark, s"$root/staging/$date/$t")
      val byName = staged.schema.fields.map(f => f.name -> f.dataType).toMap
      schema.fields.foreach { f =>
        val expected = f.dataType match {
          case TimestampType => StringType // T1: formatted, not cast
          case dt            => dt
        }
        assert(byName.get(f.name).contains(expected),
          s"$t.${f.name}: expected $expected, got ${byName.get(f.name)}")
      }
      // every cast succeeded: no nulls anywhere in the 2 fixture rows
      val rows = staged.select(schema.fields.map(f =>
        org.apache.spark.sql.functions.col(f.name)).toIndexedSeq: _*).collect()
      assert(rows.length == 2, s"$t: expected 2 staged rows")
      rows.foreach(r => schema.fields.indices.foreach(i =>
        assert(!r.isNullAt(i), s"$t.${schema.fields(i).name} cast to null")))
    }

    // T1 spot check: declared-timestamp survives as the reference's string form
    val enc = Readers.parquet(spark, s"$root/staging/$date/encounters")
      .select("start").collect().map(_.getString(0)).sorted
    assert(enc.head == "2020-01-01T3:04:00") // single-H hour, no millis

    // the mart built on top of the full typed staging layer
    val fact = Readers.parquet(spark, s"$root/mart/fact_patient")
    assert(fact.count() == 2)
    assert(Readers.parquet(spark, s"$root/mart/dim_patient").count() == 2)
  }
}
