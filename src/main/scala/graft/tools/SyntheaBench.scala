package graft.tools

import graft.model.SchemaJson
import graft.pipeline.FixedClock
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** The reference's OWN workload as a tracked bench row: an 18-table
  * Synthea-shaped CSV export (fixture ×N — deterministic rows derived
  * from the packaged schema dictionary) pushed through all four
  * pipeline stages (landing→source move, CSV repair, schema-driven
  * clean to parquet + catalog, SCD2 patient star schema). Generation
  * is excluded from the timed section; the number is the end-to-end
  * pipeline wall-clock, the figure a reference user would compare
  * against their Glue job runtimes. */
object SyntheaBench {

  /** Child-table multipliers over the patient count — roughly the row
    * ratios of a real Synthea export's mart-source tables. */
  private val Sizing: Map[String, Int => Int] = Map(
    "patients" -> (n => n),
    "encounters" -> (n => 5 * n),
    "conditions" -> (n => 3 * n),
    "medications" -> (n => 3 * n),
    "observations" -> (n => 10 * n),
    "allergies" -> (n => n),
    "payer_transitions" -> (n => 2 * n),
    "payers" -> (n => math.max(10, n / 100))
  )

  /** Deterministic value for (table, column, row) — keys reference each
    * other so the star joins have real selectivity; everything else is
    * typed filler the cleaner casts per the packaged schema. */
  private def value(table: String, col: String, dt: String, i: Int, nPatients: Int): String =
    (table, col) match {
      case ("patients", "id") => s"p$i"
      case ("payers", "id") => s"pay$i"
      case ("encounters", "id") => s"e$i"
      case (_, "patient") => s"p${i % nPatients}"
      case (_, "payer") => s"pay${i % math.max(10, nPatients / 100)}"
      case (_, "encounter") => s"e${i % (5 * nPatients)}"
      case ("observations", "description") =>
        // every third row carries the or-split multi-value shape the
        // reference's staging contract depends on
        if (i % 3 == 0) "Systolic BP or Diastolic BP" else s"obs desc ${i % 40}"
      case ("observations", "value") =>
        if (i % 3 == 0) s"${100 + i % 60} or ${60 + i % 40}" else s"${i % 200}"
      case (_, "first") => s"Fn${i % 500}"
      case (_, "last") => s"Ln${i % 800}"
      case (_, "middle") => if (i % 4 == 0) "" else s"M${i % 10}"
      case (_, "address") => s"${i % 1000} Main St"
      case (_, "city") => s"City${i % 50}"
      case (_, "state") => s"S${i % 20}"
      case (_, "zip") => f"${i % 100000}%05d"
      case (_, "gender") => if (i % 2 == 0) "F" else "M"
      case (_, "ownership") => if (i % 3 == 0) "Government" else "Private"
      case _ => dt match {
        case "date" => f"20${10 + i % 15}%d-${1 + i % 12}%02d-${1 + i % 28}%02d"
        case "timestamp" => f"20${10 + i % 15}%d-${1 + i % 12}%02d-${1 + i % 28}%02dT${i % 24}%02d:${i % 60}%02d:00Z"
        case "int" | "long" => (i % 9973).toString
        case "double" => s"${i % 997}.${i % 100}"
        case _ => s"v${i % 1000}" // strings: bounded cardinality
      }
    }

  /** Write the 18-table landing dir; header casing is the raw Synthea
    * export's (UPPERCASE), exercising the snake_case rename. */
  def writeFixture(landing: String, nPatients: Int): Unit = {
    Files.createDirectories(Paths.get(landing))
    graft.SyntheaEtl.ExpectedTables.toSeq.sorted.foreach { table =>
      val schema = SchemaJson.loadResource(table).getOrElse(
        throw new IllegalStateException(s"no packaged schema for $table"))
      val n = Sizing.get(table).map(_(nPatients)).getOrElse(nPatients / 10)
      val sb = new StringBuilder(n * 64)
      sb.append(schema.fields.map(f =>
        if (f.name == "id") "Id" else f.name.toUpperCase).mkString(",")).append('\n')
      var i = 0
      while (i < n) {
        sb.append(schema.fields.map(f =>
          value(table, f.name, f.dataType.typeName match {
            case "integer" => "int"
            case other => other
          }, i, nPatients)).mkString(",")).append('\n')
        i += 1
      }
      Files.writeString(Paths.get(s"$landing/$table.csv"), sb.toString)
    }
  }

  /** Generate (untimed) + run the 4-stage pipeline (timed). Returns the
    * pipeline seconds. */
  def run(spark: SparkSession, nPatients: Int = 2000): Double = {
    val root = Files.createTempDirectory("graft-synthea-bench").toString
    writeFixture(s"$root/datasource", nPatients)
    val t0 = System.nanoTime()
    val ran = graft.SyntheaEtl.run(spark, s"$root/datasource", root,
      "2026-01-01", FixedClock("2026-01-01 00:00:00"), requireAll = true)
    val sec = (System.nanoTime() - t0) / 1e9
    require(ran.toSet == Set("ingest", "repair", "clean", "mart"),
      s"pipeline skipped stages: ran ${ran.mkString(",")}")
    sec
  }
}
