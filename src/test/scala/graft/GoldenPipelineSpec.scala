package graft

import graft.io.{Mover, Readers, Writers}
import graft.model.SchemaJson
import graft.ops.{Cleaner, CsvRepair, Scd2, StarSchema}
import graft.pipeline.{FixedClock, Pipeline, Stage}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** End-to-end 4-stage pipeline on Synthea-shaped fixtures embodying the
  * reference's documented data problems (FIXTURES.md / SURVEY §5.3):
  * landing move → text-scan CSV repair → schema-driven clean → SCD2 dim +
  * fact, all through the Pipeline sequencer with a frozen clock.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("landing → source → raw → staging → mart, quirks intact") {
    val root = Files.createTempDirectory("graft-golden").toString
    val landing = s"$root/datasource"
    Files.createDirectories(Paths.get(landing))

    // Fixture with the documented problems: unnamed header column, extra
    // commas, short rows, " or " multi-values, phone dashes, unparseable
    // dates, whitespace, duplicate rows.
    Files.writeString(Paths.get(s"$landing/patients.csv"),
      """Id,BIRTHDATE,First Name,,PHONE NUMBER,City
        |p1, 1990-01-02 ,Alice,junk,555-123-4567,Boston
        |p2,not-a-date,Bob,junk,555-999-0000,Salem or Lynn,EXTRA
        |p3,1985-05-06,Carol
        |p1, 1990-01-02 ,Alice,junk,555-123-4567,Boston
        |""".stripMargin)
    Files.writeString(Paths.get(s"$landing/encounters.csv"),
      """Id,Patient,Cost
        |e1,p1,100.5
        |e2,p1,49.5
        |e3,p2,20
        |""".stripMargin)

    val schema = SchemaJson.parse(
      """[{"name":"id","type":"string"},{"name":"birthdate","type":"date"},
        |{"name":"first_name","type":"string"},{"name":"phone_number","type":"string"},
        |{"name":"city","type":"string"}]""".stripMargin)
    val encSchema = SchemaJson.parse(
      """[{"name":"id","type":"string"},{"name":"patient","type":"string"},
        |{"name":"cost","type":"double"}]""".stripMargin)
    val date = "2024-01-01"
    val clock = FixedClock("2024-01-01 00:00:00")

    val pipeline = Pipeline(Seq(
      Stage("ingest", _ => new Mover().ingestAll(landing, root, date)),
      Stage("repair", s => {
        for (t <- Seq("patients", "encounters")) {
          val lines = Readers.text(s, s"$root/source/$date/$t/$t.csv")
          Writers.csvSingleFile(CsvRepair.repair(s, lines).get, s"$root/raw/$date/$t")
        }
      }, precondition = s => new Mover().isComplete(root, date, Set("patients", "encounters"))),
      Stage("clean", s => {
        Writers.parquet(Cleaner.clean(Readers.csv(s, s"$root/raw/$date/patients"), schema),
          s"$root/staging/$date/patients")
        Writers.parquet(Cleaner.clean(Readers.csv(s, s"$root/raw/$date/encounters"), encSchema),
          s"$root/staging/$date/encounters")
      }),
      Stage("mart", s => {
        val staged = Readers.parquet(s, s"$root/staging/$date/patients")
        val dim = StarSchema.buildDim(staged, None,
          StarSchema.DimSpec("dim_patient",
            Seq("id" -> "patient_id", "first_name" -> "first_name", "city" -> "city"),
            Scd2.Scd2Spec(Seq("patient_id"), Seq("first_name", "city"), "patient_sk", "dim_patient")),
          clock)
        Writers.parquet(dim, s"$root/mart/$date/dim_patient")
        val enc = Readers.parquet(s, s"$root/staging/$date/encounters")
        val fact = StarSchema.buildFact(
          staged.select(col("id").as("patient_id")),
          lookups = Seq(),
          measures = Seq((StarSchema.countMeasure(enc, "patient", "total_encounters")
            .withColumnRenamed("patient", "patient_id"), Seq("patient_id"))),
          clock = clock)
        Writers.parquet(fact, s"$root/mart/$date/fact_patient")
      })
    ))
    assert(pipeline.run(spark) == Seq("ingest", "repair", "clean", "mart"))

    // staging assertions: quirks preserved
    val staged = Readers.parquet(spark, s"$root/staging/$date/patients")
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(staged.size == 3) // dup p1 removed (D1)
    val p1 = staged("p1")
    assert(p1.getAs[java.sql.Date]("birthdate").toString == "1990-01-02") // trimmed + cast
    assert(p1.getAs[String]("phone_number") == "5551234567")              // P4
    val p2 = staged("p2")
    assert(p2.isNullAt(p2.fieldIndex("birthdate")))                       // lenient cast (P7)
    assert(p2.getAs[String]("city_part1") == "Salem")                     // P5 split
    assert(p2.getAs[String]("city_part2") == "Lynn")
    val p3 = staged("p3")
    assert(p3.getAs[String]("phone_number") == "None")                    // T2 null fill
    // unnamed column dropped (P1): no junk column survived
    assert(!staged("p1").schema.fieldNames.exists(_.contains("junk")))

    // mart assertions
    val dim = Readers.parquet(spark, s"$root/mart/$date/dim_patient")
    assert(dim.filter(col("is_active") === true).count() == 3)
    val fact = Readers.parquet(spark, s"$root/mart/$date/fact_patient")
      .collect().map(r => r.getAs[String]("patient_id") -> r.getAs[Long]("total_encounters")).toMap
    assert(fact("p1") == 2L && fact("p2") == 1L && fact("p3") == 0L) // 0-fill
  }
}
