package graft.tools

import graft.io.Writers
import org.apache.spark.sql.functions._

/** Cross-JVM persistent-catalog smoke, one phase per process (the catalog
  * implementation is pinned per SparkContext, so proving persistence takes
  * two real JVM lifetimes — exactly the property under test: the metastore
  * outlives the session, like the reference's Glue Data Catalog).
  *
  * `CatalogSmoke write <warehouse>`: persistent session, saveAsTable
  * `fact_patient`, exit.
  * `CatalogSmoke read <warehouse>`: NEW session on the same warehouse,
  * `spark.table("fact_patient")` — prints `rows=<n> payers=<n>` for the
  * caller to assert on.
  */
object CatalogSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CatalogSmoke write|read <warehouse>")
    val Array(mode, warehouse) = args
    // keep derby.log out of the repo cwd
    System.setProperty("derby.stream.error.file", s"$warehouse/derby.log")
    val spark = graft.GraftSession.persistent(s"catalog-smoke-$mode", warehouse)
    try mode match {
      case "write" =>
        import spark.implicits._
        val fact = Seq(
          ("p1", 3L, "pay1"), ("p2", 1L, "pay1"), ("p3", 0L, "pay2")
        ).toDF("patient_id", "total_encounters", "payer_id")
        Writers.parquetTable(fact, s"$warehouse/data/fact_patient", "fact_patient")
        println(s"wrote=${spark.table("fact_patient").count()}")
      case "read" =>
        val t = spark.table("fact_patient") // by NAME: no path anywhere
        val payers = t.select(countDistinct(col("payer_id"))).head().getLong(0)
        println(s"rows=${t.count()} payers=$payers")
      case other => sys.error(s"unknown mode $other")
    } finally spark.stop()
  }
}
