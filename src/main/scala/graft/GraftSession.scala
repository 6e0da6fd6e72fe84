package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the test harness (single JVM, `local[N]`) but every setting is
  * chosen to also be the right default on a large cluster:
  *   - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  *     dynamic broadcast decisions — essential at 100 TB where static
  *     `spark.sql.shuffle.partitions` can never be right for every stage.
  *   - UTC session time zone: deterministic timestamp semantics for the
  *     DuckDB-oracle comparisons and for cross-region cluster runs.
  *   - shuffle partitions sized to the local core count rather than the
  *     200 default (on a real cluster AQE coalescing makes the initial
  *     number mostly irrelevant as long as it is not too small).
  */
object GraftSession {

  def builder(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions) // graft SQL functions (dot_product, simhash, ...)
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
