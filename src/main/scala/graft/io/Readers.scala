package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source scans (SURVEY.md §2.1).
  *
  * All readers return lazy plans; Catalyst pushes filters/column pruning into
  * the file scans (check with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`). Nothing here collects to the driver except `headerOf`,
  * which mirrors the reference's `df.first()` header probe
  * (reference: Source_Raw_Dynamic.py:93-99).
  */
object Readers {

  /** S3 — raw text scan, one string per line (for pre-parse CSV repair;
    * reference: Source_Raw_Dynamic.py:92). */
  def text(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** S4 — header extraction: first line of the text scan. Driver action by
    * design (arity/names must be known before the distributed parse). */
  def headerOf(lines: Dataset[String]): Option[Array[String]] =
    lines.head(1).headOption.map(graft.ops.CsvRepair.parseLine(_).getOrElse(Array.empty))

  /** S5 — CSV scan with header, all columns string (no inferSchema — matches
    * reference: Raw_To_Staging.py:166 so the declared-schema cast is the only
    * typing step). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** CSV with an explicit schema (used by tests and the typed ingest path). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S6 — parquet scan. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Test-data table by name: `<sfDir>/<table>.parquet`. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    parquet(spark, s"$sfDir/$name.parquet")

  /** Delta-format table at `version` (default latest) — any table with
    * an open `_delta_log`, whoever authored it (graft's writer, or a
    * foreign engine whose log carries commitInfo/txn noise, scattered
    * non-Hive file layouts, checkpoint files; see
    * [[DeltaInterop.readDelta]]). This is the graft-side entry for
    * consuming tables other engines publish. */
  def delta(spark: SparkSession, dir: String,
            version: Option[Long] = None): DataFrame =
    DeltaInterop.readDelta(spark, dir, version)

  /** Parquet timestamp columns in whatever physical encoding the
    * producer chose:
    *   - TIMESTAMP(NANOS) — Spark's vectorized reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]); we read nanos as raw longs (legacy
    *     conf) and convert with exact integer division (`div`, not `/`
    *     — ns epoch values exceed a double's 2^53 mantissa, so float
    *     division would corrupt them);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) — decodes as
    *     TIMESTAMP_NTZ; cast to TIMESTAMP (the session time zone is
    *     UTC, so the instant is unchanged and matches the oracle's
    *     naive read);
    *   - TIMESTAMP(MICROS, utc) — already the session type; no-op. */
  def parquetNanos(spark: SparkSession, path: String, nanosCols: Seq[String]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    nanosCols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"`$c` div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, org.apache.spark.sql.functions.col(c)
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => d
      }
    }
  }

  /** S8 — empty relation with an explicit schema (SCD2 first-run seed;
    * reference: Patient_datamart.py:92-98). */
  def emptyWithSchema(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Permissive JSON-lines scan with corrupt-record capture — the JSON
    * mirror of the CSV repair stage: bad lines don't kill the job OR
    * silently vanish; they land in `_corrupt` for quarantine/metrics while
    * well-formed rows parse against the declared schema. (The declared
    * schema also means NO inference pass — one scan, not two.) */
  def jsonPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Parquet scan across files with EVOLVED schemas: union-of-columns via
    * mergeSchema — files written before a column existed read as nulls.
    * The ingestion-compatibility knob for long-lived layered tables. */
  def parquetMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
