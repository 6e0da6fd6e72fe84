package graft

import java.nio.file.Files
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values (the `allowColumnDefaults` writer feature,
  * Spark/delta's CURRENT_DEFAULT field-metadata encoding): inserts
  * that omit a default-bearing column get the evaluated expression at
  * the staging choke point — provided values always win, and defaults
  * never rewrite history (delta-spark's contract: no ADD COLUMN
  * backfill). */
class DeltaColumnDefaultSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("CREATE with DEFAULTs fills omitted insert columns; explicit values win") {
    val dir = Files.createTempDirectory("graft-defaults").toString
    spark.sql(s"CREATE TABLE delta.`$dir` (id BIGINT, tag STRING DEFAULT 'unk', " +
      "score BIGINT DEFAULT 5 + 2) USING delta")
    val st0 = DeltaInterop.state(spark, dir)
    assert(st0.protocol.impliedWriterFeatures.contains("allowColumnDefaults"))
    spark.sql(s"INSERT INTO delta.`$dir` (id) VALUES (1), (2)")
    spark.sql(s"INSERT INTO delta.`$dir` (id, tag, score) VALUES (3, 'real', 100)")
    val rows = DeltaInterop.readDelta(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "unk", 7L), (2L, "unk", 7L), (3L, "real", 100L)))
  }

  test("ALTER COLUMN SET/DROP DEFAULT changes only FUTURE inserts; validation is loud") {
    val dir = Files.createTempDirectory("graft-defaults2").toString
    DeltaInterop.writeDelta(Seq((1L, "a")).toDF("id", "tag"), dir, Nil)
    spark.sql(s"ALTER TABLE delta.`$dir` ALTER COLUMN tag SET DEFAULT 'filled'")
    val st = DeltaInterop.state(spark, dir)
    assert(st.protocol.impliedWriterFeatures.contains("allowColumnDefaults"))
    spark.sql(s"INSERT INTO delta.`$dir` (id) VALUES (2)")
    // history untouched: row 1 keeps its value; row 2 got the default
    assert(DeltaInterop.readDelta(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "filled")))
    spark.sql(s"ALTER TABLE delta.`$dir` ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"INSERT INTO delta.`$dir` (id) VALUES (3)")
    assert(DeltaInterop.readDelta(spark, dir).filter(col("id") === 3L)
      .head().isNullAt(1))
    // a default that does not evaluate standalone refuses
    val e = intercept[IllegalArgumentException](
      DeltaInterop.setColumnDefault(spark, dir, "tag", "other_col + 1"))
    assert(e.getMessage.contains("does not evaluate standalone"))
    // identity columns refuse a default
    val dir2 = Files.createTempDirectory("graft-defaults3").toString
    spark.sql(s"CREATE TABLE delta.`$dir2` (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "tag STRING) USING delta")
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.setColumnDefault(spark, dir2, "id", "1"))
    assert(e2.getMessage.contains("IDENTITY"))
  }
}
