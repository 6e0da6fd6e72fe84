package graft

import java.nio.file.Files
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NAMED-catalog Iceberg tables — the reference's Athena contract
  * (SQL over names, not paths) on the Iceberg plane, matching what
  * the Delta plane has had since q170: CTAS registers a name, every
  * statement (DML, maintenance, DESCRIBE, ALTER) resolves the name to
  * the same path-addressed handlers, and name-addressed ALTERs
  * re-register so the stored view schema tracks the table. */
class IcebergNameSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("CTAS by name + full DML/maintenance lifecycle entirely by name") {
    val dir = Files.createTempDirectory("graft-ice-name").toString
    (0L until 40L).map(i => (i, s"r_$i", i * 2L)).toDF("id", "tag", "score")
      .createOrReplaceTempView("ice_name_src")
    spark.sql("CREATE TABLE ice_named USING iceberg " +
      s"LOCATION '$dir' AS SELECT * FROM ice_name_src")
    try {
      // reads by NAME resolve through the catalog view
      assert(spark.sql("SELECT count(*) FROM ice_named").head().getLong(0) == 40)
      // INSERT / DELETE / UPDATE / MERGE by name
      spark.sql("INSERT INTO ice_named SELECT id + 100, tag, score " +
        "FROM ice_name_src WHERE id < 5")
      assert(spark.table("ice_named").count() == 45)
      val del = spark.sql("DELETE FROM ice_named WHERE id < 3").head().getLong(0)
      assert(del == 3)
      val upd = spark.sql("UPDATE ice_named SET score = score + 1000 " +
        "WHERE id BETWEEN 10 AND 14").head().getLong(0)
      assert(upd == 5)
      val mrg = spark.sql(
        """MERGE INTO ice_named AS t USING (
          |  SELECT id * 2 AS id, 'merged' AS tag, 0 AS score
          |  FROM ice_name_src WHERE id < 4
          |) AS s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET tag = s.tag
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
      assert(mrg.getLong(0) > 0)
      // maintenance + metadata views by name
      val opt = spark.sql("OPTIMIZE ice_named").head()
      assert(opt.getLong(1) >= 1, s"OPTIMIZE by name folds deletes: $opt")
      Thread.sleep(5)
      val vac = spark.sql("VACUUM ice_named RETAIN 0 HOURS").head()
      assert(vac.getLong(0) >= 1, s"VACUUM by name expires: $vac")
      assert(spark.sql("DESCRIBE HISTORY ice_named").count() >= 1)
      val det = spark.sql("DESCRIBE DETAIL ice_named").head()
      assert(det.getString(0) == "iceberg")
      // name ≡ path: both spellings read the same table
      val byName = spark.table("ice_named").agg(sum("score")).head().getLong(0)
      val byPath = IcebergInterop.readIceberg(spark, dir)
        .agg(sum("score")).head().getLong(0)
      assert(byName == byPath)
      // ALTER by name evolves the schema AND refreshes the registration
      spark.sql("ALTER TABLE ice_named ADD COLUMN extra BIGINT")
      assert(spark.table("ice_named").columns.contains("extra"),
        "the re-registered view must carry the evolved schema")
      assert(spark.sql("SELECT extra FROM ice_named WHERE extra IS NOT NULL")
        .count() == 0)
    } finally spark.sql("DROP VIEW IF EXISTS ice_named")
  }

  test("partitioned CTAS by name: transform spellings land a real partition spec") {
    val dir = Files.createTempDirectory("graft-ice-name-part").toString
    (0L until 60L).map(i => (i, s"r_$i")).toDF("id", "tag")
      .createOrReplaceTempView("ice_name_part_src")
    spark.sql("CREATE TABLE ice_named_part USING iceberg " +
      s"PARTITIONED BY (bucket(4, id)) LOCATION '$dir' " +
      "AS SELECT * FROM ice_name_part_src")
    try {
      assert(spark.table("ice_named_part").count() == 60)
      val hit = IcebergInterop.readIcebergWhere(spark, dir,
        Map("id" -> ((17.0, 17.0))))
      assert(hit.count() == 1)
      val (read, skipped) = IcebergInterop.lastManifestScan
      assert(read == 1 && skipped == 3,
        s"named CTAS must produce a REAL bucket spec: read=$read skipped=$skipped")
      // IF NOT EXISTS is a no-op on an existing name; plain CREATE refuses
      spark.sql("CREATE TABLE IF NOT EXISTS ice_named_part USING iceberg " +
        s"LOCATION '$dir' AS SELECT * FROM ice_name_part_src")
      assert(spark.table("ice_named_part").count() == 60)
      intercept[Exception](spark.sql("CREATE TABLE ice_named_part USING iceberg " +
        s"LOCATION '$dir' AS SELECT * FROM ice_name_part_src").collect())
    } finally spark.sql("DROP VIEW IF EXISTS ice_named_part")
  }

  test("name routing never hijacks Delta names or unregistered names") {
    val deltaDir = Files.createTempDirectory("graft-ice-name-delta").toString
    graft.io.DeltaInterop.saveAsDeltaTable(
      (0L until 10L).map(i => (i, s"d_$i")).toDF("id", "tag"),
      "ice_name_delta_t", deltaDir)
    try {
      // a DELTA name keeps routing to the Delta plane
      val del = spark.sql("DELETE FROM ice_name_delta_t WHERE id < 2")
      assert(spark.table("ice_name_delta_t").count() == 8)
      assert(new java.io.File(s"$deltaDir/_delta_log").exists())
      // an unregistered name falls through to Spark's own error
      val e = intercept[Exception](
        spark.sql("DELETE FROM no_such_table_xyz WHERE id = 1").collect())
      assert(!e.getMessage.contains("iceberg"), e.getMessage)
    } finally spark.sql("DROP VIEW IF EXISTS ice_name_delta_t")
  }

  test("saveAsIcebergTable registers; a second registration refreshes") {
    val dir = Files.createTempDirectory("graft-ice-name-save").toString
    IcebergInterop.saveAsIcebergTable(
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), "ice_name_saved", dir)
    try {
      assert(spark.table("ice_name_saved").count() == 2)
      IcebergWrite.addColumn(spark, dir, "v", org.apache.spark.sql.types.LongType)
      IcebergInterop.registerCatalogTable(spark, "ice_name_saved", dir)
      assert(spark.table("ice_name_saved").columns.toSeq == Seq("id", "tag", "v"))
    } finally spark.sql("DROP VIEW IF EXISTS ice_name_saved")
  }

  test("re-running a name CTAS against an existing LOCATION refuses, never appends") {
    val dir = Files.createTempDirectory("graft-ice-ctas-redo").toString + "/t"
    spark.sql(s"CREATE TABLE ice_redo USING iceberg LOCATION '$dir' AS " +
      "SELECT id, id * 2 AS v FROM range(10)").collect()
    assert(IcebergInterop.readIceberg(spark, dir).count() == 10)
    // a NEW session loses the in-memory registration but not the
    // directory — simulate by dropping the catalog entry
    spark.sql("DROP VIEW ice_redo") // the registration is a view over graft_iceberg
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE ice_redo USING iceberg LOCATION '$dir' AS " +
        "SELECT id, id * 2 AS v FROM range(10)").collect())
    assert(e.getMessage.contains("already exists"), e.getMessage)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 10,
      "the refused CTAS must not have appended")
    // IF NOT EXISTS re-registers the existing table instead
    spark.sql(s"CREATE TABLE IF NOT EXISTS ice_redo USING iceberg " +
      s"LOCATION '$dir' AS SELECT id, id * 2 AS v FROM range(10)").collect()
    assert(spark.table("ice_redo").count() == 10)
  }

  test("partitioned PATH CTAS routes to the path handler, not the name layer") {
    val dir = Files.createTempDirectory("graft-ice-ctas-part").toString + "/t"
    spark.sql(s"CREATE TABLE iceberg.`$dir` USING iceberg " +
      "PARTITIONED BY (bucket(4, id)) AS SELECT id, id % 5 AS k FROM range(40)")
      .collect()
    assert(IcebergInterop.readIceberg(spark, dir).count() == 40)
    // the table really is bucket-partitioned: a point read opens one
    // bucket's manifests
    IcebergInterop.readIcebergWhere(spark, dir,
      Map("id" -> ((7.0, 7.0)))).collect()
    val (read, skipped) = IcebergInterop.lastManifestScan
    assert(read >= 1 && skipped >= 1,
      s"bucket spec must prune manifests: read=$read skipped=$skipped")
    // and nothing leaked into the session catalog under a fake db
    assert(!spark.catalog.databaseExists("iceberg"))
  }
}
