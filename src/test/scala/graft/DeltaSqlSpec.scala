package graft

import java.nio.file.Files
import graft.io.DeltaInterop
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front-end for the Delta mutation surface
  * ([[graft.sql.DeltaSqlParser]], injected by [[GraftExtensions]]):
  * the reference's users type `MERGE INTO` / `DELETE` / `DESCRIBE
  * HISTORY` in a SQL console, so the same statements must run here —
  * executing through the exact DeltaInterop paths the Scala API uses
  * (same gates, same commits, same log shape). */
class DeltaSqlSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshTable(prefix: String, n: Long = 20L): String = {
    val dir = Files.createTempDirectory(prefix).toString
    DeltaInterop.writeDelta(
      (0L until n).map(i => (i, i % 4, s"n_$i")).toDF("id", "grp", "name"),
      dir, Nil)
    dir
  }

  test("DELETE FROM delta.`p` WHERE removes rows and reports the count") {
    val dir = freshTable("graft-sql-del")
    val r = spark.sql(s"DELETE FROM delta.`$dir` WHERE id % 2 = 0").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(10L))
    assert(DeltaInterop.readDelta(spark, dir).count() == 10)
    assert(DeltaInterop.readDelta(spark, dir)
      .filter(col("id") % 2 === 0).count() == 0)
    // WHERE-less DELETE truncates
    spark.sql(s"DELETE FROM delta.`$dir`")
    assert(DeltaInterop.readDelta(spark, dir).count() == 0)
  }

  test("UPDATE delta.`p` SET ... WHERE hits through the same gate as the Scala API") {
    val dir = freshTable("graft-sql-upd")
    val r = spark.sql(
      s"UPDATE delta.`$dir` SET name = concat('x_', name), grp = grp + 10 WHERE id < 5").collect()
    assert(r.head.getLong(0) == 5L)
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.filter(col("id") < 5 && col("name").startsWith("x_")).count() == 5)
    assert(t.filter(col("grp") >= 10).count() == 5)
    assert(t.filter(col("id") >= 5 && col("name").startsWith("x_")).count() == 0)
  }

  test("MERGE INTO upserts from a temp view; subquery sources work too") {
    val dir = freshTable("graft-sql-merge")
    (Seq((1L, 99L, "updated"), (100L, 0L, "inserted")))
      .toDF("id", "grp", "name").createOrReplaceTempView("merge_src")
    val r = spark.sql(
      s"""MERGE INTO delta.`$dir` AS t USING merge_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(r.head.getLong(1) == 1L, s"one insert expected: ${r.toSeq}")
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 21)
    assert(t.filter(col("id") === 1L).select("name").as[String].head() == "updated")
    assert(t.filter(col("id") === 100L).count() == 1)
    // parenthesized subquery source
    spark.sql(
      s"""MERGE INTO delta.`$dir` t USING
         |(SELECT id, grp, concat('q_', name) AS name FROM merge_src) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(DeltaInterop.readDelta(spark, dir)
      .filter(col("name").startsWith("q_")).count() == 2)
  }

  test("general MERGE: conditional UPDATE assignments, DELETE, conditional INSERT") {
    val dir = freshTable("graft-sql-mergex")   // ids 0..19, grp = id % 4
    Seq((1L, 50L, "hit-upd"),     // matched, grp>=50 -> update clause
        (2L, 5L, "hit-del"),      // matched, grp<50  -> delete clause
        (100L, 7L, "new-yes"),    // unmatched, grp<50 -> insert
        (101L, 99L, "new-no"))    // unmatched, grp>=50 -> filtered out
      .toDF("id", "grp", "name").createOrReplaceTempView("mx_src")
    val r = spark.sql(
      s"""MERGE INTO delta.`$dir` t USING mx_src s ON t.id = s.id
         |WHEN MATCHED AND s.grp >= 50 THEN UPDATE SET name = concat(t.name, '+', s.name), grp = s.grp
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED AND s.grp < 50 THEN INSERT (id, grp, name) VALUES (s.id, s.grp, upper(s.name))
         |""".stripMargin).collect()
    assert(r.head.getLong(1) == 1L, s"one insert expected: ${r.toSeq}")
    val t = DeltaInterop.readDelta(spark, dir)
    assert(t.count() == 20, "20 - 1 deleted + 1 inserted")
    val updated = t.filter(col("id") === 1L).collect().head
    assert(updated.getAs[String]("name") == "n_1+hit-upd" && updated.getAs[Long]("grp") == 50L)
    assert(t.filter(col("id") === 2L).count() == 0, "matched+unconditional DELETE clause")
    assert(t.filter(col("id") === 100L).select("name").as[String].head() == "NEW-YES")
    assert(t.filter(col("id") === 101L).count() == 0, "insert condition must filter")
    // untouched rows untouched
    assert(t.filter(col("id") === 3L).select("name").as[String].head() == "n_3")
    // clause ORDER matters: first-true wins (DELETE before UPDATE)
    Seq((4L, 60L, "x")).toDF("id", "grp", "name").createOrReplaceTempView("mx_src2")
    spark.sql(
      s"""MERGE INTO delta.`$dir` t USING mx_src2 s ON t.id = s.id
         |WHEN MATCHED AND s.grp >= 50 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = 'should-not-happen'
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(t.count() == 19 || DeltaInterop.readDelta(spark, dir).count() == 19)
    assert(DeltaInterop.readDelta(spark, dir).filter(col("id") === 4L).count() == 0)
  }

  test("general MERGE records a coherent change feed") {
    val dir = freshTable("graft-sql-mergecdf")
    DeltaInterop.setTableProperties(spark, dir, Map("delta.enableChangeDataFeed" -> "true"))
    Seq((1L, 0L, "upd"), (2L, 0L, "del"), (100L, 0L, "ins"))
      .toDF("id", "grp", "name").createOrReplaceTempView("mcdf_src")
    spark.sql(
      s"""MERGE INTO delta.`$dir` t USING mcdf_src s ON t.id = s.id
         |WHEN MATCHED AND s.name = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val v = DeltaInterop.state(spark, dir).version
    val m = spark.sql(s"SELECT _change_type, count(*) AS n FROM table_changes('$dir', $v, $v) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L, "insert" -> 1L), m)
  }

  test("DESCRIBE HISTORY and RESTORE ... TO VERSION AS OF run as SQL") {
    val dir = freshTable("graft-sql-hist")
    spark.sql(s"DELETE FROM delta.`$dir` WHERE id < 10")
    val hist = spark.sql(s"DESCRIBE HISTORY delta.`$dir`").collect()
    assert(hist.length == 2)
    assert(hist.head.getLong(0) == 1L, "newest first")
    assert(hist.map(_.getString(2)).toSet == Set("WRITE", "DELETE"))
    val r = spark.sql(s"RESTORE TABLE delta.`$dir` TO VERSION AS OF 0").collect()
    assert(r.head.getLong(0) == 2L)
    assert(DeltaInterop.readDelta(spark, dir).count() == 20)
  }

  test("table_changes('p', from, to) is queryable inside plain SELECTs") {
    val dir = freshTable("graft-sql-tc")
    DeltaInterop.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))                 // v1
    spark.sql(s"DELETE FROM delta.`$dir` WHERE id < 4")            // v2
    spark.sql(s"UPDATE delta.`$dir` SET grp = grp + 100 WHERE id = 10") // v3
    val agg = spark.sql(
      s"""SELECT _change_type, count(*) AS n
         |FROM table_changes('$dir', 2, 3)
         |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val m = agg.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("delete" -> 4L, "update_preimage" -> 1L, "update_postimage" -> 1L), m)
    // open-ended range defaults to the latest version
    assert(spark.sql(s"SELECT count(*) FROM table_changes('$dir', 2)")
      .head().getLong(0) == 6L)
  }

  test("SELECT ... FROM delta.`p` works, with VERSION AS OF time travel") {
    val dir = freshTable("graft-sql-sel")
    spark.sql(s"DELETE FROM delta.`$dir` WHERE id >= 10")  // v1
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`$dir`").head().getLong(0) == 10)
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`$dir` VERSION AS OF 0")
      .head().getLong(0) == 20)
    // joins/aggregates over the path table parse as plain Spark SQL
    val g = spark.sql(
      s"""SELECT grp, count(*) AS n FROM delta.`$dir` GROUP BY grp ORDER BY grp""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g.values.sum == 10 && g.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("INSERT INTO / OVERWRITE and CTAS run as SQL with positional resolution") {
    val root = Files.createTempDirectory("graft-sql-ins").toString
    val dir = s"$root/t"
    spark.sql(
      s"""CREATE TABLE delta.`$dir` USING delta PARTITIONED BY (grp)
         |AS SELECT id, id % 4 AS grp, concat('n_', id) AS name
         |FROM range(20)""".stripMargin)
    assert(DeltaInterop.readDelta(spark, dir).count() == 20)
    assert(DeltaInterop.state(spark, dir).partitionColumns == Seq("grp"))
    // IF NOT EXISTS is a no-op on an existing table; bare CREATE refuses
    spark.sql(s"CREATE TABLE IF NOT EXISTS delta.`$dir` AS SELECT 1 AS x, 2 AS y, 3 AS z")
    assert(DeltaInterop.readDelta(spark, dir).count() == 20)
    intercept[Exception](
      spark.sql(s"CREATE TABLE delta.`$dir` AS SELECT 1 AS x, 2 AS y, 3 AS z").collect())
    // positional INSERT: names don't need to match, types cast
    spark.sql(s"INSERT INTO delta.`$dir` VALUES (100, 0, 'v100'), (101, 1, 'v101')")
    assert(DeltaInterop.readDelta(spark, dir).count() == 22)
    spark.sql(s"INSERT INTO delta.`$dir` SELECT id + 200, id % 4, 'sel' FROM range(3)")
    assert(DeltaInterop.readDelta(spark, dir).count() == 25)
    // INSERT ... SELECT over another delta path table (read rewrite nests)
    val dir2 = s"$root/t2"
    spark.sql(s"CREATE TABLE delta.`$dir2` AS SELECT id, grp, name FROM delta.`$dir` WHERE id < 5")
    assert(DeltaInterop.readDelta(spark, dir2).count() == 5)
    spark.sql(s"INSERT OVERWRITE delta.`$dir2` SELECT id, grp, name FROM delta.`$dir` WHERE id >= 100")
    assert(DeltaInterop.readDelta(spark, dir2).count() == 5)
    assert(DeltaInterop.readDelta(spark, dir2).agg(min(col("id"))).head().getLong(0) == 100L)
  }

  test("OPTIMIZE, VACUUM, ALTER TABLE, DESCRIBE DETAIL, SHOW TBLPROPERTIES run as SQL") {
    val dir = Files.createTempDirectory("graft-sql-maint").toString
    DeltaInterop.writeDelta(
      (0L until 40L).map(i => (i, s"n_$i")).toDF("id", "name").repartition(4), dir, Nil)
    // compaction: 4 small files -> 1
    val opt = spark.sql(s"OPTIMIZE delta.`$dir`").collect()
    assert(opt.head.getLong(0) == 4L && opt.head.getLong(1) == 1L)
    // the compacted-away files reclaim after RETAIN 0 once their commits
    // age out of the JSON log (same contract as the Scala API)
    DeltaInterop.checkpoint(spark, dir)
    DeltaInterop.cleanupLog(spark, dir)
    val vac = spark.sql(s"VACUUM delta.`$dir` RETAIN 0 HOURS").collect()
    assert(vac.head.getLong(0) == 4L, s"vacuum reclaimed ${vac.head.getLong(0)}")
    assert(DeltaInterop.readDelta(spark, dir).count() == 40)
    // ALTER TABLE surface
    spark.sql(s"ALTER TABLE delta.`$dir` ADD COLUMN score double")
    spark.sql(s"ALTER TABLE delta.`$dir` RENAME COLUMN name TO label")
    spark.sql(s"ALTER TABLE delta.`$dir` SET TBLPROPERTIES ('graft.owner' = 'sql-spec')")
    spark.sql(s"ALTER TABLE delta.`$dir` ADD CONSTRAINT nonneg CHECK (id >= 0)")
    val st = DeltaInterop.state(spark, dir)
    assert(st.schema.fieldNames.toSeq == Seq("id", "label", "score"))
    assert(st.configuration("graft.owner") == "sql-spec")
    assert(st.configuration("delta.constraints.nonneg") == "id >= 0")
    val props = spark.sql(s"SHOW TBLPROPERTIES delta.`$dir`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.owner") == "sql-spec")
    val detail = spark.sql(s"DESCRIBE DETAIL delta.`$dir`").collect().head
    assert(detail.getString(0) == "delta" && detail.getLong(3) >= 1L)
    // the renamed column reads through SQL; the constraint fires on INSERT
    assert(spark.sql(s"SELECT count(label) FROM delta.`$dir`").head().getLong(0) == 40)
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO delta.`$dir` VALUES (-1, 'bad', 0.5)").collect())
    assert(e.getMessage.contains("nonneg"), e.getMessage)
    // DROP CONSTRAINT lifts the gate; UNSET TBLPROPERTIES removes keys
    spark.sql(s"ALTER TABLE delta.`$dir` DROP CONSTRAINT nonneg").collect()
    spark.sql(s"INSERT INTO delta.`$dir` VALUES (-1, 'ok-now', 0.5)").collect()
    assert(DeltaInterop.readDelta(spark, dir).filter(col("id") === -1).count() == 1)
    spark.sql(s"ALTER TABLE delta.`$dir` UNSET TBLPROPERTIES ('graft.owner')").collect()
    val st2 = DeltaInterop.state(spark, dir)
    assert(!st2.configuration.contains("graft.owner") &&
      !st2.configuration.contains("delta.constraints.nonneg"))
    // unsetting column-mapping keys refuses (physical layout depends on them)
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE delta.`$dir` UNSET TBLPROPERTIES ('delta.columnMapping.mode')").collect())
    assert(e2.getMessage.contains("column-mapping"))
  }

  test("OPTIMIZE ... WHERE compacts only the named partition (incremental maintenance)") {
    val dir = Files.createTempDirectory("graft-sql-optwhere").toString
    DeltaInterop.writeDelta(
      (0L until 60L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "grp")
        .repartition(3), dir, Seq("grp"))
    val before = DeltaInterop.state(spark, dir)
    assert(before.files.count(_.partitionValues("grp") == "a") == 3)
    assert(before.files.count(_.partitionValues("grp") == "b") == 3)
    val r = spark.sql(s"OPTIMIZE delta.`$dir` WHERE grp = 'a'").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L,
      s"scoped compaction: removed ${r.getLong(0)}, added ${r.getLong(1)}")
    val after = DeltaInterop.state(spark, dir)
    assert(after.files.count(_.partitionValues("grp") == "a") == 1,
      "partition a compacted to one file")
    assert(after.files.count(_.partitionValues("grp") == "b") == 3,
      "partition b untouched")
    assert(DeltaInterop.readDelta(spark, dir).count() == 60)
    // scoped ZORDER rewrites only the named partition too
    val z = spark.sql(
      s"OPTIMIZE delta.`$dir` WHERE grp = 'b' ZORDER BY (id)").collect().head
    assert(z.getLong(0) == 3L)
    assert(DeltaInterop.readDelta(spark, dir).count() == 60)
    // a non-partition column refuses loudly
    val e = intercept[Exception](
      spark.sql(s"OPTIMIZE delta.`$dir` WHERE id = 3").collect())
    assert(e.getMessage.contains("not partition columns"), e.getMessage)
  }

  test("foreign Iceberg tables read as SQL: iceberg.`p`, VERSION AS OF snapshot, joins with Delta") {
    val dir = Files.createTempDirectory("graft-sql-iceberg").toString
    val s1 = graft.tools.IcebergFixture.append(
      (0L until 100L).map(i => (i, s"g_${i % 4}")).toDF("id", "grp"), dir)
    graft.tools.IcebergFixture.append(
      (100L until 150L).map(i => (i, s"g_${i % 4}")).toDF("id", "grp"), dir)
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`")
      .head().getLong(0) == 150)
    // VERSION AS OF = snapshot id (Spark+Iceberg semantics)
    assert(spark.sql(
      s"SELECT max(id) AS m FROM iceberg.`$dir` VERSION AS OF $s1")
      .head().getLong(0) == 99)
    // the TVF spelling works directly, and Iceberg joins Delta in one
    // statement — both sides resolve to plain pruned scans
    val dDir = freshTable("graft-sql-ice-delta", 50)
    val joined = spark.sql(
      s"""SELECT count(*) AS n FROM iceberg.`$dir` i
         |JOIN delta.`$dDir` d ON i.id = d.id""".stripMargin).head().getLong(0)
    assert(joined == 50)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_iceberg('$dir', $s1)")
      .head().getLong(0) == 100)
    // a string literal spelling iceberg.`x` is DATA, not a read
    assert(spark.sql("SELECT 'iceberg.`/nope`' AS s").head().getString(0)
      == "iceberg.`/nope`")
    // DESCRIBE HISTORY works on Iceberg tables too (snapshot log)
    val hist = spark.sql(s"DESCRIBE HISTORY iceberg.`$dir`").collect()
    assert(hist.length == 2 && hist.forall(_.getAs[String]("operation") == "append"))
  }

  test("Iceberg TIMESTAMP AS OF resolves through snapshot timestamp-ms (API and SQL)") {
    val dir = Files.createTempDirectory("graft-sql-iceberg-ts").toString
    val s1 = graft.tools.IcebergFixture.append(
      (0L until 40L).map(i => (i, s"x_$i")).toDF("id", "tag"), dir)
    val s2 = graft.tools.IcebergFixture.append(
      (40L until 60L).map(i => (i, s"y_$i")).toDF("id", "tag"), dir)
    // the fixture stamps timestamp-ms = 1700000000000 + snapshot id
    def tsOf(s: Long) = java.time.Instant.ofEpochMilli(1700000000000L + s).toString
    assert(graft.io.IcebergInterop.snapshotAtTimestamp(
      spark, dir, 1700000000000L + s1) == s1)
    // a timestamp BETWEEN snapshots resolves to the earlier one
    assert(graft.io.IcebergInterop.snapshotAtTimestamp(
      spark, dir, 1700000000000L + s2 - 1) == s1)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM iceberg.`$dir` TIMESTAMP AS OF '${tsOf(s1)}'")
      .head().getLong(0) == 40)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM iceberg.`$dir` TIMESTAMP AS OF '${tsOf(s2)}'")
      .head().getLong(0) == 60)
    // before the first snapshot: loud
    val e = intercept[Exception](graft.io.IcebergInterop.snapshotAtTimestamp(
      spark, dir, 1699999999999L))
    assert(e.getMessage.contains("no Iceberg snapshot"), e.getMessage)
  }

  test("CLUSTER BY runs as SQL: CREATE, plain OPTIMIZE clusters, ALTER ... CLUSTER BY [NONE]") {
    val dir = Files.createTempDirectory("graft-sql-cluster").toString + "/t"
    spark.sql(s"CREATE TABLE delta.`$dir` (id BIGINT, lang STRING) " +
      "USING delta CLUSTER BY (lang, id)")
    spark.sql(s"INSERT INTO delta.`$dir` " +
      "SELECT id, concat('l', cast(id % 3 AS STRING)) FROM range(300)")
    val det = spark.sql(s"DESCRIBE DETAIL delta.`$dir`").collect().head
    assert(det.getAs[String]("clusteringColumns") == "lang,id")
    // plain OPTIMIZE on a clustered table CLUSTERS (not just bin-packs)
    val opt = spark.sql(s"OPTIMIZE delta.`$dir`").collect().head
    assert(opt.getAs[Long]("num_files_added") > 0)
    assert(DeltaInterop.state(spark, dir).files
      .forall(_.clusteringProvider == "graft-zorder"))
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`$dir`")
      .head().getLong(0) == 300)
    // CLUSTER BY NONE drops the domain; re-CLUSTER BY re-declares it
    spark.sql(s"ALTER TABLE delta.`$dir` CLUSTER BY NONE").collect()
    assert(DeltaInterop.state(spark, dir).clusteringColumns.isEmpty)
    spark.sql(s"ALTER TABLE delta.`$dir` CLUSTER BY (id)").collect()
    assert(DeltaInterop.state(spark, dir).clusteringColumns == Seq("id"))
    // OPTIMIZE ... WHERE on a clustered table must ERROR loudly, not
    // silently drop the user's partition filter (clustering rewrites
    // the whole table)
    val e = intercept[Exception](
      spark.sql(s"OPTIMIZE delta.`$dir` WHERE lang = 'l0'").collect())
    assert(e.getMessage.contains("clustered"), e.getMessage)
  }


  test("INSERT INTO / OVERWRITE iceberg.`p` writes native Iceberg snapshots") {
    val dir = Files.createTempDirectory("graft-sql-ice-ins").toString + "/t"
    spark.sql(s"INSERT INTO iceberg.`$dir` SELECT id, concat('t', id) AS tag FROM range(10)")
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`").head().getLong(0) == 10)
    spark.sql(s"INSERT INTO iceberg.`$dir` SELECT id + 10 AS id, concat('u', id) AS tag FROM range(5)")
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`").head().getLong(0) == 15)
    val snaps = graft.io.IcebergInterop.snapshots(spark, dir)
      .orderBy("sequence_number").collect()
    assert(snaps.length == 2 && snaps.forall(_.getString(3) == "append"))
    // OVERWRITE replaces contents; prior snapshots stay travelable
    spark.sql(s"INSERT OVERWRITE iceberg.`$dir` SELECT id + 100 AS id, 'z' AS tag FROM range(3)")
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`").head().getLong(0) == 3)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM iceberg.`$dir` VERSION AS OF ${snaps.head.getLong(0)}")
      .head().getLong(0) == 10)
    // positional resolution casts to the table's types
    spark.sql(s"INSERT INTO iceberg.`$dir` SELECT '999', 7 FROM range(1)")
    assert(spark.sql(s"SELECT sum(id) AS s FROM iceberg.`$dir` WHERE id > 500")
      .head().getLong(0) == 999L)
  }


  test("CREATE TABLE iceberg.`p` AS SELECT creates a native Iceberg table") {
    val dir = Files.createTempDirectory("graft-sql-ice-ctas").toString + "/t"
    spark.sql(s"CREATE TABLE iceberg.`$dir` AS SELECT id, id % 3 AS grp FROM range(12)")
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`").head().getLong(0) == 12)
    // bare CTAS on an existing table refuses; IF NOT EXISTS no-ops
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE iceberg.`$dir` AS SELECT 1 AS id, 2 AS grp"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    spark.sql(s"CREATE TABLE IF NOT EXISTS iceberg.`$dir` AS SELECT 1 AS id, 2 AS grp")
    assert(spark.sql(s"SELECT count(*) AS n FROM iceberg.`$dir`").head().getLong(0) == 12)
  }

  test("OPTIMIZE ZORDER BY and TIMESTAMP AS OF time travel run as SQL") {
    val dir = Files.createTempDirectory("graft-sql-zorder").toString
    DeltaInterop.writeDelta(
      (0L until 1000L).map(i => (i, (i * 37) % 1000, i % 10))
        .toDF("a", "b", "g").repartition(8), dir, Nil)
    val r = spark.sql(s"OPTIMIZE delta.`$dir` ZORDER BY (a, b)").collect()
    assert(r.head.getLong(1) >= 1L)
    assert(DeltaInterop.readDelta(spark, dir).count() == 1000)
    // timestamp time travel: resolve 'now' to the latest version
    val nowTs = new java.sql.Timestamp(System.currentTimeMillis() + 5000).toString
    assert(spark.sql(
      s"SELECT count(*) FROM delta.`$dir` TIMESTAMP AS OF '$nowTs'")
      .head().getLong(0) == 1000)
  }

  test("CONVERT TO DELTA snapshots an existing parquet dir in place") {
    val dir = Files.createTempDirectory("graft-sql-convert").toString + "/lake"
    (0L until 30L).map(i => (i, i % 3, s"n_$i")).toDF("id", "part", "name")
      .write.partitionBy("part").parquet(dir)
    val nFilesBefore = {
      def count(f: java.io.File): Int =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
        else f.listFiles().map(count).sum
      count(new java.io.File(dir))
    }
    val r = spark.sql(s"CONVERT TO DELTA parquet.`$dir` PARTITIONED BY (part)").collect()
    assert(r.head.getLong(0) == 0L)
    val st = DeltaInterop.state(spark, dir)
    assert(st.partitionColumns == Seq("part"))
    assert(st.files.length == nFilesBefore, "convert must reference every file, move none")
    assert(st.files.forall(_.numRecords > 0), "footer stats must ride along")
    assert(spark.sql(s"SELECT count(*) FROM delta.`$dir`").head().getLong(0) == 30)
    // converted tables are immediately mutable through the normal gates
    spark.sql(s"DELETE FROM delta.`$dir` WHERE id % 2 = 0")
    assert(DeltaInterop.readDelta(spark, dir).count() == 15)
    // converting twice refuses
    intercept[Exception](spark.sql(s"CONVERT TO DELTA parquet.`$dir`").collect())
    // partition-column inference from the path works without the clause
    val dir2 = Files.createTempDirectory("graft-sql-convert2").toString + "/lake"
    (0L until 10L).map(i => (i, i % 2)).toDF("id", "half")
      .write.partitionBy("half").parquet(dir2)
    spark.sql(s"CONVERT TO DELTA parquet.`$dir2`")
    assert(DeltaInterop.state(spark, dir2).partitionColumns == Seq("half"))
    assert(DeltaInterop.readDelta(spark, dir2).count() == 10)
  }

  test("SHALLOW CLONE branches a table without copying; mutations stay isolated") {
    val root = Files.createTempDirectory("graft-sql-clone").toString
    val src = s"$root/src"; val dst = s"$root/clone"
    DeltaInterop.writeDelta(
      (0L until 20L).map(i => (i, i % 2, s"n_$i")).toDF("id", "half", "name")
        .repartition(2), src, Seq("half"))
    val r = spark.sql(s"CREATE TABLE delta.`$dst` SHALLOW CLONE delta.`$src`").collect()
    assert(r.head.getLong(0) == 0L)
    // zero data files inside the clone dir — references are absolute
    val st = DeltaInterop.state(spark, dst)
    assert(st.files.forall(_.path.contains(src)), st.files.map(_.path).mkString(","))
    assert(st.partitionColumns == Seq("half"))
    assert(spark.sql(s"SELECT count(*) FROM delta.`$dst`").head().getLong(0) == 20)
    // mutating the clone touches only the clone; the source is untouched
    spark.sql(s"DELETE FROM delta.`$dst` WHERE id < 10")
    spark.sql(s"INSERT INTO delta.`$dst` VALUES (100, 0, 'clone-only')")
    assert(DeltaInterop.readDelta(spark, dst).count() == 11)
    assert(DeltaInterop.readDelta(spark, src).count() == 20, "source must be untouched")
    // the clone's vacuum cannot reclaim source data
    DeltaInterop.checkpoint(spark, dst); DeltaInterop.cleanupLog(spark, dst)
    DeltaInterop.vacuum(spark, dst, retainMillis = 0L)
    assert(DeltaInterop.readDelta(spark, src).count() == 20)
    assert(DeltaInterop.readDelta(spark, dst).count() == 11)
    // DV-carrying sources refuse (sidecars would resolve at the wrong root)
    DeltaInterop.deleteWhereDV(spark, src, col("id") === 0L)
    val e = intercept[IllegalArgumentException](
      spark.sql(s"CREATE TABLE delta.`$root/c2` SHALLOW CLONE delta.`$src`").collect())
    assert(e.getMessage.contains("deletion-vector"), e.getMessage)
  }

  test("non-Delta SQL is untouched by the injected parser") {
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("plain_t")
    assert(spark.sql(
      "SELECT v FROM plain_t WHERE k = (SELECT max(k) FROM plain_t)")
      .head().getString(0) == "b")
    // a DELETE over a NON-delta table still routes to Spark's own
    // analyzer (and fails there, not in the graft parser)
    intercept[Exception](spark.sql("DELETE FROM plain_t WHERE k = 1").collect())
  }

  test("SQL DELETE reports metadata-derived affected rows, DV masks included") {
    val dir = freshTable("graft-sql-delcount")
    // make one file carry a deletion vector first: its masked rows must
    // not count as affected when the SQL DELETE later touches the file
    val (_, _, nDv) = DeltaInterop.deleteWhereDV(spark, dir, col("id") < 3L)
    assert(nDv == 3L)
    val r = spark.sql(s"DELETE FROM delta.`$dir` WHERE id < 10").collect()
    assert(r.head.getLong(0) == 7L, s"expected 7 affected rows, got ${r.head.getLong(0)}")
    assert(DeltaInterop.readDelta(spark, dir).count() == 10)
  }

  test("SQL mutations respect the appendOnly gate like the Scala API") {
    val dir = freshTable("graft-sql-gate")
    DeltaInterop.setTableProperties(spark, dir, Map("delta.appendOnly" -> "true"))
    val e = intercept[IllegalArgumentException](
      spark.sql(s"DELETE FROM delta.`$dir` WHERE id = 1").collect())
    assert(e.getMessage.contains("delta.appendOnly"))
  }

  test("column-list CREATE TABLE: IDENTITY + generated columns through SQL") {
    val dir = Files.createTempDirectory("graft-sql-create-cols").toString + "/t"
    spark.sql(
      s"""CREATE TABLE delta.`$dir` (
         |  row_id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
         |  k BIGINT NOT NULL,
         |  twice BIGINT GENERATED ALWAYS AS (k * 2),
         |  tag STRING
         |) USING delta""".stripMargin)
    val st = DeltaInterop.state(spark, dir)
    assert(st.protocol.writerFeatures.contains("identityColumns"))
    assert(!st.schema("k").nullable)
    assert(st.schema("twice").metadata.getString("delta.generationExpression") == "k * 2")
    // identity column UNLISTED in the INSERT → engine-generated
    spark.sql(
      s"""INSERT INTO delta.`$dir` (k, twice, tag)
         |SELECT id, id * 2, concat('t_', id) FROM range(5)""".stripMargin)
    spark.sql(
      s"""INSERT INTO delta.`$dir` (k, twice, tag)
         |SELECT id, id * 2, concat('u_', id) FROM range(100, 103)""".stripMargin)
    val rows = DeltaInterop.readDelta(spark, dir)
      .select("row_id", "k").as[(Long, Long)].collect()
    assert(rows.length == 8 && rows.map(_._1).distinct.length == 8)
    assert(rows.map(_._1).min == 10L, "first value AT start")
    assert(rows.forall { case (r, _) => (r - 10L) % 2L == 0 }, "step-aligned")
    val (b1, b2) = rows.partition(_._2 < 100)
    assert(b1.map(_._1).max < b2.map(_._1).min, "second insert after the first")
    // generated-column contract still enforced through this path
    val e = intercept[IllegalArgumentException](spark.sql(
      s"INSERT INTO delta.`$dir` (k, twice, tag) SELECT 9, 5, 'bad'").collect())
    assert(e.getMessage.contains("k * 2"), e.getMessage)
    // SET on the identity column refuses via SQL too
    val e2 = intercept[IllegalArgumentException](spark.sql(
      s"UPDATE delta.`$dir` SET row_id = 0 WHERE k = 1").collect())
    assert(e2.getMessage.contains("identity"), e2.getMessage)
    // IF NOT EXISTS second create is a no-op; plain re-create refuses
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS delta.`$dir` (a INT) USING delta")
    assert(DeltaInterop.state(spark, dir).schema.fieldNames.length == 4)
    val e3 = intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE delta.`$dir` (a INT) USING delta").collect())
    assert(e3.getMessage.contains("already exists"))
  }

  test("column-list CREATE by catalog NAME registers and reads back") {
    val db = "default"
    val tbl = s"sqlprop_create_${System.identityHashCode(this)}"
    spark.sql(
      s"""CREATE TABLE $db.$tbl (
         |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
         |  v STRING NOT NULL
         |) USING delta PARTITIONED BY (v)""".stripMargin)
    try {
      spark.sql(s"INSERT INTO $db.$tbl (v) VALUES ('a'), ('b')")
      val t = spark.sql(s"SELECT id, v FROM $db.$tbl ORDER BY id").collect()
      assert(t.length == 2 && t.map(_.getLong(0)).distinct.length == 2)
      // BY DEFAULT: explicit ids are legal and advance the watermark
      spark.sql(s"INSERT INTO $db.$tbl (id, v) VALUES (500, 'c')")
      spark.sql(s"INSERT INTO $db.$tbl (v) VALUES ('d')")
      val ids = spark.sql(s"SELECT id FROM $db.$tbl").collect().map(_.getLong(0))
      assert(ids.distinct.length == 4 && ids.max > 500L)
    } finally spark.sql(s"DROP VIEW IF EXISTS $db.$tbl") // registrations are TVF-backed views
  }
}
