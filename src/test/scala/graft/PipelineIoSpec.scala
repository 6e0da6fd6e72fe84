package graft

import graft.io.{FileCatalog, Mover, Readers, Writers}
import graft.ops.StarSchema
import graft.pipeline.{Pipeline, Stage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class PipelineIoSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("mover: landing file → source + archive, original deleted, barrier check") {
    val root = Files.createTempDirectory("graft").toString
    val landing = s"$root/datasource"
    Files.createDirectories(java.nio.file.Paths.get(landing))
    Files.writeString(java.nio.file.Paths.get(s"$landing/patients.csv"), "id,name\n1,a\n")
    val mover = new Mover()
    val moved = mover.ingestAll(landing, root, "2024-01-01")
    assert(moved.size == 1)
    assert(Files.exists(java.nio.file.Paths.get(s"$root/source/2024-01-01/patients/patients.csv")))
    assert(Files.exists(java.nio.file.Paths.get(s"$root/archive/2024-01-01/patients/patients.csv")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$landing/patients.csv")))
    assert(mover.isComplete(root, "2024-01-01", Set("patients")))
    assert(!mover.isComplete(root, "2024-01-01", Set("patients", "orders")))
  }

  test("file catalog: latest date partition discovery") {
    val root = Files.createTempDirectory("graft").toString
    for (d <- Seq("2024-01-01", "2024-02-15", "2024-02-03", "not-a-date"))
      Files.createDirectories(java.nio.file.Paths.get(s"$root/raw/$d"))
    val cat = new FileCatalog(root)
    assert(cat.latestDate("raw").contains("2024-02-15"))
    assert(cat.datePartitions("raw").size == 3)
    assert(cat.latestDate("missing-layer").isEmpty)
  }

  test("writers: single-file csv (faithful) and partitioned parquet (scale)") {
    val root = Files.createTempDirectory("graft").toString
    val df = Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("id", "load_date")
    Writers.csvSingleFile(df, s"$root/csv_out")
    val csvFiles = new java.io.File(s"$root/csv_out").listFiles().filter(_.getName.endsWith(".csv"))
    assert(csvFiles.length == 1) // coalesce(1) → exactly one data file
    Writers.parquetPartitioned(df, s"$root/pq_out", Seq("load_date"))
    assert(new java.io.File(s"$root/pq_out/load_date=2024-01-01").exists())
    val back = Readers.parquet(spark, s"$root/pq_out").filter($"load_date" === "2024-01-01")
    assert(back.count() == 1) // partition pruning path
  }

  test("dynamic partition refresh overwrites only the incoming partitions") {
    val out = Files.createTempDirectory("graft-dynpart").toString
    val day1 = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02")).toDF("id", "v", "load_date")
    Writers.parquetRefreshPartitions(day1, out, Seq("load_date"))
    // recompute day 2 only: day 1's partition must survive untouched
    val day2fix = Seq((9L, "B2", "2024-01-02")).toDF("id", "v", "load_date")
    Writers.parquetRefreshPartitions(day2fix, out, Seq("load_date"))
    val result = spark.read.parquet(out)
      // partition-column type inference reads the date string back as DATE
      .select(col("id"), col("v"), col("load_date").cast("string").as("load_date"))
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[String]("load_date"))).toSet
    assert(result == Set((1L, "a", "2024-01-01"), (9L, "B2", "2024-01-02")))
    // a full-overwrite write would have dropped 2024-01-01 entirely
  }

  test("empty relation with schema (SCD2 seed)") {
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val df = Readers.emptyWithSchema(spark, schema)
    assert(df.isEmpty && df.schema == schema)
  }

  test("pipeline: failed precondition halts the stage sequence (18-file barrier)") {
    var ran = Vector.empty[String]
    val p = Pipeline(Seq(
      Stage("a", _ => ran :+= "a"),
      Stage("b", _ => ran :+= "b", precondition = _ => false),
      Stage("c", _ => ran :+= "c")
    ))
    assert(p.run(spark) == Seq("a"))
    assert(ran == Vector("a"))
  }

  test("persistent catalog: a second SparkSession resolves fact_patient by name") {
    // The catalog implementation is fixed per JVM SparkContext (and this
    // suite's shared session is in-memory), so the persistence property is
    // proven the only honest way: two sequential JVMs on one warehouse.
    val warehouse = Files.createTempDirectory("graft-warehouse").toString
    def runPhase(mode: String): String = {
      val java = s"${System.getProperty("java.home")}/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-DSPARK_GRAFT_CPUS=4",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.CatalogSmoke", mode, warehouse)
      val out = new StringBuilder
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      scala.io.Source.fromInputStream(proc.getInputStream).getLines()
        .foreach(l => out.append(l).append('\n'))
      assert(proc.waitFor() == 0, s"CatalogSmoke $mode failed:\n$out")
      out.toString
    }
    assert(runPhase("write").contains("wrote=3"))
    // metastore files survived the first JVM's exit
    assert(new java.io.File(s"$warehouse/metastore_db").exists())
    val read = runPhase("read")
    assert(read.contains("rows=3 payers=2"), s"unexpected read output:\n$read")
  }

  test("snapshot-store exports: file manifest and hive copy read back with stock readers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-exp").toString + "/t"
    val v1 = (0 until 40).map(i => (i.toLong, s"c$i", "a", i % 4)).toDF("id", "name", "rev", "part")
    graft.io.PartitionedSnapshotStore.commitDelta(v1, dir, "part")
    graft.io.PartitionedSnapshotStore.commitDelta(
      v1.filter(col("part") < 2).withColumn("rev", lit("b")), dir, "part")
    val expect = graft.io.PartitionedSnapshotStore.read(spark, dir, 2, "part")
      .select("id", "name", "rev", "part").collect().map(_.toSeq).toSet

    // file manifest: stock recipe = text file of paths + basePath read
    val mf = s"$dir/_file_manifest.txt"
    val (v, nFiles) = graft.io.SnapshotInterop.exportFileManifest(spark, dir, mf)
    assert(v == 2 && nFiles > 0)
    val files = scala.io.Source.fromFile(mf.stripPrefix("file:")).getLines().toSeq
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")))
    val viaManifest = spark.read.option("basePath", s"$dir/data").parquet(files: _*)
      .select("id", "name", "rev", "part").collect().map(_.toSeq).toSet
    assert(viaManifest == expect)

    // hive materialization: one plain partitioned dir, plain read
    val out = s"$dir/../hive_export"
    graft.io.SnapshotInterop.exportHive(spark, dir, out, "part")
    val viaHive = spark.read.parquet(out)
      .select("id", "name", "rev", "part").collect().map(_.toSeq).toSet
    assert(viaHive == expect)
  }

  test("snapshot schema evolution: a widening delta reads old partitions as null; catalog follows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-evo").toString + "/t"
    val v1 = (0 until 40).map(i => (i.toLong, s"c$i", i % 4)).toDF("id", "name", "part")
    graft.io.PartitionedSnapshotStore.commitDelta(v1, dir, "part")
    graft.io.SnapshotInterop.publishToCatalog(spark, dir, "snap_evo_t", "part")
    assert(!spark.table("snap_evo_t").columns.contains("extra"))
    // v2 widens: parts 0/1 rewritten WITH a new column; 2/3 carry forward
    graft.io.PartitionedSnapshotStore.commitDelta(
      v1.filter(col("part") < 2).withColumn("extra", lit("x")), dir, "part")
    val r = graft.io.PartitionedSnapshotStore.read(spark, dir, 2, "part")
    assert(r.columns.toSet == Set("id", "name", "extra", "part"))
    assert(r.filter(col("extra") === "x").count() == 20)
    assert(r.filter(col("extra").isNull).count() == 20) // old partitions: null fill
    // republish widens the CATALOG table additively; old files read null
    graft.io.SnapshotInterop.publishToCatalog(spark, dir, "snap_evo_t", "part")
    val t = spark.table("snap_evo_t")
    assert(t.columns.contains("extra"))
    assert(t.filter(col("extra") === "x").count() == 20)
    assert(t.filter(col("extra").isNull).count() == 20)
    assert(t.count() == 40)
    spark.sql("DROP TABLE snap_evo_t")
  }

  test("snapshot publish survives vacuum: retained manifests pin every referenced data dir") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-vac").toString + "/t"
    val v1 = (0 until 40).map(i => (i.toLong, s"c$i", "a", i % 4)).toDF("id", "name", "rev", "part")
    graft.io.PartitionedSnapshotStore.commitDelta(v1, dir, "part")
    // v2 rewrites parts 0/1 only — parts 2/3 still point at v1's data dirs
    graft.io.PartitionedSnapshotStore.commitDelta(
      v1.filter(col("part") < 2).withColumn("rev", lit("b")), dir, "part")
    graft.io.SnapshotInterop.publishToCatalog(spark, dir, "snap_vac_t", "part")
    // vacuum to the latest version only: manifest v1 drops, but the v1
    // data dirs REFERENCED by manifest v2 must survive
    graft.io.PartitionedSnapshotStore.vacuum(spark, dir, keep = 1)
    val t = spark.table("snap_vac_t")
    assert(t.count() == 40)
    assert(t.filter(col("rev") === "b").count() == 20)
    // a later delta + republish repoints the touched partitions
    graft.io.PartitionedSnapshotStore.commitDelta(
      v1.filter(col("part") === 3).withColumn("rev", lit("c")), dir, "part")
    graft.io.SnapshotInterop.publishToCatalog(spark, dir, "snap_vac_t", "part")
    assert(spark.table("snap_vac_t").filter(col("rev") === "c").count() == 10)
    assert(spark.table("snap_vac_t").count() == 40)
    spark.sql("DROP TABLE snap_vac_t")
  }

  test("snapshot-store interop: a second JVM reads the published table with stock Spark only") {
    val warehouse = Files.createTempDirectory("graft-snap-warehouse").toString
    def runPhase(mode: String): String = {
      val java = s"${System.getProperty("java.home")}/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-DSPARK_GRAFT_CPUS=4",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.SnapshotSmoke", mode, warehouse)
      val out = new StringBuilder
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      scala.io.Source.fromInputStream(proc.getInputStream).getLines()
        .foreach(l => out.append(l).append('\n'))
      assert(proc.waitFor() == 0, s"SnapshotSmoke $mode failed:\n$out")
      out.toString
    }
    // publish = catalog metadata over the v2 manifest (v1 dirs shared for
    // untouched partitions 2/3, v2 dirs for rewritten 0/1)
    assert(runPhase("write").contains("published=v2 rows=40"))
    // the stock read in a FRESH JVM sees: all 40 rows, the delta's rev=b
    // rows exactly where v2 rewrote (partitions 0/1 = 20 rows), 4 catalog
    // partitions, and partition-pruned SQL over an untouched partition
    val read = runPhase("read")
    assert(read.contains("rows=40 rev_b=20 partitions=4 part3=10"),
      s"unexpected stock-read output:\n$read")
  }

  test("IVF-PQ index persistence: a fresh JVM serves the published artifact bit-identically, no retrain") {
    val indexDir = Files.createTempDirectory("graft-ivfpq-idx").toString
    def runPhase(mode: String): String = {
      val java = s"${System.getProperty("java.home")}/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-DSPARK_GRAFT_CPUS=4",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.IvfPqSmoke", mode, indexDir, "/root/testdata/sf0.001")
      val out = new StringBuilder
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      scala.io.Source.fromInputStream(proc.getInputStream).getLines()
        .foreach(l => out.append(l).append('\n'))
      assert(proc.waitFor() == 0, s"IvfPqSmoke $mode failed:\n$out")
      out.toString
    }
    def resultLine(out: String): String =
      out.linesIterator.find(_.startsWith("result=")).getOrElse(fail(s"no result line:\n$out"))
    val built = runPhase("build")
    assert(built.contains("published=") && built.contains("/v1"))
    // the artifact survived the training JVM; a new JVM serves identically
    assert(new java.io.File(s"$indexDir/_CURRENT").exists())
    val served = runPhase("serve")
    val r = resultLine(built)
    assert(r.stripPrefix("result=").nonEmpty && resultLine(served) == r,
      s"fresh-JVM serve diverged:\nbuild: $r\nserve: ${resultLine(served)}")
    // republish bumps the version, pointer follows
    val rebuilt = runPhase("build")
    assert(rebuilt.contains("/v2") && resultLine(rebuilt) == r)
  }

  test("star schema: dim input cleans, fact joins dims + measures with 0-fill") {
    val staging = Seq(("p1", "alice", "nyc"), ("p1", "alice", "nyc"), ("p2", null, "sf"))
      .toDF("id", "name", "city")
    val dimIn = StarSchema.dimInput(staging, Seq("id" -> "patient_id", "name" -> "name"))
    assert(dimIn.count() == 1) // dropna removed p2, dropDuplicates removed the dup
    val base = Seq(("p1", "nyc"), ("p2", "sf")).toDF("patient_id", "city")
    val dim = Seq(("nyc", "sk-nyc")).toDF("city", "location_sk")
    val enc = Seq(("p1", 3L)).toDF("patient_id", "total_encounters")
    val fact = StarSchema.buildFact(
      base,
      lookups = Seq((dim, base("city") === dim("city"), Seq(dim("location_sk")))),
      measures = Seq((enc, Seq("patient_id")))
    )
    val rows = fact.collect().map(r =>
      (r.getAs[String]("patient_id"), r.getAs[String]("location_sk"), r.getAs[Long]("total_encounters")))
    assert(rows.contains(("p1", "sk-nyc", 3L)))
    assert(rows.contains(("p2", null, 0L))) // missing dim → null sk, missing measure → 0
  }
}
