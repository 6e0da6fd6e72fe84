package graft.tools

import graft.io.{PartitionedSnapshotStore, SnapshotInterop}
import org.apache.spark.sql.functions._

/** Cross-JVM snapshot-store interop smoke: phase `write` commits two
  * versions into a [[PartitionedSnapshotStore]] (the second a delta
  * touching HALF the partitions) and publishes the result to the
  * persistent catalog via [[SnapshotInterop.publishToCatalog]]; phase
  * `read` opens a FRESH session on the same warehouse and reads the
  * table with NOTHING but stock Spark surface — `spark.table` /
  * `spark.sql` by name, no graft reader anywhere — printing row counts,
  * the updated-partition evidence, and the pruned-scan partition count
  * for the spec to assert on.
  *
  *   SnapshotSmoke write <warehouse>
  *   SnapshotSmoke read <warehouse>
  */
object SnapshotSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SnapshotSmoke write|read <warehouse>")
    val Array(mode, warehouse) = args
    System.setProperty("derby.stream.error.file", s"$warehouse/derby.log")
    val spark = graft.GraftSession.persistent(s"snapshot-smoke-$mode", warehouse)
    try mode match {
      case "write" =>
        import spark.implicits._
        val dir = s"$warehouse/snap_customers"
        // v1: 40 rows across 4 partitions, all rev "a"
        val v1 = (0 until 40).map(i => (i.toLong, s"cust_$i", "a", i % 4))
          .toDF("cust_id", "name", "rev", "part")
        PartitionedSnapshotStore.commitDelta(v1, dir, "part")
        // v2 delta: partitions 0 and 1 fully rewritten at rev "b"
        val v2 = v1.filter(col("part") < 2).withColumn("rev", lit("b"))
        PartitionedSnapshotStore.commitDelta(v2, dir, "part")
        val v = SnapshotInterop.publishToCatalog(spark, dir, "snap_customers", "part")
        println(s"published=v$v rows=${spark.table("snap_customers").count()}")
      case "read" =>
        // STOCK read path: by name, catalog partitions, plain SQL — the
        // only classes involved are Spark's own
        val t = spark.table("snap_customers")
        val n = t.count()
        val nB = t.filter(col("rev") === "b").count()
        val parts = spark.sql("SHOW PARTITIONS snap_customers").count()
        // catalog partition pruning: one partition's rows via SQL
        val p3 = spark.sql(
          "SELECT count(*) FROM snap_customers WHERE part = 3").head().getLong(0)
        println(s"rows=$n rev_b=$nB partitions=$parts part3=$p3")
      case other => sys.error(s"unknown mode $other")
    } finally spark.stop()
  }
}
