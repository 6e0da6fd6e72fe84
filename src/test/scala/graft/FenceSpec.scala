package graft

import java.nio.file.Files
import graft.functions.Fence
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.expressions.OptimizerFence]]: identity semantics,
  * and the plan property it exists for — expensive derived columns are
  * evaluated ONCE, with inferred/pushed predicates settling on the
  * attribute above the fence instead of re-inlining the definition. */
class FenceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // parquet-backed: a LocalRelation fixture constant-folds the whole
  // pipeline into a LocalTableScan and the plan asserts nothing
  private lazy val src = {
    val dir = Files.createTempDirectory("graft-fence").toString
    (0 until 100).map(i => (i.toLong, s"text_$i")).toDF("id", "text")
      .write.parquet(s"$dir/t")
    s"$dir/t"
  }

  private def expensive(c: Column) = sha2(repeat(c, 7), 256)
  private def dim = spark.range(5).select(col("id").as("k"),
    sha2(concat(lit("k"), col("id").cast("string")), 256).as("fp"))

  private def evalCount(df: DataFrame): Int =
    "repeat\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).size

  test("identity semantics; the join-inferred isnotnull no longer re-inlines the definition") {
    val t = spark.read.parquet(src)
    val plain = t.withColumn("fp", expensive(col("text"))).join(dim, Seq("fp"))
    val fenced = t.withColumn("fp", Fence(expensive(col("text")))).join(dim, Seq("fp"))
    // the trap, demonstrated: the equi-join's inferred isnotnull(fp) is
    // pushed through the defining Project into a scan filter, so the
    // sha2(repeat(...)) pipeline appears (and runs) twice per row
    assert(evalCount(plain) == 2)
    // fenced: defined once; the inferred filter survives but references
    // the ATTRIBUTE above the fence
    assert(evalCount(fenced) == 1)
    val opt = fenced.queryExecution.optimizedPlan.toString
    assert("isnotnull\\(fp#\\d+\\)".r.findFirstIn(opt).isDefined, s"expected attribute isnotnull:\n$opt")
    assert(plain.collect().toSet == fenced.collect().toSet)
    assert(plain.schema == fenced.schema)
  }

  test("a caller's own equi-filter on the fenced column is not pushed into the pipeline") {
    val t = spark.read.parquet(src)
    val probe = dim.collect().head.getString(1)
    val plain = t.withColumn("fp", expensive(col("text"))).filter(col("fp") === probe)
    val fenced = t.withColumn("fp", Fence(expensive(col("text")))).filter(col("fp") === probe)
    assert(evalCount(plain) == 2) // filter conjuncts inline the definition
    assert(evalCount(fenced) == 1)
    assert(plain.collect().toSet == fenced.collect().toSet)
  }

  test("fenced column stays inside whole-stage codegen") {
    val t = spark.read.parquet(src)
    val agg = t.withColumn("fp", Fence(expensive(col("text"))))
      .select(sum(length(col("fp"))).as("n"))
    // materialize: under AQE only the final plan carries codegen stages
    agg.queryExecution.toRdd.foreachPartition(
      (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
    val exec = agg.queryExecution.executedPlan.toString
    val fenceLine = exec.linesIterator.find(_.contains("fence(")).getOrElse("")
    assert(fenceLine.contains("*("), s"fence fell out of codegen:\n$exec")
  }
}
