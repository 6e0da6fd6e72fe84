package graft

import graft.io.Writers
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The scale-path machinery: SQL-registered custom functions, salted skew
  * joins (row-identical to plain joins), and bucketed tables whose joins
  * plan without a shuffle. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("GraftExtensions: custom expressions callable from spark.sql") {
    // SharedSpark builds through GraftSession.builder → extensions installed
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT dot_product(a, b) AS d FROM v").head().getDouble(0) == 11.0)
    Seq(Seq("x", "y", "z")).toDF("toks").createOrReplaceTempView("vt")
    assert(spark.sql("SELECT simhash(toks) AS h FROM vt").head().getLong(0) > 0L)
    assert(spark.sql("SELECT intersect_size(array('a','b'), array('b','c')) AS i").head().getInt(0) == 1)
    val sig = spark.sql("SELECT minhash_sig(array('aa','bb'), 4) AS s").head().getSeq[String](0)
    assert(sig.length == 4 && sig.forall(_.length == 32))
    assert(spark.sql("SELECT minhash_sig(cast(array() AS array<string>), 4) AS s")
      .head().isNullAt(0)) // empty → NULL
  }

  test("salted join is row-identical to the plain join") {
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload") // key 1 is hot: 90% of rows
    val right = Seq((1L, "dim1"), (5L, "dim5"), (999L, "dim999")).toDF("k", "attr")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", saltBuckets = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("bloom-prefiltered join is row-identical to the plain join and prunes the probe side") {
    val probe = (1 to 10000).map(i => (i.toLong % 100, s"row$i")).toDF("k", "payload")
    val build = Seq((1L, "dim1"), (7L, "dim7"), (42L, "dim42")).toDF("bk", "attr")
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    val bloomed = graft.operators.BloomJoin.prefilteredJoin(probe, build, "k", "bk", 100L)
    assert(bloomed.select("k", "payload", "attr").collect().map(_.toSeq).toSet == plain)
    assert(plain.size == 300)
    // the bloom filter itself (before the join) must keep all 3 matching
    // keys and prune most of the 97 non-matching ones
    val kept = bloomed.select("k").distinct().collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 7L, 42L))
  }

  test("bucketed tables join without an exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Writers.bucketedTable(a, s"$wh/ta", "graft_ta", Seq("k"), 4)
    Writers.bucketedTable(b, s"$wh/tb", "graft_tb", Seq("k"), 4)
    // disable broadcast so the planner must pick sort-merge — the point is
    // that bucketing removes the shuffle exchanges from an SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_ta").join(spark.table("graft_tb"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
    }
  }
}
