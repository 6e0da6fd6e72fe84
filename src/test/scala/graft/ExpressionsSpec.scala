package graft

import graft.functions.{MinHash, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom codegen expressions must agree exactly with the composable
  * higher-order-function forms they replace. */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("DotProduct == HOF dot, bitwise, on float arrays") {
    val df = Seq(
      (Array(1.1f, -2.2f, 3.3f), Array(0.5f, 4.4f, -1.0f)),
      (Array(0.0f, 0.0f), Array(0.0f, 0.0f)),
      (Array(1e-8f, 1e8f), Array(1e8f, 1e-8f))
    ).toDF("a", "b")
    val rows = df.select(
      VF.dot($"a", $"b").as("fast"),
      VF.dotHof($"a", $"b").as("ref")
    ).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct handles double arrays and codegen + interpreted paths agree") {
    val df = Seq((Array(1.5, 2.5), Array(2.0, -3.0))).toDF("a", "b")
    assert(df.select(VF.dot($"a", $"b")).head().getDouble(0) == 1.5 * 2.0 + 2.5 * -3.0)
  }

  test("IntersectSize == size(array_intersect) on distinct string arrays") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("x")),
      (Seq.empty[String], Seq("x"))
    ).toDF("a", "b")
    val rows = df.select(
      MinHash.intersectSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref")
    ).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("SortedLongIntersectSize == intersect count on sorted long arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L))
    ).toDF("a", "b")
    val rows = df.select(
      MinHash.sortedIntersectSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref")
    ).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("MinHashSig == HOF signature, element for element; empty → NULL") {
    val df = Seq(
      Seq("aa bb cc", "bb cc dd", "cc dd ee"),
      Seq("single"),
      Seq.empty[String]
    ).toDF("sh")
    val rows = df.select(
      $"sh",
      graft.functions.MinHash.signature($"sh", 8).as("fast"),
      graft.functions.MinHash.signatureHof($"sh", 8).as("ref")
    ).collect()
    rows.foreach { r =>
      if (r.getSeq[String](0).isEmpty)
        // empty shingle set → NULL signature (drops out of LSH banding via
        // transform/posexplode null propagation, no filter needed)
        assert(r.isNullAt(1))
      else
        assert(r.getSeq[String](1) == r.getSeq[String](2))
    }
  }

  test("SimHashExpr == HOF simhash on assorted token arrays") {
    val df = Seq(
      Seq("alpha", "beta", "gamma"),
      Seq("x"),
      Seq("the", "quick", "brown", "fox", "jumps", "over", "it"),
      Seq.empty[String]
    ).toDF("toks")
    val rows = df.select(
      graft.functions.SimHash.simhash($"toks").as("fast"),
      graft.functions.SimHash.simhashHof($"toks").as("ref")
    ).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("all custom expressions run under CODEGEN_ONLY (no fallback path)") {
    // CODEGEN_ONLY makes expression compilation failures fatal instead of
    // silently dropping to interpreted eval — proving every custom
    // expression really generates compilable code (no CodegenFallback).
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val df = Seq(
        (Seq("aa", "bb", "cc"), Seq("bb", "cc", "dd"), Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
        (Seq.empty[String], Seq("x"), Array(0.5f, 0.5f), Array(1.0f, -1.0f))
      ).toDF("sa", "sb", "va", "vb")
      val r = df.select(
        MinHash.intersectSize($"sa", $"sb").as("is"),
        graft.functions.MinHash.signature($"sa", 4).as("sig"),
        graft.functions.SimHash.simhash($"sa").as("sh"),
        VF.dot($"va", $"vb").as("d")
      ).collect()
      assert(r(0).getInt(0) == 2 && r(0).getSeq[String](1).length == 4)
      assert(r(0).getLong(2) > 0L && r(0).getDouble(3) == 11.0)
      assert(r(1).isNullAt(1)) // empty shingles → NULL sig through codegen too
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("hashedShingles preserves cardinality and intersection counts") {
    val df = Seq((Seq("aa", "bb", "cc"), Seq("bb", "cc", "dd"))).toDF("a", "b")
    val r = df.select(
      MinHash.sortedIntersectSize(
        MinHash.hashedShingles($"a"), MinHash.hashedShingles($"b")).as("ni"),
      size(MinHash.hashedShingles($"a")).as("na")
    ).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 3)
  }

  test("HostTelemetry samples /proc/stat and emits monotone tick deltas") {
    val before = graft.tools.HostTelemetry.cpuTicks()
    assert(before.contains("steal") && before.contains("iowait"), before)
    // burn a little CPU so the delta is visibly positive
    var x = 0L
    (0 until 20000000).foreach(i => x += i)
    assert(x > 0)
    val json = graft.tools.HostTelemetry.deltaJson(
      before, graft.tools.HostTelemetry.cpuTicks())
    assert(json.contains("\"steal_ticks\":") && json.contains("\"iowait_ticks\":"), json)
    val total = "\"total_ticks\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toLong)
    assert(total.exists(_ >= 0), json)
  }
}
