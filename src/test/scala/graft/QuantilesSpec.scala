package graft

import graft.operators.{LangModel, Quantiles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("kthSmallest: exact at every rank, duplicates included, on both paths") {
    // deterministic values with heavy ties (v = i*7 % 13) — selection must
    // count duplicates, not distinct values
    val vals = (0 until 400).map(i => (i.toLong * 7) % 13)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(7).cache()
    val sorted = vals.sorted
    val n = vals.length.toLong
    for (k <- Seq(1L, 2L, 99L, 100L, 101L, 200L, 399L, 400L)) {
      // top-k shortcut path (default smallRegion covers everything)
      assert(Quantiles.kthSmallest(df, "v", k, n) == sorted((k - 1).toInt),
        s"shortcut path, k=$k")
      // iterative pivot path (smallRegion=1 forces the guard loop to land
      // every rank itself)
      assert(Quantiles.kthSmallest(df, "v", k, n, smallRegion = 1) ==
        sorted((k - 1).toInt), s"iterative path, k=$k")
    }
    df.unpersist()
  }

  test("kthSmallest: doubles with a skewed distribution, iterative path") {
    val vals = (0 until 300).map(i => math.pow(1.03, i % 97) * ((i % 5) + 1))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(5).cache()
    val sorted = vals.sorted
    for (k <- Seq(1, 75, 150, 225, 300))
      assert(Quantiles.kthSmallest(df, "v", k, 300, smallRegion = 1) ==
        sorted(k - 1), s"k=$k")
    df.unpersist()
  }

  test("kthPair: the composite (value, tie) boundary is exact under heavy ties") {
    val rows = (0 until 240).map(i => (i.toLong, (i % 3).toDouble)) // 80-way ties
    val df = rows.toDF("id", "v").repartition(6).cache()
    val sorted = rows.map { case (id, v) => (v, id) }.sorted
    for (k <- Seq(1, 79, 80, 81, 120, 240)) {
      val (v, t) = Quantiles.kthPair(df, "v", "id", k, 240)
      assert((v, t) == (sorted(k - 1)._1, sorted(k - 1)._2), s"k=$k")
      // the defining property: exactly k rows at-or-below the boundary
      assert(df.filter(col("v") < lit(v) ||
        (col("v") === lit(v) && col("id") <= lit(t))).count() == k)
    }
    df.unpersist()
  }

  test("qualityWeakLabels: threshold filters reproduce the exact ntile(4) tiles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaFilters = LangModel.qualityWeakLabels(docs, "doc_id", "text")
      .select(col("doc_id"), col("qlabel"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the replaced formulation, verbatim — global window ntile
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("quality"), col("doc_id"))
    val viaNtile = docs
      .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
      .withColumn("qt", ntile(4).over(w))
      .filter(col("qt") === 1 || col("qt") === 4)
      .select(col("doc_id"),
        when(col("qt") === 4, lit("hi")).otherwise(lit("lo")).as("qlabel"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaFilters == viaNtile)
  }

  test("qualityWeakLabels: tie-heavy corpus (every quality duplicated) still matches ntile") {
    // 8 distinct texts × 25 copies → massive (quality) ties; the id
    // tie-break decides every tile boundary
    val texts = Seq("good clean prose here", "short", "1234 5678 90",
      "!!! ??? ...", "a longer document with many proper words in it",
      "mixed 12 words !", "x", "the quick brown fox jumps over the dog")
    val docs = (0 until 200).map(i => (i.toLong, texts(i % 8))).toDF("doc_id", "text")
      .repartition(8)
    val viaFilters = LangModel.qualityWeakLabels(docs, "doc_id", "text")
      .select(col("doc_id"), col("qlabel"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("quality"), col("doc_id"))
    val viaNtile = docs
      .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
      .withColumn("qt", ntile(4).over(w))
      .filter(col("qt") === 1 || col("qt") === 4)
      .select(col("doc_id"),
        when(col("qt") === 4, lit("hi")).otherwise(lit("lo")).as("qlabel"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaFilters == viaNtile)
  }

  test("qualityWeakLabels: no WindowExec anywhere in the labeling plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = LangModel.qualityWeakLabels(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"labeling plan still sorts globally:\n$plan")
  }

  test("qualityWeakLabels: tiny corpora hit the ntile edge sizes (n < 4)") {
    for (n <- 1 to 5) {
      val docs = (0 until n).map(i => (i.toLong, s"text number $i with words"))
        .toDF("doc_id", "text")
      val got = LangModel.qualityWeakLabels(docs, "doc_id", "text")
        .select(col("doc_id"), col("qlabel"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("quality"), col("doc_id"))
      val want = docs
        .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
        .withColumn("qt", ntile(4).over(w))
        .filter(col("qt") === 1 || col("qt") === 4)
        .select(col("doc_id"),
          when(col("qt") === 4, lit("hi")).otherwise(lit("lo")).as("qlabel"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want, s"n=$n")
    }
  }
}
