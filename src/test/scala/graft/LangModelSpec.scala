package graft

import graft.operators.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("charNgrams: positional trigrams of the normalized text; short docs empty") {
    val df = Seq((1L, "AbC  d"), (2L, "ab"), (3L, "")).toDF("id", "text")
      .select(col("id"), LangModel.charNgrams(col("text"), 3).as("g"))
    val g = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L) == Seq("abc", "bc ", "c d")) // lowercased, ws collapsed
    assert(g(2L).isEmpty && g(3L).isEmpty)
  }

  test("trainPredict: planted distinct character distributions classify correctly") {
    // two 'languages' with disjoint alphabets + one ambiguous-but-closer doc
    val docs = Seq(
      (1L, "aaa bbb aab aba bab", "aa"),
      (2L, "aba bba aab abb bba", "aa"),
      (3L, "xxx yyy xxy xyx yxy", "xx"),
      (4L, "xyy yyx xxy yxx xyy", "xx"),
      (5L, "aab aba baa abb bab", "aa")
    ).toDF("doc_id", "text", "lang")
    val out = LangModel.trainPredict(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "aa", 2L -> "aa", 3L -> "xx", 4L -> "xx", 5L -> "aa"))
  }

  test("predict on UNSEEN docs: smoothing handles novel grams; gram-less docs fall to the prior") {
    val train = Seq(
      (1L, "aaa bbb aab aba bab aaa bba", "aa"),
      (2L, "xxx yyy xxy xyx yxy xyy yyx", "xx"),
      (3L, "abb bab aba baa abab ab", "aa") // 'aa' has the larger prior: 2 docs vs 1
    ).toDF("doc_id", "text", "lang")
    val model = LangModel.train(train, "text", "lang")
    assert(model.langs == Seq("aa", "xx"))
    val unseen = Seq((10L, "aba qqq bab"), (11L, "yxy zzz xyx"), (12L, "z")).toDF("doc_id", "text")
    val out = LangModel.predict(unseen, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(10L) == "aa") // novel 'qqq' smoothed, known grams decide
    assert(out(11L) == "xx")
    assert(out(12L) == "aa") // no trigrams at all → argmax prior = 'aa'
  }

  test("predict ≡ predictJoined: broadcast-fold scoring lands the join formulation's answers") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = LangModel.train(docs, "text", "lang")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val fold = rows(LangModel.predict(docs, "doc_id", "text", model))
    val joined = rows(LangModel.predictJoined(docs, "doc_id", "text", model))
    assert(fold == joined && fold.size == docs.count())
    // and the fold path is pure map-side: no exchange before the output
    val plan = LangModel.predict(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast-fold scoring must not shuffle:\n$plan")
  }

  test("train: two driver actions — labels+priors ride one groupBy, not three passes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.count() // warm the file listing outside the window
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        actions.add(funcName + "::" + qe.logical.nodeName)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val m = LangModel.train(docs, "text", "lang")
      Thread.sleep(1000) // listener delivery is async
      assert(m.langs.nonEmpty)
      // exactly two driver COLLECTS: the groupBy(label) pass (labels +
      // doc counts together) and the vocab-capped count-table pass — the
      // separate distinct-labels collect is gone. (The remaining listener
      // entry is Parallelism.ensure's rdd-conversion probe, not a scan.)
      val collects = actions.toArray.map(_.toString).filter(_.startsWith("collect"))
      assert(collects.length == 2,
        s"training ran ${collects.length} driver collects — expected exactly 2: " +
          String.join(", ", actions))
    } finally spark.listenerManager.unregister(listener)
  }

  test("train: null labels are rejected with a clear error") {
    val docs = Seq((1L, "some text", "en"), (2L, "mehr text", null))
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      LangModel.train(docs, "text", "lang")
    }
    assert(e.getMessage.contains("null labels"))
  }

  test("trainHashed: wide buckets reproduce the exact model's predictions; narrow buckets bound vocab") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = LangModel.train(docs, "text", "lang")
    // 2^22 buckets over a ~30k-gram universe: collisions vanish, the
    // hashed model must land every prediction of the exact one
    val wide = LangModel.trainHashed(docs, "text", "lang", hashBits = 22)
    assert(wide.vocab == exact.vocab, "a 4M-bucket space collided on a 30k vocab")
    def preds(m: LangModel.NbLangModel) =
      LangModel.predict(docs, "doc_id", "text", m)
        .select("id", "pred_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(wide) == preds(exact))
    // the memory bound is REAL: an 8-bit space caps vocab at 256 no
    // matter the corpus, and scoring still runs end-to-end
    val narrow = LangModel.trainHashed(docs, "text", "lang", hashBits = 8)
    assert(narrow.vocab <= 256)
    assert(LangModel.predict(docs, "doc_id", "text", narrow).count() == docs.count())
    // hashed models are deterministic (content-addressed buckets)
    val again = LangModel.trainHashed(docs, "text", "lang", hashBits = 8)
    assert(again.counts.view.mapValues(_.toSeq).toMap ==
      narrow.counts.view.mapValues(_.toSeq).toMap)
    // monoid fold respects the bucket space
    val e = intercept[IllegalArgumentException] {
      LangModel.merge(narrow, wide)
    }
    assert(e.getMessage.contains("hash widths differ"))
  }

  test("merge: sharded training folds to the full-corpus model exactly (monoid state)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val full = LangModel.train(docs, "text", "lang")
    val merged = LangModel.merge(
      LangModel.train(a, "text", "lang"), LangModel.train(b, "text", "lang"))
    assert(merged.langs == full.langs)
    assert(merged.docCounts == full.docCounts)
    assert(merged.gramTotals == full.gramTotals)
    assert(merged.vocab == full.vocab)
    assert(merged.counts.view.mapValues(_.toSeq).toMap ==
      full.counts.view.mapValues(_.toSeq).toMap)
    // and therefore identical predictions
    def rows(m: LangModel.NbLangModel) =
      LangModel.predict(docs, "doc_id", "text", m).collect().map(_.toSeq).toSet
    assert(rows(merged) == rows(full))
  }

  test("NbStream model persistence: write/read round-trips the model bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-model").toString
    for (m <- Seq(LangModel.train(docs, "text", "lang"),
      LangModel.trainHashed(docs, "text", "lang", hashBits = 10))) {
      val d = s"$dir/m${m.hashBits}"
      graft.streaming.NbStream.writeModel(spark, m, d)
      val back = graft.streaming.NbStream.readModel(spark, d)
      assert(back.langs == m.langs && back.docCounts == m.docCounts &&
        back.gramTotals == m.gramTotals && back.vocab == m.vocab &&
        back.n == m.n && back.hashBits == m.hashBits)
      assert(back.counts.view.mapValues(_.toSeq).toMap ==
        m.counts.view.mapValues(_.toSeq).toMap)
    }
  }

  test("qualityWeakLabels: sampled ranking bounds the window input; labels stay quartile-shaped") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val full = LangModel.qualityWeakLabels(docs, "doc_id", "text")
    // quartile shape: |hi| + |lo| = half the corpus (±ntile remainder)
    assert(math.abs(full.count() - n / 2) <= 2)
    assert(full.select("qlabel").distinct().collect().map(_.getString(0)).toSet == Set("hi", "lo"))
    // the scale path: rank only a deterministic 40% hash sample — the
    // window input shrinks, the labels still train a usable model
    val sampled = LangModel.qualityWeakLabels(docs, "doc_id", "text", sampleBp = 4000)
    val sn = sampled.count()
    assert(sn < full.count() && sn > 0)
    // deterministic: same sample, same labels, every run
    assert(LangModel.qualityWeakLabels(docs, "doc_id", "text", sampleBp = 4000)
      .collect().map(_.toSeq).toSet == sampled.collect().map(_.toSeq).toSet)
    val model = LangModel.train(sampled.withColumnRenamed("qlabel", "lab"), "text", "lab")
    assert(model.langs == Seq("hi", "lo"))
    assert(LangModel.predict(docs, "doc_id", "text", model).count() == n)
  }
}
