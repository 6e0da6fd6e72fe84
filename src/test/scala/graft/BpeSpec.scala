package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("mergeOnce: greedy left-to-right, non-overlapping, equal-pair runs") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")),   // two disjoint (a,b)
      (2L, Seq("x", "x", "x")),        // run of 3: merge 1-2, keep 3
      (3L, Seq("x", "x", "x", "x")),   // run of 4: two merges
      (4L, Seq("a", "a", "b"))         // (a,b) at pos 2 only
    ).toDF("id", "syms")
    val ab = df.withColumn("m", Bpe.mergeOnce(col("syms"), "a", "b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    assert(ab(1L) == Seq("ab", "ab"))
    assert(ab(4L) == Seq("a", "ab"))
    val xx = df.withColumn("m", Bpe.mergeOnce(col("syms"), "x", "x"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    assert(xx(2L) == Seq("xx", "x"))
    assert(xx(3L) == Seq("xx", "xx"))
  }

  test("train: learns the planted most-frequent pair first, ties break lexicographically") {
    // 'ab' appears in every word (weighted 3+2+1 = 6 occurrences of (a,b));
    // next best after the first merge is (ab, c) from the two 'abc' words
    val docs = Seq(
      (1L, "abc abc abd"),
      (2L, "abc abd"),
      (3L, "abd zz")
    ).toDF("doc_id", "text")
    val (model, words) = Bpe.train(docs, "doc_id", "text", numMerges = 3)
    assert(model.merges.head == (("a", "b")))
    // after merge 1 every word starts with symbol 'ab'; pair counts:
    // (ab,c) = 3, (ab,d) = 3, (z,z) = 1 → tie broken on rhs: c < d
    assert(model.merges(1) == (("ab", "c")))
    assert(model.merges(2) == (("ab", "d")))
    val seg = words.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms"))).toMap
    assert(seg("abc") == Seq("abc") && seg("abd") == Seq("abd"))
    assert(seg("zz") == Seq("z", "z"))
  }

  test("segment applies the trained merges in order; tokenCounts joins the vocab") {
    val docs = Seq((1L, "abc abc abd"), (2L, "abc abd"), (3L, "abd zz")).toDF("doc_id", "text")
    val (model, words) = Bpe.train(docs, "doc_id", "text", numMerges = 2)
    // fresh words re-segmented from chars must equal the trained table
    val fresh = Bpe.charWords(Bpe.wordCounts(docs, "doc_id", "text"))
      .withColumn("syms", Bpe.segment(col("syms"), model))
      .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms"))).toMap
    val trained = words.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms"))).toMap
    assert(fresh == trained)
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", words)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // after 2 merges: abc → [abc] (1 piece), abd → [ab, d] (2), zz → [z, z] (2)
    assert(counts(1L) == ((3L, 4L))) // abc + abc + abd = 1 + 1 + 2
    assert(counts(3L) == ((2L, 4L))) // abd + zz = 2 + 2
  }

  test("train ≡ trainIterative: driver-incremental and distributed loops land the same model") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (fast, fastWords) = Bpe.train(docs, "doc_id", "text", numMerges = 12)
    val (slow, slowWords) = Bpe.trainIterative(docs, "doc_id", "text", numMerges = 12)
    assert(fast.merges == slow.merges)
    assert(fast.merges.length == 12)
    def seg(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getSeq[String](r.fieldIndex("syms")))).toSet
    assert(seg(fastWords) == seg(slowWords))
  }

  test("train: ≥256 merges cost a bounded handful of Spark jobs, not one per merge") {
    // synthetic wide-vocab corpus (sf0.001's vocabulary exhausts at ~89
    // merges); deterministic, no RNG
    val docs = spark.createDataFrame((0 until 400).map { i =>
      (i.toLong, (0 until 6).map(j => s"w${(i * 31 + j * 7) % 1000}q${i % 17}").mkString(" "))
    }).toDF("doc_id", "text")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (model, _) = Bpe.train(docs, "doc_id", "text", numMerges = 256)
      Thread.sleep(1000) // listener delivery is async; jobs have all started

      assert(model.merges.length == 256, s"corpus exhausted at ${model.merges.length} merges")
      assert(jobs <= 20, s"training scheduled $jobs Spark jobs — the per-merge round-trip is back")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("tokenCounts: out-of-vocabulary words fall back to character count, never drop") {
    val trainDocs = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    val (_, words) = Bpe.train(trainDocs, "doc_id", "text", numMerges = 2)
    // 'zz' and 'qqqq' were never seen in training
    val unseen = Seq((9L, "abc zz qqqq")).toDF("doc_id", "text")
    val counts = Bpe.tokenCounts(unseen, "doc_id", "text", words)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // abc → 1 trained piece; zz → 2 chars; qqqq → 4 chars; all 3 words counted
    assert(counts(9L) == ((3L, 7L)))
  }
}
