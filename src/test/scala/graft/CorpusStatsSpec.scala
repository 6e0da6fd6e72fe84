package graft

import graft.operators.CorpusStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the corpus-statistics operators (the qNN
  * oracle gate covers them at scale; these pin the formulas on inputs
  * small enough to verify by eye). */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("tfidfTopTerms: raw-ratio idf ranks rare terms above common ones") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana banana")
    ).toDF("doc_id", "text")
    val top = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("score"))).toMap
    // doc 1: apple tf=2 df=1 → 2*3/1=6.0 beats banana 1*3/3=1.0
    assert(top(1L) == ("apple", 2L, 1L, 6.0))
    // doc 2: cherry 1*3/1=3.0 beats banana 1.0
    assert(top(2L) == ("cherry", 1L, 1L, 3.0))
    // doc 3: only banana, tf=3 → 3*3/3=3.0
    assert(top(3L) == ("banana", 3L, 3L, 3.0))
  }

  test("withRepetition: repeated trigrams raise rep_frac; short docs are 0") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 trigrams, 3 distinct → 4/7 repeats
      (2L, "one two three four"), // 2 trigrams, both distinct → 0.0
      (3L, "tiny doc"),           // < 3 tokens → total 0 → 0.0
      (4L, "")
    ).toDF("doc_id", "text")
    val r = CorpusStats.withRepetition(docs, "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("total_ngrams"), x.getAs[Int]("distinct_ngrams"),
          x.getAs[Double]("rep_frac"))).toMap
    assert(r(1L) == ((7, 3, 1.0 - 3.0 / 7)))
    assert(r(2L) == ((2, 2, 0.0)))
    assert(r(3L) == ((0, 0, 0.0)))
    assert(r(4L) == ((0, 0, 0.0)))
  }

  test("contaminationCounts: only docs sharing eval trigrams report, counted distinct") {
    val train = Seq(
      (10L, "the quick brown fox jumps"), // shares "the quick brown" + "quick brown fox"
      (11L, "totally unrelated text here"),
      (12L, "the quick brown fox jumps over") // superset → same 2 shared + more
    ).toDF("doc_id", "text")
    val eval = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val out = CorpusStats.contaminationCounts(train, eval, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(out == Map(10L -> 2L, 12L -> 2L)) // doc 11 absent: clean
  }
}
