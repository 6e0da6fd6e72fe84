package graft

import graft.ops.Quality
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def frame() = Seq(
    (1L, Some("a"), Some(1.0)),
    (2L, None, Some(2.0)),
    (3L, Some("c"), None),
    (4L, Some("d"), None)
  ).toDF("id", "s", "v")

  test("observed metrics ride the action: row count + per-column null counts") {
    val (obs, ob) = Quality.observed(frame(), "m", Seq("s", "v"))
    assert(obs.count() == 4)
    val m = ob.get
    assert(m("n_rows").asInstanceOf[Long] == 4)
    assert(m("nulls_s").asInstanceOf[Long] == 1)
    assert(m("nulls_v").asInstanceOf[Long] == 2)
  }

  test("gate passes under the threshold and names the offending column above it") {
    val (n, m) = Quality.gate(frame(), "ok", Seq("s"), maxNullFraction = 0.5)
    assert(n == 4 && m("nulls_s").asInstanceOf[Long] == 1)
    val ex = intercept[IllegalStateException] {
      Quality.gate(frame(), "bad", Seq("v"), maxNullFraction = 0.25)
    }
    assert(ex.getMessage.contains("column v"))
  }

  test("profile: one row per column with counts, distincts, numeric bounds") {
    val p = Quality.profile(frame(), Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
          Option(r.getAs[java.lang.Double]("min_num")),
          Option(r.getAs[java.lang.Double]("max_num")))).toMap
    assert(p("id") == ((4L, 0L, 4L, Some(1.0), Some(4.0))))
    assert(p("v") == ((4L, 2L, 2L, Some(1.0), Some(2.0))))
    // string column: nulls/distincts counted, numeric bounds NULL
    assert(p("s") == ((4L, 1L, 3L, None, None)))
  }

  test("heavyHitters: per-column top-k with value tie-break, one stacked pass") {
    import spark.implicits._
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 1), ("c", 9)
    ).toDF("s", "v")
    val hh = Quality.heavyHitters(df, Seq("s", "v"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val bySCol = hh.filter(_._1 == "s").sortBy(_._4)
    assert(bySCol.map(t => (t._2, t._3)).toSeq == Seq(("a", 3L), ("b", 2L)))
    val byVCol = hh.filter(_._1 == "v").sortBy(_._4)
    // counts: 1->3, 2->1, 3->1, 9->1 -- rank 2 tie broken by value string asc
    assert(byVCol.map(t => (t._2, t._3)).toSeq == Seq(("1", 3L), ("2", 1L)))
  }

  test("heavyHitters: quote/backtick column names survive (typed pivot, no SQL splice)") {
    import spark.implicits._
    val df = Seq(1, 1, 2).toDF("x")
      .withColumnRenamed("x", "it's `odd`")
    val hh = Quality.heavyHitters(df, Seq("it's `odd`"), k = 1).collect()
    assert(hh.length == 1)
    assert(hh.head.getString(0) == "it's `odd`" && hh.head.getString(1) == "1"
      && hh.head.getLong(2) == 2L)
  }

  test("histogram: clamped top edge, out-of-range dropped, edges exact") {
    import spark.implicits._
    val df = Seq(0.0, 5.0, 10.0, 15.0, 20.0, 25.0).toDF("x") // hi = 20 closed
    val h = Quality.histogram(df, "x", nBins = 4, lo = 0.0, hi = 20.0)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(h(0) == ((0.0, 5.0, 1L)))   // 0.0
    assert(h(1) == ((5.0, 10.0, 1L)))  // 5.0
    assert(h(2) == ((10.0, 15.0, 1L))) // 10.0
    assert(h(3) == ((15.0, 20.0, 2L))) // 15.0 and the clamped 20.0
    assert(!h.contains(4)) // 25.0 dropped
  }
}
