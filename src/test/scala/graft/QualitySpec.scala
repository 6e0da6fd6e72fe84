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
}
