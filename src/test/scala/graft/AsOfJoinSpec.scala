package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val left = Seq(
    (1L, "u1", 100L),
    (2L, "u1", 205L),
    (3L, "u1", 50L),  // before any right row → no match
    (4L, "u2", 300L)  // key with no right rows at all
  ).toDF("id", "user", "ts")

  private val right = Seq(
    ("u1", 100L, 10L, "a"), // equal ts → inclusive match for left id=1
    ("u1", 200L, 20L, "b"),
    ("u1", 210L, 30L, "c")  // after left id=2 → not matched
  ).toDF("user", "rts", "rid", "tag")

  test("backward inclusive match, per-key, nulls when nothing precedes") {
    val out = AsOfJoin.asof(left, right, "user", "ts", "rts", Seq("rid", "tag"))
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.get(r.fieldIndex("rid_asof"))), Option(r.get(r.fieldIndex("tag_asof"))))).toMap
    assert(out(1L) == (Some(10L), Some("a"))) // equal-ts inclusive
    assert(out(2L) == (Some(20L), Some("b"))) // latest ≤ 205
    assert(out(3L) == (None, None))           // nothing at/before 50
    assert(out(4L) == (None, None))           // key absent on right
  }

  test("duplicate right timestamps: greatest tieBreak survives") {
    val dupRight = Seq(("u1", 100L, 1L, "low"), ("u1", 100L, 9L, "high"))
      .toDF("user", "rts", "rid", "tag")
    val out = AsOfJoin.asof(left.filter($"id" === 1), dupRight, "user", "ts", "rts",
      Seq("rid", "tag"), tieBreak = Some("rid")).head()
    assert(out.getAs[String]("tag_asof") == "high")
  }

  test("forward direction: first right row at-or-after, nulls when nothing follows") {
    val out = AsOfJoin.asof(left, right, "user", "ts", "rts", Seq("rid", "tag"),
      direction = "forward")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.get(r.fieldIndex("rid_asof")))).toMap
    assert(out(1L) == Some(10L)) // equal-ts inclusive (rts=100)
    assert(out(2L) == Some(30L)) // earliest ≥ 205 is rts=210
    assert(out(3L) == Some(10L)) // earliest ≥ 50 is rts=100
    assert(out(4L) == None)      // key absent on right
  }

  test("value columns stay atomic: all come from the same matched row") {
    val rightWithNull = Seq(("u1", 100L, 10L, null.asInstanceOf[String]), ("u1", 90L, 5L, "old"))
      .toDF("user", "rts", "rid", "tag")
    val out = AsOfJoin.asof(left.filter($"id" === 1), rightWithNull, "user", "ts", "rts",
      Seq("rid", "tag")).head()
    // the ts=100 row matches; its null tag must NOT fall back to the ts=90 row
    assert(out.getAs[Long]("rid_asof") == 10L)
    assert(out.isNullAt(out.fieldIndex("tag_asof")))
  }
}
