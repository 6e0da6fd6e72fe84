package graft

import graft.io.IcebergTransforms
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Iceberg partition-transform math is pinned by the SPEC'S OWN
  * published test vectors (iceberg.apache.org/spec/ Appendix B —
  * "32-bit Hash Requirements" table), so bucket pruning agrees with
  * what a real Iceberg writer computed, independent of the fixture
  * that exercises it. */
class IcebergTransformsSpec extends AnyFunSuite {
  import IcebergTransforms._

  test("murmur3 matches the spec's published bucket hash vectors") {
    // int/long 34 hash identically (ints upcast to 8-byte LE long)
    assert(hashLong(34L) == 2017239379)
    // string "iceberg" hashes its UTF-8 bytes
    assert(hashString("iceberg") == 1210000089)
    // date 2017-11-16 = 17486 epoch days, hashed as a long
    assert(hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 epoch micros
    assert(hashLong(1510871468000000L) == -2047944441)
    // time 22:31:08 = 81068000000 micros-of-day
    assert(hashLong(81068000000L) == -662762989)
  }

  test("bucket ordinal = (hash & Int.MaxValue) % N") {
    assert(bucketOfLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    assert(bucketOfString("iceberg", 16) == (1210000089 & Int.MaxValue) % 16)
    // negative hash: the & clears the sign bit, never Math.abs
    assert(bucketOfLong(17486L, 100) == ((-653330422) & Int.MaxValue) % 100)
    assert(bucketOfLong(17486L, 100) >= 0)
  }

  test("temporal transforms: micros and epoch-day sources") {
    val micros = 1510871468000000L // 2017-11-16T22:31:08Z
    assert(eval("day", TimestampType, micros) == Some(17486))
    assert(eval("hour", TimestampType, micros) == Some((micros / 3600000000L).toInt))
    assert(eval("month", TimestampType, micros) == Some((2017 - 1970) * 12 + 10))
    assert(eval("year", TimestampType, micros) == Some(47))
    // DateType sources are already epoch days
    assert(eval("day", DateType, 17486L) == Some(17486))
    assert(eval("month", DateType, 17486L) == Some((2017 - 1970) * 12 + 10))
    // pre-epoch floors toward -inf (1969-12-31T23:00 is day -1)
    assert(eval("day", TimestampType, -3600000000L) == Some(-1))
  }

  test("truncate: numeric floor-to-width, string code-point prefix") {
    assert(eval("truncate[10]", LongType, 37L) == Some(30L))
    assert(eval("truncate[10]", LongType, -3L) == Some(-10L)) // floor, not toward 0
    assert(eval("truncate[10]", IntegerType, 37L) == Some(30))
    assert(eval("truncate[3]", StringType, "iceberg") == Some("ice"))
    assert(eval("truncate[10]", StringType, "ice") == Some("ice"))
  }

  test("mapRange: monotone transforms map endpoints; bucket maps only points") {
    val d0 = 17486L * 86400000000L // start of day 17486
    assert(mapRange("day", TimestampType, d0.toDouble, (d0 + 1).toDouble) ==
      Some((17486.0, 17486.0)))
    // a range spanning a day boundary widens to both days
    assert(mapRange("day", TimestampType, (d0 - 1).toDouble, d0.toDouble) ==
      Some((17485.0, 17486.0)))
    assert(mapRange("truncate[100]", LongType, 250.0, 260.0) ==
      Some((200.0, 200.0)))
    val b = bucketOfLong(42L, 8).toDouble
    assert(mapRange("bucket[8]", LongType, 42.0, 42.0) == Some((b, b)))
    // non-point bucket range: order destroyed, no evidence
    assert(mapRange("bucket[8]", LongType, 42.0, 43.0).isEmpty)
    // unknown transform: no evidence
    assert(mapRange("zorder", LongType, 1.0, 2.0).isEmpty)
  }

  test("mapStringEq: identity bytes, truncate prefix, bucket ordinal") {
    assert(mapStringEq("identity", "en").map {
      case Right(b) => new String(b, "UTF-8"); case _ => ""
    } == Some("en"))
    assert(mapStringEq("truncate[2]", "english").map {
      case Right(b) => new String(b, "UTF-8"); case _ => ""
    } == Some("en"))
    assert(mapStringEq("bucket[16]", "iceberg") ==
      Some(Left((1210000089 & Int.MaxValue) % 16)))
    assert(mapStringEq("year", "2020").isEmpty)
  }
}
