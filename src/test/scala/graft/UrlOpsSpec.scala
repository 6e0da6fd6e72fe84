package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(UrlOps.normalizeUrl(col("u"))).as[String].head()

  test("RFC 3986 normalization: case, default ports, fragments, query order") {
    assert(norm("HTTP://Graft.TEST:80/docs/1?b=2&a=1#frag") ==
      "http://graft.test/docs/1?a=1&b=2")
    assert(norm("https://Host.Example:443/x") == "https://host.example/x")
    // non-default port survives; other schemes keep their port
    assert(norm("http://h:8080/p") == "http://h:8080/p")
    assert(norm("ftp://H:21/f") == "ftp://h:21/f")
    // empty path becomes /, query attaches to it
    assert(norm("http://h") == "http://h/")
    assert(norm("http://h?b=2&a=1") == "http://h/?a=1&b=2")
    // bare ? (empty query) drops
    assert(norm("http://h/p?") == "http://h/p")
    // path case is significant and survives
    assert(norm("http://h/CaseSensitive/Path") == "http://h/CaseSensitive/Path")
  }

  test("relative references pass through; dedup collapses variants") {
    assert(norm("/relative/path?b=1") == "/relative/path?b=1")
    val variants = Seq(
      (1, "HTTP://A.test:80/p?y=2&x=1#top"),
      (2, "http://a.test/p?x=1&y=2"),
      (3, "http://a.test/other")).toDF("v", "u")
    val canon = variants.select(col("v"), UrlOps.normalizeUrl(col("u")).as("c"))
    assert(canon.select("c").distinct().count() == 2,
      "the two spellings of one page collapse to one canonical URL")
  }
}
