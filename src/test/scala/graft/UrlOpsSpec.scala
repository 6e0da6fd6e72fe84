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

  test("dot-segments remove per RFC 3986 §5.2.4") {
    assert(norm("http://h/a/./b/../c") == "http://h/a/c")
    assert(norm("http://h/./x") == "http://h/x")
    // excess .. never climbs past the root
    assert(norm("http://h/../../x") == "http://h/x")
    assert(norm("http://h/a/..") == "http://h/")
    // a trailing /. or /.. keeps the directory slash
    assert(norm("http://h/a/b/.") == "http://h/a/b/")
    assert(norm("http://h/a/b/..") == "http://h/a/")
    // empty segments are NOT collapsed (the RFC doesn't)
    assert(norm("http://h//a") == "http://h//a")
    // dots inside a segment name are not dot-segments
    assert(norm("http://h/a.b/c..d") == "http://h/a.b/c..d")
    // query untouched by path rules
    assert(norm("http://h/a/./b?q=/x/./y") == "http://h/a/b?q=/x/./y")
  }

  test("percent-encoding normalizes per RFC 3986 §6.2.2.1-2") {
    // unreserved octets decode: %7E → ~, %41 → A, %2D → -, lowercase hex too
    assert(norm("http://h/%7Euser") == "http://h/~user")
    assert(norm("http://h/%7euser") == "http://h/~user")
    assert(norm("http://h/a%41%2Db%2Ec%5Fd") == "http://h/aA-b.c_d")
    // reserved octets STAY encoded, hex uppercased (%2f would change the
    // path structure if decoded)
    assert(norm("http://h/a%2fb") == "http://h/a%2Fb")
    assert(norm("http://h/a%3Fb?x=1") == "http://h/a%3Fb?x=1")
    // malformed % passes through untouched
    assert(norm("http://h/100%25done") == "http://h/100%25done")
    assert(norm("http://h/50%") == "http://h/50%")
    assert(norm("http://h/x%G1y") == "http://h/x%G1y")
    // in the query too
    assert(norm("http://h/p?x=%7e&y=%2f") == "http://h/p?x=~&y=%2F")
    // the three spellings of one path collapse
    assert(Seq("http://h/%7Eu/./a", "http://h/~u/a", "http://h/%7eu/b/../a")
      .map(norm).distinct == List("http://h/~u/a"))
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
