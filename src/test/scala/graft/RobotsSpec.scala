package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val robots =
    """# corpus policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow: /tmp
      |Disallow:
      |
      |User-agent: graftbot
      |Disallow: /docs/
      |""".stripMargin

  private def rules() =
    Robots.parseRules(Seq(("h1", robots)).toDF("host", "txt"), "txt", "host")

  test("parse: groups attribute, comments and empty Disallow drop") {
    val r = rules().orderBy("rule_idx")
      .select("agent", "is_allow", "rule_path")
      .as[(String, Int, String)].collect().toSeq
    assert(r == Seq(
      ("*", 0, "/private/"),
      ("*", 1, "/private/pub/"),
      ("*", 0, "/tmp"),
      ("graftbot", 0, "/docs/")))
  }

  test("evaluate: longest match wins, allow beats disallow ties, no match allows") {
    val urls = Seq(
      (1L, "h1", "/docs/x"),        // * group: no rule → allowed
      (2L, "h1", "/private/x"),     // Disallow /private/ → denied
      (3L, "h1", "/private/pub/x"), // Allow (longer) overrides → allowed
      (4L, "h1", "/tmp123"),        // prefix match on /tmp → denied
      (5L, "h2", "/private/x")      // host with NO robots → allowed
    ).toDF("id", "host", "path")
    val got = Robots.evaluate(urls, rules(), "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    assert(got == Seq(1, 0, 1, 0, 1))
    // the specific agent's own group REPLACES * where declared
    val bot = Robots.evaluate(urls, rules(), "host", "path", agent = "graftbot")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    assert(bot == Seq(0, 1, 1, 1, 1),
      "graftbot: /docs denied by its group; * rules no longer apply")
  }

  test("allow/disallow tie at equal length: allow wins (RFC 9309)") {
    val tied = Robots.parseRules(Seq(("h",
      "User-agent: *\nDisallow: /a/\nAllow: /b/")).toDF("host", "txt"),
      "txt", "host")
    val urls = Seq((1L, "h", "/a/x"), (2L, "h", "/b/x")).toDF("id", "host", "path")
    // construct a genuine tie: same path covered by equal-length rules
    val both = Robots.parseRules(Seq(("h",
      "User-agent: *\nDisallow: /p/\nAllow: /p/")).toDF("host", "txt"),
      "txt", "host")
    val t = Robots.evaluate(Seq((1L, "h", "/p/x")).toDF("id", "host", "path"),
      both, "host", "path").select("is_allowed").as[Int].head()
    assert(t == 1, "equal-length allow wins the tie")
    assert(Robots.evaluate(urls, tied, "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq == Seq(0, 1))
  }
}
