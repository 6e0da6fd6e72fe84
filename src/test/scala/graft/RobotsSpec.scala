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

  test("parse: groups attribute, comments drop, empty Disallow is a no-op allow") {
    val r = rules().orderBy("rule_idx")
      .select("agent", "is_allow", "rule_path")
      .as[(String, Int, String)].collect().toSeq
    assert(r == Seq(
      ("*", 0, "/private/"),
      ("*", 1, "/private/pub/"),
      ("*", 0, "/tmp"),
      ("*", 1, ""), // empty Disallow: zero-length allow, never outranks
      ("graftbot", 0, "/docs/")))
  }

  test("an empty-Disallow group still claims its agent (permissive override)") {
    val txt = "User-agent: *\nDisallow: /\n\nUser-agent: nicebot\nDisallow:\n"
    val r = Robots.parseRules(Seq(("h", txt)).toDF("host", "txt"), "txt", "host")
    val urls = Seq((1L, "h", "/x"), (2L, "h", "/")).toDF("id", "host", "path")
    assert(Robots.evaluate(urls, r, "host", "path", agent = "nicebot")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq == Seq(1, 1),
      "nicebot's own no-restriction group replaces *'s deny-all")
    assert(Robots.evaluate(urls, r, "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq == Seq(0, 0))
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

  test("wildcards: * and trailing $ match per RFC 9309 §2.2.3") {
    // RFC/Google reference cases: /*.htm (6 octets) outranks /page (5);
    // /$ allows exactly the root while / disallows everything else.
    val r1 = Robots.parseRules(Seq(("h",
      "User-agent: *\nAllow: /page\nDisallow: /*.htm")).toDF("host", "txt"),
      "txt", "host")
    val g1 = Robots.evaluate(Seq(
      (1L, "h", "/page"),      // only /page matches → allowed
      (2L, "h", "/page.htm"),  // both match; /*.htm longer → denied
      (3L, "h", "/x/a.htm")    // wildcard spans directories → denied
    ).toDF("id", "host", "path"), r1, "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    assert(g1 == Seq(1, 0, 0))

    val r2 = Robots.parseRules(Seq(("h",
      "User-agent: *\nAllow: /$\nDisallow: /")).toDF("host", "txt"),
      "txt", "host")
    val g2 = Robots.evaluate(Seq(
      (1L, "h", "/"),          // /$ anchors: root allowed (2 > 1 octets)
      (2L, "h", "/page")       // $ prevents the allow → denied
    ).toDF("id", "host", "path"), r2, "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    assert(g2 == Seq(1, 0))

    // /*? matches any URL containing a query; $ mid-pattern is literal
    val r3 = Robots.parseRules(Seq(("h",
      "User-agent: *\nDisallow: /*?\nDisallow: /a$b")).toDF("host", "txt"),
      "txt", "host")
    val g3 = Robots.evaluate(Seq(
      (1L, "h", "/search?q=x"), // contains ? → denied
      (2L, "h", "/search"),     // no query → allowed
      (3L, "h", "/a$bc")        // literal $ in the middle → denied
    ).toDF("id", "host", "path"), r3, "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    assert(g3 == Seq(0, 1, 0))
  }

  test("multi-agent groups share the block; matching is case-insensitive") {
    val txt =
      """User-agent: GraftBot
        |User-agent: otherbot
        |Disallow: /x/
        |Crawl-delay: 2.5
        |
        |User-agent: *
        |Disallow: /y/
        |""".stripMargin
    val r = Robots.parseRules(Seq(("h", txt)).toDF("host", "txt"), "txt", "host")
    val urls = Seq((1L, "h", "/x/p"), (2L, "h", "/y/p")).toDF("id", "host", "path")
    // both agents of the run get the /x/ rule; the * group doesn't apply
    for (agent <- Seq("graftbot", "GRAFTBOT", "otherbot")) {
      val got = Robots.evaluate(urls, r, "host", "path", agent = agent)
        .orderBy("id").select("is_allowed").as[Int].collect().toSeq
      assert(got == Seq(0, 1), s"agent=$agent")
    }
    // Crawl-delay doesn't split the group, and * still owns its own rules
    assert(Robots.evaluate(urls, r, "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq == Seq(1, 0))
  }

  test("most-specific agent group wins: prefix match, longest token") {
    val txt =
      """User-agent: graftbot-news
        |Disallow: /news/
        |
        |User-agent: graftbot
        |Disallow: /general/
        |
        |User-agent: *
        |Disallow: /all/
        |""".stripMargin
    val r = Robots.parseRules(Seq(("h", txt)).toDF("host", "txt"), "txt", "host")
    val urls = Seq(
      (1L, "h", "/news/x"), (2L, "h", "/general/x"), (3L, "h", "/all/x")
    ).toDF("id", "host", "path")
    def got(agent: String) =
      Robots.evaluate(urls, r, "host", "path", agent = agent)
        .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    // exact token: its own group only
    assert(got("graftbot-news") == Seq(0, 1, 1))
    // longer product token falls to the longest matching PREFIX group
    assert(got("graftbot-image") == Seq(1, 0, 1))
    // unrelated token: the * group
    assert(got("unrelated") == Seq(1, 1, 0))
    // a token the group name only PARTIALLY spells does not match
    assert(got("graft") == Seq(1, 1, 0),
      "group tokens must be a prefix of the agent, not vice versa")
  }

  test("evaluateAgents: one pass equals per-agent evaluate, column-for-column") {
    val urls = Seq(
      (1L, "h1", "/docs/x"), (2L, "h1", "/private/x"),
      (3L, "h1", "/private/pub/x"), (4L, "h1", "/tmp123"),
      (5L, "h2", "/private/x")
    ).toDF("id", "host", "path")
    val multi = Robots.evaluateAgents(urls, rules(), "host", "path",
        Seq("*" -> "a_star", "graftbot" -> "a_bot"))
      .orderBy("id").select("a_star", "a_bot")
      .as[(Int, Int)].collect().toSeq
    val star = Robots.evaluate(urls, rules(), "host", "path")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    val bot = Robots.evaluate(urls, rules(), "host", "path", agent = "graftbot")
      .orderBy("id").select("is_allowed").as[Int].collect().toSeq
    assert(multi == star.zip(bot), "single corpus pass ≡ N separate passes")
  }

  test("schedule: per-host spacing by declared delay, default elsewhere") {
    val delays = Seq(("slow.test", 2.5)).toDF("host", "crawl_delay")
    val urls = Seq(
      (1L, "slow.test"), (2L, "slow.test"), (3L, "slow.test"),
      (4L, "fast.test"), (5L, "fast.test")
    ).toDF("id", "host")
    val got = Robots.schedule(urls, delays, "host", "id", defaultDelay = 1.0)
      .orderBy("id").select("id", "fetch_seq", "fetch_offset_s")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 0.0), (2L, 1, 2.5), (3L, 2, 5.0), // declared 2.5s spacing
      (4L, 0, 0.0), (5L, 1, 1.0)))              // default 1s spacing
  }

  test("crawl-delay attaches per group agent; sitemaps are host-wide") {
    val txt =
      """Sitemap: https://h.test/sitemap.xml
        |User-agent: a
        |User-agent: b
        |Disallow: /x
        |Crawl-delay: 1.5
        |
        |User-agent: c
        |Crawl-delay: 7
        |Sitemap: https://h.test/extra.xml
        |""".stripMargin
    val hosts = Seq(("h", txt)).toDF("host", "txt")
    val d = Robots.crawlDelays(hosts, "txt", "host")
      .orderBy("agent").as[(String, String, Double)].collect().toSeq
    assert(d == Seq(("h", "a", 1.5), ("h", "b", 1.5), ("h", "c", 7.0)))
    val s = Robots.sitemaps(hosts, "txt", "host")
      .orderBy("sitemap").as[(String, String)].collect().toSeq
    assert(s == Seq(("h", "https://h.test/extra.xml"),
      ("h", "https://h.test/sitemap.xml")))
  }
}
