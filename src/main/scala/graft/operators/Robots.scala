package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and allow/deny evaluation (RFC 9309, the Robots
  * Exclusion Protocol) — the politeness filter a crawl corpus applies
  * before/while selecting fetched pages.
  *
  * Supported semantics: `User-agent` groups — including RFC 9309 §2.1's
  * multi-agent groups, where CONSECUTIVE `User-agent` lines all share
  * the rule block that follows — with `Allow`/`Disallow` rules,
  * wildcard path patterns (`*` matches any octet run, a trailing `$`
  * anchors the end of the URL — RFC 9309 §2.2.3, mandatory for
  * matching), longest-PATTERN-wins (§2.2.2's most-octets rule, ranked
  * on the rule path as written), allow-wins-ties, no-match ⇒ allowed,
  * empty `Disallow:` ⇒ no restriction (kept as a zero-length allow so
  * its group still claims its agents), agent selection per §2.2.1's
  * most-specific match
  * (case-insensitive prefix of the product token, longest group token
  * wins — the deployed-parser semantics; see [[evaluate]]).
  * Documented subset: a `$` not in final position is literal; pass the
  * bare product token to [[evaluate]] (version suffixes like `/1.2`
  * are the caller's to strip).
  *
  * Scale shape: robots files are per-HOST and tiny — the parsed rule
  * table broadcasts, URL evaluation is one broadcast join + one
  * aggregation keyed by the URL, never a shuffle of the corpus against
  * itself. Group attribution inside each file is a window per host
  * (hosts are the parallel unit). Wildcard rules are translated ONCE at
  * parse time into anchored Java regexes carried as a column; the
  * per-URL match is `regexp_like` against that tiny broadcast side. */
object Robots {

  /** Shared line pass: one row per robots.txt line with its group id.
    * A group = a run of consecutive `User-agent` lines plus the rules
    * after them; `grp` is the count of rule lines strictly before the
    * run's first UA line, so consecutive UA lines (no rules between)
    * share a group and any allow/disallow line — even an empty
    * `Disallow:` — starts a new group at the next UA line. Non-rule
    * directives (`Crawl-delay`) do NOT split a group, matching
    * deployed parsers. */
  private def classified(df: DataFrame, textCol: String, hostCol: String): DataFrame = {
    val lines = df.select(col(hostCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("line",
        trim(regexp_replace(col("line"), "#.*$", ""))) // strip comments
    val lc = lower(col("line"))
    val w = Window.partitionBy(col(hostCol)).orderBy(col("line_no"))
    lines
      .withColumn("__is_ua", lc.startsWith("user-agent:"))
      .withColumn("__is_rule",
        lc.startsWith("allow:") || lc.startsWith("disallow:"))
      .withColumn("__rules_before",
        coalesce(sum(col("__is_rule").cast("int"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .withColumn("grp",
        last(when(col("__is_ua"), col("__rules_before")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** The group's agent names, lower-cased (RFC 9309 §2.2.1: matching is
    * case-insensitive): one row per (host, grp, agent). */
  private def agentsOf(ls: DataFrame, hostCol: String): DataFrame =
    ls.where(col("__is_ua"))
      .select(col(hostCol), col("grp"),
        lower(trim(expr("substring(line, 12)"))).as("agent"))
      .distinct()

  /** Translate a robots path pattern into an anchored Java regex:
    * specials escape, `*` → `.*`, a TRAILING `$` → an end anchor.
    * Evaluated once per rule at parse time — the per-URL match never
    * re-derives it. */
  private def patternRegex(rulePath: org.apache.spark.sql.Column) = {
    val anchored = rulePath.endsWith("$")
    val core = when(anchored,
      rulePath.substr(lit(1), length(rulePath) - 1)).otherwise(rulePath)
    val esc = regexp_replace(core, "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1")
    val star = regexp_replace(esc, "\\*", ".*")
    concat(lit("^"), star, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Parse robots.txt bodies into one rule per (group agent) per row:
    * (keep cols, rule_idx, agent, is_allow, rule_path, rule_regex).
    * Comments drop; consecutive `User-agent` lines each receive the
    * full following rule block (RFC 9309 multi-agent groups). An empty
    * `Disallow:`/`Allow:` (no restriction) is KEPT as a zero-length
    * ALLOW rule — it never outranks a real match (0 octets), but it
    * keeps its group visible to agent selection, so
    * `User-agent: somebot` + `Disallow:` correctly grants somebot its
    * own permissive group instead of falling back to `*`'s
    * restrictions. */
  def parseRules(df: DataFrame, textCol: String, hostCol: String): DataFrame = {
    val ls = classified(df, textCol, hostCol)
    val rules = ls.where(col("__is_rule") && col("grp").isNotNull)
      .withColumn("rule_path",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .withColumn("is_allow",
        when(length(col("rule_path")) === 0, lit(1)) // no-restriction no-op
          .when(lower(col("line")).startsWith("allow:"), lit(1))
          .otherwise(lit(0)))
      .select(col(hostCol), col("grp"), col("line_no").as("rule_idx"),
        col("is_allow"), col("rule_path"))
    rules.join(broadcast(agentsOf(ls, hostCol)), Seq(hostCol, "grp"))
      .withColumn("rule_regex", patternRegex(col("rule_path")))
      .select(col(hostCol), col("rule_idx"), col("agent"),
        col("is_allow"), col("rule_path"), col("rule_regex"))
  }

  /** Per-group `Crawl-delay` directives: (keep cols, agent,
    * crawl_delay). The delay attaches to every agent of its group, like
    * a rule, but does not terminate the group. */
  def crawlDelays(df: DataFrame, textCol: String, hostCol: String): DataFrame = {
    val ls = classified(df, textCol, hostCol)
    val delays = ls
      .where(lower(col("line")).startsWith("crawl-delay:") && col("grp").isNotNull)
      .select(col(hostCol), col("grp"),
        trim(expr("substring(line, 13)")).cast("double").as("crawl_delay"))
    delays.join(broadcast(agentsOf(ls, hostCol)), Seq(hostCol, "grp"))
      .select(col(hostCol), col("agent"), col("crawl_delay"))
  }

  /** `Sitemap:` directives — host-wide per the sitemaps protocol
    * (group-independent): (keep cols, sitemap), one row per
    * declaration in file order. */
  def sitemaps(df: DataFrame, textCol: String, hostCol: String): DataFrame =
    classified(df, textCol, hostCol)
      .where(lower(col("line")).startsWith("sitemap:"))
      .select(col(hostCol), trim(expr("substring(line, 9)")).as("sitemap"))

  /** Politeness-aware fetch scheduling — what `Crawl-delay` is FOR:
    * per host, URLs are spaced `crawl_delay` seconds apart in
    * `orderCol` order, producing the plan a polite fetcher executes.
    * `delays` carries (hostCol, crawl_delay) rows (e.g.
    * [[crawlDelays]] filtered to the crawling agent); hosts without a
    * declared delay use `defaultDelay`. Adds `fetch_seq` (0-based
    * position within the host's queue) and `fetch_offset_s`
    * (seq × delay, seconds from the host's first fetch).
    *
    * Scale shape: the delay table is per-host tiny (broadcast); the
    * one window runs per HOST — hosts are a crawl's natural parallel
    * unit, and a single host's fetch order is inherently sequential
    * (that is what politeness means), so no cross-host coordination
    * exists to shuffle. */
  def schedule(urls: DataFrame, delays: DataFrame, hostCol: String,
               orderCol: String, defaultDelay: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(col(hostCol)).orderBy(col(orderCol))
    urls
      .join(broadcast(delays.select(col(hostCol).as("__dh"),
        col("crawl_delay").as("__delay"))),
        urls(hostCol) === col("__dh"), "left")
      .withColumn("fetch_seq", row_number().over(w) - 1)
      .withColumn("fetch_offset_s",
        col("fetch_seq") * coalesce(col("__delay"), lit(defaultDelay)))
      .drop("__dh", "__delay")
  }

  /** Evaluate URL paths against parsed rules for one crawler agent:
    * adds `is_allowed` (1/0) to `urls`. Group selection follows RFC 9309
    * §2.2.1's MOST-SPECIFIC match, the way deployed matchers (Google's
    * open-source parser) implement it: a group applies when its agent
    * token is a case-insensitive PREFIX of the requesting product token
    * (`graftbot` matches a crawler calling itself `graftbot-news`), and
    * among matching groups the longest token wins; no match falls back
    * to `*`. Pass the product token (no version suffix). Longest
    * matching PATTERN wins per URL (most octets of the rule path as
    * written); an allow beats a disallow of equal length; no match
    * allows. */
  def evaluate(urls: DataFrame, rules: DataFrame, hostCol: String,
               pathCol: String, agent: String = "*"): DataFrame =
    evaluateAgents(urls, rules, hostCol, pathCol, Seq(agent -> "is_allowed"))

  /** The rules applicable to one agent: its most-specific matching
    * group per host (longest group token that prefixes the product
    * token), `*` where none matches. Tiny — broadcast downstream. */
  private def scopedFor(rules: DataFrame, hostCol: String, agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val best = rules
      .where(col("agent") =!= "*" && lit(agentLc).startsWith(col("agent")))
      .groupBy(col(hostCol).as("__h"))
      .agg(max(length(col("agent"))).as("__bestlen"))
    rules
      .join(broadcast(best), rules(hostCol) === col("__h"), "left")
      .where(when(col("__bestlen").isNotNull,
          col("agent") =!= "*" && length(col("agent")) === col("__bestlen") &&
            lit(agentLc).startsWith(col("agent")))
        .otherwise(col("agent") === "*"))
      .select(col(hostCol).as("__rh"), col("is_allow"), col("rule_path"),
        col("rule_regex"))
  }

  /** Evaluate SEVERAL crawler agents in ONE pass over the corpus:
    * `agents` maps each product token to its output column name. The
    * per-agent scoped rule sets (tiny) union with an output tag and
    * broadcast; the corpus joins ONCE and one URL-keyed aggregate
    * resolves every agent's longest-match decision as a conditional
    * `max` — N agents cost one corpus scan and one shuffle, not N.
    * Same ranking semantics as [[evaluate]] per agent. */
  def evaluateAgents(urls: DataFrame, rules: DataFrame, hostCol: String,
                     pathCol: String, agents: Seq[(String, String)]): DataFrame = {
    require(agents.nonEmpty && agents.map(_._2).distinct.size == agents.size,
      "agents need distinct output column names")
    val scopedAll = agents.map { case (agent, outCol) =>
      scopedFor(rules, hostCol, agent).withColumn("__out", lit(outCol))
    }.reduce(_ unionByName _)
    val urlCols = urls.columns.map(col)
    val bests = agents.map { case (_, outCol) =>
      max(when(col("__out") === outCol && col("rule_path").isNotNull,
        struct(length(col("rule_path")).as("l"), col("is_allow").as("a"))))
        .as(s"__best_$outCol")
    }
    val grouped = urls
      .join(broadcast(scopedAll),
        urls(hostCol) === col("__rh") &&
          regexp_like(col(pathCol), col("rule_regex")), "left")
      .groupBy(urlCols: _*)
      .agg(bests.head, bests.tail: _*)
    agents.foldLeft(grouped) { case (df, (_, outCol)) =>
      df.withColumn(outCol,
          coalesce(col(s"__best_$outCol.a"), lit(1)).cast("int"))
        .drop(s"__best_$outCol")
    }
  }
}
