package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and allow/deny evaluation (RFC 9309, the Robots
  * Exclusion Protocol) — the politeness filter a crawl corpus applies
  * before/while selecting fetched pages.
  *
  * Supported semantics (documented subset): `User-agent` groups with
  * `Allow`/`Disallow` rules, path-prefix matching, longest-match-wins,
  * allow-wins-ties (the RFC's rule), no-match ⇒ allowed, empty
  * `Disallow:` ⇒ no restriction. Wildcard (`*`/`$`) path patterns are
  * out of scope and parse as literal prefixes.
  *
  * Scale shape: robots files are per-HOST and tiny — the parsed rule
  * table broadcasts, URL evaluation is one broadcast join + one
  * aggregation keyed by the URL, never a shuffle of the corpus against
  * itself. Group attribution inside each file is a window per host
  * (hosts are the parallel unit). */
object Robots {

  /** Parse robots.txt bodies into one rule per row:
    * (keep cols, agent, rule_idx, is_allow, rule_path). Blank
    * `Disallow:` lines (no restriction) and comments drop. */
  def parseRules(df: DataFrame, textCol: String, hostCol: String): DataFrame = {
    val keep = col(hostCol)
    val lines = df.select(keep,
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("line",
        trim(regexp_replace(col("line"), "#.*$", ""))) // strip comments
    val w = Window.partitionBy(col(hostCol)).orderBy(col("line_no"))
    val agentOf = when(lower(col("line")).startsWith("user-agent:"),
      trim(expr("substring(line, 12)")))
    lines
      .withColumn("agent",
        last(agentOf, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("is_allow",
        when(lower(col("line")).startsWith("allow:"), lit(1))
          .when(lower(col("line")).startsWith("disallow:"), lit(0)))
      .where(col("is_allow").isNotNull && col("agent").isNotNull)
      .withColumn("rule_path",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .where(length(col("rule_path")) > 0) // empty Disallow: = no rule
      .select(keep, col("line_no").as("rule_idx"), col("agent"),
        col("is_allow"), col("rule_path"))
  }

  /** Evaluate URL paths against parsed rules for one crawler agent:
    * adds `is_allowed` (1/0) to `urls`. Group selection: the agent's own
    * group when the host declares one, else `*`. Longest matching rule
    * wins; an allow beats a disallow of equal length; no match allows. */
  def evaluate(urls: DataFrame, rules: DataFrame, hostCol: String,
               pathCol: String, agent: String = "*"): DataFrame = {
    // per host: does a group for this agent exist? (tiny, broadcast)
    val hasAgent = rules.where(col("agent") === agent)
      .select(col(hostCol).as("__h")).distinct()
      .withColumn("__has_agent", lit(1))
    val scoped = rules
      .join(broadcast(hasAgent), rules(hostCol) === col("__h"), "left")
      .where(when(col("__has_agent") === 1, col("agent") === agent)
        .otherwise(col("agent") === "*"))
      .select(col(hostCol).as("__rh"), col("is_allow"), col("rule_path"))
    val urlCols = urls.columns.map(col)
    urls
      .join(broadcast(scoped),
        urls(hostCol) === col("__rh") &&
          col(pathCol).startsWith(col("rule_path")), "left")
      .groupBy(urlCols: _*)
      .agg(max(when(col("rule_path").isNotNull,
        struct(length(col("rule_path")).as("l"), col("is_allow").as("a"))))
        .as("__best"))
      .withColumn("is_allowed",
        coalesce(col("__best.a"), lit(1)).cast("int"))
      .drop("__best")
  }
}
