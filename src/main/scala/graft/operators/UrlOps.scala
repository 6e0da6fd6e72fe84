package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-pipeline step BEFORE fetch/content
  * dedup: the same page is reachable through case-varied hosts, default
  * ports, fragments, and re-ordered query strings, and a corpus keyed
  * on raw URLs over-counts it. The normal form here follows RFC 3986's
  * normalization guidance:
  *
  *   - scheme and host lowercase (case-insensitive per spec);
  *   - default ports drop (`:80` for http, `:443` for https);
  *   - the fragment drops (never sent to the server);
  *   - an empty path becomes `/`;
  *   - query parameters sort bytewise (order-insensitive services).
  *
  * Pure codegen'd string builtins — per-row, no UDFs, linear at any
  * corpus size, and every step is replayable in ANSI-ish SQL for the
  * oracle. */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** The RFC 3986-normalized form of an absolute URL column. Inputs
    * without a `scheme://` prefix pass through unchanged (relative
    * references have no authority to normalize). */
  def normalizeUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val auth = lower(regexp_extract(noFrag, SchemeRe + "([^/?#]*)", 2))
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val pathq = regexp_extract(noFrag, SchemeRe + "[^/?#]*(.*)$", 2)
    val path = substring_index(pathq, "?", 1)
    val normPath = when(length(path) === 0, lit("/")).otherwise(path)
    val query = pathq.substr(length(path) + lit(2), length(pathq))
    val sortedQ = when(length(query) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    when(length(scheme) === 0, u) // not an absolute URL: leave it alone
      .otherwise(concat(scheme, lit("://"), authNoPort, normPath, sortedQ))
  }
}
