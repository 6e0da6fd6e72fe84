package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-pipeline step BEFORE fetch/content
  * dedup: the same page is reachable through case-varied hosts, default
  * ports, fragments, re-ordered query strings, `./`/`../` path spellings,
  * and gratuitous percent-encodings, and a corpus keyed on raw URLs
  * over-counts it. The normal form here follows RFC 3986 §6.2.2:
  *
  *   - scheme and host lowercase (case-insensitive per spec);
  *   - default ports drop (`:80` for http, `:443` for https);
  *   - the fragment drops (never sent to the server);
  *   - an empty path becomes `/`;
  *   - percent-encoding normalizes (§6.2.2.1-2): unreserved octets
  *     (ALPHA / DIGIT / `-` `.` `_` `~`) DECODE, everything else keeps
  *     its encoding with UPPERCASE hex digits (`%2f` → `%2F` — reserved
  *     octets must stay encoded or the path structure changes);
  *   - dot-segments remove (§6.2.2.3 / §5.2.4: `/a/./b/../c` → `/a/c`,
  *     excess `..` at the root drops, a trailing `/.`/`/..` keeps the
  *     directory slash);
  *   - query parameters sort bytewise (order-insensitive services).
  *
  * Pure codegen'd string/array builtins (`transform` with index for the
  * percent decoder, `aggregate` with an array accumulator for the
  * dot-segment stack) — per-row, no UDFs, linear at any corpus size, and
  * every step is replayable in ANSI-ish SQL for the oracle. */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** RFC 3986 §6.2.2.1-2: decode unreserved `%XX`, uppercase the hex of
    * the rest; malformed `%` sequences pass through untouched. Safe on
    * the whole URL string — reserved octets stay encoded, so parsing
    * structure cannot change. */
  private def pctNormalize(u: Column): Column = {
    val parts = split(u, "%")
    array_join(
      transform(parts, (e, i) => {
        val hexUp = upper(e.substr(1, 2))
        val code = conv(hexUp, 16, 10).cast("int")
        val unreserved =
          (code >= 0x41 && code <= 0x5A) || (code >= 0x61 && code <= 0x7A) ||
            (code >= 0x30 && code <= 0x39) ||
            code.isin(0x2D, 0x2E, 0x5F, 0x7E)
        val rest = e.substr(lit(3), length(e))
        when(i === 0, e) // text before the first '%' has no encoding
          .when(!e.rlike("^[0-9A-Fa-f]{2}"), concat(lit("%"), e))
          .when(unreserved, concat(call_function("char", code), rest))
          .otherwise(concat(lit("%"), hexUp, rest))
      }),
      "")
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, as a codegen'd fold: segments
    * push onto an array accumulator, `.` drops, `..` pops (never past
    * the root), and a trailing `/`, `/.` or `/..` keeps the directory
    * slash. Expects a path starting with `/`. */
  private def removeDotSegments(path: Column): Column = {
    val folded = aggregate(
      split(path, "/"),
      array().cast("array<string>"),
      (acc, s) =>
        when(s === ".", acc)
          .when(s === "..", slice(acc, lit(1), greatest(size(acc) - 1, lit(1))))
          .otherwise(concat(acc, array(s))))
    val joined = array_join(folded, "/")
    val base = when(length(joined) === 0, lit("/")).otherwise(joined)
    val wantSlash = path.rlike("(/|/\\.|/\\.\\.)$")
    when(wantSlash && !base.endsWith("/"), concat(base, lit("/")))
      .otherwise(base)
  }

  /** The RFC 3986-normalized form of an absolute URL column. Inputs
    * without a `scheme://` prefix pass through unchanged (relative
    * references have no authority to normalize). */
  def normalizeUrl(u: Column): Column = {
    val noFrag = pctNormalize(substring_index(u, "#", 1))
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val auth = lower(regexp_extract(noFrag, SchemeRe + "([^/?#]*)", 2))
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val pathq = regexp_extract(noFrag, SchemeRe + "[^/?#]*(.*)$", 2)
    val path = substring_index(pathq, "?", 1)
    val normPath = removeDotSegments(
      when(length(path) === 0, lit("/")).otherwise(path))
    val query = pathq.substr(length(path) + lit(2), length(pathq))
    val sortedQ = when(length(query) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    when(length(scheme) === 0, u) // not an absolute URL: leave it alone
      .otherwise(concat(scheme, lit("://"), authNoPort, normPath, sortedQ))
  }
}
