package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.Extract
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML→text extraction queries (q218–q219).
  *
  * The fixture wraps each `documents` row in a deterministic web page —
  * navigation chrome, headline, the text re-flowed into `<p>` paragraphs of
  * 20 words (the first with inline `<b>`/`<a>` markup), a list, a share
  * widget, a script/style/comment trio that must vanish, and an
  * entity-laden footer — so the DuckDB oracle can re-derive every block
  * decision from the raw text with string functions while the Spark side
  * has to genuinely parse the markup.
  */
private[graft] trait QueriesExtract extends QueryBase {

  /** Deterministic HTML page per document. Pure per-row string assembly —
    * stays in codegen; at 100 TB this is the shape of a real raw-HTML scan
    * (one long string column per page). */
  private def withHtml(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val nPara = ceil(size(toks).cast("double") / 20.0).cast("int")
    val paras = transform(
      sequence(lit(0), nPara - 1),
      i => concat_ws(" ", slice(toks, i * 20 + 1, lit(20))))
    val id = col("doc_id").cast("string")

    val firstPara = concat(
      lit("<p><b>"), element_at(toks, 1), lit("</b> "),
      concat_ws(" ", slice(toks, 2, 19)),
      lit(""" <a href="/more">read more here</a></p>"""))
    val restParas = array_join(
      transform(slice(paras, lit(2), size(paras)),
        x => concat(lit("<p>"), x, lit("</p>"))),
      "\n")

    val html = concat_ws("\n",
      lit("<html>"),
      concat(lit("<head><title>Doc "), id, lit(" | "), col("source"),
        lit(" | graft</title><style>h1 { font-size: 2em; }</style></head>")),
      lit("<body>"),
      lit("""<nav id="menu"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>"""),
      concat(lit("<h1>Document "), id, lit(" from "), col("source"), lit("</h1>")),
      firstPara,
      restParas,
      lit("<ul><li>first listed point in summary</li><li>another listed point for emphasis</li></ul>"),
      // the data-note attribute embeds a '>' inside a quoted value — a
      // naive <[^>]*> tag strip truncates the tag there and leaks
      // `b">` into the block text; the oracle states the text WITHOUT
      // it, so only a quote-aware parser hashes green
      lit("""<div class="share" data-note="a>b"><a href="#t">Tweet this</a> <a href="#f">Share on FB</a> now</div>"""),
      lit("""<script>var x = 1 < 2; if (x) { document.write("<p>fake paragraph</p>"); }</script>"""),
      lit("<style>.menu a { color: #333; }</style>"),
      lit("<!-- build 2026 <p>ghost</p> -->"),
      concat(lit("<footer>Copyright &copy; 2026 "), col("source"),
        lit(""" &amp; partners &mdash; <a href="/tos">Terms of Service</a> <a href="/priv">Privacy</a></footer>""")),
      lit("</body>"),
      lit("</html>"))

    docs.select(col("doc_id"), col("source"), html.as("html"))
  }

  /** q218 — per-block segmentation + jusText gates over parsed HTML. */
  private[graft] def q218(s: SparkSession, dir: String): DataFrame =
    Extract.segments(withHtml(T(s, dir, "documents")), "html")
      .select(col("doc_id"), col("block_idx"), col("tag"), col("text"),
        col("n_words"), col("link_density"), col("stop_density"), col("decision"))
      .orderBy(col("doc_id"), col("block_idx"))

  /** q222 — jusText's context-sensitive second pass: short/neargood
    * blocks reclassify by their nearest contextually-certain neighbors;
    * the oracle replays the window pass in SQL. */
  private[graft] def q222(s: SparkSession, dir: String): DataFrame =
    Extract.refine(
        Extract.segments(withHtml(T(s, dir, "documents")), "html"), "doc_id")
      .select(col("doc_id"), col("block_idx"), col("tag"),
        col("decision"), col("final_decision"))
      .orderBy(col("doc_id"), col("block_idx"))

  /** q223 — WARC ingestion end-to-end: the corpus serializes into WARC
    * request/response record pairs, lands as an archive file, splits
    * back into records at the SOURCE (distributed custom-lineSep text
    * scan), the HTTP envelopes strip, and the extraction plane consumes
    * the responses — producing exactly q219's answer (shared oracle).
    * (Record-inventory invariants — request + response per page, every
    * response a 200 — are pinned in WarcSpec, outside the timed body.) */
  private[graft] def q223(s: SparkSession, dir: String): DataFrame = {
    // spread the corpus over the session's core count BEFORE
    // serializing: one task per written archive file is the unit of
    // parallelism on the read side, and the record-parse projections
    // run below extraction's own parallelism floor — a single-file
    // archive would funnel the whole parse through one task (guide
    // §2.5 input skew; a real crawl ships thousands of archives)
    val docs = graft.io.Parallelism.ensure(withHtml(T(s, dir, "documents")))
      .withColumn("uri",
        concat(lit("https://graft.test/doc/"), col("doc_id").cast("string")))
    val tmp = graft.io.TempDirs.scratch("graft-q223")
    graft.io.WarcReader.toWarcRecords(docs, "uri", "html")
      .write.text(s"$tmp/corpus.warc")
    val resp = graft.io.WarcReader.responses(s, s"$tmp/corpus.warc")
    Extract.extractText(resp, "html", "target_uri")
      .withColumn("doc_id",
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
      .withColumn("quality", TF.qualityScore(col("clean_text")))
      .select(col("doc_id"), col("title"), col("clean_text"),
        col("n_blocks_kept"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** q224 — CONTINUOUS web-corpus ingestion: archives ARRIVE in two
    * waves in a streamed directory; each micro-batch splits records at
    * the source, strips HTTP envelopes, extracts clean text, and lands
    * (doc, fingerprint) rows exactly-once; the final read dedups by
    * fingerprint across everything ingested. Micro-batch boundaries
    * must be invisible — the oracle derives the same fingerprints and
    * survivors from the raw corpus in one shot. */
  private[graft] def q224(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // q223's archive-fan-out note applies per WAVE here: each wave
    // lands one file per task, so the stream's record parse reads a
    // wave with full parallelism instead of one task per wave
    val docs = graft.io.Parallelism.ensure(withHtml(T(s, dir, "documents")))
      .withColumn("uri",
        concat(lit("https://graft.test/doc/"), col("doc_id").cast("string")))
    val tmp = graft.io.TempDirs.scratch("graft-q224")
    val in = s"$tmp/in"
    val out = s"$tmp/out"
    graft.io.WarcReader.toWarcRecords(
      docs.filter(col("doc_id") % 2 === 0), "uri", "html")
      .write.mode("append").text(in) // wave 1
    val stream = graft.io.WarcReader.recordsStream(s, in)
    val q = graft.io.WarcReader.responsesOf(stream).writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // batchId-keyed OVERWRITE: a crash-replayed micro-batch lands on
        // its own directory again instead of appending duplicates —
        // exactly-once without a transactional sink
        Extract.extractText(b.toDF(), "html", "target_uri")
          .select(
            regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            TF.fingerprint(col("clean_text")).as("fingerprint"))
          .write.mode("overwrite").parquet(s"$out/batch=$batchId")
        ()
      }.start()
    try {
      q.processAllAvailable()
      graft.io.WarcReader.toWarcRecords(
        docs.filter(col("doc_id") % 2 =!= 0), "uri", "html")
        .write.mode("append").text(in) // wave 2 arrives mid-stream
      q.processAllAvailable()
    } finally q.stop()
    val ingested = s.read.parquet(out)
    ingested
      .withColumn("is_survivor",
        (col("doc_id") === min(col("doc_id"))
          .over(Window.partitionBy(col("fingerprint")))).cast("int"))
      .select(col("doc_id"), col("fingerprint"), col("is_survivor"))
      .orderBy(col("doc_id"))
  }

  /** q225 — URL canonicalization + URL-level dedup: two raw spellings of
    * every page (case-varied host, default port, fragment, re-ordered
    * query) collapse to one canonical URL; the survivor flag keys the
    * fetch-dedup step. The oracle replays every normalization rule. */
  private[graft] def q225(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col("doc_id").cast("string")
    val v1 = concat(lit("HTTP://Graft.TEST:80/docs/"), id,
      lit("?b="), col("lang"), lit("&a="), col("source"), lit("#frag"))
    val v2 = concat(lit("http://graft.test/docs/"), id,
      lit("?a="), col("source"), lit("&b="), col("lang"))
    T(s, dir, "documents")
      .select(col("doc_id"), posexplode(array(v1, v2)).as(Seq("p", "url")))
      .withColumn("variant", col("p") + 1)
      .withColumn("canonical", graft.operators.UrlOps.normalizeUrl(col("url")))
      .withColumn("is_survivor",
        (col("variant") === min(col("variant"))
          .over(Window.partitionBy(col("canonical")))).cast("int"))
      .select(col("doc_id"), col("variant"), col("url"),
        col("canonical"), col("is_survivor"))
      .orderBy(col("doc_id"), col("variant"))
  }

  /** q230 — URL normalization COMPLETENESS (RFC 3986 §6.2.2): dotted
    * path spellings (`/./`, `/../`) and gratuitous percent-encodings
    * (`%2D`→`-`, `%7e`→`~`, `%2f`→`%2F` — reserved stays encoded,
    * hex uppercases) collapse onto the already-normal spelling; the
    * oracle states the canonical form analytically, so any deviation in
    * the dot-segment stack or the percent decoder hash-fails. */
  private[graft] def q230(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col("doc_id").cast("string")
    val v1 = concat(lit("http://graft.test/./docs/../page%2Findex%2D"), id,
      lit("?x=%7euser&y=%2f"))
    val v2 = concat(lit("http://graft.test/page%2Findex-"), id,
      lit("?x=~user&y=%2F"))
    T(s, dir, "documents")
      .select(col("doc_id"), posexplode(array(v1, v2)).as(Seq("p", "url")))
      .withColumn("variant", col("p") + 1)
      .withColumn("canonical", graft.operators.UrlOps.normalizeUrl(col("url")))
      .withColumn("is_survivor",
        (col("variant") === min(col("variant"))
          .over(Window.partitionBy(col("canonical")))).cast("int"))
      .select(col("doc_id"), col("variant"), col("url"),
        col("canonical"), col("is_survivor"))
      .orderBy(col("doc_id"), col("variant"))
  }

  /** q233 — WET derivation roundtrip (Common Crawl's companion format
    * for extracted text): the q219 extraction output serializes into
    * `conversion` records (text/plain, WARC-Refers-To back-links,
    * octet-exact Content-Length), lands as a .wet archive, and reads
    * back through the same record source — multi-line clean text
    * (block-joined with newlines) must survive the record framing
    * byte-for-byte. Oracle: the q219 derivation, text columns only. */
  private[graft] def q233(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.io.TempDirs.scratch("graft-q233")
    val ext = Extract.extractText(withHtml(T(s, dir, "documents")), "html", "doc_id")
      .withColumn("uri",
        concat(lit("https://graft.test/doc/"), col("doc_id").cast("string")))
    graft.io.WarcReader.toWetRecords(ext, "uri", "clean_text")
      .write.text(s"$tmp/corpus.wet")
    graft.io.WarcReader.records(s, s"$tmp/corpus.wet")
      .where(col("record_type") === "conversion")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("payload").as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** q232 — politeness-aware fetch scheduling: even-numbered hosts
    * declare a `Crawl-delay` for graftbot, odd hosts fall back to the
    * crawler's default spacing; each host's URLs schedule
    * `fetch_seq × delay` seconds apart in doc order. The oracle
    * replays the per-host row numbering and both delay sources. */
  private[graft] def q232(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Robots
    val docs = T(s, dir, "documents")
    val srcNum = regexp_extract(col("source"), "(\\d+)$", 1).cast("int")
    val hosts = docs.select(col("source")).distinct()
      .withColumn("robots",
        when(srcNum % 2 === 0, concat(
          lit("User-agent: graftbot\nDisallow: /private/\nCrawl-delay: "),
          (srcNum % 3).cast("string"), lit(".5\n")))
          .otherwise(lit("User-agent: *\nDisallow: /private/\n")))
    val delays = Robots.crawlDelays(hosts, "robots", "source")
      .where(col("agent") === "graftbot")
      .select(col("source"), col("crawl_delay"))
    val urls = docs.select(col("doc_id"), col("source"),
      concat(lit("/docs/"), col("doc_id").cast("string")).as("path"))
    Robots.schedule(urls, delays, "source", "doc_id", defaultDelay = 1.0)
      .select(col("doc_id"), col("source"), col("path"),
        col("fetch_seq"), col("fetch_offset_s"))
      .orderBy(col("doc_id"))
  }

  /** q234 — the CRAWL-SIDE capstone, one plan: discovered links in two
    * raw spellings (case-varied host, default port, dot-segments)
    * canonicalize, URL-dedup to one survivor per page, evaluate
    * against each host's wildcard robots policy (paths ending in `0`
    * under /docs/ are disallowed via a `*…$` pattern), and the allowed
    * survivors schedule politely per host (declared crawl delays).
    * The fetch plan a real frontier hands the fetcher fleet. */
  private[graft] def q234(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Robots
    import org.apache.spark.sql.expressions.Window
    val docs = T(s, dir, "documents")
    val srcNum = regexp_extract(col("source"), "(\\d+)$", 1).cast("int")
    val id = col("doc_id").cast("string")
    val v1 = concat(lit("HTTP://"), upper(col("source")),
      lit(".Test:80/./docs/../docs/"), col("lang"), lit("/"), id)
    val v2 = concat(lit("http://"), col("source"), lit(".test/docs/"),
      col("lang"), lit("/"), id)
    val raw = docs
      .select(col("doc_id"), col("source"),
        posexplode(array(v1, v2)).as(Seq("p", "url")))
      .withColumn("variant", col("p") + 1)
      .withColumn("canonical", graft.operators.UrlOps.normalizeUrl(col("url")))
    val survivors = raw
      .withColumn("__surv",
        col("variant") === min(col("variant"))
          .over(Window.partitionBy(col("canonical"))))
      .where(col("__surv"))
      .withColumn("path", regexp_replace(col("canonical"), "^https?://[^/]+", ""))
      .select(col("doc_id"), col("source"), col("canonical"), col("path"))
    val hosts = docs.select(col("source")).distinct()
      .withColumn("robots", concat(
        lit("User-agent: *\nDisallow: /docs/*0$\nCrawl-delay: "),
        (srcNum % 3).cast("string"), lit(".5\n")))
    val rules = Robots.parseRules(hosts, "robots", "source")
    val delays = Robots.crawlDelays(hosts, "robots", "source")
      .where(col("agent") === "*")
      .select(col("source"), col("crawl_delay"))
    val allowed = Robots.evaluate(survivors, rules, "source", "path")
      .where(col("is_allowed") === 1)
    Robots.schedule(allowed, delays, "source", "doc_id")
      .select(col("doc_id"), col("source"), col("canonical"),
        col("fetch_seq"), col("fetch_offset_s"))
      .orderBy(col("doc_id"))
  }

  /** q226 — robots.txt politeness filter (RFC 9309): each source host
    * publishes a policy (with a crawler-specific group on even-numbered
    * hosts); URLs evaluate for the generic agent AND for `graftbot`,
    * whose own group REPLACES `*` where declared. The oracle re-derives
    * every decision analytically from the fixture's arithmetic. */
  private[graft] def q226(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Robots
    val docs = T(s, dir, "documents")
    val srcNum = regexp_extract(col("source"), "(\\d+)$", 1).cast("int")
    val hosts = docs.select(col("source")).distinct()
      .withColumn("robots", concat(
        lit("# corpus policy\nUser-agent: *\nDisallow: /private/\n" +
          "Allow: /private/pub/\nDisallow: /tmp\n"),
        when(srcNum % 2 === 0,
          lit("\nUser-agent: graftbot\nDisallow: /docs/\n"))
          .otherwise(lit(""))))
    val rules = Robots.parseRules(hosts, "robots", "source")
    val id = col("doc_id").cast("string")
    val urls = docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 4 === 0, concat(lit("/docs/"), id))
        .when(col("doc_id") % 4 === 1, concat(lit("/private/"), id))
        .when(col("doc_id") % 4 === 2, concat(lit("/private/pub/"), id))
        .otherwise(concat(lit("/tmp"), id)).as("path"))
    Robots.evaluateAgents(urls, rules, "source", "path",
        Seq("*" -> "is_allowed", "graftbot" -> "is_allowed_bot"))
      .select(col("doc_id"), col("path"), col("is_allowed"),
        col("is_allowed_bot"))
      .orderBy(col("doc_id"))
  }

  /** q227 — RFC 9309 wildcard rules + group metadata: each host's policy
    * uses `*`-patterns and `$` end anchors (slash-star-question,
    * star-dot-pdf-dollar), declares a MULTI-AGENT group (GraftBot + otherbot
    * share one rule block, mixed-case on purpose) with a per-group
    * `Crawl-delay`, and publishes a `Sitemap`. URLs evaluate for `*`,
    * `GRAFTBOT` (case-insensitive match) and `otherbot`; the oracle
    * re-derives every decision by replaying the regex translation and
    * the longest-pattern-wins ranking in SQL. */
  private[graft] def q227(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Robots
    val docs = T(s, dir, "documents")
    val srcNum = regexp_extract(col("source"), "(\\d+)$", 1).cast("int")
    val hosts = docs.select(col("source")).distinct()
      .withColumn("robots", concat(
        lit("Sitemap: https://"), col("source"), lit(".test/sitemap.xml\n"),
        lit("User-agent: *\nDisallow: /*?\nDisallow: /*.pdf$\n" +
          "Allow: /docs/*.pdf$\nDisallow: /cgi-bin/\n\n"),
        lit("User-agent: GraftBot\nUser-agent: otherbot\n" +
          "Allow: /cgi-bin/pub\nDisallow: /cgi-bin/\nCrawl-delay: "),
        (srcNum % 3).cast("string"), lit(".5\n")))
    val rules = Robots.parseRules(hosts, "robots", "source")
    val id = col("doc_id").cast("string")
    val urls = docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 5 === 0, concat(lit("/docs/"), id, lit(".pdf")))
        .when(col("doc_id") % 5 === 1, concat(lit("/search?q="), id))
        .when(col("doc_id") % 5 === 2, concat(lit("/cgi-bin/script"), id))
        .when(col("doc_id") % 5 === 3, concat(lit("/cgi-bin/pub/"), id))
        .otherwise(concat(lit("/about"), id, lit(".pdfx"))).as("path"))
    // ONE corpus pass resolves all three agents (the per-agent scoped
    // rule sets broadcast with an output tag — N agents ≠ N scans)
    val decided = Robots.evaluateAgents(urls, rules, "source", "path",
      Seq("*" -> "is_allowed", "GRAFTBOT" -> "is_allowed_bot",
        "otherbot" -> "is_allowed_other"))
    val delays = Robots.crawlDelays(hosts, "robots", "source")
      .where(col("agent") === "graftbot")
      .select(col("source"), col("crawl_delay"))
    val maps = Robots.sitemaps(hosts, "robots", "source")
    decided
      .join(broadcast(delays), "source").join(broadcast(maps), "source")
      .select(col("doc_id"), col("path"), col("is_allowed"),
        col("is_allowed_bot"), col("is_allowed_other"),
        col("crawl_delay"), col("sitemap"))
      .orderBy(col("doc_id"))
  }

  /** q228 — LENGTH-FRAMED WARC ingestion on an adversarial corpus: every
    * page's body EMBEDS the literal record marker bytes (the case that
    * breaks marker-split readers), pages alternate WARC/1.0 and 1.1,
    * and payloads are ISO-8859-1 with accented prose — Content-Length
    * framing plus Content-Type charset decoding must round-trip every
    * byte. Archives are written distributed (one member-gzipped
    * `.warc.gz` per partition via the spec-exact byte serializer); the
    * oracle re-derives version, byte length, and the decoded payload
    * analytically. */
  private[graft] def q228(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.io.TempDirs.scratch("graft-q228")
    val arch = s"$tmp/arch"
    // one archive per task (q223's fan-out note): framing is
    // sequential WITHIN an archive, so the archive count IS the read
    // parallelism — a single-partition source would serialize the
    // whole framed parse through one task
    val pages = graft.io.Parallelism.ensure(T(s, dir, "documents")).select(
      concat(lit("https://graft.test/doc/"), col("doc_id").cast("string"))
        .as("uri"),
      concat(lit("<html><body><p>a page about\r\nWARC/1.0\r\nrecords" +
          "</p><p>café déjà-vu à la «mode» "), col("text"),
        lit("</p></body></html>")).as("body"),
      when(col("doc_id") % 2 === 0, "1.0").otherwise("1.1").as("warc_version"),
      lit("text/html; charset=iso-8859-1").as("content_type"),
      lit("ISO-8859-1").as("charset"))
    graft.io.WarcWriter.writeArchives(pages, "uri", "body", arch)
    graft.io.WarcReader.recordsFramed(s, arch)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("warc_version"), col("frame_ok").cast("int").as("frame_ok"),
        col("content_length"), col("payload"))
      .orderBy(col("doc_id"))
  }

  /** q229 — PER-LANGUAGE stopword gates (jusText is
    * stoplist-per-language): each document renders as a one-paragraph
    * page whose prose carries its own language's function words; the
    * block is gated BOTH ways — with the language column (de/es/fr
    * stoplists, zh bypassed) and with the English-only default. The
    * oracle replays both densities and both decisions, so the row
    * proves non-English prose classifies `good` under the per-lang gate
    * while the en-only gate sees `stop_density ≈ 0`. */
  private[graft] def q229(s: SparkSession, dir: String): DataFrame = {
    val prefix = when(col("lang") === "de",
        lit("der große Datensatz und die schnelle Abfrage ist nicht klein mit Daten"))
      .when(col("lang") === "es",
        lit("el sistema de datos es una consulta que sirve para los casos"))
      .when(col("lang") === "fr",
        lit("le système est dans une grande base pour les données du groupe"))
      .when(col("lang") === "zh",
        lit("数据 系统 查询 快速 合并 窗口 流 处理"))
      .otherwise(lit("the data system is a fast query and it works for the team"))
    val page = concat(lit("<html><body><p>"), prefix, lit(" "), col("text"),
      lit("</p></body></html>"))
    val docs = T(s, dir, "documents")
      .select(col("doc_id"), col("lang"), page.as("html"))
    val byLang = Extract.segments(docs, "html", langCol = Some("lang"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        col("stop_density"), col("decision"))
    val byEn = Extract.segments(docs, "html")
      .select(col("doc_id"), col("stop_density").as("stop_density_en"),
        col("decision").as("decision_en"))
    byLang.join(byEn, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_words"), col("stop_density"),
        col("decision"), col("stop_density_en"), col("decision_en"))
      .orderBy(col("doc_id"))
  }

  /** q231 — the REAL-CORPUS FRONT DOOR, end-to-end in one plan: per-
    * language pages serialize into length-framed member-gzipped WARC
    * archives (zh pages UTF-8, the rest ISO-8859-1 — per-record charset
    * dispatch), the framed reader decodes them, extraction runs with the
    * per-language stopword gates (lang from the URI path, the crawl
    * convention), and the clean text feeds the downstream text plane:
    * language-ID, quality score, fingerprint, and exact-dedup survivor
    * flags. Every stage's value is replayed analytically by the oracle. */
  private[graft] def q231(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = graft.io.TempDirs.scratch("graft-q231")
    val arch = s"$tmp/arch"
    val prefix = when(col("lang") === "de",
        lit("der große Datensatz und die schnelle Abfrage ist nicht klein mit Daten"))
      .when(col("lang") === "es",
        lit("el sistema de datos es una consulta que sirve para los casos"))
      .when(col("lang") === "fr",
        lit("le système est dans une grande base pour les données du groupe"))
      .when(col("lang") === "zh", lit("数据 系统 查询 快速 合并 窗口 流 处理"))
      .otherwise(lit("the data system is a fast query and it works for the team"))
    // q228's archive-fan-out note: the framed parse parallelizes by
    // archive file, so spread the corpus before serializing
    val pages = graft.io.Parallelism.ensure(T(s, dir, "documents")).select(
      concat(lit("https://graft.test/"), col("lang"), lit("/doc/"),
        col("doc_id").cast("string")).as("uri"),
      concat(lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body>" +
          """<nav><a href="/">Home</a> <a href="/x">More</a></nav>""" + "<p>"),
        prefix, lit(" "), col("text"),
        lit("</p><footer>Copyright graft</footer></body></html>")).as("body"),
      lit("1.0").as("warc_version"),
      when(col("lang") === "zh", "text/html; charset=utf-8")
        .otherwise("text/html; charset=iso-8859-1").as("content_type"),
      when(col("lang") === "zh", "UTF-8").otherwise("ISO-8859-1").as("charset"))
    graft.io.WarcWriter.writeArchives(pages, "uri", "body", arch)
    val resp = graft.io.WarcReader.recordsFramed(s, arch)
      .where(col("record_type") === "response" && col("http_status") === 200)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        regexp_extract(col("target_uri"), "^https://graft\\.test/([a-z]+)/", 1)
          .as("lang"),
        col("payload").as("html"))
    val ext = Extract.extractText(resp, "html", "doc_id",
      langCol = Some("lang"))
    TF.withLangId(ext, "clean_text", "lang_pred")
      .withColumn("quality", TF.qualityScore(col("clean_text")))
      .withColumn("fingerprint", TF.fingerprint(col("clean_text")))
      .withColumn("is_survivor",
        (col("doc_id") === min(col("doc_id"))
          .over(Window.partitionBy(col("fingerprint")))).cast("int"))
      .select(col("doc_id"), col("lang"), col("title"), col("n_blocks_kept"),
        col("lang_pred"), col("quality"), col("fingerprint"), col("is_survivor"))
      .orderBy(col("doc_id"))
  }

  /** q219 — full extraction: title + clean text + the q24 quality score of
    * the extracted text (proving the extractor feeds the downstream text
    * plane unchanged). */
  private[graft] def q219(s: SparkSession, dir: String): DataFrame =
    Extract.extractText(withHtml(T(s, dir, "documents")), "html", "doc_id")
      .withColumn("quality", TF.qualityScore(col("clean_text")))
      .select(col("doc_id"), col("title"), col("clean_text"),
        col("n_blocks_kept"), col("quality"))
      .orderBy(col("doc_id"))
}
