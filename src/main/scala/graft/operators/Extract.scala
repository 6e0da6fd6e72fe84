package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction with jusText-style boilerplate removal.
  *
  * The first stage of every real web-corpus pipeline: raw markup goes in,
  * clean paragraph text comes out, with navigation chrome / share widgets /
  * footers dropped by per-block gates. The approach follows the published
  * jusText / trafilatura family: segment the document into blocks at
  * block-level element boundaries, score each block on link density,
  * stopword density, and length, classify, and keep the content blocks.
  *
  * Everything here is codegen'd builtins (`regexp_replace`, `split`,
  * `transform`, `aggregate`, `posexplode`) — per-row, no UDFs, no shuffle
  * until the caller aggregates, so the operator scales linearly: at 100 TB
  * each task extracts its own partition's documents independently and the
  * expensive regex work stays inside whole-stage codegen.
  *
  * Classification (documented so the DuckDB oracle can replay it):
  *   - `boilerplate` — link_density > 1/3 (most of the block's text is
  *     anchor text: navigation, share bars, footers);
  *   - `short`       — fewer than [[MinWords]] words (headings, stubs);
  *   - `neargood`    — stopword density below [[MinStopDensity]] (word-salad
  *     or non-prose; kept by [[extractText]] but flagged);
  *   - `good`        — everything else.
  */
object Extract {

  /** Block-level elements that open a new segment. Matches the HTML5 list
    * of flow-content containers jusText segments on. */
  val BlockTags: Seq[String] = Seq(
    "nav", "header", "footer", "section", "article", "aside", "main",
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "div", "ul", "ol", "li",
    "table", "tr", "blockquote", "pre", "figure", "dl", "dt", "dd")

  /** Blocks with fewer words than this are `short` (jusText length gate). */
  val MinWords = 5

  /** Blocks whose anchor-text share exceeds this are `boilerplate`. */
  val MaxLinkDensity: Double = 1.0 / 3.0

  /** Blocks below this stopword density are `neargood`, not `good`. */
  val MinStopDensity = 0.05

  private val sentinel = "\u0000"

  /** Quote-aware tag pattern: a `>` inside a quoted attribute value
    * (`<img alt="a>b">`) does not terminate the tag — the naive
    * `<[^>]*>` truncates there and leaks attribute text into content.
    * Alternation keeps the whole pattern regex-engine portable (Java
    * and RE2) and inside codegen. */
  private val TagPat = "<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"

  /** Remove non-content subtrees: scripts, styles, comments. Must run
    * before any tag-level processing — script bodies may contain literal
    * `<` and fake tags (`document.write("<p>…")`). */
  def stripNonContent(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>.*?</style>", "")
    regexp_replace(noStyle, "(?s)<!--.*?-->", "")
  }

  /** Decode the common named/numeric entities. `&amp;` is decoded last so
    * double-escaped sequences (`&amp;lt;`) stay escaped, matching a
    * single-pass decoder. */
  def decodeEntities(c: Column): Column = {
    val pairs = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&copy;" -> "©",
      "&mdash;" -> "—", "&ndash;" -> "–", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (ent, ch)) => regexp_replace(acc, ent, ch) }
  }

  /** Inner text of an HTML fragment: drop tags, decode entities, collapse
    * whitespace. The collapse makes extraction robust to source formatting
    * (indentation, line breaks inside elements). */
  def innerText(fragment: Column): Column =
    // Collapse BEFORE trim: Spark's trim strips only spaces, so a trailing
    // newline survives an early trim and leaves a dangling separator.
    trim(regexp_replace(
      decodeEntities(regexp_replace(fragment, TagPat, " ")),
      "\\s+", " "))

  /** `<title>` contents from the document head. */
  def title(html: Column): Column =
    innerText(regexp_extract(stripNonContent(html),
      "(?is)<title(?:[^>\"']|\"[^\"]*\"|'[^']*')*>(.*?)</title>", 1))

  /** Total characters of anchor text in a fragment: extract every
    * `<a …>…</a>` inner HTML, reduce each to text, sum lengths. Pure
    * array builtins — stays in codegen. */
  def linkChars(fragment: Column): Column =
    aggregate(
      transform(
        regexp_extract_all(fragment,
          lit("(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>(.*?)</a>"), lit(1)),
        a => length(innerText(a)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  private def tokenCountOf(text: Column): Column =
    when(length(text) === 0, lit(0)).otherwise(size(split(text, "\\s+")))

  private val stopPattern =
    graft.functions.TextFunctions.EnStopwords.mkString("\\b(", "|", ")\\b")

  /** Stopword density of the `text` attribute for one language's
    * stoplist; the empty (CJK) stoplist scores 0.0 without a regex. */
  private def stopDensityFor(words: Seq[String]): Column =
    if (words.isEmpty) lit(0.0)
    else
      size(regexp_extract_all(lower(col("text")),
        lit(words.mkString("\\b(", "|", ")\\b")), lit(0))).cast("double") /
        greatest(col("n_words"), lit(1))

  /** Segment a document's HTML into classified blocks.
    *
    * Output: the columns of `df` minus `htmlCol`, plus
    * `(block_idx, tag, text, n_words, link_density, stop_density, decision)`
    * — one row per non-empty block, `block_idx` 1-based in document order.
    *
    * Reference behavior modeled: jusText's context-free classification pass
    * (the published algorithm's first stage); trafilatura's block
    * segmentation at flow-element boundaries.
    *
    * `langCol`: jusText is STOPLIST-PER-LANGUAGE — with a language column
    * named here, the stopword-density gate uses that language's stoplist
    * ([[graft.functions.TextFunctions.Stoplists]]; unknown languages fall
    * back to English). For stoplist-less languages (zh — the CJK case)
    * the gate is BYPASSED (`stop_density = 0`, threshold 0 — jusText's
    * `stopwords_low = stopwords_high = 0` recipe), so CJK prose is not
    * mass-misclassified `neargood`. Without `langCol` the English list
    * applies everywhere (the pre-round-18 behavior, kept for the
    * lang-less oracle fixtures).
    */
  def segments(df: DataFrame, htmlCol: String,
               langCol: Option[String] = None): DataFrame = {
    val body = regexp_extract(stripNonContent(col(htmlCol)), "(?is)<body[^>]*>(.*?)</body>", 1)
    // A sentinel before every opening block tag turns the body into a
    // splittable string; each fragment then carries exactly one block's
    // opening tag plus its (possibly nested-inline) content.
    val marked = regexp_replace(
      body, "(?i)<(" + BlockTags.mkString("|") + ")\\b", sentinel + "<$1")
    val rawFrags = split(marked, sentinel)
    // Pre-compute (tag, text, link_chars) per fragment, drop textless
    // fragments (pure-container elements like <ul> whose content lives in
    // child blocks), THEN number — block_idx counts emitted blocks, the
    // same numbering jusText reports.
    val structs = filter(
      transform(rawFrags, f =>
        struct(
          lower(regexp_extract(f, "^<([A-Za-z0-9]+)", 1)).as("tag"),
          innerText(f).as("text"),
          linkChars(f).as("lc"))),
      s => length(s.getField("text")) > 0)

    val keep = df.columns.filter(_ != htmlCol).map(col)
    // Materialize the block array behind an optimizer fence and explode the
    // ATTRIBUTE with posexplode_outer: without the fence,
    // InferFiltersFromGenerate pushes `size(pipeline) > 0` into the scan and
    // re-evaluates the whole regex pipeline per row (the q86 lesson); the
    // _outer + cheap attribute filter drops blockless pages instead.
    graft.io.Parallelism.ensure(df)
      .withColumn("__blocks", graft.functions.Fence(structs))
      .select(keep :+ posexplode_outer(col("__blocks")).as(Seq("__pos", "__b")): _*)
      .where(col("__b").isNotNull)
      .select(keep ++ Seq(
        (col("__pos") + 1).as("block_idx"),
        col("__b.tag").as("tag"),
        col("__b.text").as("text"),
        col("__b.lc").as("__lc")): _*)
      .withColumn("n_words", tokenCountOf(col("text")))
      .withColumn("link_density",
        col("__lc").cast("double") / greatest(length(col("text")), lit(1)))
      .withColumn("stop_density", langCol match {
        case None =>
          size(regexp_extract_all(lower(col("text")), lit(stopPattern), lit(0))).cast("double") /
            greatest(col("n_words"), lit(1))
        case Some(lc) =>
          // lazily-evaluated when-chain: only the matching language's
          // regex count runs per row
          val TF = graft.functions.TextFunctions
          TF.Stoplists.filterNot(_._1 == "en").foldLeft(
            stopDensityFor(TF.EnStopwords)) { case (els, (lang, words)) =>
            when(col(lc) === lang, stopDensityFor(words)).otherwise(els)
          }
      })
      .withColumn("__stop_thresh", langCol match {
        case None => lit(MinStopDensity)
        case Some(lc) =>
          when(col(lc) === "zh", lit(0.0)).otherwise(lit(MinStopDensity))
      })
      .withColumn("decision",
        when(col("link_density") > lit(MaxLinkDensity), "boilerplate")
          .when(col("n_words") < MinWords, "short")
          .when(col("stop_density") < col("__stop_thresh"), "neargood")
          .otherwise("good"))
      .drop("__lc", "__stop_thresh")
  }

  /** jusText's CONTEXT-SENSITIVE second pass: `short` and `neargood`
    * blocks reclassify by their nearest contextually-certain neighbors
    * (the closest `good`/`boilerplate` block before and after, in
    * document order):
    *   - `neargood` → `good` if EITHER neighbor is good, else
    *     `boilerplate` (prose next to prose is prose; isolated
    *     word-salad inside chrome is chrome);
    *   - `short` → `good` only if BOTH neighbors are good (a heading
    *     inside the article body), else `boilerplate`;
    *   - a missing neighbor (document edge) counts as boilerplate —
    *     headers/footers hug the edges.
    * Adds `final_decision` next to the context-free `decision`. One
    * window per document ordered by block index — documents are the
    * parallel unit, so the pass scales with the corpus. */
  def refine(segmented: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("block_idx"))
    val core = when(col("decision").isin("good", "boilerplate"), col("decision"))
    val prevCore = coalesce(
      last(core, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit("boilerplate"))
    val nextCore = coalesce(
      first(core, ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)),
      lit("boilerplate"))
    segmented.withColumn("final_decision",
      when(col("decision").isin("good", "boilerplate"), col("decision"))
        .when(col("decision") === "neargood",
          when(prevCore === "good" || nextCore === "good", "good")
            .otherwise("boilerplate"))
        .otherwise( // short
          when(prevCore === "good" && nextCore === "good", "good")
            .otherwise("boilerplate")))
  }

  /** Full-document extraction: title + clean text (content blocks joined
    * with newlines, document order) + kept-block count. One aggregate over
    * the segmented blocks — shuffles on the id column only, carrying the
    * compact block structs, never the raw HTML. With `refined = true`,
    * keeps the context-sensitive pass's `good` blocks ([[refine]]);
    * otherwise the context-free `good`+`neargood`. With `langCol`, the
    * per-language gates apply ([[segments]]) and the column rides
    * through the aggregate (it is per-document, so it joins the group
    * keys for free). */
  def extractText(df: DataFrame, htmlCol: String, idCol: String,
                  refined: Boolean = false,
                  langCol: Option[String] = None): DataFrame = {
    val keep = Seq(col(idCol), title(col(htmlCol)).as("title"), col(htmlCol)) ++
      langCol.map(col)
    val titled = df.select(keep: _*)
    val seg = segments(titled, htmlCol, langCol)
    val blocks =
      if (refined) refine(seg, idCol).where(col("final_decision") === "good")
      else seg.where(col("decision").isin("good", "neargood"))
    blocks.groupBy(Seq(col(idCol)) ++ langCol.map(col) :+ col("title"): _*)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("block_idx"), col("text")))),
            s => s.getField("text")),
          "\n").as("clean_text"),
        count(lit(1)).as("n_blocks_kept"))
  }
}
