package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline.
  *
  * Everything here is built from codegen'd builtins (`split`, `transform`,
  * `aggregate`, `regexp_*`) — per-row, no shuffle, whole-stage-codegen
  * friendly, so each scales linearly to arbitrary data sizes. Formulas are
  * deliberately chosen to be expressible in ANSI-ish SQL too, so the DuckDB
  * oracle can replicate them bit-for-bit.
  */
object TextFunctions {

  /** Canonical text normalization: lower-case, trim, collapse whitespace. */
  def normalizeText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Document fingerprint: md5 of the normalized text. Stable across
    * engines (md5 is standardized), cheap, and the building block for
    * exact dedup at any scale (group/join on the 128-bit digest rather
    * than the full text → tiny shuffle). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Tokens: whitespace split of the trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** BPE-ish subword count approximation: word-piece regex tokens — runs of
    * letters, runs of digits, or single non-space punctuation. */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[\\p{L}]+|[0-9]+|[^\\s\\p{L}0-9]"), lit(0)))

  /** Word n-gram shingles from an already-materialized token array column.
    * `transform(sequence(...))` keeps this inside codegen; no UDF.
    *
    * PERF: pass an *attribute* (a real column), not an expensive expression —
    * subexpressions inlined into repeated lambda contexts are re-evaluated
    * per lambda instantiation (measured 8× slowdown when the tokenizer tree
    * was nested inside the 16 MinHash permutation lambdas). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array())
        .otherwise(
          transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)
          )
        )
    )

  /** Convenience one-shot shingles. Fine in a single projection; for reuse
    * across several downstream expressions, materialize via [[withShingles]]. */
  def wordShingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokens(normalizeText(c)), n)

  /** Materialize a shingle column in two collapsed-projection-safe steps. */
  def withShingles(df: org.apache.spark.sql.DataFrame, textCol: String,
                   outCol: String, n: Int): org.apache.spark.sql.DataFrame =
    graft.io.Parallelism.ensure(df)
      .withColumn("__graft_toks", tokens(normalizeText(col(textCol))))
      .withColumn(outCol, shinglesFromTokens(col("__graft_toks"), n))
      .drop("__graft_toks")

  /** Quality-score features (all per-row arithmetic, oracle-replicable):
    * alpha ratio, digit ratio, punctuation ratio, mean token length,
    * stopword ratio. Combined score in [0,1]-ish via a fixed linear blend. */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(c, lit("[\\p{L}]"), lit(0))).cast("double") / length(c))

  def digitRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(c, lit("[0-9]"), lit(0))).cast("double") / length(c))

  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(c, lit("[.,;:!?]"), lit(0))).cast("double") / length(c))

  val EnStopwords: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")

  /** Per-language stoplists for stopword-density gates (jusText is
    * stoplist-per-language). Marker subsets like [[LangMarkers]], not
    * exhaustive lists — what matters is that each is deterministic and
    * oracle-replayable. `zh` maps to the EMPTY list: jusText's published
    * recipe for stoplist-less (CJK) languages runs with no stopwords and
    * `stopwords_low = stopwords_high = 0`, i.e. the density gate is
    * bypassed rather than misfiring on every block. */
  val Stoplists: Map[String, Seq[String]] = Map(
    "en" -> EnStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "una", "para"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh" -> Seq.empty)

  def stopwordRatio(c: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val pat = stopwords.mkString("\\b(", "|", ")\\b")
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(lower(c), lit(pat), lit(0))).cast("double") / tokenCount(c))
  }

  /** Blended quality score. Weights are arbitrary but fixed; what matters is
    * determinism and that each feature is a meaningful filter signal.
    * Fenced at the definition: every consumer filters or re-references
    * the score, and without the fence each pushed/inferred predicate
    * re-inlines the four regex-count pipelines per reference
    * ([[Fence]] — the q136/q138 lesson applied at the source). */
  def qualityScore(c: Column): Column =
    Fence(alphaRatio(c) * 0.5 +
      (lit(1.0) - punctRatio(c)) * 0.2 +
      (lit(1.0) - digitRatio(c)) * 0.2 +
      least(tokenCount(c).cast("double") / 100.0, lit(1.0)) * 0.1)

  /** Language-ID heuristic: per-language stopword-hit counts + a CJK
    * character count; argmax with a fixed tie-break order (zh, en, de, es,
    * fr — matched by an explicit when-chain so the oracle can reproduce the
    * exact tie semantics). */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|that|with|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein)\\b",
    "es" -> "\\b(el|la|los|las|que|es|una|para)\\b",
    "fr" -> "\\b(le|la|les|des|est|une|dans|pour)\\b"
  )

  def langScore(c: Column, pattern: String): Column =
    size(regexp_extract_all(lower(c), lit(pattern), lit(0)))

  def cjkScore(c: Column): Column =
    size(regexp_extract_all(c, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))

  /** Argmax when-chain over (lang, score-column) pairs. Ties resolve in
    * declaration order. Pass *attribute* columns — each score is referenced
    * ~|langs| times in the chain, so inlining the regex-count expressions
    * re-evaluates them per comparison (measured: 12s → sub-second on 500
    * docs after materialization). */
  def langArgmax(all: Seq[(String, Column)]): Column =
    all.init.foldRight(lit(all.last._1): Column) { case ((lang, s), els) =>
      val geAll = all.filter(_._1 != lang).map { case (_, o) => s >= o }.reduce(_ && _)
      when(geAll, lit(lang)).otherwise(els)
    }

  /** Predicted language code. Ties resolve in declaration order:
    * zh > en > de > es > fr. Convenience single-column form — for real use
    * prefer [[withLangId]], which materializes the score columns. */
  def langId(c: Column): Column = {
    val all = ("zh" -> cjkScore(c)) +: LangMarkers.map { case (lang, pat) => lang -> langScore(c, pat) }
    langArgmax(all)
  }

  /** Materialized language-ID: adds `outCol` with the predicted language. */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
                 outCol: String): org.apache.spark.sql.DataFrame = {
    val scored = LangMarkers.foldLeft(
      graft.io.Parallelism.ensure(df).withColumn("__ls_zh", cjkScore(col(textCol)))
    ) { case (acc, (lang, pat)) => acc.withColumn(s"__ls_$lang", langScore(col(textCol), pat)) }
    val all = ("zh" +: LangMarkers.map(_._1)).map(l => l -> col(s"__ls_$l"))
    scored.withColumn(outCol, langArgmax(all))
      .drop(("zh" +: LangMarkers.map(_._1)).map(l => s"__ls_$l"): _*)
  }

  /** Polynomial rolling hash of the normalized text:
    * h = fold(chars, 0, (acc, ch) -> (acc * 31 + code(ch)) mod (1e9+7)).
    * Pure `aggregate` over a codepoint array — codegen'd, no UDF, and
    * replicable in DuckDB via list_reduce for the oracle. The modulus keeps
    * the accumulator < 2^30 so `acc * 31 + code` never overflows a long. */
  def rollingHash(c: Column): Column = {
    val norm = normalizeText(c)
    val codes = transform(
      sequence(lit(1), length(norm)),
      i => ascii(norm.substr(i, lit(1))).cast("long")
    )
    aggregate(codes, lit(0L), (acc, x) => (acc * 31 + x) % lit(1000000007L))
  }
}
