package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data curation — the operators that
  * need a view across documents (the per-row text signals live in
  * [[graft.functions.TextFunctions]]).
  *
  * Every score is deliberately transcendental-free (ratios of exact
  * integer counts in double arithmetic), so the DuckDB oracle reproduces
  * results bit-for-bit — same policy as the cosine/quality formulas.
  */
object CorpusStats {

  /** TF-IDF top-k terms per document, with a raw-ratio idf
    * (`score = tf · N / df` — rank-equivalent to log-idf for fixed tf since
    * log is monotone, and exactly reproducible cross-engine).
    *
    * Plan shape at scale: one shuffle for per-(doc, term) counts with
    * map-side partial aggregation, one for document frequency (|terms|
    * rows), then a term-keyed join back — term frequency follows Zipf, so
    * AQE's skew-join split handles the stopword keys. The corpus size N
    * rides in as a broadcast 1-row aggregate (no driver collect). Top-k is
    * a per-doc window on the scored rows — |doc×term| input, but the
    * ordering key is (score, term) within a doc partition, never global. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // explode_OUTER, deliberately: plain explode lets Catalyst's
    // InferFiltersFromGenerate push `size(<token pipeline>) > 0` down into
    // the scan filter, re-evaluating the whole tokenizer per input row
    // (the repo's documented 30×-class trap). The outer variant infers
    // nothing; empty docs emit one null term that the length filter drops.
    val toks = graft.io.Parallelism.ensure(docs)
      .select(col(idCol), explode_outer(TF.tokens(TF.normalizeText(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // broadcast the doc-frequency side: it is vocabulary-sized (|distinct
    // terms|), while tf is |doc×term| — hash-joining in place spares the
    // big side its term-keyed shuffle AND the stopword-skew that shuffle
    // would carry. (For a corpus whose vocabulary outgrows broadcast,
    // drop the hint and AQE's skew-split handles the stopword keys.)
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf") * col("n_docs")) / col("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Gopher-style repetition signal: the fraction of word n-grams that are
    * repeats of an earlier n-gram in the same document,
    * `1 − distinct/total`. Pure per-row arithmetic over the shared
    * tokenizer — no shuffle, whole-stage codegen. High values mark the
    * boilerplate/spam documents repetition filters drop before training. */
  def withRepetition(docs: DataFrame, textCol: String, outPrefix: String = "",
                     n: Int = 3): DataFrame = {
    val p = outPrefix
    graft.io.Parallelism.ensure(docs)
      .withColumn("__toks", TF.tokens(TF.normalizeText(col(textCol))))
      .withColumn(s"${p}total_ngrams", greatest(size(col("__toks")) - (n - 1), lit(0)))
      .withColumn(s"${p}distinct_ngrams", size(TF.shinglesFromTokens(col("__toks"), n)))
      .withColumn(s"${p}rep_frac",
        when(col(s"${p}total_ngrams") === 0, lit(0.0))
          .otherwise(lit(1.0) -
            col(s"${p}distinct_ngrams").cast("double") / col(s"${p}total_ngrams")))
      .drop("__toks")
  }

  /** Unigram language-model quality score: each document's mean token
    * log-probability under an add-one-smoothed unigram model trained on the
    * corpus itself — the cheap statistical stand-in for the perplexity
    * filters (CCNet-style) that rank documents by "looks like the
    * reference corpus". Low scores mark gibberish, boilerplate and
    * wrong-language text; emitted per document as
    * (idCol, n_tokens, avg_logprob ROUNDED to 2 dp — the shuffled-aggregate
    * float policy, since per-doc summation order is engine-dependent).
    *
    * Model: p(t) = (count(t) + 1) / (total + |vocab|), ln-scores.
    *
    * Plan shape at scale: one shuffle builds the vocabulary counts (map-side
    * partial aggregation; vocabulary-sized result), which then BROADCASTS
    * back against the exploded token stream — the |doc×token| side never
    * shuffles on the token key (the same broadcast-the-small-side layout as
    * [[tfidfTopTerms]]'s dfreq, with the same stopword-skew rationale).
    * The final per-doc mean is the only big-side shuffle, keyed by doc id —
    * uniformly distributed, no skew. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explode_OUTER for the documented InferFiltersFromGenerate reason;
    // empty docs emit a null token dropped by the length filter.
    val toks = graft.io.Parallelism.ensure(docs)
      .select(col(idCol), explode_outer(TF.tokens(TF.normalizeText(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("vocab"))
    val scored = toks
      .join(broadcast(counts), "term")
      .crossJoin(broadcast(totals))
      .withColumn("__lp",
        log((col("cnt") + 1).cast("double") / (col("total") + col("vocab")).cast("double")))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("__lp")), 2).as("avg_logprob"))
  }

  /** Winnowing fingerprints (the MOSS/local-minimum scheme): positional
    * k-gram hashes, then within every window of `w` consecutive hashes the
    * minimum is selected (rightmost occurrence on ties), and the distinct
    * selected (position, hash) pairs are the document's fingerprints.
    * Winnowing's guarantee: any shared substring of ≥ (w + k − 1) tokens
    * between two documents yields at least one IDENTICAL fingerprint —
    * the basis for partial-overlap / plagiarism-style detection that
    * whole-document MinHash cannot see (MinHash needs global similarity;
    * winnowing localizes).
    *
    * Emits one row per fingerprint: (idCol, pos, fp) with `pos` the
    * 1-based k-gram position. PURE PER-ROW work (nested higher-order
    * functions over the hash array — no shuffle, no UDF); downstream
    * matching is a group/join on the 32-bit fp exactly like exact-dedup's
    * digest join. Hash = first 8 hex chars of md5(gram), engine-portable
    * the same way as [[Curation.hashBucket]]. */
  /** Shared gram-hash pipeline: tokens → positional k-grams → 32-bit
    * hashes, each materialized as a real column so no stage re-evaluates
    * its predecessor per lambda. Adds `__toks`/`__grams`/`__hs` to the
    * frame; consumed by [[winnowFingerprints]] (window-min selection) and
    * [[Dedup.repeatedSpans]] (all-position stream). */
  private[operators] def withGramHashes(docs: DataFrame, idCol: String,
                                        textCol: String, k: Int): DataFrame =
    graft.io.Parallelism.ensure(docs)
      .withColumn("__toks", TF.tokens(TF.normalizeText(col(textCol))))
      .withColumn("__grams",
        when(size(col("__toks")) < k, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), size(col("__toks")) - k),
            i => concat_ws(" ", (0 until k).map(j => element_at(col("__toks"), i + j + 1)): _*))))
      .withColumn("__hs",
        transform(col("__grams"), g => conv(substring(md5(g), 1, 8), 16, 10).cast("long")))

  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    val base = withGramHashes(docs, idCol, textCol, k)
    val m = size(col("__hs"))
    // window starts: 1..m−w+1 (a single clamped window when 0 < m < w)
    val nWin = greatest(m - w + 1, lit(1))
    val sels = when(m === 0, array().cast("array<struct<pos:int,fp:bigint>>"))
      .otherwise(array_distinct(transform(sequence(lit(1), nWin), s => {
        val sl = slice(col("__hs"), s, lit(w))
        val minv = array_min(sl)
        // rightmost index of the min inside the window (winnowing tie rule)
        val rj = array_max(filter(sequence(lit(1), size(sl)), j => element_at(sl, j) === minv))
        struct((s - 1 + rj).cast("int").as("pos"), minv.as("fp"))
      })))
    base.withColumn("__sels", sels)
      // explode_outer + null-filter on the OUTPUT, not plain explode: the
      // inferred size(__sels) > 0 scan filter would re-run the whole
      // token→gram→hash pipeline per input row (the documented trap).
      .select(col(idCol), explode_outer(col("__sels")).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Materialized (doc, prev, cur) bigram stream — shared by
    * [[bigramLogProb]] and [[pmiCollocations]]. Tokens and the bigram
    * struct array are real columns (the per-lambda re-evaluation rule),
    * the generator is outer + null-filtered (the InferFilters rule). */
  private def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.io.Parallelism.ensure(docs)
      .withColumn("__toks", TF.tokens(TF.normalizeText(col(textCol))))
      .withColumn("__bgs",
        when(size(col("__toks")) < 2, array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(2), size(col("__toks"))),
            i => struct(element_at(col("__toks"), i - 1).as("a"),
              element_at(col("__toks"), i).as("b")))))
      .select(col(idCol), explode_outer(col("__bgs")).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col(idCol), col("bg.a").as("a"), col("bg.b").as("b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)

  /** Bigram language-model quality score: mean ln p(wᵢ | wᵢ₋₁) under an
    * add-one-smoothed conditional model trained on the corpus —
    * p(b|a) = (c(a,b)+1) / (c(a)+|vocab|). The sequence-aware upgrade of
    * [[unigramLogProb]] (catches shuffled-word gibberish a unigram model
    * scores as fluent). Same broadcast-the-counts plan shape; rounded to
    * 2 dp per the shuffled-aggregate policy. Documents with fewer than
    * two tokens emit nothing. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bgs = bigramStream(docs, idCol, textCol)
    val bigCounts = bgs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val toks = graft.io.Parallelism.ensure(docs)
      .select(explode_outer(TF.tokens(TF.normalizeText(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val uniCounts = toks.groupBy(col("term")).agg(count(lit(1)).as("ca"))
    val vocab = uniCounts.agg(count(lit(1)).as("vocab"))
    bgs
      .join(broadcast(bigCounts), Seq("a", "b"))
      .join(broadcast(uniCounts.withColumnRenamed("term", "a")), Seq("a"))
      .crossJoin(broadcast(vocab))
      .withColumn("__lp",
        log((col("cab") + 1).cast("double") / (col("ca") + col("vocab")).cast("double")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("__lp")), 2).as("avg_logprob"))
  }

  /** PMI collocations: the corpus's top word pairs by pointwise mutual
    * information, `ln((c(ab)/N₂) / ((c(a)/N₁)·(c(b)/N₁)))`, restricted to
    * pairs seen ≥ `minCount` times (PMI of rare pairs is noise). The
    * standard collocation detector ("new york"-style units a tokenizer
    * should learn). All counts exact; the PMI double mirrors in SQL,
    * rounded to 2 dp. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Int, topK: Int): DataFrame = {
    val bgs = bigramStream(docs, idCol, textCol)
    val bigCounts = bgs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val n2 = bigCounts.agg(sum(col("cab")).as("n2"))
    val toks = graft.io.Parallelism.ensure(docs)
      .select(explode_outer(TF.tokens(TF.normalizeText(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val uniCounts = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val n1 = uniCounts.agg(sum(col("c")).as("n1"))
    bigCounts.filter(col("cab") >= minCount)
      .join(broadcast(uniCounts.select(col("term").as("a"), col("c").as("ca"))), Seq("a"))
      .join(broadcast(uniCounts.select(col("term").as("b"), col("c").as("cb"))), Seq("b"))
      .crossJoin(broadcast(n2)).crossJoin(broadcast(n1))
      .withColumn("pmi", round(log(
        (col("cab").cast("double") / col("n2").cast("double")) /
          ((col("ca").cast("double") / col("n1").cast("double")) *
            (col("cb").cast("double") / col("n1").cast("double")))), 2))
      .select(col("a"), col("b"), col("cab"), col("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Benchmark decontamination: per training document, how many of its
    * distinct word n-gram shingles also appear anywhere in the evaluation
    * set — the overlap filter run before training so eval data doesn't
    * leak into the corpus (any count ≥ 1 is a contamination flag).
    *
    * Plan shape at scale: the eval side collapses to its DISTINCT shingle
    * set (small relative to the corpus — benchmarks are thousands of
    * documents, not billions), which broadcasts; the training side explodes
    * shingles and map-side joins against it, so the only shuffle is the
    * final per-doc count. Returns (idCol, n_shared) for contaminated docs
    * only. */
  def contaminationCounts(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // explode_outer for the same InferFiltersFromGenerate reason as above:
    // with plain explode the inferred size/notnull predicates push the full
    // shingle pipeline into the scan filter (measured 32 s → 1.4 s at sf0.1
    // for this operator). Null shingle rows die in the inner join below.
    def exploded(df: DataFrame): DataFrame =
      TF.withShingles(df, textCol, "__sh", n)
        .select(col(idCol), explode_outer(col("__sh")).as("__s"))
    val benchSet = exploded(eval).select(col("__s")).distinct().filter(col("__s").isNotNull)
    exploded(train)
      .join(broadcast(benchSet), "__s") // shingles are distinct per doc → count = distinct overlap
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
