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
