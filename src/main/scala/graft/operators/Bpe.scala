package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable byte-pair encoding: learn a merge table from the corpus,
  * then tokenize with it — the learned-vocab upgrade of
  * [[TF.subwordCount]]'s regex heuristic (packing/truncation/curriculum
  * operators consume token counts; a trained vocab makes them real).
  *
  * Training runs on the DISTINCT-WORD frequency table, not the token
  * stream — the classic Sennrich formulation and the scale lever: a
  * 100 TB corpus has billions of tokens but a Zipf-bounded distinct-word
  * set, so each iteration's pair count aggregates |vocab| rows, and the
  * corpus itself is touched exactly once (word counting). Each merge
  * iteration is one distributed pair-count aggregate + a 1-row argmax
  * collect + a map-side fold over the word symbols — the same
  * driver-roundtrip-of-scalars shape as [[Similarity.kmeansFit]] (k·dim
  * doubles there, one (lhs, rhs) pair here; never row data).
  *
  * Determinism: no RNG anywhere — ties on pair count break
  * lexicographically on (lhs, rhs), so the DuckDB oracle replays the
  * whole training loop exactly (closed-form greedy merge per iteration:
  * occurrence islands + position parity instead of the fold).
  */
object Bpe {

  /** Ordered merge table. */
  final case class BpeModel(merges: Seq[(String, String)])

  /** Distinct words of the normalized corpus with occurrence counts. */
  def wordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.io.Parallelism.ensure(docs)
      .select(explode_outer(TF.tokens(TF.normalizeText(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** One greedy left-to-right merge pass of pair (a, b) over a symbol
    * array: scan left to right, replacing each non-overlapping adjacent
    * (a, b) with the concatenation. Sequential `aggregate` fold — the
    * recurrence is non-associative (overlap consumption), same reasoning
    * as [[Packer]]'s greedy fill. */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Words split to character symbols: (word, cnt, syms). */
  def charWords(words: DataFrame): DataFrame =
    words.withColumn("syms",
      transform(sequence(lit(1), length(col("word"))), i => col("word").substr(i, lit(1))))

  /** Train `numMerges` BPE merges. Returns the model and the final
    * segmented word table (word, cnt, syms) — the segmentation IS the
    * trained tokenizer applied to the training vocabulary. Stops early if
    * the corpus runs out of adjacent pairs. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int): (BpeModel, DataFrame) = {
    var words = charWords(wordCounts(docs, idCol, textCol)).cache()
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to numMerges if !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val next = words.withColumn("syms", mergeOnce(col("syms"), a, b)).cache()
        next.count() // materialize before dropping the parent cache
        words.unpersist()
        words = next
      }
    }
    (BpeModel(merges.toSeq), words)
  }

  /** Corpus-weighted adjacent-pair counts over the segmented words. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"),
        explode_outer(when(size(col("syms")) < 2,
            array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(2), size(col("syms"))),
            i => struct(element_at(col("syms"), i - 1).as("a"),
              element_at(col("syms"), i).as("b"))))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** Apply a trained model to a symbol array column (merges in training
    * order — standard BPE inference). N chained folds; callers tokenizing
    * a large stream should join against a pre-segmented vocabulary
    * instead (see [[train]]'s returned word table). */
  def segment(syms: Column, model: BpeModel): Column =
    model.merges.foldLeft(syms) { case (c, (a, b)) => mergeOnce(c, a, b) }

  /** Learned-vocab token counts per document: the word stream joined to
    * the trained segmentation — the corpus is scanned once and only
    * (word) keys shuffle; piece counts ride the Zipf-small vocab side. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  segmented: DataFrame): DataFrame = {
    val stream = graft.io.Parallelism.ensure(docs)
      .select(col(idCol), explode_outer(TF.tokens(TF.normalizeText(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
    stream.join(broadcast(segmented.select(col("word"), size(col("syms")).as("__np"))), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__np")).as("n_bpe_tokens"))
  }
}
