package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable character-n-gram Naive Bayes language classifier — the
  * model-based upgrade of [[graft.functions.TextFunctions.langId]]'s
  * fixed regex heuristic (fastText-style langID is char-ngram features +
  * a linear model; multinomial NB is the classic oracle-replayable
  * member of that family).
  *
  * Training is pure corpus aggregation — per-(label, gram) occurrence
  * counts, per-label totals, corpus vocabulary size, label priors — so
  * the WHOLE training run replays in SQL exactly like the BPE trainer
  * and k-means (q126/q68): the oracle recomputes the counts and the
  * add-one-smoothed score of every document and must land the same
  * prediction and 2-dp score.
  *
  * Scale shape: the gram stream is map-side (one explode of per-row
  * substrings); counts are one grams-keyed aggregate with map-side
  * partial combine; the model is vocab-sized (Zipf-bounded char n-grams
  * — at n=3 the universe is small regardless of corpus size) and ships
  * BROADCAST into scoring, which is one doc-keyed aggregate. Nothing
  * all-pairs, nothing driver-side but model state — the same contract
  * as the centroid trainers. Fp policy: raw `ln` terms summed through
  * the aggregate and rounded at the edge (q95's proven policy; label
  * score gaps are orders of magnitude above summation noise).
  */
object LangModel {

  /** Trained model: `langs` sorted ascending (tie order), per-lang
    * ln-priors and smoothing totals as driver scalars (model state, like
    * centroids), counts as a vocab-wide DataFrame (gram, <one count col
    * per lang>) for the broadcast scoring join. */
  final case class NbLangModel(
      langs: Seq[String],
      lnPriors: Map[String, Double],
      gramTotals: Map[String, Long],
      vocab: Long,
      countsWide: DataFrame,
      n: Int)

  /** Character n-grams of the normalized text (lowercase, collapsed
    * whitespace), one per position — occurrences, not a set. */
  def charNgrams(textCol: Column, n: Int): Column = {
    val t = TF.normalizeText(textCol)
    when(length(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
  }

  private def gramStream(docs: DataFrame, idCols: Seq[Column], textCol: String,
                         n: Int): DataFrame =
    graft.io.Parallelism.ensure(docs)
      .select(idCols :+ explode_outer(charNgrams(col(textCol), n)).as("gram"): _*)
      .filter(col("gram").isNotNull)

  /** Train on labeled documents. One distributed aggregate over the gram
    * stream; only model-sized state (L scalars + the vocab-wide counts
    * relation) leaves it. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            n: Int = 3): NbLangModel = {
    val grams = gramStream(docs, Seq(col(labelCol).as("__lang")), textCol, n)
    val counts = grams.groupBy(col("__lang"), col("gram"))
      .agg(count(lit(1)).as("cnt")).cache()
    val langs = docs.select(col(labelCol)).distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val totals = counts.groupBy(col("__lang")).agg(sum(col("cnt")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = counts.select(col("gram")).distinct().count()
    val docCounts = docs.groupBy(col(labelCol)).agg(count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalDocs = docCounts.values.sum
    val lnPriors = docCounts.map { case (l, d) =>
      l -> math.log(d.toDouble / totalDocs.toDouble)
    }
    val countsWide = counts.groupBy(col("gram"))
      .pivot("__lang", langs).agg(sum(col("cnt")))
    NbLangModel(langs, lnPriors, totals, vocab, countsWide, n)
  }

  /** Score every document against every label and keep the argmax
    * (ties → lexicographically smaller label). Output:
    * (id, pred_lang, score) with score = ln prior + Σ ln P(gram|label),
    * add-one smoothed, rounded 2 dp. Unseen grams smooth to count 0;
    * gram-less documents score on the prior alone. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: NbLangModel): DataFrame = {
    val grams = gramStream(docs, Seq(col(idCol).as("id")), textCol, model.n)
    val joined = grams.join(broadcast(model.countsWide), Seq("gram"), "left")
    def lnTerm(l: String): Column =
      sum(log((coalesce(col(s"`$l`"), lit(0L)) + 1).cast("double") /
        lit(model.gramTotals.getOrElse(l, 0L) + model.vocab).cast("double")))
        .as(s"__s_$l")
    val sums = joined.groupBy(col("id"))
      .agg(lnTerm(model.langs.head), model.langs.drop(1).map(lnTerm): _*)
    val scoredStructs = array(model.langs.map { l =>
      struct((-(lit(model.lnPriors(l)) + coalesce(col(s"__s_$l"), lit(0.0))))
        .as("neg"), lit(l).as("lang"))
    }: _*)
    docs.select(col(idCol).as("id"))
      .join(sums, Seq("id"), "left")
      .withColumn("__best", array_min(scoredStructs))
      .select(col("id"),
        col("__best.lang").as("pred_lang"),
        round(-col("__best.neg"), 2).as("score"))
  }

  /** Train on the corpus's own labels and classify the same corpus —
    * the self-consistency run the oracle replays end-to-end. */
  def trainPredict(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: String, n: Int = 3): DataFrame =
    predict(docs, idCol, textCol, train(docs, textCol, labelCol, n))
}
