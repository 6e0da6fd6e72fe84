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
    * ln-priors and smoothing totals as driver scalars, per-gram per-lang
    * counts as model state (vocab × L longs — charset^n-bounded for char
    * n-grams, capped deterministically by `maxVocab` mass otherwise; the
    * same model-fits-in-memory contract as centroid matrices and the BPE
    * vocab). */
  final case class NbLangModel(
      langs: Seq[String],
      docCounts: Map[String, Long],
      gramTotals: Map[String, Long],
      vocab: Long,
      counts: Map[String, Array[Long]],
      n: Int,
      hashBits: Int = 0) {

    /** ln(docs_l / total docs) — derived, so merged models re-normalize. */
    @transient lazy val lnPriors: Map[String, Double] = {
      val total = docCounts.values.sum.toDouble
      docCounts.map { case (l, d) => l -> math.log(d.toDouble / total) }
    }

    /** Precomputed ln-term table for the broadcast scoring expression. */
    @transient lazy val scoreModel: graft.functions.expressions.NbScoreModel = {
      val denoms = langs.map(l => (gramTotals.getOrElse(l, 0L) + vocab).toDouble).toArray
      graft.functions.expressions.NbScoreModel(
        langs.length,
        counts.map { case (g, cs) =>
          g -> Array.tabulate(langs.length)(l => math.log((cs(l) + 1).toDouble / denoms(l)))
        },
        Array.tabulate(langs.length)(l => math.log(1.0 / denoms(l))))
    }
  }

  /** Character n-grams of the normalized text (lowercase, collapsed
    * whitespace), one per position — occurrences, not a set.
    *
    * NOTE for plan authors: this inlines the normalization INTO the
    * substr lambda — fine for specs/small frames, but a hot path must
    * materialize the normalized text first ([[charNgramsOfNorm]]):
    * higher-order-function lambdas re-evaluate their subtrees once per
    * ELEMENT, so the normalize regex runs ~|text| times per document
    * here (the repo-wide HOF-nesting trap; measured 64 s vs 9 s at ×10
    * on the classify path). */
  def charNgrams(textCol: Column, n: Int): Column =
    charNgramsOfNorm(TF.normalizeText(textCol), n)

  /** [[charNgrams]] over an ALREADY-materialized normalized-text
    * column: the lambda's substr references an attribute, so the
    * per-element work is one substring — nothing re-evaluates. */
  def charNgramsOfNorm(norm: Column, n: Int): Column =
    when(length(norm) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n))))

  /** HASHED feature bucket of a gram — the feature-hashing trick that
    * bounds model memory at higher n-gram orders (vocab ≤ 2^bits instead
    * of charsetⁿ), trading exactness for the standard collision risk.
    * The hash is the first 8 md5 hex digits parsed base-16, mod 2^bits —
    * chosen because BOTH engines compute it identically (Spark:
    * `conv(substr(md5(g),1,8),16,10)`; DuckDB:
    * `('0x'||substr(md5(g),1,8))::BIGINT`), so hashed TRAINING replays
    * end-to-end in the oracle — a faster engine-private hash (xxhash64)
    * has no DuckDB twin and would demote the gate to rows-only. */
  def hashedBucket(g: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 30, "hashBits in [1, 30]")
    (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % (1L << bits)).cast("string")
  }

  /** Gram feature column over materialized normalized text: raw
    * positional n-grams, or their hashed buckets when `hashBits > 0`. */
  private def gramExprOfNorm(norm: Column, n: Int, hashBits: Int): Column = {
    val gs = charNgramsOfNorm(norm, n)
    if (hashBits <= 0) gs else transform(gs, g => hashedBucket(g, hashBits))
  }

  private def gramStream(docs: DataFrame, idCols: Seq[Column], textCol: String,
                         n: Int, hashBits: Int = 0): DataFrame =
    graft.io.Parallelism.ensure(docs)
      // normalize ONCE per document into a real (fenced) column — never
      // inside the gram lambda (see charNgrams)
      .withColumn("__nrm", graft.functions.Fence(TF.normalizeText(col(textCol))))
      .select(idCols :+
        explode_outer(gramExprOfNorm(col("__nrm"), n, hashBits)).as("gram"): _*)
      .filter(col("gram").isNotNull)

  /** Train on labeled documents. One distributed aggregate over the gram
    * stream; only model-sized state (L scalars + the vocab × L count
    * table, `maxVocab`-mass-capped deterministically — unbound in the
    * oracle configuration, where vocab ≪ the cap) leaves it. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            n: Int = 3, maxVocab: Int = 1 << 20, hashBits: Int = 0): NbLangModel = {
    val grams = gramStream(docs, Seq(col(labelCol).as("__lang")), textCol, n, hashBits)
    val counts = grams.groupBy(col("__lang"), col("gram"))
      .agg(count(lit(1)).as("cnt")).cache()
    // one pass yields both the label universe and the per-label doc
    // counts (priors) — label-count-sized driver state
    val docCountRows = docs.groupBy(col(labelCol)).agg(count(lit(1)).as("d"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    require(!docCountRows.exists(_._1 == null),
      s"$labelCol contains null labels — labels must be non-null strings")
    val docCounts = docCountRows.map { case (l, d) => l.asInstanceOf[String] -> d }.toMap
    val langs = docCounts.keys.toSeq.sorted
    require(langs.nonEmpty, "cannot train a classifier on zero labeled documents")
    val langIdx = langs.zipWithIndex.toMap
    // keep the maxVocab highest-mass grams (cnt desc, gram — deterministic);
    // a no-op below the cap, so V and the counts match the uncapped oracle
    val countRows = counts
      .join(counts.groupBy(col("gram")).agg(sum(col("cnt")).as("__tot"))
        .orderBy(col("__tot").desc, col("gram")).limit(maxVocab)
        .select(col("gram")), Seq("gram"), "left_semi")
      .collect()
    val table = scala.collection.mutable.HashMap.empty[String, Array[Long]]
    countRows.foreach { r =>
      val arr = table.getOrElseUpdate(r.getAs[String]("gram"), new Array[Long](langs.length))
      arr(langIdx(r.getAs[String]("__lang"))) = r.getAs[Long]("cnt")
    }
    val totals = langs.map { l =>
      val i = langIdx(l)
      l -> table.valuesIterator.map(_(i)).sum
    }.toMap
    counts.unpersist()
    NbLangModel(langs, docCounts, totals, table.size.toLong, table.toMap, n, hashBits)
  }

  /** Feature-hashed training — [[train]] over 2^bits hash buckets
    * instead of raw grams. BOUNDED model memory at any n-gram order
    * (SURVEY.md §7.4b item 3): the count table can never exceed
    * 2^bits × L longs no matter how the corpus grows, so n ≥ 4 works
    * without the `maxVocab` truncation cap. Collisions merge gram
    * statistics (the standard hashing-trick trade — at n=3 with
    * bits ≥ 20 the ~30k-gram universe is effectively collision-free,
    * spec-asserted identical predictions to the exact model). */
  def trainHashed(docs: DataFrame, textCol: String, labelCol: String,
                  n: Int = 3, hashBits: Int = 12): NbLangModel =
    train(docs, textCol, labelCol, n, maxVocab = 1 << 30, hashBits = hashBits)

  /** Merge two independently-trained models — the NB state (gram counts,
    * doc counts) is a MONOID, so sharded/incremental training folds
    * exactly: `merge(train(A), train(B)) == train(A ∪ B)` bit-for-bit
    * (integer state; priors/smoothing re-derive from the merged counts).
    * This is what makes the training plane incremental at 100 TB: daily
    * partials train independently and fold, the same shape as
    * [[graft.ops.IncrementalAgg]] / the streaming sinks. (Exact equality
    * assumes the shards trained with an unbound `maxVocab` — a binding
    * cap truncates per shard, like any sketch-before-merge.) */
  def merge(a: NbLangModel, b: NbLangModel): NbLangModel = {
    require(a.n == b.n, s"n-gram orders differ: ${a.n} vs ${b.n}")
    require(a.hashBits == b.hashBits,
      s"hash widths differ: ${a.hashBits} vs ${b.hashBits}")
    val langs = (a.langs ++ b.langs).distinct.sorted
    def zeros = new Array[Long](langs.length)
    def remap(m: NbLangModel): Map[String, Array[Long]] = {
      val idx = m.langs.map(l => langs.indexOf(l)).toArray
      m.counts.map { case (g, cs) =>
        val out = zeros
        var i = 0
        while (i < cs.length) { out(idx(i)) += cs(i); i += 1 }
        g -> out
      }
    }
    val merged = scala.collection.mutable.HashMap.empty[String, Array[Long]]
    Seq(remap(a), remap(b)).foreach(_.foreach { case (g, cs) =>
      val slot = merged.getOrElseUpdate(g, zeros)
      var i = 0
      while (i < cs.length) { slot(i) += cs(i); i += 1 }
    })
    val totals = langs.map { l =>
      l -> (a.gramTotals.getOrElse(l, 0L) + b.gramTotals.getOrElse(l, 0L))
    }.toMap
    val docCounts = langs.map { l =>
      l -> (a.docCounts.getOrElse(l, 0L) + b.docCounts.getOrElse(l, 0L))
    }.toMap
    NbLangModel(langs, docCounts, totals, merged.size.toLong, merged.toMap, a.n,
      a.hashBits)
  }

  /** Score every document against every label and keep the argmax
    * (ties → lexicographically smaller label). Output:
    * (id, pred_lang, score) with score = ln prior + Σ ln P(gram|label),
    * add-one smoothed, rounded 2 dp. Unseen grams smooth to count 0;
    * gram-less documents score on the prior alone.
    *
    * Scale shape: ONE broadcast of the ln-term table consumed by the
    * [[graft.functions.expressions.NbScores]] codegen fold — per-row
    * scoring, no gram explode, no join, no shuffle before the caller's
    * ordering (the join formulation pushed ~1500 gram rows PER DOCUMENT
    * through an exchange; measured 88.6 s → map-side at ×100). Kept as
    * [[predictJoined]] for the spec-asserted reference. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: NbLangModel): DataFrame =
    classify(graft.io.Parallelism.ensure(docs), textCol, model)
      .select(col(idCol).as("id"), col("pred_lang"), col("score"))

  /** Append `pred_lang`/`score` to ANY frame with a text column — the
    * frozen-model serving form: pure per-row expressions (the score fold
    * materialized ONCE as a real column, then the argmax over it — never
    * re-evaluated per label), so it drops into batch plans and Structured
    * Streaming micro-batches alike (q139 streams documents through it,
    * exactly like the frozen IVF-PQ encode in
    * [[graft.streaming.AnnStream]]).
    *
    * The fold and the argmax are wrapped in
    * [[graft.functions.Fence]] so "materialized once" survives the
    * optimizer for EVERY consumer: without it, a downstream equi-filter
    * or join on `pred_lang` lets `InferFiltersFromConstraints` +
    * predicate pushdown inline the whole scoring pipeline into a Filter
    * conjunct below these projections (measured 16 s vs 1.4 s on q136
    * before the fence — then worked around per-call-site with `<=>`).
    * `pred_lang`/`score` stay unfenced getFields, so consumers'
    * predicates settle cheaply just above the fence. */
  def classify(df: DataFrame, textCol: String, model: NbLangModel): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val bc = df.sparkSession.sparkContext.broadcast(model.scoreModel)
    val scores = column(graft.functions.expressions.NbScores(
      expression(gramExprOfNorm(col("__nrm"), model.n, model.hashBits)), bc))
    val scoredStructs = array(model.langs.zipWithIndex.map { case (l, i) =>
      struct((-(lit(model.lnPriors(l)) +
        coalesce(element_at(col("__s"), i + 1), lit(0.0)))).as("neg"),
        lit(l).as("lang"))
    }: _*)
    // normalize ONCE into a fenced column: nested in the gram lambda the
    // regex re-runs per ELEMENT — ~|text| evaluations per document
    // (measured 64 s vs 9 s at ×10 for this exact path)
    df.withColumn("__nrm", graft.functions.Fence(TF.normalizeText(col(textCol))))
      .withColumn("__s", graft.functions.Fence(scores))
      .withColumn("__best", graft.functions.Fence(array_min(scoredStructs)))
      .withColumn("pred_lang", col("__best.lang"))
      .withColumn("score", round(-col("__best.neg"), 2))
      .drop("__nrm", "__s", "__best")
  }

  /** The join formulation of [[predict]] — gram stream ⟕ broadcast
    * counts → doc-keyed ln-term sums. Reference implementation the
    * broadcast-fold path is spec-asserted against. */
  def predictJoined(docs: DataFrame, idCol: String, textCol: String,
                    model: NbLangModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wide = model.counts.toSeq.map { case (g, cs) => (g, cs.toSeq) }
      .toDF("gram", "__cs")
    val grams = gramStream(docs, Seq(col(idCol).as("id")), textCol, model.n,
      model.hashBits)
    val joined = grams.join(broadcast(wide), Seq("gram"), "left")
    def lnTerm(l: String, i: Int): Column =
      sum(log((coalesce(element_at(col("__cs"), i + 1), lit(0L)) + 1).cast("double") /
        lit(model.gramTotals.getOrElse(l, 0L) + model.vocab).cast("double")))
        .as(s"__s_$i")
    val sums = joined.groupBy(col("id"))
      .agg(lnTerm(model.langs.head, 0),
        model.langs.drop(1).zipWithIndex.map { case (l, i) => lnTerm(l, i + 1) }: _*)
    val scoredStructs = array(model.langs.zipWithIndex.map { case (l, i) =>
      struct((-(lit(model.lnPriors(l)) + coalesce(col(s"__s_$i"), lit(0.0))))
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

  /** Weak quality labels for classifier distillation (CCNet-style): the
    * heuristic score's top/bottom quartiles become 'hi'/'lo' training
    * labels. Quartile membership follows the exact `ntile(4) OVER
    * (ORDER BY quality, id)` tile sizes (so the oracle replays it with a
    * literal ntile), but the ENGINE never builds that total order: the
    * two boundary `(quality, id)` pairs are found with
    * [[Quantiles.kthPair]] (distributed selection — approx_percentile
    * pivots + exact count guards) and membership becomes two pure
    * FILTERS. No WindowExec anywhere in the plan; at 100 TB the ranking
    * is a handful of map-side aggregates over a cached (id, quality)
    * projection instead of one executor sorting every document. The
    * `sampleBp` deterministic hash-sample knob (content-addressed like
    * [[Curation.hashSplit]]) remains for corpora where even the labeled
    * quartiles should come from a sample. */
  def qualityWeakLabels(docs: DataFrame, idCol: String, textCol: String,
                        sampleBp: Int = 10000): DataFrame = {
    require(sampleBp > 0 && sampleBp <= 10000, "sampleBp in (0, 10000]")
    val sampled =
      if (sampleBp == 10000) docs
      else docs.filter(Curation.hashBucket(col(idCol), 10000) < sampleBp)
    // qualityScore is fenced at its definition: the threshold frame's
    // isNotNull and the labeling filter's 4-term OR each reference the
    // column several times, and without the fence the optimizer inlined
    // the whole regex pipeline once PER reference (measured 250 s vs
    // ~80 s at ×100 — the scoring pass ran ~4×)
    val quality = graft.functions.TextFunctions.qualityScore(col(textCol))
    val qf = sampled
      .select(col(idCol).as("__id"), quality.as("__q"))
      .filter(col("__q").isNotNull).cache()
    try {
      val n = qf.count()
      val base = n / 4
      val rem = n % 4
      val s1 = base + (if (rem >= 1) 1L else 0L) // tile-1 size
      // tile 4 = the last `base` rows = rank > n - base
      val lo: Column =
        if (s1 < 1) lit(false)
        else {
          val (qv, qi) = Quantiles.kthPair(qf, "__q", "__id", s1, n)
          col("quality") < lit(qv) ||
            (col("quality") === lit(qv) && col(idCol) <= lit(qi))
        }
      val hi: Column =
        if (base < 1) lit(false)
        else {
          val (qv, qi) = Quantiles.kthPair(qf, "__q", "__id", n - base, n)
          col("quality") > lit(qv) ||
            (col("quality") === lit(qv) && col(idCol) > lit(qi))
        }
      sampled
        .withColumn("quality", quality)
        .filter(lo || hi)
        .withColumn("qlabel", when(hi, lit("hi")).otherwise(lit("lo")))
    } finally qf.unpersist() // labeled output is cached by callers
  }
}
