package graft

import graft.functions.{MinHash, SimHash, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Curation, Dedup, Multimodal, Similarity}
import graft.ops.{Scd2, StarSchema}
import graft.pipeline.FixedClock
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-join, session-window, DPP, curation and trained-index builders (q114–q130): stream-static joins, priority dedup, BPE training, repeated spans, streaming ANN maintenance.
  * Mixed into [[SparkEntry]]; split from the single-file registry for
  * maintainability — the `queries` map and driver contract live there.
  */
private[graft] trait QueriesIndexStream extends QueryBase {
  /** STREAM-STATIC join (its own join planning path in Structured
    * Streaming — the static side re-broadcasts per micro-batch): events
    * stream against a static event-type weight table, weighted hourly
    * totals. Batch twin = the same join + aggregation run unstreamed. */
  private[graft] def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // integer weights keep products on the data's 2-decimal grid, so the
    // rounded sums never sit on a .005 boundary (a 0.1 weight produced
    // 3-decimal products whose sums landed EXACTLY on x.xx5 — engine fp
    // error direction then decided the rounding, 2/2021 groups flipped)
    val weights = Seq(("click", 1.0), ("view", 2.0), ("purchase", 10.0))
      .toDF("event_type", "weight")
    val stream = graft.streaming.EventStream.readEventsNanos(s, s"$dir/events.parquet")
    val joined = stream.join(broadcast(weights), Seq("event_type"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value") * col("weight")).as("weighted_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), round(col("weighted_value"), 2).as("weighted_value"))
    graft.streaming.EventStream.runBounded(s, joined, "graft_q114_sink")
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** The SQL front-end over the extension functions: q97's Morton key
    * computed entirely in `spark.sql` through the GraftExtensions-
    * registered `zorder_value` — proving the layout functions are
    * first-class for SQL users (same oracle as q97). */
  private[graft] def q115(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderkey,
        |  zorder_value(16, o_custkey,
        |    datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01')) AS zval
        |FROM orders_v ORDER BY o_orderkey""".stripMargin)
  }

  /** Sessionization through Spark's BUILT-IN `session_window` aggregate,
    * pinned to q32's oracle — the fourth formulation of the same
    * semantics (lag+cumsum window q32, flatMapGroupsWithState q58,
    * transformWithState q65, session_window here), all provably
    * equivalent through one oracle. At scale this is the formulation to
    * prefer: a single hash-aggregation with session merging, no full
    * per-user sort window.
    *
    * BOUNDARY EQUIVALENCE (verified, not assumed): Spark merges an event
    * into the current session when its start is ≤ the session's end
    * (inclusive at the exact boundary — see the guard test in
    * EventStreamSpec "session_window boundary": a gap of exactly 30 min
    * stays in the SAME session, gap + 1µs splits). That is precisely the
    * q32 oracle's rule (`us - prev > 1800000000` splits), so the pin
    * holds on every representable µs timestamp, not just this dataset. */
  private[graft] def q116(s: SparkSession, dir: String): DataFrame = {
    val sessions = T(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start_us"))
    sessions
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** The hive-partitioned orders layout (write-once infrastructure, like
    * the bucketed tables): one directory per o_orderstatus under
    * `<path>/fact`, plus a parquet-backed status dim under `<path>/dim`
    * (a LocalRelation dim constant-folds its filter away, which starves
    * the DPP rule of the filterable scan it hooks on). */
  private[graft] val partLayoutCache = scala.collection.concurrent.TrieMap.empty[String, String]
  def ensurePartitionedOrders(s: SparkSession, dir: String): String =
    partLayoutCache.getOrElseUpdate(dir, {
      import s.implicits._
      val path = graft.io.TempDirs.scratch("graft-part")
      T(s, dir, "orders").write.mode("overwrite")
        .partitionBy("o_orderstatus").parquet(s"$path/fact")
      Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
        .toDF("status", "label").write.mode("overwrite").parquet(s"$path/dim")
      path
    })

  /** DYNAMIC PARTITION PRUNING: the dim-side filter (label = 'finished')
    * reaches the partitioned fact scan at RUNTIME as a dynamicpruning
    * subquery on the partition column — only the F partition's files are
    * read (plan-asserted in ScaleOpsSpec). At 100 TB with a
    * date-partitioned fact this is the mechanism that turns "join against
    * this week's dim slice" into a 7-partition scan instead of a full
    * one. */
  private[graft] def q117(s: SparkSession, dir: String): DataFrame = {
    val base = ensurePartitionedOrders(s, dir)
    val fact = s.read.parquet(s"$base/fact")
    val dim = s.read.parquet(s"$base/dim")
    fact.join(dim.filter(col("label") === "finished"),
        col("o_orderstatus") === col("status"))
      .groupBy(col("o_orderstatus"), col("label"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Cross-dataset exact dedup with SOURCE PRIORITY: every document also
    * arrives as a lower-priority "mirror" copy with a SMALLER id — plain
    * min-id dedup would keep the mirrors, so the green oracle row proves
    * the priority column (not the id) picks the survivor. Runs on the
    * sort-free arg_min aggregate (q83's scale path) over the text
    * fingerprint. */
  private[graft] def q118(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents").select(col("doc_id"), col("text"), col("source"))
    val mirrors = docs.select((col("doc_id") - 100000).as("doc_id"), col("text"),
      lit("mirror").as("source"))
    val all = docs.unionByName(mirrors)
      .withColumn("prio", when(col("source") === "mirror", 1).otherwise(0))
      .withColumn("fingerprint", TF.fingerprint(col("text")))
    StarSchema.dedupKeyedAgg(all, Seq("fingerprint"),
        Seq(col("prio"), col("doc_id")), latest = false) // min (prio, id)
      .select(col("doc_id"), col("source"), col("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum binning: quality quartiles per language (ntile over the
    * total (quality, doc_id) order) — the stage assignment a curriculum
    * schedule trains from easy/high-quality to hard. */
  private[graft] def q119(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    T(s, dir, "documents")
      .withColumn("quality", TF.qualityScore(col("text")))
      .withColumn("stage", ntile(4).over(w))
      .select(col("doc_id"), col("lang"), col("quality"), col("stage"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget truncation (max-sequence-length preprocessing): keep
    * the first 48 tokens, emit the truncated text, the kept count and a
    * flag. Pure per-row array slicing. */
  private[graft] def q120(s: SparkSession, dir: String): DataFrame = {
    val toks = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+"))
    T(s, dir, "documents")
      .withColumn("__toks", toks)
      .select(col("doc_id"),
        size(col("__toks")).as("n_tokens"),
        least(size(col("__toks")), lit(48)).as("n_kept"),
        (size(col("__toks")) > 48).as("truncated"),
        concat_ws(" ", slice(col("__toks"), 1, 48)).as("text_head"))
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM quality score — the sequence-aware upgrade of q95's
    * unigram model (catches shuffled-word gibberish). */
  private[graft] def q121(s: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.bigramLogProb(T(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Corpus collocations: top-20 bigrams by PMI (count ≥ 5). */
  private[graft] def q122(s: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.pmiCollocations(T(s, dir, "documents"), "doc_id", "text",
      minCount = 5, topK = 20)

  /** EXACT SUBSTRING-LEVEL dedup, detection half: maximal cross-corpus
    * repeated spans (Lee-et-al-style) — token ranges covered by 5-grams
    * occurring at ≥2 sites anywhere in the corpus, island-merged per
    * document, reported at ≥8 tokens. The step document-level
    * MinHash/SimHash cannot do (they detect similar DOCUMENTS; this
    * extracts the shared boilerplate INSIDE otherwise-unique ones). */
  private[graft] def q124(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedSpans(T(s, dir, "documents"), "doc_id", "text",
        k = 5, minOccurrences = 2, minSpanTokens = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("start_pos"))

  /** EXACT SUBSTRING-LEVEL dedup, removal half: the corpus with every
    * q124 span stripped out of the (normalized) token stream — repeated
    * boilerplate gone, unique prose kept, every document still present
    * (fully-duplicated ones come back empty). */
  private[graft] def q125(s: SparkSession, dir: String): DataFrame =
    Dedup.stripRepeatedSpans(T(s, dir, "documents"), "doc_id", "text",
        k = 5, minOccurrences = 2, minSpanTokens = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** PARAGRAPH-granularity near-dup: 64-token exact-partition chunks
    * through the banded MinHash pipeline — sub-document duplicate
    * detection ("same doc, edited intro"). Same LSH machinery as q28,
    * one level finer. */
  private[graft] def q129(s: SparkSession, dir: String): DataFrame =
    Dedup.paragraphNearDups(T(s, dir, "documents"), "doc_id", "text",
        width = 64, threshold = 0.5)
      .orderBy(col("doc_a"), col("chunk_a"), col("doc_b"), col("chunk_b"))

  /** STREAMING ANN-index maintenance: the residual IVF-PQ model trains
    * ONCE on the initial corpus (vec_id < 300), whose codes seed the
    * index state; the remaining vectors then ARRIVE as two micro-batches
    * and fold in via AnnStream.indexMaintenanceSink (frozen-model
    * map-side encode, batchId-keyed idempotent appends). The oracle
    * replays training on the initial corpus and encodes the FULL corpus
    * in one shot — hash equality proves the maintained index is
    * batch-boundary-insensitive and routing-equivalent to a rebuild. */
  /** q130's frozen index model — trained ONCE per (session, dir) on the
    * initial corpus, like [[QueriesScaleOps.ensureResidualIndex]]: an ANN
    * service trains offline; the bench row measures the STREAMING
    * maintenance (frozen-model encode + idempotent state appends), not
    * the one-time bootstrap. The seed codes materialize here too, so the
    * timed run never re-executes the training pipeline. */
  private[graft] val q130IndexCache = scala.collection.concurrent.TrieMap
    .empty[String, graft.operators.ProductQuant.IvfPqResidualIndex]
  def ensureStreamAnnIndex(s: SparkSession, dir: String)
      : graft.operators.ProductQuant.IvfPqResidualIndex =
    q130IndexCache.getOrElseUpdate(dir, {
      val initial = T(s, dir, "embeddings").filter(col("vec_id") < 300)
      val idx = graft.operators.ProductQuant.buildIvfPqResidual(
        initial, "vec_id", "embedding", coarseK = 4, m = 4, k = 8, iters = 2)
      val seeded = idx.copy(encoded = idx.encoded.cache())
      seeded.encoded.count()
      seeded
    })

  private[graft] def q130(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val idx = ensureStreamAnnIndex(s, dir)
    val tmp = graft.io.TempDirs.scratch("graft-q130")
    graft.io.Writers.parquet(idx.encoded, s"$tmp/state/binit")
    val rest = emb.filter(col("vec_id") >= 300)
    val updatesDir = s"$tmp/updates"
    rest.filter(col("vec_id") % 2 === 0).write.mode("append").parquet(updatesDir)
    val stream = s.readStream.schema(rest.schema).parquet(updatesDir)
    val q = graft.streaming.AnnStream.indexMaintenanceSink(s, stream,
      "vec_id", "embedding", idx.centroids, idx.model, s"$tmp/state", s"$tmp/ckpt")
    q.processAllAvailable()
    rest.filter(col("vec_id") % 2 === 1).write.mode("append").parquet(updatesDir)
    q.processAllAvailable()
    q.stop()
    graft.streaming.AnnStream.readCodes(s, s"$tmp/state")
      .select(col("id").as("vec_id"), col("cell"),
        concat_ws(",", transform(col("codes"), c => c.cast("string"))).as("codes"))
      .orderBy(col("vec_id"))
  }

  /** One BPE training run per sf dir (8 merges on the documents corpus),
    * shared by q126/q127/q128 — training is deterministic, so the share
    * is pure memoization. */
  private[graft] val bpeCache = scala.collection.concurrent.TrieMap
    .empty[String, (operators.Bpe.BpeModel, DataFrame)]
  private[graft] def ensureBpe(s: SparkSession, dir: String): (operators.Bpe.BpeModel, DataFrame) =
    bpeCache.getOrElseUpdate(dir,
      operators.Bpe.train(T(s, dir, "documents"), "doc_id", "text", numMerges = 8))

  /** TRAINED BPE, the merge table: 8 iterations of corpus-weighted
    * most-frequent-adjacent-pair selection (ties lexicographic) over the
    * distinct-word table. The oracle replays every iteration in SQL —
    * pair counts, argmax, and the greedy left-to-right merge (closed-form
    * islands + parity, no recursion) — so the LEARNED vocabulary itself
    * is hash-verified, not just its application. */
  private[graft] def q126(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureBpe(s, dir)._1.merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("merge_rank", "lhs", "rhs")
      .orderBy(col("merge_rank"))
  }

  /** The trained tokenizer applied to its own vocabulary: final
    * segmentation of every distinct word after the 8 learned merges. */
  private[graft] def q127(s: SparkSession, dir: String): DataFrame =
    ensureBpe(s, dir)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_pieces"),
        array_join(col("syms"), " ").as("pieces"))
      .orderBy(col("word"))

  /** Learned-vocab token counts per document — the REAL counts the
    * packing/truncation/curriculum operators approximate with the regex
    * subword heuristic: corpus word stream joined to the broadcast
    * trained segmentation. */
  private[graft] def q128(s: SparkSession, dir: String): DataFrame = {
    val (_, words) = ensureBpe(s, dir)
    operators.Bpe.tokenCounts(T(s, dir, "documents"), "doc_id", "text", words)
      .orderBy(col("doc_id"))
  }

  /** Hard-negative mining for contrastive training: each query's top-5
    * nearest neighbors RESTRICTED to a different label — the
    * close-but-wrong examples a retrieval trainer wants. Composition of
    * the exact scorer with a label constraint (the ANN path composes the
    * same way via ivfTopKWhere). */
  private[graft] def q123(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val c = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("c_vec"),
      col("label").as("c_label"), VF.norm(col("embedding")).as("c_nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    c.join(broadcast(q.withColumn("q_nrm", VF.norm(col("q_vec")))),
        col("c_label") =!= col("q_label"))
      .withColumn("cosine",
        when(col("q_nrm") === 0.0 || col("c_nrm") === 0.0, lit(0.0))
          .otherwise(VF.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** NEAR-DUP SURVIVOR SELECTION — the dedup pipeline's actual OUTPUT:
    * q28's verified near-dup pairs close transitively into clusters
    * (q69's min-label propagation), and the min-id document of each
    * cluster survives, carrying how many documents it represents
    * (singletons survive with size 1). Min-label propagation labels every
    * cluster BY its minimum member id, so the survivor set is exactly the
    * distinct labels — no extra pass. Composition of two bucketed
    * operators; nothing here is all-pairs. */
  private[graft] def q131(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.3)
    Dedup.clusters(docs.select(col("doc_id").as("id")), pairs)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .select(col("cluster_id").as("doc_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** FUSED survivor selection ([[Dedup.bucketSurvivors]]): each LSH
    * bucket elects its min-id representative, only (representative,
    * member) pairs are Jaccard-verified, verified losers anti-join away
    * — OUTPUT-LINEAR where q131's pair materialization is quadratic on
    * duplicate-heavy corpora. One-hop semantics (no transitive closure),
    * replayed in SQL with no recursion. */
  private[graft] def q143(s: SparkSession, dir: String): DataFrame =
    Dedup.bucketSurvivors(T(s, dir, "documents"), "text", "doc_id", threshold = 0.3)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Training-batch assembly with the REAL tokenizer: the trained BPE
    * segmentation's per-document subword counts ([[operators.Bpe
    * .tokenCounts]], q128) feed the greedy budget packer
    * ([[operators.Packer.packGreedy]], q94) — the end-to-end
    * "tokenize, then fill 400-token batches" path a training pipeline
    * runs, where q94 stood in with the regex heuristic. Counts ride
    * the word⋈broadcast-vocab join map-side; packing is the one
    * grp-keyed exchange. Empty documents have no words, hence no
    * tokens, hence no pack slot — same on both engines. */
  private[graft] def q148(s: SparkSession, dir: String): DataFrame = {
    val (_, words) = ensureBpe(s, dir)
    val counts = operators.Bpe.tokenCounts(T(s, dir, "documents"), "doc_id", "text", words)
    operators.Packer.packGreedy(counts, "doc_id", "n_bpe_tokens", budget = 400, numGroups = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
}
