package graft

import graft.functions.{MinHash, SimHash, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Curation, Dedup, Multimodal, Similarity}
import graft.ops.{Scd2, StarSchema}
import graft.pipeline.FixedClock
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational + text/vector/session/multimodal builders (q01–q40): the SURVEY §2.12 declared-query surface plus the first LLM-pipeline extensions.
  * Mixed into [[SparkEntry]]; split from the single-file registry for
  * maintainability — the `queries` map and driver contract live there.
  */
private[graft] trait QueriesRelational extends QueryBase {
  // ───────────────────────── core relational (SURVEY §2.12) ─────────────

  /** A1/A2 — grouped aggregation with partial (map-side) combine. */
  private[graft] def q01(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** F1/P13 — filter + projection; predicate and column pruning reach the
    * parquet scan (PushedFilters in explain). */
  private[graft] def q02(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_quantity") >= 49 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** J5/A1 — join + aggregate (customer side broadcast by Catalyst/AQE). */
  private[graft] def q03(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders").join(T(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("c_mktsegment"))

  /** J5 star join — dims broadcast, fact never shuffles for the lookups. */
  private[graft] def q04StarJoin(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("r_name"))

  /** J2 — left anti join (customers with no high-value orders). */
  private[graft] def q05(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(T(s, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** J3 — left semi join (customers with at least one finished order). */
  private[graft] def q06(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(T(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** D1 — full-row distinct. */
  private[graft] def q07(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** D2 — keyed dedup with a deterministic survivor (latest order per
    * customer) via the library's window-based dedup. */
  private[graft] def q08(s: SparkSession, dir: String): DataFrame =
    StarSchema.dedupKeyed(
      T(s, dir, "orders"),
      Seq("o_custkey"),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc)
    )
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"), col("o_totalprice"))
      .orderBy(col("o_custkey"))

  /** U1 — unionByName of two differently-ordered projections. */
  private[graft] def q09(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
    val lo = o.filter(col("o_totalprice") < 2000)
      .select(lit("low").as("bucket"), col("o_totalprice"), col("o_orderkey"))
    hi.unionByName(lo).orderBy(col("o_orderkey"))
  }

  /** P9/P10 — concat_ws + sha2/md5 surrogate keys (the SCD2 hash family). */
  private[graft] def q10(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(
        col("c_custkey"),
        sha2(concat_ws("|", col("c_custkey"), col("c_name")), 256).as("sk"),
        md5(col("c_name")).as("name_fp")
      )
      .orderBy(col("c_custkey"))

  /** P6/T2 — null→"None" fill on string columns (quirk reproduced). */
  private[graft] def q11(s: SparkSession, dir: String): DataFrame = {
    val withNulls = T(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")).as("seg"))
    graft.ops.Cleaner.fillNone(withNulls).orderBy(col("c_custkey"))
  }

  /** P3/P4 — trim + regexp_replace (the phone-dash cleaner's ops). */
  private[graft] def q12(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        regexp_replace(col("o_orderpriority"), "-", "").as("priority_clean"),
        trim(concat(lit("  "), col("o_orderstatus"), lit("  "))).as("status_trim")
      )
      .orderBy(col("o_orderkey"))

  /** P5 — multi-value split into part1/part2 (reference's or-split shape). */
  private[graft] def q13(s: SparkSession, dir: String): DataFrame = {
    val parts = split(col("p_name"), " ")
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        trim(parts.getItem(0)).as("name_part1"),
        trim(parts.getItem(1)).as("name_part2")
      )
      .orderBy(col("p_partkey"))
  }

  /** P7/T1 — the timestamp→string format quirk (single-H hour). */
  private[graft] def q14(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(col("event_id"), graft.ops.Cleaner.timestampToRefString(col("ts")).as("ts_ref"))
      .orderBy(col("event_id"))

  /** Window — running total per customer (deterministic frame). */
  private[graft] def q15(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    T(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total")
      )
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Window — top-3 per group with deterministic tie-break. */
  private[graft] def q16(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    T(s, dir, "part")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("p_brand"), col("rank"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rank"))
  }

  /** Time-bucketed aggregation (the batch twin of the streaming hourly agg). */
  private[graft] def q17(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("hour_ts"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** §2.11 — SCD2 hash-diff merge, faithful mode, deterministic clock.
    * Run 1 seeds the dimension from `customer`; run 2 applies a mutated
    * snapshot (segment change for custkey%7=0, new keys for custkey%101=0)
    * and must produce unchanged ∪ expired ∪ changed exactly. */
  private[graft] def q18(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val spec = Scd2.Scd2Spec(Seq("c_custkey"), Seq("c_name", "c_mktsegment"), "customer_sk", "dim_customer")
    val existing = Scd2.faithful(base, None, spec, FixedClock("2024-01-01 00:00:00"))
    val mutated = base.select(
      col("c_custkey"), col("c_name"),
      when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("_V2")))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val newRows = base.filter(col("c_custkey") % 101 === 0).select(
      (col("c_custkey") + 1000000).as("c_custkey"),
      concat(lit("NEW "), col("c_name")).as("c_name"),
      col("c_mktsegment"))
    val snapshot = mutated.unionByName(newRows)
    Scd2.faithful(snapshot, Some(existing), spec, FixedClock("2024-06-01 00:00:00"))
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"), col("customer_sk"),
        date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss").as("created_at"),
        date_format(col("modified_at"), "yyyy-MM-dd HH:mm:ss").as("modified_at"),
        col("is_active"), col("old_hash"))
      .orderBy(col("c_custkey"), col("is_active"))
  }

  /** Conditional aggregation (pivot-shaped, portable across engines). */
  private[graft] def q19(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders").join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p")
      )
      .orderBy(col("c_mktsegment"))

  /** Rollup (grouping sets) — free from Spark SQL, matched by DuckDB. */
  private[graft] def q20(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  // ───────────────────────── LLM-pipeline: text ─────────────────────────

  /** Document fingerprinting: md5 of normalized text + polynomial rolling
    * hash — both per-row, codegen'd, oracle-replicable. */
  private[graft] def q21(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), TF.fingerprint(col("text")).as("fingerprint"),
        TF.rollingHash(col("text")).as("rolling_hash"))
      .orderBy(col("doc_id"))

  /** Exact dedup via fingerprint grouping (survivor = lowest doc_id). */
  private[graft] def q22(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(T(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("fingerprint"))
      .orderBy(col("doc_id"))

  /** Token counting: whitespace tokens + BPE-ish subword regex tokens. */
  private[graft] def q23(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"),
        TF.subwordCount(col("text")).cast("long").as("n_subwords"))
      .orderBy(col("doc_id"))

  /** Quality scoring — exact fp-expression mirror on both sides. */
  private[graft] def q24(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Language ID heuristic vs the labeled lang column. */
  private[graft] def q25(s: SparkSession, dir: String): DataFrame =
    TF.withLangId(T(s, dir, "documents"), "text", "pred_lang")
      .withColumn("correct", (col("lang") === col("pred_lang")).cast("int"))
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("correct"))
      .orderBy(col("doc_id"))

  /** N-gram Jaccard near-dup pairs within a blocking key (source). */
  private[graft] def q26(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(T(s, dir, "documents"), "text", "doc_id", "source", 3, 0.3)
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash signatures (16 perms) digested per doc — the map-side half of
    * LSH dedup, hash-matched against the oracle. */
  private[graft] def q27(s: SparkSession, dir: String): DataFrame =
    TF.withShingles(T(s, dir, "documents"), "text", "__sh", 3)
      .withColumn("__sig", MinHash.signature(col("__sh"), 16))
      .select(col("doc_id"), md5(concat_ws(",", col("__sig"))).as("sig_digest"))
      .orderBy(col("doc_id"))

  /** MinHash LSH near-dup pairs (banded candidates → exact Jaccard). */
  private[graft] def q28(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(T(s, dir, "documents"), "text", "doc_id",
      threshold = 0.3, shingleSize = 3, numHashes = 16, bands = 4)
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash fingerprints (60-bit, portable bit extraction). */
  private[graft] def q29(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashFingerprints(T(s, dir, "documents"), "text", "doc_id")
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  // ───────────────────────── LLM-pipeline: vectors ──────────────────────

  /** Brute-force exact top-k cosine neighbors for 10 query vectors. */
  private[graft] def q30(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding near-dup pairs above a cosine threshold. */
  private[graft] def q31(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(T(s, dir, "embeddings"), "embedding", "vec_id", 0.4)
      .orderBy(col("id_a"), col("id_b"))

  // ───────────────────────── events / sessions ──────────────────────────

  /** Gap-based sessionization, batch mode (window-function formulation —
    * the streaming twin lives in graft.streaming.EventStream). */
  private[graft] def q32(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gapUs = 30L * 60 * 1000000 // 30 min
    T(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("session_start_us"), max(col("us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // ───────────────────────── multimodal ─────────────────────────────────

  /** Multimodal metadata path: text → binary payload → batched feature
    * extraction (decode is a deterministic stub; plumbing is real). */
  private[graft] def q33(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withFakeMedia(T(s, dir, "documents"), "doc_id", "text")
    Multimodal.extractFeatures(s, media).toDF()
      .select(col("media_id"), col("mime"), col("byte_len"))
      .orderBy(col("media_id"))
  }

  /** As-of join (backward inclusive): each purchase event enriched with the
    * user's most recent click — the union-window formulation (no range
    * explosion; see graft.operators.AsOfJoin). */
  private[graft] def q34(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = StarSchema.dedupKeyed(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("value").as("click_value")),
      Seq("user_id", "ts"), Seq(col("click_id").desc))
    operators.AsOfJoin.asof(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_id", "click_value"), tieBreak = Some("click_id"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("click_id_asof"), col("click_value_asof"))
      .orderBy(col("event_id"))
  }

  /** Exact percentiles (median/p90) per group. */
  private[graft] def q35(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        round(expr("percentile(p_retailprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(p_retailprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n")
      )
      .orderBy(col("p_brand"))

  /** Distinct aggregation (two distinct counts + plain count in one agg). */
  private[graft] def q36(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders").join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders")
      )
      .orderBy(col("c_mktsegment"))

  /** Generator/explode path: global top-20 tokens (count desc, token asc).
    * explode_OUTER + attribute null-filter: plain explode lets
    * InferFiltersFromGenerate push the tokenizer into the scan filter
    * (see CorpusStats — the 538s-at-×10 lesson). */
  private[graft] def q37(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(explode_outer(TF.tokens(TF.normalizeText(col("text")))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20)

  /** IVF approximate nearest neighbor: assign corpus to 8 centroid cells,
    * probe the 2 nearest cells per query, exact top-3 within them. */
  private[graft] def q38(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 15)
    Similarity.ivfTopK(emb, queries, centroids, "vec_id", "embedding", k = 3, nprobe = 2)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Cube grouping sets (all 4 combinations). */
  private[graft] def q39(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** String similarity: Levenshtein distance between name tokens. */
  private[graft] def q40(s: SparkSession, dir: String): DataFrame = {
    val parts = split(col("p_name"), " ")
    T(s, dir, "part")
      .select(col("p_partkey"),
        levenshtein(parts.getItem(0), parts.getItem(1)).as("edit_dist"))
      .orderBy(col("p_partkey"))
  }
}
