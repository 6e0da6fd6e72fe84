package graft

import graft.functions.{MinHash, SimHash, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Curation, Dedup, Multimodal, Similarity}
import graft.ops.{Scd2, StarSchema}
import graft.pipeline.FixedClock
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline, streaming and lakehouse builders (q41–q81): IO round-trips, SCD2 formulations, stream sinks, sampling/curation.
  * Mixed into [[SparkEntry]]; split from the single-file registry for
  * maintainability — the `queries` map and driver contract live there.
  */
private[graft] trait QueriesPipeline extends QueryBase {
  /** F4 — dropna (any-null row elimination) after null injection. */
  private[graft] def q41(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")).as("seg"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
      .na.drop()
      .orderBy(col("c_custkey"))

  /** F3 — rlike regex predicate. */
  private[graft] def q42(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .filter(col("text").rlike("spark\\s+\\w+\\s+join"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** J1-style left outer join + measure with null-to-zero semantics. */
  private[graft] def q43(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(T(s, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_big_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("big_total"))
      .orderBy(col("c_custkey"))

  /** Multimodal frame sampling: 1 media row → n frame rows (flatMap shape). */
  private[graft] def q44(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withFakeMedia(T(s, dir, "documents"), "doc_id", "text")
    Multimodal.sampleFrames(s, media, stride = 64)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("byte_len"), col("sample_val"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Approximate sketches (HLL distinct, approx quantiles). Sketch values
    * have no cross-engine oracle by nature, so the query makes itself
    * verifiable: each approximation is emitted as an in-tolerance BOOLEAN
    * against the exact aggregate computed in the same pass
    * (|approx−exact|/exact < 5%, far looser than the sketches' configured
    * error), plus the exact values themselves — DuckDB recomputes the
    * exacts and expects `true`s, and the row hashes like any other query. */
  private[graft] def q45(s: SparkSession, dir: String): DataFrame = {
    def inTol(approx: Column, exact: Column): Column =
      abs(approx - exact) / exact < 0.05
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)").as("aq"),
        expr("percentile(l_extendedprice, array(0.5, 0.99))").as("eq"),
        count(lit(1)).as("n")
      )
      .select(
        col("l_returnflag"),
        col("exact_orders"),
        inTol(col("approx_orders"), col("exact_orders")).as("orders_ok"),
        inTol(element_at(col("aq"), 1), element_at(col("eq"), 1)).as("p50_ok"),
        inTol(element_at(col("aq"), 2), element_at(col("eq"), 2)).as("p99_ok"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Structured Streaming execution of the hourly aggregation: the SAME
    * windowed plan a live deployment runs (file-source stream → watermark →
    * window agg → memory sink), on bounded input — and it must match the
    * same DuckDB oracle as the batch twin q17. */
  private[graft] def q46(s: SparkSession, dir: String): DataFrame = {
    val stream = graft.streaming.EventStream.readEventsNanos(s, s"$dir/events.parquet")
    val agg = graft.streaming.EventStream.hourlyByType(stream)
    graft.streaming.EventStream.runBounded(s, agg, "graft_q46_sink")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), round(col("total_value"), 2).as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** SRP-LSH bucket assignment (the ANN scale path's hashing step) — the
    * deterministic md5-derived hyperplane formula is portable, so even this
    * is oracle-verified. */
  private[graft] def q47(s: SparkSession, dir: String): DataFrame =
    Similarity.lshBuckets(T(s, dir, "embeddings"), "vec_id", "embedding", nPlanes = 8, seed = 42)
      .select(col("id").as("vec_id"), col("bucket"))
      .orderBy(col("vec_id"))

  /** S3/S4/R1-R3/P-chain end-to-end: export `nation` to a deterministically
    * dirty CSV (unnamed junk column, padded short rows, extra trailing
    * fields, whitespace), then run the full text-scan → repair → clean
    * pipeline and compare against an oracle that replicates the dirt
    * analytically over the original parquet. */
  private[graft] def q48(s: SparkSession, dir: String): DataFrame = {
    import graft.model.SchemaJson
    val nation = T(s, dir, "nation").orderBy(col("n_nationkey")).collect()
    val lines = Seq("N_NATIONKEY,N_NAME,,N_REGIONKEY") ++ nation.map { r =>
      val k = r.getInt(0); val name = r.getString(1); val reg = r.getInt(2)
      if (k % 7 == 0) s"$k,  $name  "                   // short row → padded
      else if (k % 5 == 0) s"$k,  $name  ,junk,$reg,EXTRA" // long row → truncated
      else s"$k,  $name  ,junk,$reg"
    }
    val tmp = java.nio.file.Paths.get(graft.io.TempDirs.scratch("graft_q48"))
    val csvPath = tmp.resolve("nation.csv")
    java.nio.file.Files.write(csvPath, String.join("\n", lines: _*).getBytes("UTF-8"))
    val repaired = graft.ops.CsvRepair.repair(s, graft.io.Readers.text(s, csvPath.toString)).get
    val schema = SchemaJson.parse(
      """[{"name":"n_nationkey","type":"int"},{"name":"n_name","type":"string"},
        |{"name":"n_regionkey","type":"int"}]""".stripMargin)
    graft.ops.Cleaner.clean(repaired, schema)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  /** Composite training-corpus filter: language-verified, quality-scored,
    * exact-deduped document selection — the chained form of q22/q24/q25. */
  private[graft] def q49(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val survivors = Dedup.exact(docs, "text", "doc_id").select("doc_id", "fingerprint")
    TF.withLangId(docs, "text", "pred_lang")
      .withColumn("quality", TF.qualityScore(col("text")))
      .join(survivors, "doc_id")
      .filter(col("pred_lang") === col("lang") && col("quality") >= 0.55)
      .select(col("doc_id"), col("lang"), col("quality"), col("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Same scenario as q18 but through [[Scd2.singleShuffle]] — the
    * one-exchange merge (union + window classification instead of three
    * shuffled joins). Oracle-pinned to the identical SQL as q18, so the
    * driver gate proves plan-for-plan equivalence of the two formulations. */
  private[graft] def q50(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val spec = Scd2.Scd2Spec(Seq("c_custkey"), Seq("c_name", "c_mktsegment"), "customer_sk", "dim_customer")
    val existing = Scd2.singleShuffle(base, None, spec, FixedClock("2024-01-01 00:00:00"))
    val mutated = base.select(
      col("c_custkey"), col("c_name"),
      when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("_V2")))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val newRows = base.filter(col("c_custkey") % 101 === 0).select(
      (col("c_custkey") + 1000000).as("c_custkey"),
      concat(lit("NEW "), col("c_name")).as("c_name"),
      col("c_mktsegment"))
    val snapshot = mutated.unionByName(newRows)
    Scd2.singleShuffle(snapshot, Some(existing), spec, FixedClock("2024-06-01 00:00:00"))
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"), col("customer_sk"),
        date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss").as("created_at"),
        date_format(col("modified_at"), "yyyy-MM-dd HH:mm:ss").as("modified_at"),
        col("is_active"), col("old_hash"))
      .orderBy(col("c_custkey"), col("is_active"))
  }

  /** Skew-salted join (SkewJoin.saltedJoin) — oracle-pinned to the plain
    * join SQL, proving the salt/replicate rewrite is row-identical. */
  private[graft] def q51(s: SparkSession, dir: String): DataFrame = {
    val supplier = T(s, dir, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
      .select(col("l_suppkey"), col("s_name"))
    graft.operators.SkewJoin
      .saltedJoin(T(s, dir, "lineitem"), supplier, "l_suppkey", saltBuckets = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("s_name"))
  }

  /** Pivot (values declared up front so no extra distinct scan). */
  private[graft] def q52(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders").join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
      .orderBy(col("c_mktsegment"))

  /** Unpivot/melt — wide measures to long (metric, value) pairs. */
  private[graft] def q53(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  /** Set operations: INTERSECT then EXCEPT (distinct semantics). */
  private[graft] def q54(s: SparkSession, dir: String): DataFrame = {
    val building = T(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val finished = T(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val bigSpenders = T(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
    building.intersect(finished).except(bigSpenders).orderBy(col("custkey"))
  }

  /** Ranking window functions: ntile / percent_rank / dense_rank / lag —
    * tie-broken by key so output is deterministic across engines. */
  private[graft] def q55(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    T(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        dense_rank().over(w).as("drank"),
        lag(col("c_acctbal"), 1).over(w).as("prev_bal"))
      .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
  }

  /** JSON source/sink roundtrip: write nation as JSON lines, read back with
    * an explicit schema (no inference pass — one scan, not two), join and
    * aggregate. Oracle runs over the original parquet — proves the JSON
    * sink/source preserves values exactly. */
  private[graft] def q56(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.io.TempDirs.scratch("graft_q56")
    T(s, dir, "nation").write.mode("overwrite").json(tmp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nationkey", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("n_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_regionkey", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("n_comment", org.apache.spark.sql.types.StringType)))
    s.read.schema(schema).json(tmp)
      .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), collect_list(col("n_name")).as("names"))
      .select(col("r_name"), col("n_nations"),
        array_join(array_sort(col("names")), ",").as("nation_list"))
      .orderBy(col("r_name"))
  }

  /** Stream-stream time-interval join, executed through the REAL streaming
    * plan (two watermarked file-source streams, append mode). The oracle is
    * a batch self-join mirroring the µs-floored event-time arithmetic. */
  private[graft] def q57(s: SparkSession, dir: String): DataFrame = {
    val ES = graft.streaming.EventStream
    val path = s"$dir/events.parquet"
    val views = ES.readEventsNanos(s, path).filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = ES.readEventsNanos(s, path).filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val joined = ES.viewClickJoin(views, clicks, horizonMin = 120)
      .select(col("view_user").as("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
    ES.runBounded(s, joined, "graft_q57_sink", "append")
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  /** Stateful streaming sessionization (flatMapGroupsWithState) on the real
    * streaming plan. Append mode emits only CLOSED sessions (the trailing
    * open session per user stays in state), so the oracle drops each user's
    * last session. Gap arithmetic is at ms precision (Timestamp.getTime),
    * mirrored exactly in the SQL. */
  private[graft] def q58(s: SparkSession, dir: String): DataFrame = {
    val ES = graft.streaming.EventStream
    val stream = ES.readEventsNanos(s, s"$dir/events.parquet")
    val sessions = ES.sessionize(s, stream, gapMs = 30L * 60 * 1000).toDF()
    ES.runBounded(s, sessions, "graft_q58_sink", "append")
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  /** PII redaction over documents. PII is injected deterministically from
    * doc_id (the synthetic corpus has none), then emails/IPv4s/phones are
    * counted and masked; the oracle runs the identical portable regexes
    * (Java ∩ RE2 syntax) in DuckDB. */
  private[graft] def q59(s: SparkSession, dir: String): DataFrame = {
    val withPii = T(s, dir, "documents").withColumn("pii_text",
      concat(col("text"),
        lit(" contact u"), col("doc_id"), lit("@example.com or +1-555-01"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
        lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".1")))
    Curation.redactPii(withPii, "pii_text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("redacted")).as("redacted_digest"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic content-addressed train/val/test split (md5 bucket —
    * stable across runs/engines/partitionings, unlike rand(seed)). */
  private[graft] def q60(s: SparkSession, dir: String): DataFrame =
    Curation.hashSplit(T(s, dir, "customer"), "c_custkey")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("split"))

  /** Symmetric int8 embedding quantization: per-vector scale + quantized
    * values, fp-exact against the oracle (floor(x/scale + 0.5) round). */
  private[graft] def q61(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings")
      .withColumn("scale", VF.quantScale(col("embedding")))
      .withColumn("q", VF.quantizeInt8(col("embedding"), col("scale")))
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("q"), x => x.cast("string")), ",").as("qvec"))
      .orderBy(col("vec_id"))

  /** ORC source/sink roundtrip: supplier → ORC → read back → broadcast
    * join + agg; oracle reads the original parquet. */
  private[graft] def q62(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.io.TempDirs.scratch("graft_q62")
    T(s, dir, "supplier").write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"), round(sum(col("s_acctbal")), 2).as("sum_bal"))
      .orderBy(col("n_name"))
  }

  /** Deterministic stratified sample (~20% per segment by content hash —
    * no RNG, no per-stratum state, same rate in every stratum). */
  private[graft] def q63(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(T(s, dir, "customer"), "c_custkey", 20)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_sampled"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("c_mktsegment"))

  /** Same streaming sessionization scenario as q58 but through Spark 4's
    * `transformWithState` state API (RocksDB store). Pinned to q58's
    * oracle — the gate proves the two state APIs produce identical
    * sessions. */
  private[graft] def q65(s: SparkSession, dir: String): DataFrame = {
    val ES = graft.streaming.EventStream
    val stream = ES.readEventsNanos(s, s"$dir/events.parquet")
    val sessions = ES.sessionizeTws(s, stream, gapMs = 30L * 60 * 1000).toDF()
    ES.runBounded(s, sessions, "graft_q65_sink", "append")
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  /** Interval RANGE window frame: per-user rolling 1-hour event count and
    * value sum (frame = all events within the trailing hour, not a fixed
    * row count). Order key is epoch micros so the frame bound is numeric
    * and identical in both engines; RANGE semantics include timestamp
    * peers on both sides. */
  private[graft] def q64(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    T(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value")).over(w), 2).as("sum_1h"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** Semi-structured JSON column: typed schema-on-read of the `props`
    * JSON string via `from_json` (codegen'd Jackson parse, no UDF), then
    * a grouped aggregate over the extracted field. */
  private[graft] def q66(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
        .getField("k"))
      .groupBy(col("event_type"), (col("k") / 10).cast("int").as("k_decile"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_decile"))

  /** Bloom-filter semi-join reduction: lineitem prefiltered map-side by a
    * bloom built over one nation's suppliers before the shuffle join.
    * Oracle is the plain join SQL — no false negatives means identical
    * results; the bloom only shrinks the shuffled fraction. */
  private[graft] def q67(s: SparkSession, dir: String): DataFrame = {
    val build = T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation").filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    graft.operators.BloomJoin
      .prefilteredJoin(T(s, dir, "lineitem"), build, "l_suppkey", "s_suppkey",
        expectedItems = 10000L)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("s_name"))
  }

  /** Trained-IVF centroid training: deterministic distributed k-means
    * (Lloyd's, k=4, 2 iterations, no RNG) — data never leaves executors,
    * only k·dim centroid doubles move. The oracle replays the identical
    * iterations in SQL (same init, same sequential-fold distances, same
    * explicit rounding), so even the training loop is oracle-verified. */
  private[graft] def q68(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(T(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 2)
      .select(col("id").as("vec_id"), col("cell"))
      .orderBy(col("vec_id"))

  /** Dedup clusters: connected components over the q28 near-dup pairs via
    * iterative min-label propagation (no driver-side graph). The oracle
    * mirrors the closure with a recursive CTE over the same pair SQL. */
  private[graft] def q69(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      threshold = 0.3, shingleSize = 3, numHashes = 16, bands = 4)
      .select(col("id_a"), col("id_b"))
    Dedup.clusters(docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Time-series gap fill: a dense hour spine from `sequence`+`explode`
    * (min..max event hour), left-joined to the hourly counts so silent
    * hours appear as explicit zeros — the resample/densify step before
    * any rolling metric. The spine is generated, not scanned. */
  private[graft] def q70(s: SparkSession, dir: String): DataFrame = {
    val hourly = T(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = T(s, dir, "events")
      .agg(date_trunc("hour", min(col("ts"))).as("lo"), date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    spine.join(hourly, Seq("h"), "left")
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("hour_start"))
  }

  /** Capstone corpus-curation pipeline — the full training-data prep chain
    * in one plan: near-dup CLUSTER survivors (minhash LSH pairs →
    * connected components → min-id survivor), language-verified, quality-
    * thresholded, PII-redacted (digest), and deterministically split
    * train/val/test. Every stage is individually oracle-verified
    * (q28/q69/q25/q24/q59/q60); this query pins their composition. */
  private[graft] def q71(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      threshold = 0.3, shingleSize = 3, numHashes = 16, bands = 4)
      .select(col("id_a"), col("id_b"))
    val survivors = Dedup.clusters(docs.select(col("doc_id").as("id")), pairs)
      .filter(col("id") === col("cluster_id"))
      .select(col("id").as("doc_id"))
    val scored = TF.withLangId(docs, "text", "pred_lang")
      .withColumn("quality", TF.qualityScore(col("text")))
    val redacted = Curation.redactPii(scored, "text")
    Curation.hashSplit(redacted.join(survivors, "doc_id"), "doc_id")
      .filter(col("pred_lang") === col("lang") && col("quality") >= 0.55)
      .select(col("doc_id"), col("lang"), col("quality"),
        md5(col("redacted")).as("redacted_digest"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Spark 4 VARIANT column: `parse_json` once into the binary variant
    * encoding, then typed `variant_get` paths — the schema-flexible
    * complement to q66's fixed-schema `from_json` (same oracle answer,
    * different extraction machinery). */
  private[graft] def q72(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "int"))
      .groupBy(col("event_type"), (col("k") / 10).cast("int").as("k_decile"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_decile"))

  /** Forward as-of join — for each purchase, the same user's FIRST click
    * at-or-after it (q34's mirror; same one-pass union-window plan run in
    * reverse time order). */
  private[graft] def q73(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = StarSchema.dedupKeyed(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("value").as("click_value")),
      Seq("user_id", "ts"), Seq(col("click_id").desc))
    operators.AsOfJoin.asof(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_id", "click_value"), tieBreak = Some("click_id"),
      direction = "forward")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("click_id_asof"), col("click_value_asof"))
      .orderBy(col("event_id"))
  }

  /** Incremental aggregate maintenance: the orders table arrives as two
    * deterministic "days" (orderkey parity); day 1 builds the per-customer
    * state, day 2 merges in WITHOUT rescanning day 1. The oracle is the
    * full-recompute aggregate — the gate proves fold-in ≡ rebuild. */
  private[graft] def q74(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.IncrementalAgg
    val orders = T(s, dir, "orders")
    val day1 = orders.filter(col("o_orderkey") % 2 === 0)
    val day2 = orders.filter(col("o_orderkey") % 2 === 1)
    val keys = Seq("o_custkey")
    val measures = Seq("o_totalprice")
    val snapshot = IncrementalAgg.build(day1, keys, measures)
    IncrementalAgg.merge(snapshot, day2, keys, measures)
      .select(col("o_custkey"), col("n_rows").as("n_orders"),
        round(col("sum_o_totalprice"), 2).as("sum_price"))
      .orderBy(col("o_custkey"))
  }

  /** Deterministic source mixing: per-language sampling rates over the
    * corpus (keep all English, thin the rest) — the reproducible
    * `sampleBy`. */
  private[graft] def q75(s: SparkSession, dir: String): DataFrame =
    Curation.sampleByRates(T(s, dir, "documents"), "lang", "doc_id",
      Map("en" -> 100, "de" -> 50, "es" -> 50, "fr" -> 25, "zh" -> 25))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))

  /** Corpus-overlap estimation via mergeable per-source MinHash sketches:
    * |sources|² sketch comparisons instead of |docs|² document
    * comparisons. The element-wise-min sketch merges across partitions/
    * days for free (min is associative) — the 100 TB way to ask "how much
    * does source A overlap source B". */
  private[graft] def q76(s: SparkSession, dir: String): DataFrame = {
    val sketches = Dedup.groupSketches(T(s, dir, "documents"), "text", "source")
    Dedup.sketchOverlap(sketches)
      .orderBy(col("grp_a"), col("grp_b"))
  }

  /** Corrupt-record quarantine on a JSON source (the JSON mirror of the
    * CSV-repair stage): every 5th nation row is written as a broken line;
    * PERMISSIVE parse + `_corrupt` capture keeps the job alive, parses the
    * good rows, and makes the bad ones countable. Oracle replicates the
    * corruption pattern analytically over the original parquet. */
  private[graft] def q77(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.io.TempDirs.scratch("graft_q77")
    T(s, dir, "nation")
      .select(when(col("n_nationkey") % 5 === 0,
          concat(lit("{BROKEN json line for key "), col("n_nationkey")))
        .otherwise(to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey"))))
        .as("value"))
      .write.mode("overwrite").text(tmp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nationkey", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("n_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_regionkey", org.apache.spark.sql.types.IntegerType)))
    graft.io.Readers.jsonPermissive(s, tmp, schema)
      .select(when(col("_corrupt").isNotNull, lit("corrupt")).otherwise(lit("ok")).as("kind"),
        col("n_regionkey"))
      .groupBy(col("kind"), col("n_regionkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kind"), col("n_regionkey"))
  }

  /** Schema evolution across parquet files: an early writer knew 3
    * columns, a later one adds `name_len`; `mergeSchema` reads the
    * union, with pre-evolution rows null in the new column. */
  private[graft] def q78(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.io.TempDirs.scratch("graft_q78")
    val nation = T(s, dir, "nation")
    nation.filter(col("n_regionkey") < 2)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(tmp)
    nation.filter(col("n_regionkey") >= 2)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        length(col("n_name")).as("name_len"))
      .write.mode("append").parquet(tmp)
    graft.io.Readers.parquetMergedSchema(s, tmp)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("name_len"))
      .orderBy(col("n_nationkey"))
  }

  /** Correlated scalar subquery through the SQL front-end (TPC-H Q17
    * shape): lineitems below 20% of their part's average quantity.
    * Catalyst decorrelates the subquery into an aggregate + join — no
    * per-row re-execution, which is what makes this runnable at scale. */
  private[graft] def q79(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_partkey, count(*) AS n_small,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem_v l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem_v l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin)
  }

  /** Explicit GROUPING SETS (finer than rollup/cube) + grouping_id to
    * label each aggregation level. */
  private[graft] def q80(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, grouping(o_orderpriority) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
        |ORDER BY o_orderstatus, gid, o_orderpriority""".stripMargin)
  }

  /** q46's hourly aggregation drained with `Trigger.AvailableNow` — the
    * cron-scheduled catch-up pattern (the trigger terminates the query
    * itself). Pinned to the same oracle as batch q17 and streaming q46. */
  private[graft] def q81(s: SparkSession, dir: String): DataFrame = {
    val stream = graft.streaming.EventStream.readEventsNanos(s, s"$dir/events.parquet")
    val agg = graft.streaming.EventStream.hourlyByType(stream)
    graft.streaming.EventStream.runAvailableNow(s, agg, "graft_q81_sink")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), round(col("total_value"), 2).as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }
}
