package graft

/** The DuckDB oracle registry: for every entry in [[SparkEntry.queries]],
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables — the correctness gate's other half. Pure SQL strings (plus the
  * generators for the iterative replays: k-means, PQ, packing, winnowing,
  * repeated spans, BPE training); nothing here touches Spark.
  */
object OracleSql {

  private val normSql = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private val shinglesSql =
    s"""list_distinct(CASE WHEN len(w) < 3 THEN [] ELSE
       | list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)""".stripMargin
  private val docShinglesCte =
    s"""docsh AS (SELECT doc_id, source, $shinglesSql AS sh FROM
       | (SELECT doc_id, source, regexp_split_to_array($normSql, ' ') AS w FROM documents))""".stripMargin
  private val jaccardSql =
    """CASE WHEN (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) = 0 THEN 0.0
      | ELSE len(list_intersect(a.sh, b.sh))::DOUBLE /
      |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE END""".stripMargin

  /** Greedy-packing replay (q94/q111 shared prefix): hash-grouped docs in
    * id order stepped through the recursive fill; the final relation is
    * `p(grp, doc_id, n_tokens, rn, pack_id, fill, pack_pos)`. Callers
    * prefix with `WITH RECURSIVE`. */
  /** Greedy-pack replay over ANY (doc_id, n_tokens) source — the
    * recursion is the same whether counts come from the regex heuristic
    * (q94/q111) or the trained BPE segmentation (q148). */
  private def packReplayCteFrom(countsSql: String): String =
    s"""d AS (
       |  SELECT grp, doc_id, n_tokens,
       |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
       |  FROM (SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 8 AS grp, doc_id,
       |    n_tokens FROM ($countsSql))),
       |p AS (
       |  SELECT grp, doc_id, n_tokens, rn, 0::BIGINT AS pack_id, n_tokens AS fill, 0 AS pack_pos
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.grp, d.doc_id, d.n_tokens, d.rn,
       |    CASE WHEN p.fill + d.n_tokens > 400 THEN p.pack_id + 1 ELSE p.pack_id END,
       |    CASE WHEN p.fill + d.n_tokens > 400 THEN d.n_tokens ELSE p.fill + d.n_tokens END,
       |    CASE WHEN p.fill + d.n_tokens > 400 THEN 0 ELSE p.pack_pos + 1 END
       |  FROM p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1)""".stripMargin

  private lazy val packReplayCte = packReplayCteFrom(
    """SELECT doc_id,
      |    (CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS n_tokens
      |    FROM documents""".stripMargin)

  /** Winnowing replay (q96/q108 shared prefix): tokens → positional
    * 5-grams → 32-bit md5 hashes → per-window (w=4) rightmost-min
    * selections, one struct row per window in `wsel(doc_id, s{pos,fp})`
    * (distinct-ness applied by the consumer). */
  private lazy val winnowSelCte =
    s"""t AS (SELECT doc_id, regexp_split_to_array($normSql, ' ') AS w FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(w) < 5 THEN []
       |  ELSE list_transform(range(1, len(w) - 3),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END AS grams
       |  FROM t),
       |h AS (SELECT doc_id, list_transform(grams, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
       |  FROM g WHERE len(grams) > 0),
       |wsel AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(hs) - 3, 1) + 1), s ->
       |    {'pos': s - 1 + list_max(list_filter(range(1, len(list_slice(hs, s, s + 3)) + 1),
       |        j -> list_slice(hs, s, s + 3)[j] = list_min(list_slice(hs, s, s + 3)))),
       |     'fp': list_min(list_slice(hs, s, s + 3))})) AS s
       |  FROM h)""".stripMargin

  /** q124/q125's shared prefix: the ALL-position gram-hash stream (same
    * token→5-gram→fp32 pipeline as winnowing, no window-min selection),
    * duplicated-fp filter (≥2 sites corpus-wide), island merge, and the
    * ≥8-token span table in `spans(doc_id, start_pos, end_pos,
    * span_toks)`. Mirrors Dedup.repeatedSpans(k=5, minOcc=2, minSpan=8). */
  private lazy val repeatedSpansCte =
    s"""t AS (SELECT doc_id, regexp_split_to_array($normSql, ' ') AS w FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(w) < 5 THEN []
       |  ELSE list_transform(range(1, len(w) - 3),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END AS grams
       |  FROM t),
       |h AS (SELECT doc_id, list_transform(grams, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
       |  FROM g WHERE len(grams) > 0),
       |pg AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
       |    i -> {'pos': i, 'fp': hs[i]})) AS s FROM h),
       |pos AS (SELECT doc_id, s.pos::INT AS pos, s.fp AS fp FROM pg),
       |dupfp AS (SELECT fp FROM pos GROUP BY fp HAVING count(*) >= 2),
       |d AS (SELECT p.doc_id, p.pos FROM pos p JOIN dupfp USING (fp)),
       |isl AS (SELECT doc_id, pos,
       |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d),
       |spans AS (SELECT doc_id, min(pos) AS start_pos, max(pos) AS end_pos,
       |    (max(pos) - min(pos) + 5)::BIGINT AS span_toks
       |  FROM isl GROUP BY doc_id, grp HAVING (max(pos) - min(pos) + 5) >= 8)""".stripMargin

  /** q126/q127/q128's shared prefix: the FULL BPE training replay — 8
    * iterations, each = corpus-weighted pair counts (`prN`), the argmax
    * pair with lexicographic tie-break (`btN`), and the greedy
    * left-to-right merge applied closed-form (`msN` marks merge-start
    * positions: occurrence islands + even-offset parity — equivalent to
    * the engine's sequential fold because only equal-pair runs overlap),
    * ending in the segmented word table `ws8(word, cnt, syms)`. */
  private lazy val bpeCteChain: String = {
    val init =
      s"""bw0 AS MATERIALIZED (SELECT word, count(*)::BIGINT AS cnt FROM (
         |    SELECT unnest(regexp_split_to_array($normSql, ' ')) AS word FROM documents)
         |  WHERE len(word) > 0 GROUP BY word),
         |ws0 AS MATERIALIZED (SELECT word, cnt,
         |  list_transform(range(1, len(word) + 1), i -> word[i]) AS syms FROM bw0)""".stripMargin
    val iters = (1 to 8).map { i =>
      val prev = s"ws${i - 1}"
      s"""pr$i AS MATERIALIZED (SELECT p.a AS a, p.b AS b, sum(cnt)::BIGINT AS n FROM (
         |    SELECT cnt, unnest(CASE WHEN len(syms) < 2 THEN []
         |      ELSE list_transform(range(2, len(syms) + 1),
         |        j -> {'a': syms[j-1], 'b': syms[j]}) END) AS p
         |    FROM $prev) GROUP BY 1, 2),
         |bt$i AS MATERIALIZED (SELECT a, b FROM pr$i ORDER BY n DESC, a, b LIMIT 1),
         |ps$i AS MATERIALIZED (SELECT word, cnt, syms, unnest(range(1, len(syms) + 1)) AS j FROM $prev),
         |oc$i AS MATERIALIZED (SELECT p.word, p.j FROM ps$i p, bt$i bt
         |  WHERE p.syms[p.j] = bt.a AND p.j < len(p.syms) AND p.syms[p.j + 1] = bt.b),
         |ms$i AS MATERIALIZED (SELECT word, j FROM (
         |    SELECT word, j, min(j) OVER (PARTITION BY word, isl) AS j0 FROM (
         |      SELECT word, j, j - row_number() OVER (PARTITION BY word ORDER BY j) AS isl
         |      FROM oc$i)) WHERE (j - j0) % 2 = 0),
         |ws$i AS MATERIALIZED (SELECT o.word, any_value(o.cnt) AS cnt, list(o.piece ORDER BY o.j) AS syms
         |  FROM (SELECT p.word, p.cnt, p.j,
         |      CASE WHEN ms.j IS NOT NULL THEN p.syms[p.j] || bt.b ELSE p.syms[p.j] END AS piece,
         |      (mp.j IS NOT NULL) AS skip
         |    FROM ps$i p CROSS JOIN bt$i bt
         |    LEFT JOIN ms$i ms ON ms.word = p.word AND ms.j = p.j
         |    LEFT JOIN ms$i mp ON mp.word = p.word AND mp.j = p.j - 1) o
         |  WHERE NOT o.skip GROUP BY o.word)""".stripMargin
    }.mkString(",\n")
    init + ",\n" + iters
  }

  /** Sequential-fold dot product mirror of VectorFunctions.dot. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       | i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, x) -> acc + x)""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(${dotSql(a, a)}) = 0.0 OR sqrt(${dotSql(b, b)}) = 0.0 THEN 0.0
       | ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END""".stripMargin

  /** Exact SQL mirror of `TextFunctions.qualityScore` (same fp tree). */
  private val qualitySql =
    """(CASE WHEN length(text) = 0 THEN 0.0
      |     ELSE len(regexp_extract_all(text, '[\p{L}]'))::DOUBLE / length(text) END) * 0.5
      |  + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
      |     ELSE len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE / length(text) END) * 0.2
      |  + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
      |     ELSE len(regexp_extract_all(text, '[0-9]'))::DOUBLE / length(text) END) * 0.2
      |  + least((CASE WHEN length(trim(text)) = 0 THEN 0
      |     ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::DOUBLE / 100.0, 1.0) * 0.1""".stripMargin

  private val langCase = {
    val zh = "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
    val en = "len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|that|with|for)\\b'))"
    val de = "len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|mit|ein)\\b'))"
    val es = "len(regexp_extract_all(lower(text), '\\b(el|la|los|las|que|es|una|para)\\b'))"
    val fr = "len(regexp_extract_all(lower(text), '\\b(le|la|les|des|est|une|dans|pour)\\b'))"
    s"""CASE WHEN $zh >= $en AND $zh >= $de AND $zh >= $es AND $zh >= $fr THEN 'zh'
       | WHEN $en >= $zh AND $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
       | WHEN $de >= $zh AND $de >= $en AND $de >= $es AND $de >= $fr THEN 'de'
       | WHEN $es >= $zh AND $es >= $en AND $es >= $de AND $es >= $fr THEN 'es'
       | ELSE 'fr' END""".stripMargin
  }

  def all: Map[String, String] =
    // q50 runs the single-shuffle SCD2 formulation against the SAME oracle
    // as q18's 3-join merge, and q65 runs transformWithState sessionization
    // against q58's flatMapGroupsWithState oracle — the gate proves output
    // equivalence of the alternative formulations.
    oracleSqlCore +
      ("q50_scd2_merge1" -> oracleSqlCore("q18_scd2_faithful")) +
      ("q65_sessions_tws" -> oracleSqlCore("q58_stream_sessions")) +
      // q72 extracts via Spark 4's VARIANT type; q66 via fixed-schema
      // from_json — same answer, so they share one oracle.
      ("q72_variant_props" -> oracleSqlCore("q66_json_props")) +
      // q81 drains q46's plan via Trigger.AvailableNow — same oracle.
      ("q81_stream_availablenow" -> oracleSqlCore("q46_stream_hourly")) +
      // q82 re-plans q04's star join over co-bucketed fact tables and
      // q83 is q08's dedup as a sort-free arg_max aggregate — alternative
      // physical strategies, same oracles.
      ("q82_bucketed_star" -> oracleSqlCore("q04_star_join")) +
      ("q83_dedup_latest_agg" -> oracleSqlCore("q08_dedup_latest_order")) +
      // q92 streams q18's two snapshots through the foreachBatch SCD2
      // sink — the streaming plan must land the batch merge's exact table.
      ("q92_stream_scd2" -> oracleSqlCore("q18_scd2_faithful")) +
      // q107 maintains q04's star aggregate incrementally (seed + delta
      // fold) — alternative refresh strategy, same oracle.
      ("q107_incr_star_agg" -> oracleSqlCore("q04_star_join")) +
      // q110 folds streamed micro-batches into q74's aggregate state —
      // the monoid merge must be batch-boundary-insensitive.
      ("q110_stream_incr_agg" -> oracleSqlCore("q74_incremental_agg")) +
      // q115 computes q97's Morton key through the SQL-registered
      // zorder_value function — same oracle.
      ("q115_sql_zorder" -> oracleSqlCore("q97_zorder_value")) +
      // q116 sessionizes with the BUILTIN session_window aggregate —
      // the fourth formulation against q32's oracle.
      ("q116_session_window" -> oracleSqlCore("q32_sessionize")) +
      // q132/q133/q134 force the BROADCAST centroid path (threshold 0 —
      // broadcast-variable argmin expression + treeAggregate means fold)
      // through q38/q68/q87's exact oracles: the k·dim scale path must
      // produce bit-identical assignments, trained means, and scores.
      ("q132_ivf_topk_bc" -> oracleSqlCore("q38_ivf_topk")) +
      ("q133_kmeans_bc" -> oracleSqlCore("q68_kmeans_ivf")) +
      ("q134_semantic_bc" -> oracleSqlCore("q87_semantic_neardup")) +
      // q139 classifies a document STREAM with the frozen NB model —
      // micro-batch boundaries must be invisible: q135's batch oracle.
      ("q139_stream_classify" -> oracleSqlCore("q135_nb_langid")) +
      // q144 TRAINS through the streaming monoid sink — the committed
      // model must equal the batch training exactly, so q135's oracle
      // pins every prediction and score.
      ("q144_stream_nb_train" -> oracleSqlCore("q135_nb_langid")) +
      // q164 consumes q160's exact change-feed lifecycle as a STREAM
      // (readChangeFeed=true, startingVersion=earliest, rate-limited) —
      // streamed CDF must equal batch CDF, so q160's oracle pins it.
      ("q164_delta_cdf_stream" -> oracleSqlCore("q160_delta_cdf")) +
      // q221 folds the branch-scoped audit STREAM of q216's staged
      // lifecycle — the reconstruction must equal q216's audit read.
      ("q221_branch_stream" -> oracleSqlCore("q216_iceberg_wap")) +
      // q223 routes the same corpus through WARC serialization, the
      // record-splitting source, and HTTP envelope stripping before the
      // extractor — the answer must be bit-identical to q219's.
      ("q223_warc_extract" -> oracleSqlCore("q219_html_extract"))

  private lazy val oracleSqlCore: Map[String, String] = Map(
    // q140: the Delta log's append/overwrite/time-travel states derive
    // analytically from the corpus — v1 (create+append) is the corpus as
    // written; the latest snapshot is the overwrite's n_chars+1.
    "q140_delta_roundtrip" ->
      """WITH latest AS (SELECT lang, count(*) AS n_latest,
        |    sum(n_chars + 1)::BIGINT AS chars_latest FROM documents GROUP BY 1),
        | v1 AS (SELECT lang, count(*) AS n_v1,
        |    sum(n_chars)::BIGINT AS chars_v1 FROM documents GROUP BY 1)
        |SELECT lang, n_latest, chars_latest, n_v1, chars_v1
        |FROM latest JOIN v1 USING (lang) ORDER BY lang""".stripMargin,
    // q145: the checkpointed table's two snapshots derive analytically —
    // latest = the full corpus, v10 = all twelfth-slices but the last
    // (the JSON prefix below the checkpoint is deleted before reading)
    "q145_delta_checkpoint" ->
      """WITH latest AS (SELECT lang, count(*) AS n_latest,
        |    sum(n_chars)::BIGINT AS chars_latest FROM documents GROUP BY 1),
        | v10 AS (SELECT lang, count(*) AS n_v10,
        |    sum(n_chars)::BIGINT AS chars_v10 FROM documents
        |    WHERE doc_id % 12 <> 11 GROUP BY 1)
        |SELECT lang, n_latest, chars_latest, n_v10, chars_v10
        |FROM latest JOIN v10 USING (lang) ORDER BY lang""".stripMargin,
    // q146: the foreign log's final state keeps the %4==0 files (the
    // %4==2 set is removed in commit 1) plus the odd-doc files
    "q146_delta_foreign" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id % 4 <> 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q147: OPTIMIZE + VACUUM must be invisible to readers — all three
    // physical states (pre-compact originals, compacted, post-vacuum)
    // aggregate to the same full corpus
    "q147_delta_optimize" ->
      """SELECT lang,
        | count(*) AS n_pre, sum(n_chars)::BIGINT AS chars_pre,
        | count(*) AS n_opt, sum(n_chars)::BIGINT AS chars_opt,
        | count(*) AS n_vac, sum(n_chars)::BIGINT AS chars_vac
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // q150: the exactly-once streaming sink's table must hold the corpus
    // EXACTLY once — the full-stream replay is dropped by the txn
    // watermark, else every count doubles
    "q150_delta_stream" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q152: the DELETE + UPDATE lifecycle derives analytically — the
    // pre-delete snapshot is the corpus; the final state keeps
    // doc_id ≥ k (k = min + range/5, same integer arithmetic) with
    // n_chars+100 on the doc_id%5=0 survivors
    "q152_delta_row_ops" ->
      """WITH b AS (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 5 AS k
        |  FROM documents),
        | pre AS (SELECT lang, count(*) AS n_pre,
        |    sum(n_chars)::BIGINT AS chars_pre FROM documents GROUP BY 1),
        | post AS (SELECT lang, count(*) AS n_post,
        |    sum(CASE WHEN doc_id % 5 = 0 THEN n_chars + 100
        |        ELSE n_chars END)::BIGINT AS chars_post
        |  FROM documents, b WHERE doc_id >= k GROUP BY 1)
        |SELECT lang, n_pre, chars_pre, n_post, chars_post
        |FROM pre JOIN post USING (lang) ORDER BY lang""".stripMargin,
    // q153: MERGE rebuilds as CASE (matched replace) + UNION ALL
    // (inserts at doc_id+10M with n_chars+7)
    "q153_delta_merge" ->
      """WITH b AS (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 4 AS k
        |  FROM documents),
        | merged AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id < (SELECT k FROM b) AND doc_id % 6 = 0
        |         THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), lang,
        |    n_chars + 7
        |  FROM documents WHERE doc_id % 9 = 4)
        |SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    // q154: the column-mapped foreign table's final state keeps the
    // doc_id%3 != 2 slices (slice-2 files removed in commit 1)
    "q154_delta_colmap" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id % 3 <> 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q155: the DV masks the first ⌊cnt/7⌋ row indices of each
    // doc_id-ordered (lang, doc_id%4) slice file — the same mask as a
    // window rank over the slice ordering
    "q155_delta_dv" ->
      """WITH ranked AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang, doc_id % 4
        |                       ORDER BY doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang, doc_id % 4) AS cnt
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM ranked WHERE rn > cnt // 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q158: two DV deletes (doc_id%7==3, then doc_id<k with
    // k = min + (max-min)//5) never rewrite a data file; pre = v0
    // time travel, post = the DV-masked live set — both analytic
    "q158_delta_dv_delete" ->
      """WITH b AS (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 5 AS k
        |  FROM documents),
        |pre AS (SELECT lang, count(*) AS n_pre,
        |    sum(n_chars)::BIGINT AS chars_pre
        |  FROM documents GROUP BY 1),
        |post AS (SELECT lang, count(*) AS n_post,
        |    sum(n_chars)::BIGINT AS chars_post
        |  FROM documents, b
        |  WHERE doc_id % 7 <> 3 AND doc_id >= k GROUP BY 1)
        |SELECT pre.lang, n_pre, chars_pre, n_post, chars_post
        |FROM pre JOIN post ON pre.lang = post.lang
        |ORDER BY 1""".stripMargin,
    // q159: exactly-once streaming delivery — per-micro-batch partial
    // aggregates sum to the plain corpus aggregate iff no row is
    // dropped or duplicated across the snapshot/tail/rate-limit cuts
    "q159_delta_source" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q160: the change feed replayed analytically — inserts twice (the
    // corpus and its +7-chars appended copy), deletes = doc_id%7==3
    // with pre-delete values, update images = surviving doc_id%5==0
    // rows before/after the +100
    "q160_delta_cdf" ->
      """WITH all_ch AS (
        |  SELECT 'insert' AS change_type, lang, n_chars FROM documents
        |  UNION ALL SELECT 'insert', lang, n_chars + 7 FROM documents
        |  UNION ALL SELECT 'delete', lang, n_chars FROM documents
        |    WHERE doc_id % 7 = 3
        |  UNION ALL SELECT 'update_preimage', lang, n_chars FROM documents
        |    WHERE doc_id % 5 = 0 AND doc_id % 7 <> 3
        |  UNION ALL SELECT 'update_postimage', lang, n_chars + 100 FROM documents
        |    WHERE doc_id % 5 = 0 AND doc_id % 7 <> 3)
        |SELECT change_type, lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM all_ch GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q161: two DV-masked updates (+1000 where doc_id%6==1, then +40
    // below the 25th-percentile doc_id); pre = v0 time travel, post =
    // the composed update arithmetic — both analytic
    "q161_delta_dv_update" ->
      """WITH b AS (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 4 AS k
        |  FROM documents),
        |pre AS (SELECT lang, count(*) AS n_pre,
        |    sum(n_chars)::BIGINT AS chars_pre
        |  FROM documents GROUP BY 1),
        |post AS (SELECT lang, count(*) AS n_post,
        |    sum(n_chars
        |      + CASE WHEN doc_id % 6 = 1 THEN 1000 ELSE 0 END
        |      + CASE WHEN doc_id < k THEN 40 ELSE 0 END)::BIGINT AS chars_post
        |  FROM documents, b GROUP BY 1)
        |SELECT pre.lang, n_pre, chars_pre, n_post, chars_post
        |FROM pre JOIN post ON pre.lang = post.lang
        |ORDER BY 1""".stripMargin,
    // q162: restore-to-v0 must equal the original corpus; the
    // pre-restore head (post-delete + shifted append) stays travelable
    "q162_delta_restore" ->
      """WITH fin AS (SELECT lang, count(*) AS n_final,
        |    sum(n_chars)::BIGINT AS chars_final
        |  FROM documents GROUP BY 1),
        |v2 AS (SELECT lang, count(*) AS n_v2, sum(nc)::BIGINT AS chars_v2
        |  FROM (SELECT lang, n_chars AS nc FROM documents WHERE doc_id % 5 <> 0
        |        UNION ALL SELECT lang, n_chars + 11 FROM documents) GROUP BY 1)
        |SELECT fin.lang, n_final, chars_final, n_v2, chars_v2
        |FROM fin JOIN v2 ON fin.lang = v2.lang
        |ORDER BY 1""".stripMargin,
    // q163: rename is metadata-only — the unified read over pre- and
    // post-rename files equals the plain corpus aggregate, under the
    // renamed output column
    "q163_delta_rename" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q165: the two schema epochs replay analytically — even doc_ids
    // (pre-evolution files) contribute NULL quality, odd doc_ids carry
    // n_chars % 100 under the renamed + added columns
    "q165_delta_addcol" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
        |  count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS n_quality,
        |  sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars % 100 END)::BIGINT AS quality
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q166: the SQL-driven lifecycle replays analytically — doc_id%7=3
    // deleted (unless re-inserted by the merge), doc_id%3=0 merged to
    // n_chars+1000 (overriding the earlier +50), doc_id%5=0 updated +50
    "q166_delta_sql" ->
      """SELECT lang, count(*) AS n_docs, sum(nc)::BIGINT AS chars FROM (
        |  SELECT lang, CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000
        |                    WHEN doc_id % 5 = 0 THEN n_chars + 50
        |                    ELSE n_chars END AS nc
        |  FROM documents
        |  WHERE doc_id % 3 = 0 OR doc_id % 7 <> 3
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    // q167: latest = the overwrite's n_chars+5 over the whole corpus;
    // VERSION AS OF 1 = the CTAS+INSERT union (the original corpus);
    // OPTIMIZE between them must be invisible to both
    "q167_sql_ddl" ->
      """WITH base AS (SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |  FROM documents GROUP BY 1)
        |SELECT lang, n AS n_latest, (chars + 5 * n)::BIGINT AS chars_latest,
        |       n AS n_v1, chars AS chars_v1
        |FROM base ORDER BY lang""".stripMargin,
    // q168: the clause replay — matched evens (doc_id%4<2, n_chars even)
    // double, matched odds delete, the rest of the table is untouched,
    // and the fresh-key half inserts n_chars*2 where n_chars%3=0
    "q168_sql_merge_clauses" ->
      """WITH cur AS (
        |  SELECT lang, n_chars FROM documents WHERE doc_id % 4 >= 2
        |  UNION ALL
        |  SELECT lang, n_chars * 2 FROM documents
        |  WHERE doc_id % 4 < 2 AND n_chars % 2 = 0
        |  UNION ALL
        |  SELECT lang, n_chars * 2 FROM documents WHERE n_chars % 3 = 0
        |)
        |SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM cur GROUP BY 1 ORDER BY 1""".stripMargin,
    // q169: the converted lake equals the corpus minus the post-convert
    // SQL delete — conversion itself must be value-invisible
    "q169_convert_to_delta" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id % 5 <> 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q170: catalog-name lifecycle — survivors are the non-deleted rows
    // (doc_id%5<>2) plus the merge's re-inserts (doc_id%3=0 overlaps the
    // deletion); every doc_id%3=0 row carries the merged n_chars+777
    "q170_sql_catalog_names" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(CASE WHEN doc_id % 3 = 0 THEN n_chars + 777
        |           ELSE n_chars END)::BIGINT AS chars
        |FROM documents
        |WHERE doc_id % 5 <> 2 OR doc_id % 3 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q171: by-source replay — matched quarter (doc_id%4=1) updates to
    // n_chars+11; unmatched doc_id%4=2 deletes; remaining unmatched
    // evens gain 1000 (clause order: the delete wins over the update)
    "q171_merge_by_source" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(CASE WHEN doc_id % 4 = 1 THEN n_chars + 11
        |           WHEN n_chars % 2 = 0 THEN n_chars + 1000
        |           ELSE n_chars END)::BIGINT AS chars
        |FROM documents WHERE doc_id % 4 <> 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q172: identity lifecycle — the concrete generated ids carry
    // protocol-legal gaps, so the deterministic surface is the
    // invariants: row count, all-distinct, first value AT start (100),
    // step alignment, inter-batch ordering, watermark = max written
    "q172_identity_lifecycle" ->
      """SELECT count(*) AS n_rows, TRUE AS ids_distinct,
        |  CAST(100 AS BIGINT) AS b1_min, TRUE AS step_aligned,
        |  TRUE AS batches_ordered, TRUE AS hwm_is_max
        |FROM documents""".stripMargin,
    // q173: the Iceberg two-epoch probe — latest snapshot = whole
    // corpus; snapshot 1 = the even-doc_id half
    "q173_iceberg_read" ->
      """SELECT cur.lang, cur.n, cur.chars, old.n AS n_s1, old.chars AS chars_s1
        |FROM (SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |      FROM documents GROUP BY 1) cur
        |JOIN (SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1) old
        |USING (lang) ORDER BY lang""".stripMargin,
    // q174: Iceberg schema evolution — the renamed column's sum must
    // cover BOTH epochs (field-id resolution over old files); the
    // added column counts exactly the odd-doc_id epoch; snapshot 1 is
    // the even half under the original schema
    "q174_iceberg_evolution" ->
      """SELECT cur.lang, cur.n, cur.chars, cur.n_epoch2,
        |  old.n AS n_s1, old.chars AS chars_s1
        |FROM (SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars,
        |        sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_epoch2
        |      FROM documents GROUP BY 1) cur
        |JOIN (SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1) old
        |USING (lang) ORDER BY lang""".stripMargin,
    // q175: clustered-table lifecycle — the surviving rows are the
    // corpus minus the short-doc DV delete
    "q175_delta_clustered" ->
      """SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE n_chars >= 100
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q176: Iceberg file-level data skipping — the pruned range read
    // must equal the plain doc_id BETWEEN filter
    "q176_iceberg_pruned" ->
      """WITH b AS (SELECT
        |    min(doc_id) + 4 * ((max(doc_id) - min(doc_id)) // 10) AS lo,
        |    min(doc_id) + 5 * ((max(doc_id) - min(doc_id)) // 10) AS hi
        |  FROM documents)
        |SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents, b WHERE doc_id BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q177: the Delta+Iceberg federation join = the corpus self-join
    // of consecutive doc ids (even side Delta, odd side Iceberg)
    "q177_sql_federation" ->
      """SELECT a.lang, count(*) AS n,
        |  sum(a.n_chars + b.n_chars)::BIGINT AS chars
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q178: row-tracking lifecycle — logical rows/chars after the
    // DELETE(de) + UPDATE(fr, +1000) ops, the id watermark = every id
    // ever assigned (N corpus rows + U update-rewritten fr rows, zero
    // based), and the driver-verified id invariants as TRUE booleans
    "q178_row_tracking" ->
      """SELECT count(*) FILTER (WHERE lang <> 'de')::BIGINT AS n_rows,
        |  (sum(n_chars) FILTER (WHERE lang <> 'de')
        |   + 1000 * count(*) FILTER (WHERE lang = 'fr'))::BIGINT AS sum_chars,
        |  (count(*) + count(*) FILTER (WHERE lang = 'fr') - 1)::BIGINT AS hwm,
        |  TRUE AS ids_assigned, TRUE AS ranges_disjoint,
        |  TRUE AS fresh_update_ids
        |FROM documents""".stripMargin,
    // q179: the lang-partitioned Iceberg read of one lang = that lang
    // slice of the corpus, by source
    "q179_iceberg_partitioned" ->
      """SELECT source, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q180: SQL row-tracking lifecycle — rows/chars after DELETE(de),
    // watermark = N original ids + the compacted file's fresh range
    // (N - deleted), invariants as TRUE booleans
    "q180_sql_row_tracking" ->
      """SELECT count(*) FILTER (WHERE lang <> 'de')::BIGINT AS n_rows,
        |  sum(n_chars) FILTER (WHERE lang <> 'de')::BIGINT AS sum_chars,
        |  (count(*) + count(*) FILTER (WHERE lang <> 'de') - 1)::BIGINT AS hwm,
        |  TRUE AS dv_purged, TRUE AS ids_materialized,
        |  TRUE AS ids_original_range
        |FROM documents""".stripMargin,
    // q183: SQL MERGE merge-on-read on a row-tracked table — fr rows
    // update (+1000), de rows re-insert under fresh keys; watermark =
    // N original + U postimage + I inserted fresh ids; file-level
    // invariants as TRUE booleans
    "q183_sql_merge_row_tracking" ->
      """SELECT (count(*) + count(*) FILTER (WHERE lang = 'de'))::BIGINT AS n_rows,
        |  (sum(n_chars) + 1000 * count(*) FILTER (WHERE lang = 'fr')
        |   + sum(n_chars) FILTER (WHERE lang = 'de'))::BIGINT AS sum_chars,
        |  (count(*) + count(*) FILTER (WHERE lang = 'fr')
        |   + count(*) FILTER (WHERE lang = 'de') - 1)::BIGINT AS hwm,
        |  TRUE AS mor_masked, TRUE AS fresh_ids
        |FROM documents""".stripMargin,
    // q184: uniform (Delta + Iceberg dual metadata) lifecycle — final
    // state = all docs minus the deleted 'de' slice, read through the
    // ICEBERG plane post-rename; snapshot/manifest shape + two-path
    // agreement as literal-checked invariants
    "q184_uniform_lifecycle" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  3::BIGINT AS n_snapshots,
        |  TRUE AS incremental_manifests, TRUE AS two_paths_match
        |FROM documents WHERE lang <> 'de'""".stripMargin,
    // q185: partitioned uniform — per-lang aggregate via the ICEBERG
    // plane after enable-rewrite + append + CoW delete of 'de'
    "q185_uniform_partitioned" ->
      """SELECT lang, count(*)::BIGINT AS n_rows,
        |  sum(n_chars)::BIGINT AS sum_chars, TRUE AS two_paths_match
        |FROM documents WHERE lang <> 'de' GROUP BY lang""".stripMargin,
    // q186: Iceberg v3 deletion vectors — the masked row ordinals of
    // the sorted even-half file are exactly the 100 smallest even
    // doc_ids
    "q186_iceberg_v3_dv" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(n_chars)::BIGINT AS sum_chars, TRUE AS dv_applied
        |FROM documents WHERE doc_id NOT IN (
        |  SELECT doc_id FROM documents WHERE doc_id % 2 = 0
        |  ORDER BY doc_id LIMIT 100)""".stripMargin,
    // q187: Iceberg v3 row lineage — evens take lineage ids 0..nE-1 in
    // doc_id order, odds continue at nE; the DV masks lineage ids
    // 0..99; survivors keep their original ids
    "q187_iceberg_row_lineage" ->
      """WITH r AS (
        |  SELECT n_chars, doc_id % 2 AS odd,
        |    row_number() OVER (PARTITION BY doc_id % 2 ORDER BY doc_id) - 1 AS rk
        |  FROM documents
        |), ne AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0)
        |SELECT count(*)::BIGINT AS n_rows,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  sum(CASE WHEN odd = 0 THEN rk ELSE rk + (SELECT n FROM ne) END)::BIGINT AS sum_row_id
        |FROM r WHERE NOT (odd = 0 AND rk < 100)""".stripMargin,
    // q188: DV delete + REORG PURGE + DROP FEATURE — final state is
    // the corpus minus 'de', DV-free, downgraded, truncated
    "q188_drop_feature" ->
      """SELECT count(*)::BIGINT AS n_rows, sum(n_chars)::BIGINT AS sum_chars,
        |  TRUE AS feature_dropped, TRUE AS dv_free, TRUE AS history_truncated
        |FROM documents WHERE lang <> 'de'""".stripMargin,
    // q189: column defaults — evens inserted under DEFAULT 'und', the
    // default flips to 'xx', odds land after
    "q189_column_defaults" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN 'und' ELSE 'xx' END AS lang,
        |  count(*)::BIGINT AS n_rows, sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // q190: native Iceberg writes — final = the 'en' slice (+7 chars
    // each), pre-overwrite time travel = the %3 in {0,1} slices
    "q190_iceberg_write" ->
      """SELECT count(*) FILTER (WHERE lang = 'en')::BIGINT AS n_rows,
        |  sum(n_chars + 7) FILTER (WHERE lang = 'en')::BIGINT AS sum_chars,
        |  count(*) FILTER (WHERE doc_id % 3 <> 2)::BIGINT AS n_pre,
        |  sum(n_chars) FILTER (WHERE doc_id % 3 <> 2)::BIGINT AS chars_pre
        |FROM documents""".stripMargin,
    // q191: Iceberg streaming source — origin snapshot + two tailed
    // appends cover the whole corpus exactly once
    "q191_iceberg_stream" ->
      """SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q192: Delta->Iceberg streaming mirror — the mirrored table holds
    // the whole corpus exactly once
    "q192_iceberg_sink" ->
      """SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q193: graft-WRITTEN partitioned Iceberg table — the en slice by
    // source (manifest-level skip asserted in-query)
    "q193_iceberg_write_partitioned" ->
      """SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q194: native Iceberg merge-on-read DELETEs — low doc_id band and
    // the %7==3 slice masked; survivors aggregate per lang
    "q194_iceberg_delete" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents, mm
        |WHERE doc_id >= mn + (mx - mn) // 5 AND doc_id % 7 <> 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q195: graft-written Iceberg schema evolution — rename + add are
    // metadata-only; epoch 1 (evens) surfaces NULL quality, epoch 2
    // (odds) carries n_chars%100
    "q195_iceberg_write_evolution" ->
      """SELECT lang, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS chars,
        |  sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars % 100 END)::BIGINT AS quality
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q203: metadata tables — per-lang counts derived from manifests
    // only must equal the data-derived GROUP BY
    "q203_iceberg_meta_tables" ->
      """SELECT lang, count(*)::BIGINT AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q202: snapshot rollback — the delete rolls away, evens raw +
    // re-appended odds (+9 chars)
    "q202_iceberg_rollback" ->
      """SELECT lang, count(*)::BIGINT AS n,
        |  sum(n_chars + CASE WHEN doc_id % 2 <> 0 THEN 9 ELSE 0 END)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q201: v3 deletion-vector deletes — low sixth and the %11==7
    // slice masked via Puffin bitmaps; survivors aggregate per lang
    "q201_iceberg_dv_delete" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents, mm
        |WHERE doc_id >= mn + (mx - mn) // 6 AND doc_id % 11 <> 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q200: equality-delete lifecycle — %10 keys masked pre-delete,
    // re-appended (+5000) after; evens/odds otherwise raw
    "q200_iceberg_eq_delete" ->
      """SELECT lang, count(*)::BIGINT AS n,
        |  sum(n_chars + CASE WHEN doc_id % 10 = 0 THEN 5000 ELSE 0 END)::BIGINT AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q199: graft-written bucket[8]-partitioned table — the min doc's
    // point row (1 manifest opened, asserted in-query) + the corpus
    // totals re-emitted exactly once by the streaming round-trip
    "q199_iceberg_bucket_write" ->
      """WITH mm AS (SELECT min(doc_id) AS mn FROM documents)
        |SELECT (SELECT lang FROM documents, mm WHERE doc_id = mn) AS point_lang,
        |  (SELECT n_chars FROM documents, mm WHERE doc_id = mn)::BIGINT AS point_chars,
        |  count(*)::BIGINT AS n_stream, sum(n_chars)::BIGINT AS chars_stream
        |FROM documents""".stripMargin,
    // q198: the Iceberg lifecycle as SQL — low quarter deleted, en
    // +500, %9==0 matched re-lang'd qq / its deleted keys re-inserted,
    // shifted 'ins' rows appended, then OPTIMIZE+VACUUM (state-neutral)
    "q198_iceberg_sql_dml" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
        |live AS (
        |  SELECT CASE WHEN doc_id % 9 = 0 THEN 'qq' ELSE lang END AS lang,
        |    n_chars + CASE WHEN lang = 'en' THEN 500 ELSE 0 END AS n_chars
        |  FROM documents, mm WHERE doc_id >= mn + (mx - mn) // 4),
        |reins AS (
        |  SELECT 'qq' AS lang, n_chars FROM documents, mm
        |  WHERE doc_id < mn + (mx - mn) // 4 AND doc_id % 9 = 0),
        |ins AS (SELECT 'ins' AS lang, n_chars FROM documents WHERE doc_id % 9 = 0)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM (SELECT * FROM live UNION ALL SELECT * FROM reins
        |      UNION ALL SELECT * FROM ins)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q204: multi-field (day(ts), bucket(user_id)) partitioned Iceberg
    // write — the low event_id decile deleted + folded; the 2-D
    // manifest-skip probes are in-query requires
    "q204_iceberg_multi_partition" ->
      """WITH mm AS (SELECT min(event_id) AS mn, max(event_id) AS mx FROM events)
        |SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS total
        |FROM events, mm
        |WHERE event_id >= mn + (mx - mn) // 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q205: q198's lifecycle entirely by catalog NAME — identical
    // analytical replay (the name layer changes routing, not results)
    "q205_iceberg_named_sql" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
        |live AS (
        |  SELECT CASE WHEN doc_id % 9 = 0 THEN 'qq' ELSE lang END AS lang,
        |    n_chars + CASE WHEN lang = 'en' THEN 500 ELSE 0 END AS n_chars
        |  FROM documents, mm WHERE doc_id >= mn + (mx - mn) // 4),
        |reins AS (
        |  SELECT 'qq' AS lang, n_chars FROM documents, mm
        |  WHERE doc_id < mn + (mx - mn) // 4 AND doc_id % 9 = 0),
        |ins AS (SELECT 'ins' AS lang, n_chars FROM documents WHERE doc_id % 9 = 0)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM (SELECT * FROM live UNION ALL SELECT * FROM reins
        |      UNION ALL SELECT * FROM ins)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q206: the Iceberg changelog inventory — inserts = both appends
    // (raw) + en&>=k postimages (+500); deletes = the low band (raw)
    // + en&>=k preimages (raw) + %7==0&>=k live rows at eq-delete time
    // (en rows already +500); compaction emits nothing
    "q206_iceberg_changelog" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
        |k AS (SELECT mn + (mx - mn) // 3 AS kv FROM mm),
        |ev AS (
        |  SELECT 'insert' AS _change_type, lang, n_chars FROM documents
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars + 500 FROM documents, k
        |  WHERE lang = 'en' AND doc_id >= kv
        |  UNION ALL
        |  SELECT 'delete', lang, n_chars FROM documents, k WHERE doc_id < kv
        |  UNION ALL
        |  SELECT 'delete', lang, n_chars FROM documents, k
        |  WHERE lang = 'en' AND doc_id >= kv
        |  UNION ALL
        |  SELECT 'delete', lang,
        |    n_chars + CASE WHEN lang = 'en' THEN 500 ELSE 0 END
        |  FROM documents, k WHERE doc_id % 7 = 0 AND doc_id >= kv)
        |SELECT _change_type, lang, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS chars
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q207: native row lineage — ids re-derived with window functions
    // (evens rank 0.., odds continue at |evens|), the en slice updated
    // at seq 3 (+1000 chars), the %5 band deleted, compaction identity-
    // preserving by construction (asserted in-query on the Spark side)
    "q207_iceberg_lineage_native" ->
      """WITH ev AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS rid, 1 AS app_seq
        |  FROM documents WHERE doc_id % 2 = 0),
        |ne AS (SELECT count(*) AS n FROM ev),
        |od AS (
        |  SELECT doc_id, lang, n_chars,
        |    (SELECT n FROM ne) + row_number() OVER (ORDER BY doc_id) - 1 AS rid,
        |    2 AS app_seq
        |  FROM documents WHERE doc_id % 2 <> 0),
        |base AS (SELECT * FROM ev UNION ALL SELECT * FROM od),
        |upd AS (
        |  SELECT doc_id, lang,
        |    n_chars + CASE WHEN lang = 'en' THEN 1000 ELSE 0 END AS n_chars,
        |    rid, CASE WHEN lang = 'en' THEN 3 ELSE app_seq END AS lus
        |  FROM base),
        |live AS (SELECT * FROM upd WHERE doc_id % 5 <> 0)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars,
        |  sum(rid)::BIGINT AS sum_row_id, sum(lus)::BIGINT AS sum_lus
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,
    // q208: the z-order rewrite is layout-only — the survivors of the
    // %7 DV delete, whatever the file arrangement
    "q208_iceberg_zorder" ->
      """SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id % 7 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q209: exact ANALYZE — DuckDB replays (column, ndv, row_count)
    "q209_iceberg_stats" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS "column", count(DISTINCT doc_id)::BIGINT AS ndv,
        |    count(*)::BIGINT AS row_count FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(DISTINCT lang)::BIGINT, count(*)::BIGINT
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(DISTINCT n_chars)::BIGINT, count(*)::BIGINT
        |  FROM documents)
        |ORDER BY "column"""".stripMargin,
    // q210: streaming CDC upsert — survivors of the %5 tombstone,
    // the en slice re-imaged at +1000 (sequence arbitration kept the
    // higher of +500/+1000)
    "q210_iceberg_upsert_stream" ->
      """SELECT lang, count(*)::BIGINT AS n,
        |  sum(n_chars + CASE WHEN lang = 'en' THEN 1000 ELSE 0 END)::BIGINT
        |    AS chars
        |FROM documents WHERE doc_id % 5 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q211: partition statistics — per-day live counts as epoch days
    "q211_iceberg_partition_stats" ->
      """SELECT date_diff('day', DATE '1970-01-01', ts::DATE)::INT AS day_num,
        |  count(*)::BIGINT AS n_rows
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q212: the streaming dedup recurrence unrolled — per batch
    // (doc_id % 3), a doc drops on a band-key collision with an
    // EARLIER batch's survivor or with a smaller-id doc of its own
    // batch; empty-shingle docs have no keys and always survive
    "q212_stream_dedup" ->
      s"""WITH $docShinglesCte,
        |sig AS (SELECT doc_id, sh, list_transform(range(0, 16),
        |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
        |  FROM docsh),
        |bd AS (SELECT doc_id, doc_id % 3 AS b, unnest(list_transform(range(0, 4),
        |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk
        |  FROM sig WHERE len(sh) > 0),
        |s0 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id % 3 = 0
        |  AND NOT EXISTS (SELECT 1 FROM bd x JOIN bd y ON x.bk = y.bk
        |    WHERE x.doc_id = d.doc_id AND y.b = 0 AND y.doc_id < d.doc_id)),
        |k0 AS (SELECT DISTINCT bk FROM bd WHERE doc_id IN (SELECT doc_id FROM s0)),
        |s1 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id % 3 = 1
        |  AND NOT EXISTS (SELECT 1 FROM bd x
        |    WHERE x.doc_id = d.doc_id AND x.bk IN (SELECT bk FROM k0))
        |  AND NOT EXISTS (SELECT 1 FROM bd x JOIN bd y ON x.bk = y.bk
        |    WHERE x.doc_id = d.doc_id AND y.b = 1 AND y.doc_id < d.doc_id)),
        |k01 AS (SELECT bk FROM k0 UNION
        |  SELECT DISTINCT bk FROM bd WHERE doc_id IN (SELECT doc_id FROM s1)),
        |s2 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id % 3 = 2
        |  AND NOT EXISTS (SELECT 1 FROM bd x
        |    WHERE x.doc_id = d.doc_id AND x.bk IN (SELECT bk FROM k01))
        |  AND NOT EXISTS (SELECT 1 FROM bd x JOIN bd y ON x.bk = y.bk
        |    WHERE x.doc_id = d.doc_id AND y.b = 2 AND y.doc_id < d.doc_id)),
        |surv AS (SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM s1
        |  UNION ALL SELECT doc_id FROM s2)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id IN (SELECT doc_id FROM surv)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q213: the lineage changelog — ids re-derived with windows, the
    // change inventory unioned with each delete's CURRENT preimage
    "q213_lineage_changelog" ->
      """WITH ev AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS rid
        |  FROM documents WHERE doc_id % 2 = 0),
        |ne AS (SELECT count(*) AS n FROM ev),
        |od AS (
        |  SELECT doc_id, lang, n_chars,
        |    (SELECT n FROM ne) + row_number() OVER (ORDER BY doc_id) - 1 AS rid
        |  FROM documents WHERE doc_id % 2 <> 0),
        |base AS (SELECT * FROM ev UNION ALL SELECT * FROM od),
        |chg AS (
        |  SELECT 'insert' AS _change_type, lang, n_chars, rid FROM base
        |  UNION ALL
        |  SELECT 'delete', lang, n_chars, rid FROM base WHERE lang = 'en'
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars + 1000, rid FROM base WHERE lang = 'en'
        |  UNION ALL
        |  SELECT 'delete', lang,
        |    n_chars + CASE WHEN lang = 'en' THEN 1000 ELSE 0 END, rid
        |  FROM base WHERE doc_id % 5 = 0)
        |SELECT _change_type, lang, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS chars, sum(rid)::BIGINT AS sum_row_id
        |FROM chg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q217: changelog across rollback — the restore's net diff (the
    // dropped append as deletes, the rolled-back DV masks as undelete
    // inserts) joins the ordinary inventory
    "q217_changelog_rollback" ->
      """WITH ch AS (
        |  SELECT 'insert' AS change_type, lang, n_chars
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 'delete', lang, n_chars
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 2
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT 'delete', lang, n_chars FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 2
        |)
        |SELECT change_type, lang, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS chars
        |FROM ch GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q216: write-audit-publish — the published state is the corpus
    // minus the staged delete band
    "q216_iceberg_wap" ->
      """SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id % 10 NOT IN (4, 5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q220: cherry-pick publish past a diverged main — the end state is
    // main's seed (evens) + main's mid-audit append (doc_id%4=3) + the
    // branch's staged append (doc_id%4=1) minus the staged delete
    // (doc_id%20=1): every doc except the deleted band
    "q220_iceberg_cherrypick" ->
      """SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE doc_id % 20 != 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q215: v3 default values — pre-add thirds read the default (5),
    // the post-add third carries explicit doc_id % 7, the shifted
    // copy lands through write-default (5)
    "q215_iceberg_defaults" ->
      """WITH base AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN doc_id % 3 = 2 THEN doc_id % 7 ELSE 5 END AS grade
        |  FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars, 5 AS grade FROM documents WHERE doc_id % 3 = 0
        |)
        |SELECT lang, grade::BIGINT AS grade, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS chars
        |FROM base GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q214: the replicated mirror == the source's final state
    "q214_lineage_replication" ->
      """SELECT lang, count(*)::BIGINT AS n,
        |  sum(n_chars + CASE WHEN lang = 'en' THEN 1000 ELSE 0 END)::BIGINT
        |    AS chars
        |FROM documents WHERE doc_id % 5 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q196: native Iceberg maintenance — the low third masked, then
    // the same aggregate through live/compacted/expired states
    "q196_iceberg_maintenance" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents, mm
        |WHERE doc_id >= mn + (mx - mn) // 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q197: native Iceberg merge-on-read UPDATE + MERGE — low band
    // +1000 chars, %10==0 deleted, other %5==0 re-lang'd to zz,
    // shifted keys inserted as 'ins' (raw chars)
    "q197_iceberg_upsert" ->
      """WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
        |base AS (
        |  SELECT CASE WHEN doc_id % 5 = 0 THEN 'zz' ELSE lang END AS lang,
        |    n_chars + CASE WHEN doc_id < mn + (mx - mn) // 5
        |                   THEN 1000 ELSE 0 END AS n_chars
        |  FROM documents, mm WHERE doc_id % 10 <> 0),
        |ins AS (SELECT 'ins' AS lang, n_chars FROM documents WHERE doc_id % 5 = 0)
        |SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q181: day(ts)-hidden-partitioned Iceberg range read == the same
    // 3-day window on the raw events (the engine additionally asserts
    // 3 of 30 manifests opened)
    "q181_iceberg_day_partition" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q182: bucket(8, doc_id)-partitioned point lookup == the raw row
    // (the engine additionally asserts exactly 1 of 8 bucket
    // manifests opened, via the spec's murmur3)
    "q182_iceberg_bucket" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id = 137 ORDER BY doc_id""".stripMargin,
    // q156: the z-order-clustered two-dim pruned read must equal the
    // plain conjunctive BETWEEN — bands recomputed with the same
    // integer arithmetic (middle ~20% of each key range)
    "q156_delta_zorder" ->
      """WITH b AS (SELECT
        |    min(o_orderkey) + 4 * ((max(o_orderkey) - min(o_orderkey)) // 10) AS ok_lo,
        |    min(o_orderkey) + 5 * ((max(o_orderkey) - min(o_orderkey)) // 10) AS ok_hi,
        |    min(o_custkey) + 4 * ((max(o_custkey) - min(o_custkey)) // 10) AS ck_lo,
        |    min(o_custkey) + 5 * ((max(o_custkey) - min(o_custkey)) // 10) AS ck_hi
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders, b
        |WHERE o_orderkey BETWEEN ok_lo AND ok_hi
        |  AND o_custkey BETWEEN ck_lo AND ck_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q151: the stats-pruned range read must equal the plain BETWEEN —
    // bounds recomputed with the same integer arithmetic
    "q151_delta_skipping" ->
      """WITH b AS (SELECT min(o_orderkey) + (max(o_orderkey) - min(o_orderkey)) // 10 AS lo,
        |    min(o_orderkey) + 3 * ((max(o_orderkey) - min(o_orderkey)) // 10) AS hi
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders, b WHERE o_orderkey BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q149: per-frame channel sums and endpoint bytes derive analytically
    // from the synthesis rule (sequential unnests — DuckDB zips parallel
    // ones); decode must invert the padded DIB encode pixel-for-pixel
    "q149_video_frames" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id % 3) * 2 AS w,
        |    4 + (doc_id % 2) * 2 AS h, 1 + (doc_id % 3) AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(nf)) AS frame_idx FROM d),
        |fr AS (SELECT doc_id, w, h, frame_idx, unnest(range(h)) AS s FROM f),
        |px AS (SELECT doc_id, w, h, frame_idx, s, unnest(range(w)) AS x FROM fr),
        |v AS (SELECT doc_id, frame_idx, w, h,
        |    (doc_id * 7 + frame_idx * 13 + s * 5 + x * 3) AS base FROM px)
        |SELECT doc_id, frame_idx::INT AS frame_idx,
        | sum(base % 256)::BIGINT AS sum_b,
        | sum((base + 11) % 256)::BIGINT AS sum_g,
        | sum((base + 22) % 256)::BIGINT AS sum_r,
        | ((doc_id * 7 + frame_idx * 13) % 256)::INT AS first_byte,
        | ((doc_id * 7 + frame_idx * 13 + (h - 1) * 5 + (w - 1) * 3 + 22) % 256)::INT AS last_byte
        |FROM v GROUP BY doc_id, frame_idx, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // q148: q94's greedy pack recursion fed by q128's TRAINED-vocab
    // token counts — the full batch-assembly path (tokenizer → budget
    // fill) replayed end-to-end: BPE training chain, per-doc subword
    // counts, then the same non-associative pack recurrence.
    "q148_bpe_packing" ->
      s"""WITH RECURSIVE $bpeCteChain,
         |bstream AS (SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array($normSql, ' ')) AS word
         |    FROM documents) WHERE len(word) > 0),
         |bcounts AS (SELECT t.doc_id, sum(len(w.syms))::BIGINT AS n_tokens
         |  FROM bstream t JOIN ws8 w USING (word) GROUP BY t.doc_id),
         |${packReplayCteFrom("SELECT doc_id, n_tokens FROM bcounts")}
         |SELECT grp::INT AS grp, doc_id, n_tokens::INT AS n_tokens, pack_id,
         | pack_pos::INT AS pack_pos
         |FROM p ORDER BY doc_id""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_quantity >= 49 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_star_join" ->
      """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q07_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2",
    "q08_dedup_latest_order" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,
    "q09_union_buckets" ->
      """SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 400000
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q10_surrogate_keys" ->
      """SELECT c_custkey, sha256(concat_ws('|', c_custkey, c_name)) AS sk, md5(c_name) AS name_fp
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q11_fill_none" ->
      """SELECT c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), 'None') AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q12_clean_strings" ->
      """SELECT o_orderkey, regexp_replace(o_orderpriority, '-', '', 'g') AS priority_clean,
        | trim('  ' || o_orderstatus || '  ') AS status_trim
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q13_split_parts" ->
      """SELECT p_partkey, trim(split_part(p_name, ' ', 1)) AS name_part1,
        | trim(split_part(p_name, ' ', 2)) AS name_part2
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q14_ts_format_quirk" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%dT%-H:%M:%S') AS ts_ref
        |FROM events ORDER BY event_id""".stripMargin,
    "q15_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | row_number() OVER w AS rn,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q16_topn_per_brand" ->
      """SELECT p_brand, rank, p_partkey, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
        | FROM part) WHERE rank <= 3 ORDER BY p_brand, rank""".stripMargin,
    "q17_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start, event_type,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q18_scd2_faithful" ->
      """WITH base AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
        |ex AS (SELECT c_custkey, c_name, c_mktsegment,
        |  sha256(concat_ws('|', c_name, c_mktsegment)) AS old_hash,
        |  sha256(concat_ws('|', c_custkey)) AS customer_sk,
        |  TIMESTAMP '2024-01-01 00:00:00' AS created_at,
        |  TIMESTAMP '2024-01-01 00:00:00' AS modified_at, TRUE AS is_active FROM base),
        |nw AS (SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || '_V2' ELSE c_mktsegment END AS c_mktsegment
        |  FROM base
        | UNION ALL
        | SELECT c_custkey + 1000000, 'NEW ' || c_name, c_mktsegment FROM base WHERE c_custkey % 101 = 0),
        |nh AS (SELECT *, sha256(concat_ws('|', c_name, c_mktsegment)) AS hash FROM nw),
        |chg AS (SELECT n.* FROM nh n LEFT JOIN ex o ON n.c_custkey = o.c_custkey AND o.is_active
        |  WHERE n.hash <> o.old_hash OR o.old_hash IS NULL),
        |unchanged AS (SELECT c_custkey, c_name, c_mktsegment, customer_sk, created_at, modified_at,
        |  is_active, old_hash FROM ex
        |  WHERE is_active AND c_custkey NOT IN (SELECT c_custkey FROM chg)),
        |expired AS (SELECT e.c_custkey, e.c_name, e.c_mktsegment, e.customer_sk, e.created_at,
        |  TIMESTAMP '2024-06-01 00:00:00' AS modified_at, FALSE AS is_active, e.old_hash
        |  FROM ex e JOIN (SELECT DISTINCT c_custkey FROM chg) c ON e.c_custkey = c.c_custkey),
        |stamped AS (SELECT c_custkey, c_name, c_mktsegment,
        |  sha256(concat_ws('|', c_custkey)) AS customer_sk,
        |  TIMESTAMP '2024-06-01 00:00:00' AS created_at, TIMESTAMP '2024-06-01 00:00:00' AS modified_at,
        |  TRUE AS is_active, hash AS old_hash FROM chg)
        |SELECT c_custkey, c_name, c_mktsegment, customer_sk,
        | strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
        | strftime(modified_at, '%Y-%m-%d %H:%M:%S') AS modified_at, is_active, old_hash
        |FROM (SELECT * FROM unchanged UNION ALL SELECT * FROM expired UNION ALL SELECT * FROM stamped)
        |ORDER BY c_custkey, is_active""".stripMargin,
    "q19_conditional_agg" ->
      """SELECT c_mktsegment,
        | sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
        | sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
        | sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q21_doc_fingerprint" ->
      s"""SELECT doc_id, md5(norm) AS fingerprint,
         | list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(norm) + 1),
         |   i -> ascii(substr(norm, i::INT, 1))::BIGINT)),
         |   (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash
         |FROM (SELECT doc_id, $normSql AS norm FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "q22_exact_dedup" ->
      s"""SELECT doc_id, md5($normSql) AS fingerprint FROM documents
         |QUALIFY row_number() OVER (PARTITION BY md5($normSql) ORDER BY doc_id) = 1
         |ORDER BY doc_id""".stripMargin,
    "q23_token_stats" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT AS n_tokens,
        | len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\s\p{L}0-9]'))::BIGINT AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q24_quality_score" ->
      """SELECT doc_id,
        | (CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE len(regexp_extract_all(text, '[\p{L}]'))::DOUBLE / length(text) END) * 0.5
        | + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE / length(text) END) * 0.2
        | + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE len(regexp_extract_all(text, '[0-9]'))::DOUBLE / length(text) END) * 0.2
        | + least((CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::DOUBLE / 100.0, 1.0) * 0.1
        | AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q25_lang_id" ->
      s"""SELECT doc_id, lang, $langCase AS pred_lang,
         | (lang = ($langCase))::INT AS correct
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q26_ngram_jaccard" ->
      s"""WITH $docShinglesCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jaccardSql AS jaccard
         |FROM docsh a JOIN docsh b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE $jaccardSql >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    "q27_minhash_sig" ->
      s"""WITH $docShinglesCte
         |SELECT doc_id, md5(array_to_string(list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')),
         |  ',')) AS sig_digest
         |FROM docsh ORDER BY doc_id""".stripMargin,
    "q28_minhash_neardup" ->
      s"""WITH $docShinglesCte,
         |sig AS (SELECT doc_id, sh, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM docsh),
         |bands AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, $jaccardSql AS jaccard
         |FROM cand JOIN docsh a ON a.doc_id = id_a JOIN docsh b ON b.doc_id = id_b
         |WHERE $jaccardSql >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    "q29_simhash" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim($normSql), '\\s+') AS w FROM documents)
         |SELECT doc_id, list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 60), b ->
         |  CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform(w, t ->
         |    (2 * (floor((instr('0123456789abcdef', substr(md5(t), (b // 4)::INT + 1, 1)) - 1)
         |       / ([8, 4, 2, 1])[(b % 4) + 1])::BIGINT % 2) - 1)::BIGINT)),
         |    (acc, x) -> acc + x) > 0 THEN 1::BIGINT ELSE 0::BIGINT END)),
         |  (acc, bit) -> acc * 2 + bit) AS simhash
         |FROM toks ORDER BY doc_id""".stripMargin,
    "q30_embed_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT query_id, vec_id AS corpus_id, ${cosineSql("qv", "embedding")} AS cosine
         |  FROM embeddings CROSS JOIN q WHERE query_id <> vec_id)
         |SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
         |  FROM scored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "q31_embed_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | ${cosineSql("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,
    "q32_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |lagged AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |flagged AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS nf
        |  FROM lagged),
        |sess AS (SELECT *, (sum(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id FROM flagged)
        |SELECT user_id, session_id, min(us) AS session_start_us, max(us) AS session_end_us,
        | count(*) AS n_events
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "q33_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'application/octet-stream' AS mime,
        | octet_length(encode(text))::BIGINT AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,
    "q34_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, event_id AS click_id, value AS click_value
        |  FROM events WHERE event_type = 'click'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS us,
        |  c.click_id AS click_id_asof, c.click_value AS click_value_asof
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q35_percentile" ->
      """SELECT p_brand, round(quantile_cont(p_retailprice, 0.5), 4) AS median_price,
        | round(quantile_cont(p_retailprice, 0.9), 4) AS p90_price, count(*) AS n
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_count_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT o_orderpriority) AS n_priorities,
        | count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_top_tokens" ->
      s"""SELECT token, count(*) AS n FROM (
         |  SELECT unnest(regexp_split_to_array(trim($normSql), '\\s+')) AS token FROM documents)
         |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "q38_ivf_topk" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |cells AS (SELECT vec_id, embedding, centroid_id AS cell FROM (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosineSql("e.embedding", "c.cv")} DESC, c.centroid_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |probes AS (SELECT query_id, q_vec, centroid_id AS cell FROM (
         |  SELECT q.vec_id AS query_id, q.embedding AS q_vec, c.centroid_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosineSql("q.embedding", "c.cv")} DESC, c.centroid_id ASC) AS rn
         |  FROM embeddings q CROSS JOIN cent c
         |  WHERE q.vec_id >= 10 AND q.vec_id < 15) WHERE rn <= 2),
         |scored AS (SELECT p.query_id, s.vec_id AS corpus_id,
         |    ${cosineSql("p.q_vec", "s.embedding")} AS cosine
         |  FROM cells s JOIN probes p ON s.cell = p.cell WHERE p.query_id <> s.vec_id)
         |SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id ASC) AS rank FROM scored)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q39_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q40_edit_distance" ->
      """SELECT p_partkey, levenshtein(split_part(p_name, ' ', 1), split_part(p_name, ' ', 2)) AS edit_dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q41_dropna" ->
      """SELECT c_custkey, seg, bal FROM (
        |  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg,
        |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer)
        |WHERE seg IS NOT NULL AND bal IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,
    "q42_rlike_filter" ->
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, 'spark\s+\w+\s+join')
        |ORDER BY doc_id""".stripMargin,
    "q43_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders,
        | round(sum(coalesce(o_totalprice, 0.0)), 2) AS big_total
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q44_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS byte_len
        |  FROM documents)
        |SELECT media_id, frame_idx, byte_len, (frame_idx * 64) % 256 AS sample_val FROM (
        |  SELECT media_id, unnest(range(greatest(byte_len // 64, 1)))::BIGINT AS frame_idx, byte_len
        |  FROM m)
        |ORDER BY media_id, frame_idx""".stripMargin,
    // q45: sketch values are approximate by nature, so the query emits
    // exact aggregates + in-tolerance booleans; the oracle recomputes the
    // exacts and expects every boolean true.
    "q45_approx_sketches" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
        | true AS orders_ok, true AS p50_ok, true AS p99_ok, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q46_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start, event_type,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_lsh_buckets" ->
      """SELECT vec_id, list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), p ->
        |  CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, len(embedding)),
        |    d -> embedding[d::INT + 1]::DOUBLE *
        |      (CASE WHEN instr('0123456789abcdef',
        |         substr(md5('42:' || p::VARCHAR || ':' || d::VARCHAR), 1, 1)) % 2 = 1
        |       THEN 1.0 ELSE -1.0 END))),
        |    (acc, x) -> acc + x) > 0 THEN 1::BIGINT ELSE 0::BIGINT END)),
        |  (acc, b) -> acc * 2 + b) AS bucket
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q48_csv_roundtrip" ->
      """SELECT n_nationkey, n_name,
        | CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_regionkey END AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q49_corpus_filter" ->
      s"""WITH lang_pred AS (SELECT doc_id, lang, text, $langCase AS pred_lang FROM documents),
         |q AS (SELECT doc_id, lang, pred_lang,
         |  $qualitySql
         |  AS quality, md5($normSql) AS fingerprint
         |  FROM lang_pred),
         |survivors AS (SELECT doc_id FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5($normSql) ORDER BY doc_id) = 1)
         |SELECT doc_id, lang, quality, fingerprint FROM q
         |WHERE pred_lang = lang AND quality >= 0.55 AND doc_id IN (SELECT doc_id FROM survivors)
         |ORDER BY doc_id""".stripMargin,
    "q51_salted_join" ->
      """SELECT s_name, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52_pivot" ->
      """SELECT c_mktsegment,
        | sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS "F",
        | sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS "O",
        | sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS "P"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q53_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        |    FROM lineitem WHERE l_quantity >= 48
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |    FROM lineitem WHERE l_quantity >= 48
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |    FROM lineitem WHERE l_quantity >= 48)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q54_set_ops" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY custkey""".stripMargin,
    "q55_rank_funcs" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | ntile(4)       OVER w AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | dense_rank()   OVER w AS drank,
        | lag(c_acctbal, 1) OVER w AS prev_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin,
    "q56_json_roundtrip" ->
      """SELECT r_name, count(*) AS n_nations,
        | string_agg(n_name, ',' ORDER BY n_name) AS nation_list
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q57_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        | epoch_ns(c.ts)//1000 - epoch_ns(v.ts)//1000 AS lag_us
        |FROM events v JOIN events c ON v.user_id = c.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |  AND epoch_ns(c.ts)//1000 >= epoch_ns(v.ts)//1000
        |  AND epoch_ns(c.ts)//1000 <= epoch_ns(v.ts)//1000 + 7200000000
        |ORDER BY v.user_id, view_id, click_id""".stripMargin,
    "q58_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000000 AS ms FROM events),
        |x AS (SELECT user_id, ms,
        |  CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |sess AS (SELECT user_id, ms,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x),
        |agg AS (SELECT user_id, session_id, min(ms) AS start_ms, max(ms) AS end_ms,
        |  count(*) AS n_events FROM sess GROUP BY 1, 2)
        |SELECT user_id, start_ms, end_ms, n_events FROM agg
        |WHERE session_id < (SELECT max(session_id) FROM agg a2 WHERE a2.user_id = agg.user_id)
        |ORDER BY user_id, start_ms""".stripMargin,
    "q59_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+?[0-9][0-9()\\- ]{5,}[0-9]"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      s"""WITH p AS (SELECT doc_id,
         |  text || ' contact u' || doc_id::VARCHAR || '@example.com or +1-555-01' ||
         |  lpad((doc_id % 100)::VARCHAR, 2, '0') ||
         |  ' from 10.0.' || (doc_id % 256)::VARCHAR || '.1' AS pii_text
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(pii_text, '$email')) AS n_emails,
         |  len(regexp_extract_all(pii_text, '$phone')) AS n_phones,
         |  len(regexp_extract_all(pii_text, '$ip')) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$phone', '<PHONE>', 'g'))
         |    AS redacted_digest
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "q60_hash_split" ->
      """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        | count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
        |FROM (SELECT c_acctbal,
        |  ('0x' || substr(md5(c_custkey::VARCHAR), 1, 4))::BIGINT % 100 AS b FROM customer)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q61_quantize_int8" ->
      """SELECT vec_id,
        | list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale,
        | CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 = 0.0
        |   THEN array_to_string(list_transform(embedding, x -> '0'), ',')
        |   ELSE array_to_string(list_transform(embedding, x ->
        |     floor(x::DOUBLE / (list_max(list_transform(embedding, y -> abs(y::DOUBLE))) / 127.0)
        |       + 0.5)::BIGINT::VARCHAR), ',')
        | END AS qvec
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q62_orc_roundtrip" ->
      """SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q63_stratified_sample" ->
      """SELECT c_mktsegment, count(*) AS n_sampled, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 4))::BIGINT % 100 < 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q64_rolling_window" ->
      """SELECT user_id, event_id, epoch_ns(ts)//1000 AS us,
        | count(*) OVER w AS n_1h,
        | round(sum(value) OVER w, 2) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, us, event_id""".stripMargin,
    "q66_json_props" ->
      """SELECT event_type, (json_extract(props, '$.k')::INT // 10)::INT AS k_decile,
        | count(*) AS n, round(sum(value), 2) AS sum_value,
        | min(json_extract(props, '$.k')::INT) AS min_k,
        | max(json_extract(props, '$.k')::INT) AS max_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q67_bloom_join" ->
      """SELECT s_name, count(*) AS n_items, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q68_kmeans_ivf" ->
      s"""WITH $embKmeansSrc,
         |${kmeansReplayCte("k", "v", "4", iters = 2, dim = 64)}
         |SELECT id AS vec_id, cell FROM ka ORDER BY vec_id""".stripMargin,
    // q87: replayed k-means cells (k scaled with the corpus — the SemDeDup
    // configuration that actually holds at scale), then within-cell cosine:
    // the oracle mirrors the pruning itself, not just the scores.
    "q87_semantic_neardup" ->
      s"""WITH $embKmeansSrc,
         |${kmeansReplayCte("k", "v",
            "SELECT CAST(ceil(sqrt(count(*))) AS INT) FROM embeddings", iters = 2, dim = 64)}
         |SELECT id_a, id_b, cell, cosine FROM (
         |  SELECT a.id AS id_a, b.id AS id_b, a.cell AS cell,
         |    ${cosineSql("a.vec", "b.vec")} AS cosine
         |  FROM ka a JOIN ka b ON a.cell = b.cell AND a.id < b.id)
         |WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    // q131: q69's transitive closure grouped by label — survivor = the
    // min-id member (exactly what the min-label IS), size = members.
    "q131_dedup_survivors" ->
      s"""WITH RECURSIVE $docShinglesCte,
         |sig AS (SELECT doc_id, sh, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM docsh),
         |bands AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |pairs AS (SELECT id_a, id_b
         |  FROM cand JOIN docsh a ON a.doc_id = id_a JOIN docsh b ON b.doc_id = id_b
         |  WHERE $jaccardSql >= 0.3),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS lab FROM documents
         |  UNION
         |  SELECT e.b AS id, reach.lab FROM reach JOIN e ON e.a = reach.id),
         |lab AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY 1)
         |SELECT cluster_id AS doc_id, count(*)::BIGINT AS cluster_size
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,
    // q143: fused bucket-survivor dedup — min-id per LSH bucket is the
    // only pairing partner (linear pair count), exact-Jaccard-verified,
    // losers dropped. One-hop semantics: no recursion anywhere.
    "q143_bucket_survivors" ->
      s"""WITH $docShinglesCte,
         |sig AS (SELECT doc_id, sh, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM docsh),
         |bands AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk FROM sig),
         |bmin AS (SELECT bk, min(doc_id) AS min_id FROM bands GROUP BY 1),
         |cand AS (SELECT DISTINCT m.min_id AS id_a, d.doc_id AS id_b
         |  FROM bands d JOIN bmin m ON m.bk = d.bk AND d.doc_id > m.min_id),
         |removed AS (SELECT DISTINCT id_b FROM cand
         |  JOIN docsh a ON a.doc_id = id_a JOIN docsh b ON b.doc_id = id_b
         |  WHERE $jaccardSql >= 0.3)
         |SELECT doc_id, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id_b FROM removed)
         |ORDER BY doc_id""".stripMargin,
    "q135_nb_langid" ->
      s"""WITH $nbLangCte
         |SELECT doc_id, pred_lang, round(sc, 2) AS score FROM nbest
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // q141: FEATURE-HASHED NB training replayed end-to-end — identical
    // CTE chain with grams mapped through the md5-bucket hash, so the
    // bucketed counts, vocab (distinct occupied buckets), smoothing and
    // every argmax replay in SQL exactly like q135.
    "q141_nb_hashed" ->
      s"""WITH $nbHashedCte
         |SELECT doc_id, pred_lang, round(sc, 2) AS score FROM nbest
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // q136: the trained classifier composed into the curation shape —
    // NB-predicted language must agree with the label, quality >= 0.55,
    // deterministic hash split (q60's bucket rule).
    "q136_nb_curation" ->
      s"""WITH $nbLangCte,
         |npred AS (SELECT doc_id, pred_lang, round(sc, 2) AS score FROM nbest WHERE rn = 1),
         |nq AS (SELECT doc_id, lang,
         |  (CASE WHEN length(text) = 0 THEN 0.0
         |     ELSE len(regexp_extract_all(text, '[\\p{L}]'))::DOUBLE / length(text) END) * 0.5
         |  + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
         |     ELSE len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE / length(text) END) * 0.2
         |  + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
         |     ELSE len(regexp_extract_all(text, '[0-9]'))::DOUBLE / length(text) END) * 0.2
         |  + least((CASE WHEN length(trim(text)) = 0 THEN 0
         |     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::DOUBLE / 100.0, 1.0) * 0.1
         |  AS quality,
         |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS b
         |  FROM documents)
         |SELECT q.doc_id, q.lang, p.pred_lang, p.score, q.quality,
         |  CASE WHEN q.b < 80 THEN 'train' WHEN q.b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM nq q JOIN npred p ON p.doc_id = q.doc_id
         |WHERE p.pred_lang = q.lang AND q.quality >= 0.55
         |ORDER BY q.doc_id""".stripMargin,
    // q138: weak-supervision quality classifier — CCNet-style
    // distillation: the HEURISTIC quality score labels the top/bottom
    // quartiles, the NB machinery trains on those labels, and every doc
    // is re-scored by the MODEL. Oracle replays quartile labeling,
    // training, and scoring.
    "q138_quality_classifier" -> {
      val qualitySql =
        """(CASE WHEN length(text) = 0 THEN 0.0
          |    ELSE len(regexp_extract_all(text, '[\p{L}]'))::DOUBLE / length(text) END) * 0.5
          | + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
          |    ELSE len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE / length(text) END) * 0.2
          | + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
          |    ELSE len(regexp_extract_all(text, '[0-9]'))::DOUBLE / length(text) END) * 0.2
          | + least((CASE WHEN length(trim(text)) = 0 THEN 0
          |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::DOUBLE / 100.0, 1.0) * 0.1""".stripMargin
      val trainSrc =
        s"""SELECT doc_id, CASE WHEN qt = 4 THEN 'hi' ELSE 'lo' END AS lang, t FROM
           | (SELECT doc_id, ntile(4) OVER (ORDER BY quality, doc_id) AS qt, t FROM
           |   (SELECT doc_id, $qualitySql AS quality, $nbNormDoc AS t FROM documents))
           | WHERE qt IN (1, 4)""".stripMargin
      s"""WITH ${nbCte(trainSrc, s"SELECT doc_id, $nbNormDoc AS t FROM documents")}
         |SELECT doc_id, pred_lang AS pred_quality, round(sc, 2) AS score
         |FROM nbest WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },
    // q142: PCM payloads synthesized sample-by-sample from (doc_id,
    // byte-length-of-text); the engine decodes them through the JDK audio
    // pipeline and the oracle re-derives every integer statistic from the
    // rule — decode must invert encode exactly.
    "q142_wav_pcm" ->
      """WITH smp AS (SELECT doc_id,
        |   (8000 + (doc_id % 8) * 1000)::INT AS sample_rate,
        |   list_transform(range(0, (1 + strlen(text) % 300)::INT),
        |     j -> ((doc_id * 131 + j * 17) % 4001 - 2000)::INT) AS ss
        | FROM documents)
        |SELECT doc_id, sample_rate,
        | len(ss)::BIGINT AS n_samples,
        | list_aggregate(ss, 'sum')::BIGINT AS sum_samples,
        | list_aggregate(list_transform(ss, x -> abs(x)), 'max')::INT AS peak,
        | ss[1]::INT AS first_sample,
        | ss[len(ss)]::INT AS last_sample
        |FROM smp ORDER BY doc_id""".stripMargin,
    // q137: WAV/AVI payloads are SYNTHESIZED from (doc_id, text) by a
    // fixed rule and parsed back from raw bytes engine-side; the oracle
    // recomputes every field from the rule — parse must invert encode.
    "q137_multimodal_av" ->
      """SELECT doc_id,
        | (8000 + (doc_id % 8) * 1000)::INT AS sample_rate,
        | (1 + (doc_id % 2))::INT AS channels,
        | (strlen(text) // (2 * (1 + (doc_id % 2))))::BIGINT AS n_samples,
        | ((strlen(text) // (2 * (1 + (doc_id % 2)))) * 1000
        |   // (8000 + (doc_id % 8) * 1000))::BIGINT AS duration_ms,
        | (320 + (doc_id % 4) * 80)::INT AS width,
        | (240 + (doc_id % 3) * 80)::INT AS height,
        | (1 + (strlen(text) % 240))::INT AS n_frames,
        | ((1 + (strlen(text) % 240)) * 40)::BIGINT AS video_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q69_dedup_clusters" ->
      s"""WITH RECURSIVE $docShinglesCte,
         |sig AS (SELECT doc_id, sh, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM docsh),
         |bands AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |pairs AS (SELECT id_a, id_b
         |  FROM cand JOIN docsh a ON a.doc_id = id_a JOIN docsh b ON b.doc_id = id_b
         |  WHERE $jaccardSql >= 0.3),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS lab FROM documents
         |  UNION
         |  SELECT e.b AS id, reach.lab FROM reach JOIN e ON e.a = reach.id)
         |SELECT id AS doc_id, min(lab) AS cluster_id FROM reach
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q70_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |                  date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds)
        |SELECT strftime(spine.h, '%Y-%m-%d %H:%M') AS hour_start,
        |  coalesce(hourly.n_events, 0) AS n_events
        |FROM spine LEFT JOIN hourly ON spine.h = hourly.h
        |ORDER BY hour_start""".stripMargin,
    "q71_curation_pipeline" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+?[0-9][0-9()\\- ]{5,}[0-9]"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      val redact = s"""regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$phone', '<PHONE>', 'g')""".stripMargin
      s"""WITH RECURSIVE $docShinglesCte,
         |sig AS (SELECT doc_id, sh, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM docsh),
         |bands AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |pairs AS (SELECT id_a, id_b
         |  FROM cand JOIN docsh a ON a.doc_id = id_a JOIN docsh b ON b.doc_id = id_b
         |  WHERE $jaccardSql >= 0.3),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS lab FROM documents
         |  UNION
         |  SELECT e.b AS id, reach.lab FROM reach JOIN e ON e.a = reach.id),
         |clu AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1),
         |survivors AS (SELECT doc_id FROM clu WHERE doc_id = cluster_id),
         |lang_pred AS (SELECT doc_id, lang, text, $langCase AS pred_lang FROM documents),
         |q AS (SELECT doc_id, lang, pred_lang,
         |  $qualitySql
         |  AS quality, md5($redact) AS redacted_digest,
         |  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < 80 THEN 'train'
         |       WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM lang_pred)
         |SELECT doc_id, lang, quality, redacted_digest, split
         |FROM q JOIN survivors USING (doc_id)
         |WHERE pred_lang = lang AND quality >= 0.55
         |ORDER BY doc_id""".stripMargin
    },
    "q73_asof_forward" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, event_id AS click_id, value AS click_value
        |  FROM events WHERE event_type = 'click'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS us,
        |  c.click_id AS click_id_asof, c.click_value AS click_value_asof
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts >= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q74_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q75_source_mixing" ->
      """SELECT lang, count(*) AS n_kept FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 <
        |  CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50 WHEN 'es' THEN 50
        |            WHEN 'fr' THEN 25 WHEN 'zh' THEN 25 ELSE -1 END
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_source_overlap" ->
      s"""WITH $docShinglesCte,
         |sig AS (SELECT doc_id, source, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM docsh),
         |el AS (SELECT source, t.i - 1 AS pos, mh[t.i] AS v
         |       FROM sig, range(1, 17) t(i)),
         |sk AS (SELECT source, pos, min(v) AS v FROM el GROUP BY 1, 2),
         |sketch AS (SELECT source, list(v ORDER BY pos) AS sketch FROM sk GROUP BY 1)
         |SELECT a.source AS grp_a, b.source AS grp_b,
         |  len(list_filter(range(1, 17), i -> a.sketch[i] = b.sketch[i]))::DOUBLE / 16.0
         |    AS est_jaccard
         |FROM sketch a JOIN sketch b ON a.source < b.source
         |ORDER BY grp_a, grp_b""".stripMargin,
    "q77_json_quarantine" ->
      """SELECT CASE WHEN n_nationkey % 5 = 0 THEN 'corrupt' ELSE 'ok' END AS kind,
        | CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS n_regionkey,
        | count(*) AS n
        |FROM nation GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q78_schema_evolution" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CASE WHEN n_regionkey >= 2 THEN length(n_name) END AS name_len
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q79_corr_subquery" ->
      """SELECT l_partkey, count(*) AS n_small,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "q80_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, grouping(o_orderpriority) AS gid,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
        |ORDER BY o_orderstatus, gid, o_orderpriority""".stripMargin,
    // q84: raw-ratio idf (tf·N/df) — exact int inputs, one double division,
    // so no rounding needed on either side.
    "q84_tfidf_topterms" ->
      s"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array($normSql, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
         |  WHERE len(term) > 0 GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
         |SELECT doc_id, term, tf, df, (tf * n_docs)::DOUBLE / df::DOUBLE AS score
         |FROM tf JOIN dfreq USING (term), n
         |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 3
         |ORDER BY doc_id, term""".stripMargin,
    "q85_repetition_filter" ->
      s"""SELECT doc_id, greatest(len(w) - 2, 0) AS total_ngrams,
         | len($shinglesSql) AS distinct_ngrams,
         | CASE WHEN greatest(len(w) - 2, 0) = 0 THEN 0.0
         |   ELSE 1.0 - len($shinglesSql)::DOUBLE / greatest(len(w) - 2, 0)::DOUBLE END AS rep_frac,
         | CASE WHEN greatest(len(w) - 2, 0) = 0 THEN false
         |   ELSE (1.0 - len($shinglesSql)::DOUBLE / greatest(len(w) - 2, 0)::DOUBLE) > 0.2 END AS repetitive
         |FROM (SELECT doc_id, regexp_split_to_array($normSql, ' ') AS w FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "q86_decontamination" ->
      s"""WITH $docShinglesCte,
         |bench AS (SELECT DISTINCT unnest(sh) AS s FROM docsh WHERE doc_id % 50 = 0),
         |ex AS (SELECT doc_id, unnest(sh) AS s FROM docsh WHERE doc_id % 50 <> 0)
         |SELECT ex.doc_id, count(*)::BIGINT AS n_shared
         |FROM ex JOIN bench USING (s)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q88: q18's scenario under IDIOMATIC semantics (created_at carried
    // from the prior active version for changed keys; otherwise identical
    // on a history-free seed), through the partitioned disk-backed merge.
    "q88_scd2_partitioned" ->
      """WITH base AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
        |ex AS (SELECT c_custkey, c_name, c_mktsegment,
        |  sha256(concat_ws('|', c_name, c_mktsegment)) AS old_hash,
        |  sha256(concat_ws('|', c_custkey)) AS customer_sk,
        |  TIMESTAMP '2024-01-01 00:00:00' AS created_at,
        |  TIMESTAMP '2024-01-01 00:00:00' AS modified_at, TRUE AS is_active FROM base),
        |nw AS (SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || '_V2' ELSE c_mktsegment END AS c_mktsegment
        |  FROM base
        | UNION ALL
        | SELECT c_custkey + 1000000, 'NEW ' || c_name, c_mktsegment FROM base WHERE c_custkey % 101 = 0),
        |nh AS (SELECT *, sha256(concat_ws('|', c_name, c_mktsegment)) AS hash FROM nw),
        |chg AS (SELECT n.* FROM nh n LEFT JOIN ex o ON n.c_custkey = o.c_custkey AND o.is_active
        |  WHERE n.hash <> o.old_hash OR o.old_hash IS NULL),
        |unchanged AS (SELECT c_custkey, c_name, c_mktsegment, customer_sk, created_at, modified_at,
        |  is_active, old_hash FROM ex
        |  WHERE is_active AND c_custkey NOT IN (SELECT c_custkey FROM chg)),
        |expired AS (SELECT e.c_custkey, e.c_name, e.c_mktsegment, e.customer_sk, e.created_at,
        |  TIMESTAMP '2024-06-01 00:00:00' AS modified_at, FALSE AS is_active, e.old_hash
        |  FROM ex e JOIN (SELECT DISTINCT c_custkey FROM chg) c ON e.c_custkey = c.c_custkey),
        |stamped AS (SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  sha256(concat_ws('|', c.c_custkey)) AS customer_sk,
        |  coalesce(e.created_at, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
        |  TIMESTAMP '2024-06-01 00:00:00' AS modified_at,
        |  TRUE AS is_active, c.hash AS old_hash
        |  FROM chg c LEFT JOIN ex e ON e.c_custkey = c.c_custkey AND e.is_active)
        |SELECT c_custkey, c_name, c_mktsegment, customer_sk,
        | strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
        | strftime(modified_at, '%Y-%m-%d %H:%M:%S') AS modified_at, is_active, old_hash
        |FROM (SELECT * FROM unchanged UNION ALL SELECT * FROM expired UNION ALL SELECT * FROM stamped)
        |ORDER BY c_custkey, is_active""".stripMargin,
    "q89_table_profile" -> {
      val cols = Seq("o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate")
      val aggs = cols.zipWithIndex.map { case (c, i) =>
        s"""count($c)::BIGINT AS nn$i, count(DISTINCT $c)::BIGINT AS nd$i,
           | min(TRY_CAST($c::VARCHAR AS DOUBLE)) AS mn$i,
           | max(TRY_CAST($c::VARCHAR AS DOUBLE)) AS mx$i""".stripMargin
      }.mkString(",\n")
      val rows = cols.zipWithIndex.map { case (c, i) =>
        s"""SELECT '$c' AS col_name, n AS n_rows, n - nn$i AS n_null,
           | nd$i AS n_distinct, mn$i AS min_num, mx$i AS max_num FROM s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT count(*)::BIGINT AS n,
         |$aggs
         |FROM orders)
         |$rows
         |ORDER BY col_name""".stripMargin
    },
    // q90: the oracle replays ProductQuant end to end — float-cast unit
    // normalization, all four per-subspace codebook trainings (one
    // grp-keyed replay chain), and the argmin encoding (= the replay's
    // final assignment).
    "q90_pq_codes" ->
      s"""WITH $pqNormCte,
         |${kmeansReplayCte("p", "sl", "8", iters = 2, dim = 16)}
         |SELECT id AS vec_id, string_agg(cell::VARCHAR, ',' ORDER BY grp) AS codes
         |FROM pa GROUP BY id ORDER BY vec_id""".stripMargin,
    // q91: coarse router replay (k=4 on the normalized vectors) + the q90
    // PQ replay + the query-side math — double-precision routing distances,
    // float-cast ADC query slices, the m×k LUT, the (approx_dist, id)
    // shortlist and the exact cosine re-rank — all in SQL.
    "q91_ivfpq_topk" ->
      s"""WITH $pqNormCte,
         |cs AS (SELECT 0 AS grp, id, nvec AS vec FROM nv),
         |${kmeansReplayCte("c", "cs", "4", iters = 2, dim = 64)},
         |${kmeansReplayCte("p", "sl", "8", iters = 2, dim = 16)},
         |q AS (SELECT embedding AS qe, sqrt(${dotSql("embedding", "embedding")}) AS qnorm
         |  FROM embeddings WHERE vec_id = 10),
         |qn AS (SELECT qe, qnorm,
         |  CASE WHEN qnorm = 0.0 THEN list_transform(qe, x -> x::DOUBLE)
         |    ELSE list_transform(qe, x -> x::DOUBLE / qnorm) END AS qnd,
         |  CASE WHEN qnorm = 0.0 THEN qe
         |    ELSE list_transform(qe, x -> (x::DOUBLE / qnorm)::REAL) END AS qfv
         |  FROM q),
         |probe AS (SELECT cid AS cell FROM (
         |  SELECT c.cid, row_number() OVER (ORDER BY
         |    list_reduce(list_transform(range(1, 65),
         |      i -> (q.qnd[i] - c.cent[i]) * (q.qnd[i] - c.cent[i])), (x, y) -> x + y),
         |    c.cid) AS rn
         |  FROM ccb c, qn q) WHERE rn <= 2),
         |routed AS (SELECT a.id FROM ca a JOIN probe p ON a.cell = p.cell),
         |lut AS (SELECT c.grp, c.cid,
         |  list_reduce(list_transform(range(1, 17),
         |    i -> (q.qfv[c.grp * 16 + i]::DOUBLE - c.cent[i]) *
         |         (q.qfv[c.grp * 16 + i]::DOUBLE - c.cent[i])), (x, y) -> x + y) AS pd
         |  FROM pcb c, qn q),
         |adc AS (SELECT pa.id,
         |  list_reduce(list(lut.pd ORDER BY pa.grp), (x, y) -> x + y) AS approx_dist
         |  FROM pa JOIN routed r ON pa.id = r.id
         |  JOIN lut ON lut.grp = pa.grp AND lut.cid = pa.cell
         |  GROUP BY pa.id),
         |short AS (SELECT id, approx_dist FROM adc ORDER BY approx_dist, id LIMIT 40),
         |rer AS (SELECT s.id, s.approx_dist,
         |  CASE WHEN sqrt(${dotSql("e.embedding", "e.embedding")}) = 0.0 OR q.qnorm = 0.0 THEN 0.0
         |    ELSE ${dotSql("e.embedding", "q.qe")} /
         |      (sqrt(${dotSql("e.embedding", "e.embedding")}) * q.qnorm) END AS cosine
         |  FROM short s JOIN embeddings e ON e.vec_id = s.id, qn q)
         |SELECT id AS vec_id, approx_dist, cosine FROM (
         |  SELECT * FROM rer ORDER BY cosine DESC, id LIMIT 10)
         |ORDER BY cosine DESC, vec_id""".stripMargin,
    // q93: chunk i covers tokens [i·48, i·48+64); ⌊(n−1)/48⌋+1 chunks.
    "q93_doc_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        |  FROM documents),
        |i AS (SELECT doc_id, w,
        |  unnest(range(CASE WHEN len(w) = 0 THEN 0 ELSE (len(w) - 1) // 48 + 1 END)) AS chunk_idx
        |  FROM t),
        |c AS (SELECT doc_id, chunk_idx, list_slice(w, chunk_idx * 48 + 1, chunk_idx * 48 + 64) AS ct
        |  FROM i)
        |SELECT doc_id, chunk_idx::INT AS chunk_idx, len(ct)::INT AS n_tokens,
        | array_to_string(ct, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // q94: the greedy fill is a non-associative recurrence — replayed with
    // a recursive CTE stepping through each group's id-ordered rows.
    "q94_seq_packing" ->
      s"""WITH RECURSIVE $packReplayCte
         |SELECT grp::INT AS grp, doc_id, n_tokens::INT AS n_tokens, pack_id,
         | pack_pos::INT AS pack_pos
         |FROM p ORDER BY doc_id""".stripMargin,
    // q95: add-one-smoothed unigram model trained on the corpus itself;
    // avg ln-prob rounded to 2 dp (shuffled-aggregate float policy).
    "q95_unigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array($normSql, ' ')) AS term
         |  FROM documents),
         |tok2 AS (SELECT doc_id, term FROM toks WHERE len(term) > 0),
         |counts AS (SELECT term, count(*)::BIGINT AS cnt FROM tok2 GROUP BY 1),
         |tot AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS vocab FROM counts)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         | round(avg(ln((cnt + 1)::DOUBLE / (total + vocab)::DOUBLE)), 2) AS avg_logprob
         |FROM tok2 JOIN counts USING (term), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q96: winnowing — 5-gram 32-bit hashes, window-of-4 minimum with the
    // rightmost tie rule, distinct (pos, fp) selections per document.
    "q96_winnow_fingerprints" ->
      s"""WITH $winnowSelCte
         |SELECT DISTINCT doc_id, s.pos::INT AS pos, s.fp AS fp FROM wsel
         |ORDER BY doc_id, pos, fp""".stripMargin,
    // q97: Morton interleave of the low 16 bits of (customer, order-day).
    "q97_zorder_value" -> {
      val terms = (0 until 16).flatMap(b => Seq(
        s"(((x >> $b) & 1) << ${2 * b})",
        s"(((y >> $b) & 1) << ${2 * b + 1})"))
      s"""WITH xy AS (SELECT o_orderkey, o_custkey % 65536 AS x,
         |  datediff('day', DATE '1992-01-01', o_orderdate::DATE) % 65536 AS y FROM orders)
         |SELECT o_orderkey, ${terms.mkString(" | ")} AS zval
         |FROM xy ORDER BY o_orderkey""".stripMargin
    },
    // q98: full residual-IVF-PQ replay — coarse routing (c*), per-row
    // residuals, four residual codebooks (r*), per-probed-cell LUTs, ADC
    // shortlist and exact re-rank. Same replay machinery as q90/q91, plus
    // the residual CTEs.
    "q98_ivfpq_residual" ->
      s"""WITH $pqNormCte,
         |cs AS (SELECT 0 AS grp, id, nvec AS vec FROM nv),
         |${kmeansReplayCte("c", "cs", "4", iters = 2, dim = 64)},
         |rv AS (SELECT a.id, a.cell,
         |  list_transform(range(1, 65), i -> a.vec[i]::DOUBLE - c.cent[i]) AS rvec
         |  FROM ca a JOIN ccb c ON c.grp = a.grp AND c.cid = a.cell),
         |rsl AS (SELECT t.j AS grp, id, list_slice(rvec, t.j * 16 + 1, t.j * 16 + 16) AS vec
         |  FROM rv, range(0, 4) t(j)),
         |${kmeansReplayCte("r", "rsl", "8", iters = 2, dim = 16)},
         |q AS (SELECT embedding AS qe, sqrt(${dotSql("embedding", "embedding")}) AS qnorm
         |  FROM embeddings WHERE vec_id = 11),
         |qn AS (SELECT qe, qnorm,
         |  CASE WHEN qnorm = 0.0 THEN list_transform(qe, x -> x::DOUBLE)
         |    ELSE list_transform(qe, x -> x::DOUBLE / qnorm) END AS qnd
         |  FROM q),
         |probe AS (SELECT cid AS cell FROM (
         |  SELECT c.cid, row_number() OVER (ORDER BY
         |    list_reduce(list_transform(range(1, 65),
         |      i -> (q.qnd[i] - c.cent[i]) * (q.qnd[i] - c.cent[i])), (x, y) -> x + y),
         |    c.cid) AS rn
         |  FROM ccb c, qn q) WHERE rn <= 2),
         |qres AS (SELECT p.cell,
         |  list_transform(range(1, 65), i -> q.qnd[i] - c.cent[i]) AS rq
         |  FROM probe p JOIN ccb c ON c.grp = 0 AND c.cid = p.cell, qn q),
         |lut AS (SELECT r.cell, b.grp, b.cid,
         |  list_reduce(list_transform(range(1, 17),
         |    i -> (r.rq[b.grp * 16 + i] - b.cent[i]) * (r.rq[b.grp * 16 + i] - b.cent[i])),
         |    (x, y) -> x + y) AS pd
         |  FROM qres r, rcb b),
         |adc AS (SELECT rv.id,
         |  list_reduce(list(lut.pd ORDER BY ra.grp), (x, y) -> x + y) AS approx_dist
         |  FROM ra JOIN rv ON rv.id = ra.id
         |  JOIN lut ON lut.cell = rv.cell AND lut.grp = ra.grp AND lut.cid = ra.cell
         |  GROUP BY rv.id),
         |short AS (SELECT id, approx_dist FROM adc ORDER BY approx_dist, id LIMIT 40),
         |rer AS (SELECT s.id, s.approx_dist,
         |  CASE WHEN sqrt(${dotSql("e.embedding", "e.embedding")}) = 0.0 OR q.qnorm = 0.0 THEN 0.0
         |    ELSE ${dotSql("e.embedding", "q.qe")} /
         |      (sqrt(${dotSql("e.embedding", "e.embedding")}) * q.qnorm) END AS cosine
         |  FROM short s JOIN embeddings e ON e.vec_id = s.id, qn q)
         |SELECT id AS vec_id, approx_dist, cosine FROM (
         |  SELECT * FROM rer ORDER BY cosine DESC, id LIMIT 10)
         |ORDER BY cosine DESC, vec_id""".stripMargin,
    // q99: q38's IVF routing with the corpus side filtered to labels 0–4
    // BEFORE assignment — filtered vector search.
    "q99_filtered_ann" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |corp AS (SELECT vec_id, embedding FROM embeddings WHERE label < 5),
         |cells AS (SELECT vec_id, embedding, centroid_id AS cell FROM (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosineSql("e.embedding", "c.cv")} DESC, c.centroid_id ASC) AS rn
         |  FROM corp e CROSS JOIN cent c) WHERE rn = 1),
         |probes AS (SELECT query_id, q_vec, centroid_id AS cell FROM (
         |  SELECT q.vec_id AS query_id, q.embedding AS q_vec, c.centroid_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosineSql("q.embedding", "c.cv")} DESC, c.centroid_id ASC) AS rn
         |  FROM embeddings q CROSS JOIN cent c
         |  WHERE q.vec_id >= 10 AND q.vec_id < 15) WHERE rn <= 2),
         |scored AS (SELECT p.query_id, s.vec_id AS corpus_id,
         |    ${cosineSql("p.q_vec", "s.embedding")} AS cosine
         |  FROM cells s JOIN probes p ON s.cell = p.cell WHERE p.query_id <> s.vec_id)
         |SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id ASC) AS rank FROM scored)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // q100: the duplicated stream deduped back to exactly the events table.
    "q100_stream_dedup" ->
      """SELECT event_id, epoch_us(ts) AS us, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    // q101: DuckDB runs the inequality join natively (IEJoin); the Spark
    // side must produce the same pairs through the bucketed rewrite.
    "q101_range_join" ->
      """WITH p AS (SELECT epoch_us(ts) - 600000000 AS lo, epoch_us(ts) AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click')
        |SELECT c.event_id, count(*)::BIGINT AS n_windows
        |FROM c JOIN p ON c.us >= p.lo AND c.us <= p.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q102: the diff labels follow analytically from the mutation rules —
    // %13 keys vanish (removed), %7 survivors get a new segment (changed),
    // %101 keys reappear shifted (added).
    "q102_table_diff" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 13 = 0 THEN 'removed'
        |       WHEN c_custkey % 7 = 0 THEN 'changed'
        |       ELSE 'unchanged' END AS change
        |FROM customer
        |UNION ALL
        |SELECT c_custkey + 1000000, 'added' FROM customer WHERE c_custkey % 101 = 0
        |ORDER BY c_custkey""".stripMargin,
    // q103: file skipping must be invisible to the answer — the oracle is
    // the plain full-scan WHERE.
    "q103_zonemap_scan" ->
      """SELECT o_orderkey, o_custkey,
        |  datediff('day', DATE '1992-01-01', o_orderdate::DATE)::INT AS day
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 300
        |  AND datediff('day', DATE '1992-01-01', o_orderdate::DATE) BETWEEN 1500 AND 1800
        |ORDER BY o_orderkey""".stripMargin,
    "q104_heavy_hitters" ->
      """WITH s AS (
        |  SELECT 'o_custkey' AS col_name, o_custkey::VARCHAR AS value FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders)
        |SELECT col_name, value, n, rank FROM (
        |  SELECT col_name, value, count(*)::BIGINT AS n,
        |    row_number() OVER (PARTITION BY col_name ORDER BY count(*) DESC, value) AS rank
        |  FROM s GROUP BY 1, 2)
        |WHERE rank <= 5 ORDER BY col_name, rank""".stripMargin,
    "q105_histogram" ->
      """SELECT bin, 0.0 + bin * 50000.0 AS lo_edge, 0.0 + (bin + 1) * 50000.0 AS hi_edge, n
        |FROM (
        |  SELECT least(floor((o_totalprice::DOUBLE - 0.0) / 50000.0), 11)::INT AS bin,
        |    count(*)::BIGINT AS n
        |  FROM orders
        |  WHERE o_totalprice::DOUBLE >= 0.0 AND o_totalprice::DOUBLE <= 600000.0
        |  GROUP BY 1)
        |ORDER BY bin""".stripMargin,
    // q106: sketch estimates are approximate by nature → q45's oracle
    // style (exact aggregates + must-be-true tolerance booleans).
    "q106_hll_union" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users,
        | true AS est_ok, count(*)::BIGINT AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q108: the winnow replay feeding a (source, fp) distinct self-join.
    "q108_source_winnow_overlap" ->
      s"""WITH $winnowSelCte,
         |sel AS (SELECT DISTINCT doc_id, s.fp AS fp FROM wsel),
         |sf AS (SELECT DISTINCT d.source, sel.fp FROM sel JOIN documents d USING (doc_id))
         |SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_shared
         |FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q109: quality formula + 16-bit hash threshold, both replayed.
    "q109_weighted_sample" ->
      s"""SELECT doc_id, $qualitySql AS quality FROM documents
         |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 65536
         |  < floor(($qualitySql) * 65536)
         |ORDER BY doc_id""".stripMargin,
    // q111: the pack replay + a windowed cumulative offset per pack.
    "q111_pack_offsets" ->
      s"""WITH RECURSIVE $packReplayCte
         |SELECT grp::INT AS grp, doc_id, n_tokens::INT AS n_tokens, pack_id,
         | pack_pos::INT AS pack_pos,
         | coalesce(sum(n_tokens) OVER (PARTITION BY grp, pack_id ORDER BY pack_pos
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::INT AS pack_offset
         |FROM p ORDER BY doc_id""".stripMargin,
    // q113: binaryFile ingestion must reproduce ids and byte lengths.
    "q113_binaryfile_scan" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
        | octet_length(encode(text))::BIGINT AS content_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q114: the stream-static join's batch twin.
    "q114_stream_static_join" ->
      """WITH w AS (SELECT * FROM (VALUES ('click', 1.0), ('view', 2.0), ('purchase', 10.0))
        |  v(event_type, weight))
        |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start, event_type,
        | count(*) AS n_events, round(sum(value * weight), 2) AS weighted_value
        |FROM events JOIN w USING (event_type)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q118: mirrors carry SMALLER ids but LOWER priority — the survivor
    // proves the (prio, id) ordering, not plain min-id.
    "q118_priority_dedup" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text, source, 0 AS prio FROM documents
         |  UNION ALL SELECT doc_id - 100000, text, 'mirror', 1 FROM documents)
         |SELECT doc_id, source, md5($normSql) AS fingerprint FROM all_docs
         |QUALIFY row_number() OVER (PARTITION BY md5($normSql) ORDER BY prio, doc_id) = 1
         |ORDER BY doc_id""".stripMargin,
    // q119: ntile quartiles over the total (quality desc, doc_id) order.
    "q119_curriculum_bins" ->
      s"""SELECT doc_id, lang, $qualitySql AS quality,
         |  ntile(4) OVER (PARTITION BY lang
         |    ORDER BY ($qualitySql) DESC, doc_id ASC) AS stage
         |FROM documents ORDER BY doc_id""".stripMargin,
    // q120: first-48-token truncation, list ops.
    "q120_token_truncate" ->
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        |  FROM documents)
        |SELECT doc_id, len(w)::INT AS n_tokens, least(len(w), 48)::INT AS n_kept,
        | len(w) > 48 AS truncated,
        | array_to_string(list_slice(w, 1, 48), ' ') AS text_head
        |FROM t ORDER BY doc_id""".stripMargin,
    // q121: add-one bigram conditional model, counts + vocab replayed.
    "q121_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array($normSql, ' ') AS w FROM documents),
         |bgidx AS (SELECT doc_id, w, unnest(range(2, len(w) + 1)) AS i FROM toks),
         |bg AS (SELECT doc_id, w[i-1] AS a, w[i] AS b FROM bgidx
         |  WHERE len(w[i-1]) > 0 AND len(w[i]) > 0),
         |bc AS (SELECT a, b, count(*)::BIGINT AS cab FROM bg GROUP BY 1, 2),
         |u AS (SELECT unnest(regexp_split_to_array($normSql, ' ')) AS term FROM documents),
         |uc AS (SELECT term, count(*)::BIGINT AS ca FROM u WHERE len(term) > 0 GROUP BY 1),
         |v AS (SELECT count(*)::BIGINT AS vocab FROM uc)
         |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         | round(avg(ln((cab + 1)::DOUBLE / (ca + vocab)::DOUBLE)), 2) AS avg_logprob
         |FROM bg JOIN bc ON bc.a = bg.a AND bc.b = bg.b
         | JOIN uc ON uc.term = bg.a CROSS JOIN v
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q122: exact counts, one double PMI expression mirrored + rounded.
    "q122_pmi_collocations" ->
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array($normSql, ' ') AS w FROM documents),
         |bgidx AS (SELECT doc_id, w, unnest(range(2, len(w) + 1)) AS i FROM toks),
         |bg AS (SELECT doc_id, w[i-1] AS a, w[i] AS b FROM bgidx
         |  WHERE len(w[i-1]) > 0 AND len(w[i]) > 0),
         |bc AS (SELECT a, b, count(*)::BIGINT AS cab FROM bg GROUP BY 1, 2),
         |n2 AS (SELECT sum(cab)::BIGINT AS n2 FROM bc),
         |u AS (SELECT unnest(regexp_split_to_array($normSql, ' ')) AS term FROM documents),
         |uc AS (SELECT term, count(*)::BIGINT AS c FROM u WHERE len(term) > 0 GROUP BY 1),
         |n1 AS (SELECT sum(c)::BIGINT AS n1 FROM uc)
         |SELECT bc.a, bc.b, bc.cab,
         | round(ln((bc.cab::DOUBLE / n2.n2::DOUBLE) /
         |   ((t1.c::DOUBLE / n1.n1::DOUBLE) * (t2.c::DOUBLE / n1.n1::DOUBLE))), 2) AS pmi
         |FROM bc JOIN uc t1 ON t1.term = bc.a JOIN uc t2 ON t2.term = bc.b, n2, n1
         |WHERE bc.cab >= 5
         |ORDER BY pmi DESC, bc.a, bc.b LIMIT 20""".stripMargin,
    // q123: q30's exact scorer restricted to label-mismatched neighbors.
    "q123_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT query_id, vec_id AS corpus_id,
         |    ${cosineSql("qv", "embedding")} AS cosine
         |  FROM embeddings CROSS JOIN q WHERE embeddings.label <> q.ql)
         |SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id ASC) AS rank FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // q124: repeated-span detection — duplicated 5-gram sites island-
    // merged into maximal spans, ≥8 tokens reported.
    "q124_repeated_spans" ->
      s"""WITH $repeatedSpansCte
         |SELECT doc_id, start_pos, end_pos, span_toks FROM spans
         |ORDER BY doc_id, start_pos""".stripMargin,
    // q125: span removal — tokens covered by any span dropped, survivors
    // re-joined in order; every document returns a row.
    "q125_span_strip" ->
      s"""WITH $repeatedSpansCte,
         |toks AS (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
         |    i -> {'tpos': i, 'tok': w[i]})) AS s FROM t),
         |tok2 AS (SELECT doc_id, s.tpos::INT AS tpos, s.tok AS tok FROM toks
         |  WHERE len(s.tok) > 0),
         |kept AS (SELECT t2.doc_id, t2.tpos, t2.tok FROM tok2 t2 ANTI JOIN spans sp
         |  ON t2.doc_id = sp.doc_id AND t2.tpos BETWEEN sp.start_pos AND sp.end_pos + 4),
         |clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         |    count(*) AS n_kept FROM kept GROUP BY doc_id),
         |nt AS (SELECT d.doc_id,
         |    CASE WHEN trim(d.text) = '' THEN 0 ELSE len(t.w) END AS n_toks
         |  FROM documents d JOIN t ON d.doc_id = t.doc_id)
         |SELECT nt.doc_id, coalesce(c.clean_text, '') AS clean_text,
         |  (nt.n_toks - coalesce(c.n_kept, 0))::BIGINT AS n_removed
         |FROM nt LEFT JOIN clean c ON nt.doc_id = c.doc_id
         |ORDER BY nt.doc_id""".stripMargin,
    // q126: the learned merge table — one row per training iteration.
    "q126_bpe_merges" -> {
      val rows = (1 to 8)
        .map(i => s"SELECT $i AS merge_rank, a AS lhs, b AS rhs FROM bt$i")
        .mkString("\n UNION ALL ")
      s"""WITH $bpeCteChain
         |SELECT * FROM ($rows) ORDER BY merge_rank""".stripMargin
    },
    // q127: the trained segmentation of the whole vocabulary.
    "q127_bpe_segment" ->
      s"""WITH $bpeCteChain
         |SELECT word, len(syms)::BIGINT AS n_pieces,
         |  array_to_string(syms, ' ') AS pieces
         |FROM ws8 ORDER BY word""".stripMargin,
    // q128: learned-vocab token counts per document.
    "q128_bpe_token_counts" ->
      s"""WITH $bpeCteChain,
         |bstream AS (SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array($normSql, ' ')) AS word
         |    FROM documents) WHERE len(word) > 0)
         |SELECT t.doc_id, count(*)::BIGINT AS n_words,
         |  sum(len(w.syms))::BIGINT AS n_bpe_tokens
         |FROM bstream t JOIN ws8 w USING (word)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // q129: q28's banded-minhash replay over 64-token exact-partition
    // chunks, composite pid = 'doc:idx' split back on output.
    "q129_paragraph_neardup" ->
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN []
         |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS w0
         |  FROM documents),
         |i AS (SELECT doc_id, w0,
         |  unnest(range(CASE WHEN len(w0) = 0 THEN 0 ELSE (len(w0) - 1) // 64 + 1 END)) AS chunk_idx
         |  FROM t),
         |c AS (SELECT doc_id, chunk_idx,
         |  list_slice(w0, chunk_idx * 64 + 1, chunk_idx * 64 + 64) AS ct FROM i),
         |ch AS (SELECT doc_id::VARCHAR || ':' || chunk_idx::VARCHAR AS pid,
         |  regexp_split_to_array(regexp_replace(trim(lower(array_to_string(ct, ' '))), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM c),
         |chsh AS (SELECT pid, $shinglesSql AS sh FROM ch),
         |sig AS (SELECT pid, sh, list_transform(range(0, 16),
         |  i -> list_aggregate(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh
         |  FROM chsh),
         |bands AS (SELECT pid, unnest(list_transform(range(0, 4),
         |  j -> md5(j::VARCHAR || ',' || array_to_string(mh[j*4+1:j*4+4], ',')))) AS bk FROM sig),
         |cand AS (SELECT DISTINCT a.pid AS id_a, b.pid AS id_b
         |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.pid < b.pid)
         |SELECT string_split(id_a, ':')[1]::BIGINT AS doc_a,
         |  string_split(id_a, ':')[2]::INT AS chunk_a,
         |  string_split(id_b, ':')[1]::BIGINT AS doc_b,
         |  string_split(id_b, ':')[2]::INT AS chunk_b,
         |  $jaccardSql AS jaccard
         |FROM cand JOIN chsh a ON a.pid = id_a JOIN chsh b ON b.pid = id_b
         |WHERE $jaccardSql >= 0.5
         |ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin,
    // q130: residual IVF-PQ trained on vec_id < 300, then the FULL corpus
    // encoded in one shot with the frozen model — the engine's streamed
    // two-batch fold must land the identical table.
    "q130_stream_ann_index" ->
      s"""WITH $pqNormCte,
         |tnv AS (SELECT id, nvec FROM nv WHERE id < 300),
         |cs AS (SELECT 0 AS grp, id, nvec AS vec FROM tnv),
         |${kmeansReplayCte("c", "cs", "4", iters = 2, dim = 64)},
         |rv AS (SELECT a.id, a.cell,
         |  list_transform(range(1, 65), i -> a.vec[i]::DOUBLE - c.cent[i]) AS rvec
         |  FROM ca a JOIN ccb c ON c.grp = a.grp AND c.cid = a.cell),
         |rsl AS (SELECT t.j AS grp, id, list_slice(rvec, t.j * 16 + 1, t.j * 16 + 16) AS vec
         |  FROM rv, range(0, 4) t(j)),
         |${kmeansReplayCte("r", "rsl", "8", iters = 2, dim = 16)},
         |fa AS (SELECT id, cell FROM (
         |  SELECT n.id, c.cid AS cell, row_number() OVER (PARTITION BY n.id
         |    ORDER BY list_reduce(list_transform(range(1, 65),
         |      i -> (n.nvec[i]::DOUBLE - c.cent[i]) * (n.nvec[i]::DOUBLE - c.cent[i])),
         |      (x, y) -> x + y), c.cid) AS rn
         |  FROM nv n JOIN ccb c ON c.grp = 0) WHERE rn = 1),
         |frv AS (SELECT f.id, f.cell,
         |  list_transform(range(1, 65), i -> n.nvec[i]::DOUBLE - c.cent[i]) AS rvec
         |  FROM fa f JOIN nv n ON n.id = f.id JOIN ccb c ON c.grp = 0 AND c.cid = f.cell),
         |fsl AS (SELECT t.j AS grp, id, list_slice(rvec, t.j * 16 + 1, t.j * 16 + 16) AS vec
         |  FROM frv, range(0, 4) t(j)),
         |fcd AS (SELECT grp, id, cid FROM (
         |  SELECT s.grp, s.id, r.cid, row_number() OVER (PARTITION BY s.grp, s.id
         |    ORDER BY list_reduce(list_transform(range(1, 17),
         |      i -> (s.vec[i]::DOUBLE - r.cent[i]) * (s.vec[i]::DOUBLE - r.cent[i])),
         |      (x, y) -> x + y), r.cid) AS rn
         |  FROM fsl s JOIN rcb r ON r.grp = s.grp) WHERE rn = 1)
         |SELECT f.id AS vec_id, any_value(f.cell)::INT AS cell,
         |  string_agg(d.cid::VARCHAR, ',' ORDER BY d.grp) AS codes
         |FROM fa f JOIN fcd d ON d.id = f.id
         |GROUP BY f.id ORDER BY vec_id""".stripMargin,
    // q117: the join semantics reduce to the partition predicate.
    "q117_dpp_join" ->
      """SELECT o_orderstatus, 'finished' AS label, count(*)::BIGINT AS n,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q112: the 3-way bit interleave, term by term.
    "q112_zorder3" -> {
      val dims = Seq("x", "y", "z")
      val terms = for { b <- 0 until 16; (d, i) <- dims.zipWithIndex }
        yield s"((($d >> $b) & 1) << ${b * 3 + i})"
      s"""WITH xyz AS (SELECT o_orderkey, o_custkey % 65536 AS x,
         |  datediff('day', DATE '1992-01-01', o_orderdate::DATE) % 65536 AS y,
         |  floor(o_totalprice / 10000.0)::BIGINT % 65536 AS z FROM orders)
         |SELECT o_orderkey, ${terms.mkString(" | ")} AS zval
         |FROM xyz ORDER BY o_orderkey""".stripMargin
    },
    // q218/q219: HTML extraction — the fixture page is deterministic, so
    // the oracle re-derives every block decision (tag, text, link chars,
    // densities, jusText gates) from the raw document text with string
    // functions, never parsing markup; the Spark side must parse for real.
    "q218_html_blocks" ->
      s"""WITH $htmlBlocksCte
         |SELECT doc_id, block_idx, tag, text, n_words, link_density,
         |  stop_density,
         |  $htmlDecisionSql AS decision
         |FROM m ORDER BY doc_id, block_idx""".stripMargin,
    // q226: robots evaluation — the fixture's policy is arithmetic, so
    // every allow/deny decision re-derives in CASE logic: the * group
    // denies /private/ and /tmp but re-allows /private/pub/; graftbot's
    // own group (even-numbered hosts) replaces * and denies only /docs/
    "q226_robots_filter" ->
      """SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN '/docs/' || doc_id
        |    WHEN 1 THEN '/private/' || doc_id
        |    WHEN 2 THEN '/private/pub/' || doc_id
        |    ELSE '/tmp' || doc_id END AS path,
        |  CASE WHEN doc_id % 4 IN (0, 2) THEN 1 ELSE 0 END AS is_allowed,
        |  CASE WHEN CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 2 = 0
        |    THEN CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END
        |    ELSE CASE WHEN doc_id % 4 IN (0, 2) THEN 1 ELSE 0 END
        |  END AS is_allowed_bot
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q227: wildcard robots rules — the oracle REPLAYS the algorithm:
    // the same pattern→regex translation (escape specials, *→.*,
    // trailing $→anchor), regexp match, and longest-pattern-wins /
    // allow-wins-ties ranking (encoded as max(l*2 + is_allow) % 2),
    // plus the per-group crawl-delay and host-wide sitemap joins
    "q227_robots_wildcards" ->
      """WITH hosts AS (SELECT DISTINCT source,
        |    CAST(regexp_extract(source, '(\d+)$', 1) AS INT) AS sn FROM documents),
        |rules(is_allow, rule_path, agent) AS (VALUES
        |  (0, '/*?', '*'), (0, '/*.pdf$', '*'), (1, '/docs/*.pdf$', '*'), (0, '/cgi-bin/', '*'),
        |  (1, '/cgi-bin/pub', 'graftbot'), (0, '/cgi-bin/', 'graftbot'),
        |  (1, '/cgi-bin/pub', 'otherbot'), (0, '/cgi-bin/', 'otherbot')),
        |rx AS (SELECT *,
        |  '^' || replace(regexp_replace(
        |      CASE WHEN rule_path LIKE '%$' THEN substr(rule_path, 1, length(rule_path)-1)
        |           ELSE rule_path END,
        |      '([\\.\[\]{}()+?^$|])', '\\\1', 'g'), '*', '.*')
        |   || CASE WHEN rule_path LIKE '%$' THEN '$' ELSE '' END AS rule_regex
        |  FROM rules),
        |urls AS (SELECT doc_id, source,
        |  CASE doc_id % 5
        |    WHEN 0 THEN '/docs/' || doc_id || '.pdf'
        |    WHEN 1 THEN '/search?q=' || doc_id
        |    WHEN 2 THEN '/cgi-bin/script' || doc_id
        |    WHEN 3 THEN '/cgi-bin/pub/' || doc_id
        |    ELSE '/about' || doc_id || '.pdfx' END AS path
        |  FROM documents),
        |cand AS (SELECT u.doc_id, r.agent, r.is_allow, length(r.rule_path) AS l
        |  FROM urls u JOIN rx r ON regexp_matches(u.path, r.rule_regex)),
        |best AS (SELECT doc_id, agent, max(l*2 + is_allow) % 2 AS dec
        |  FROM cand GROUP BY 1, 2)
        |SELECT u.doc_id, u.path,
        |  coalesce(b1.dec, 1)::INT AS is_allowed,
        |  coalesce(b2.dec, 1)::INT AS is_allowed_bot,
        |  coalesce(b3.dec, 1)::INT AS is_allowed_other,
        |  h.sn % 3 + 0.5 AS crawl_delay,
        |  'https://' || u.source || '.test/sitemap.xml' AS sitemap
        |FROM urls u
        |JOIN hosts h ON h.source = u.source
        |LEFT JOIN best b1 ON b1.doc_id = u.doc_id AND b1.agent = '*'
        |LEFT JOIN best b2 ON b2.doc_id = u.doc_id AND b2.agent = 'graftbot'
        |LEFT JOIN best b3 ON b3.doc_id = u.doc_id AND b3.agent = 'otherbot'
        |ORDER BY u.doc_id""".stripMargin,
    // q229: per-language stopword gates — the oracle replays BOTH
    // densities (the language's own stoplist vs the English default)
    // and both decisions; zh replays the bypass (density 0, threshold 0)
    "q229_extract_lang" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  CASE lang
         |    WHEN 'de' THEN 'der große Datensatz und die schnelle Abfrage ist nicht klein mit Daten'
         |    WHEN 'es' THEN 'el sistema de datos es una consulta que sirve para los casos'
         |    WHEN 'fr' THEN 'le système est dans une grande base pour les données du groupe'
         |    WHEN 'zh' THEN '数据 系统 查询 快速 合并 窗口 流 处理'
         |    ELSE 'the data system is a fast query and it works for the team'
         |  END || ' ' || text AS raw FROM documents),
         |m AS (SELECT doc_id, lang, trim(regexp_replace(raw, '\\s+', ' ', 'g')) AS txt FROM t),
         |w AS (SELECT doc_id, lang, txt,
         |  (CASE WHEN length(txt) = 0 THEN 0
         |     ELSE len(regexp_split_to_array(trim(txt), '\\s+')) END)::INT AS n_words FROM m),
         |d AS (SELECT doc_id, lang, n_words,
         |  CASE lang
         |    WHEN 'de' THEN len(regexp_extract_all(lower(txt), '\\b(der|die|das|und|ist|nicht|mit|ein)\\b'))::DOUBLE / greatest(n_words, 1)
         |    WHEN 'es' THEN len(regexp_extract_all(lower(txt), '\\b(el|la|los|las|que|es|una|para)\\b'))::DOUBLE / greatest(n_words, 1)
         |    WHEN 'fr' THEN len(regexp_extract_all(lower(txt), '\\b(le|la|les|des|est|une|dans|pour)\\b'))::DOUBLE / greatest(n_words, 1)
         |    WHEN 'zh' THEN 0.0
         |    ELSE len(regexp_extract_all(lower(txt), '\\b(the|and|of|to|a|in|is|it|that|for)\\b'))::DOUBLE / greatest(n_words, 1)
         |  END AS stop_density,
         |  len(regexp_extract_all(lower(txt), '\\b(the|and|of|to|a|in|is|it|that|for)\\b'))::DOUBLE / greatest(n_words, 1) AS stop_density_en
         |  FROM w)
         |SELECT doc_id, lang, n_words, stop_density,
         |  CASE WHEN n_words < 5 THEN 'short'
         |    WHEN lang <> 'zh' AND stop_density < 0.05 THEN 'neargood'
         |    ELSE 'good' END AS decision,
         |  stop_density_en,
         |  CASE WHEN n_words < 5 THEN 'short'
         |    WHEN stop_density_en < 0.05 THEN 'neargood'
         |    ELSE 'good' END AS decision_en
         |FROM d ORDER BY doc_id""".stripMargin,
    // q231: the full front door — WARC(framed, per-record charset) →
    // extract(per-lang gates) → langId → quality → fingerprint →
    // survivors. The fixture page reduces to one content block (nav is
    // boilerplate, footer short), so the oracle derives clean_text
    // analytically and replays every downstream stage with the SHARED
    // formula snippets (normSql/qualitySql/langCase — the same strings
    // q21/q24/q25 are verified against)
    "q231_corpus_front_door" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  CASE lang
         |    WHEN 'de' THEN 'der große Datensatz und die schnelle Abfrage ist nicht klein mit Daten'
         |    WHEN 'es' THEN 'el sistema de datos es una consulta que sirve para los casos'
         |    WHEN 'fr' THEN 'le système est dans une grande base pour les données du groupe'
         |    WHEN 'zh' THEN '数据 系统 查询 快速 合并 窗口 流 处理'
         |    ELSE 'the data system is a fast query and it works for the team'
         |  END || ' ' || text AS raw FROM documents),
         |c AS (SELECT doc_id, lang, trim(regexp_replace(raw, '\\s+', ' ', 'g')) AS text FROM t),
         |f AS (SELECT doc_id, lang, text,
         |   md5($normSql) AS fingerprint,
         |   $qualitySql AS quality,
         |   $langCase AS lang_pred
         |  FROM c)
         |SELECT doc_id, lang, 'Doc ' || doc_id AS title, 1::BIGINT AS n_blocks_kept,
         |  lang_pred, quality, fingerprint,
         |  (doc_id = min(doc_id) OVER (PARTITION BY fingerprint))::INT AS is_survivor
         |FROM f ORDER BY doc_id""".stripMargin,
    // q228: length-framed WARC — every page body embeds the record
    // marker and is ISO-8859-1 encoded; the framed reader must
    // round-trip bytes exactly, so the oracle rebuilds body, version
    // and the byte length (ISO-8859-1 = 1 byte/char for latin text)
    "q228_warc_framed" ->
      s"""WITH b AS (SELECT doc_id,
         |  '<html><body><p>a page about' || chr(13) || chr(10) || 'WARC/1.0' ||
         |    chr(13) || chr(10) || 'records</p><p>café déjà-vu à la «mode» ' ||
         |    text || '</p></body></html>' AS body
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN '1.0' ELSE '1.1' END AS warc_version,
         |  1 AS frame_ok,
         |  (length('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
         |     'Content-Type: text/html; charset=iso-8859-1' || chr(13) || chr(10) ||
         |     chr(13) || chr(10)) + length(body))::BIGINT AS content_length,
         |  body AS payload
         |FROM b ORDER BY doc_id""".stripMargin,
    // q225: URL canonicalization — every RFC 3986 normalization rule
    // (scheme/host case, default ports, fragments, empty path, query
    // sort) replays step by step
    "q225_url_dedup" ->
      """WITH d AS (SELECT doc_id, lang, source FROM documents),
        |v AS (
        |  SELECT doc_id, 1 AS variant,
        |    'HTTP://Graft.TEST:80/docs/' || doc_id || '?b=' || lang ||
        |      '&a=' || source || '#frag' AS url FROM d
        |  UNION ALL
        |  SELECT doc_id, 2,
        |    'http://graft.test/docs/' || doc_id || '?a=' || source ||
        |      '&b=' || lang FROM d),
        |p1 AS (SELECT doc_id, variant, url,
        |    split_part(url, '#', 1) AS nofrag FROM v),
        |p2 AS (SELECT *,
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)', 2)) AS auth,
        |    regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://[^/?#]*(.*)$', 2) AS pathq
        |  FROM p1),
        |p3 AS (SELECT *,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |         ELSE auth END AS authnp,
        |    split_part(pathq, '?', 1) AS path
        |  FROM p2),
        |p4 AS (SELECT *,
        |    CASE WHEN length(path) = 0 THEN '/' ELSE path END AS npath,
        |    substr(pathq, length(path) + 2) AS query
        |  FROM p3),
        |n AS (SELECT doc_id, variant, url,
        |    CASE WHEN length(scheme) = 0 THEN url
        |      ELSE scheme || '://' || authnp || npath ||
        |        CASE WHEN length(query) = 0 THEN ''
        |          ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END
        |    END AS canonical
        |  FROM p4)
        |SELECT doc_id, variant::INT AS variant, url, canonical,
        |  (variant = min(variant) OVER (PARTITION BY canonical))::INT AS is_survivor
        |FROM n ORDER BY doc_id, variant""".stripMargin,
    // q234: the crawl frontier — canonical forms, the wildcard deny
    // (paths ending 0 under /docs/ ⇔ doc_id % 10 = 0), and the
    // per-host polite numbering all replay analytically
    "q234_crawl_frontier" ->
      """WITH d AS (SELECT doc_id, source, lang,
        |    CAST(regexp_extract(source, '(\d+)$', 1) AS INT) AS sn FROM documents),
        |c AS (SELECT doc_id, source, sn,
        |   'http://' || source || '.test/docs/' || lang || '/' || doc_id AS canonical FROM d),
        |a AS (SELECT * FROM c WHERE doc_id % 10 <> 0),
        |f AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS fetch_seq FROM a)
        |SELECT doc_id, source, canonical, fetch_seq::INT AS fetch_seq,
        |  fetch_seq * (sn % 3 + 0.5) AS fetch_offset_s
        |FROM f ORDER BY doc_id""".stripMargin,
    // q233: WET roundtrip — extraction's clean text must survive the
    // conversion-record framing byte-for-byte, so the oracle is q219's
    // derivation reduced to its text columns
    "q233_wet_roundtrip" ->
      s"""WITH $htmlBlocksCte,
         |kept AS (SELECT doc_id, block_idx, text FROM m
         |  WHERE ($htmlDecisionSql) IN ('good', 'neargood')),
         |agg AS (SELECT doc_id,
         |    string_agg(text, chr(10) ORDER BY block_idx) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT doc_id, clean_text, length(clean_text)::BIGINT AS n_chars
         |FROM agg ORDER BY doc_id""".stripMargin,
    // q232: politeness scheduling — per-host row numbering × the host's
    // declared (or default) crawl delay replays directly in SQL
    "q232_crawl_schedule" ->
      """WITH u AS (SELECT doc_id, source, '/docs/' || doc_id AS path,
        |    CAST(regexp_extract(source, '(\d+)$', 1) AS INT) AS sn FROM documents),
        |d AS (SELECT *, CASE WHEN sn % 2 = 0 THEN sn % 3 + 0.5 ELSE 1.0 END AS delay,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS fetch_seq
        |  FROM u)
        |SELECT doc_id, source, path, fetch_seq::INT AS fetch_seq,
        |  fetch_seq * delay AS fetch_offset_s
        |FROM d ORDER BY doc_id""".stripMargin,
    // q230: dot-segment + percent-encoding normalization — the fixture
    // is arithmetic, so the canonical form states analytically: /./ and
    // /../ cancel, %2D/%7e decode (unreserved), %2f uppercases only
    "q230_url_normalize" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |v AS (
        |  SELECT doc_id, 1 AS variant,
        |    'http://graft.test/./docs/../page%2Findex%2D' || doc_id ||
        |      '?x=%7euser&y=%2f' AS url FROM d
        |  UNION ALL
        |  SELECT doc_id, 2,
        |    'http://graft.test/page%2Findex-' || doc_id ||
        |      '?x=~user&y=%2F' FROM d),
        |n AS (SELECT doc_id, variant, url,
        |  'http://graft.test/page%2Findex-' || doc_id || '?x=~user&y=%2F'
        |    AS canonical FROM v)
        |SELECT doc_id, variant::INT AS variant, url, canonical,
        |  (variant = min(variant) OVER (PARTITION BY canonical))::INT AS is_survivor
        |FROM n ORDER BY doc_id, variant""".stripMargin,
    // q222: the context-sensitive refinement — the window pass replays
    // in SQL over the same analytically-derived block relation
    "q222_html_refine" ->
      s"""WITH $htmlBlocksCte,
         |d AS (SELECT doc_id, block_idx, tag,
         |  $htmlDecisionSql AS decision FROM m),
         |r AS (SELECT *,
         |  coalesce(last_value(CASE WHEN decision IN ('good','boilerplate')
         |      THEN decision END IGNORE NULLS)
         |    OVER (PARTITION BY doc_id ORDER BY block_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    'boilerplate') AS prev_core,
         |  coalesce(first_value(CASE WHEN decision IN ('good','boilerplate')
         |      THEN decision END IGNORE NULLS)
         |    OVER (PARTITION BY doc_id ORDER BY block_idx
         |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
         |    'boilerplate') AS next_core
         | FROM d)
         |SELECT doc_id, block_idx, tag, decision,
         |  CASE WHEN decision IN ('good','boilerplate') THEN decision
         |    WHEN decision = 'neargood' THEN
         |      CASE WHEN prev_core = 'good' OR next_core = 'good'
         |        THEN 'good' ELSE 'boilerplate' END
         |    ELSE
         |      CASE WHEN prev_core = 'good' AND next_core = 'good'
         |        THEN 'good' ELSE 'boilerplate' END
         |  END AS final_decision
         |FROM r ORDER BY doc_id, block_idx""".stripMargin,
    // q224: the streamed WARC ingestion must be batch-equivalent — the
    // oracle derives fingerprints + dedup survivors from the raw corpus
    // in one shot (micro-batch boundaries invisible)
    "q224_warc_stream" ->
      s"""WITH $htmlBlocksCte,
         |kept AS (SELECT doc_id, block_idx, text FROM m
         |  WHERE ($htmlDecisionSql) IN ('good', 'neargood')),
         |agg AS (SELECT doc_id,
         |    string_agg(text, chr(10) ORDER BY block_idx) AS clean_text
         |  FROM kept GROUP BY doc_id),
         |fp AS (SELECT doc_id,
         |    md5(regexp_replace(trim(lower(clean_text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM agg)
         |SELECT doc_id, fingerprint,
         |  (doc_id = min(doc_id) OVER (PARTITION BY fingerprint))::INT
         |    AS is_survivor
         |FROM fp ORDER BY doc_id""".stripMargin,
    "q219_html_extract" -> {
      def quality(ct: String): String =
        s"""(CASE WHEN length($ct) = 0 THEN 0.0
           |    ELSE len(regexp_extract_all($ct, '[\\p{L}]'))::DOUBLE / length($ct) END) * 0.5
           | + (1.0 - CASE WHEN length($ct) = 0 THEN 0.0
           |    ELSE len(regexp_extract_all($ct, '[.,;:!?]'))::DOUBLE / length($ct) END) * 0.2
           | + (1.0 - CASE WHEN length($ct) = 0 THEN 0.0
           |    ELSE len(regexp_extract_all($ct, '[0-9]'))::DOUBLE / length($ct) END) * 0.2
           | + least((CASE WHEN length(trim($ct)) = 0 THEN 0
           |    ELSE len(regexp_split_to_array(trim($ct), '\\s+')) END)::DOUBLE / 100.0, 1.0) * 0.1""".stripMargin
      s"""WITH $htmlBlocksCte,
         |kept AS (SELECT doc_id, block_idx, text FROM m
         |  WHERE ($htmlDecisionSql) IN ('good', 'neargood')),
         |agg AS (SELECT doc_id,
         |    string_agg(text, chr(10) ORDER BY block_idx) AS clean_text,
         |    count(*)::BIGINT AS n_blocks_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT a.doc_id,
         |  'Doc ' || a.doc_id || ' | ' || d.source || ' | graft' AS title,
         |  a.clean_text, a.n_blocks_kept,
         |  ${quality("a.clean_text")} AS quality
         |FROM agg a JOIN documents d ON d.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin
    }
  )

  /** The q218/q219 fixture replay: paragraphs re-chunked exactly like the
    * Spark fixture (20-word slices), every synthetic block's text and
    * anchor-char count stated analytically, then the jusText metrics
    * recomputed with the same formulas as `operators/Extract.scala`. */
  private val htmlBlocksCte: String =
    s"""base AS (
       |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents),
       |para AS (
       |  SELECT doc_id, source, toks,
       |    list_transform(range(0, CAST(ceil(len(toks) / 20.0) AS INT)),
       |      i -> array_to_string(list_slice(toks, i*20 + 1, (i+1)*20), ' ')) AS paras
       |  FROM base),
       |blk AS (
       |  SELECT doc_id,
       |    [struct_pack(tag := 'nav', txt := 'Home About Contact', lc := 16)] ||
       |    [struct_pack(tag := 'h1', txt := 'Document ' || doc_id || ' from ' || source, lc := 0)] ||
       |    [struct_pack(tag := 'p', txt := paras[1] || ' read more here', lc := 14)] ||
       |    list_transform(list_slice(paras, 2, len(paras)),
       |         x -> struct_pack(tag := 'p', txt := x, lc := 0)) ||
       |    [struct_pack(tag := 'li', txt := 'first listed point in summary', lc := 0),
       |        struct_pack(tag := 'li', txt := 'another listed point for emphasis', lc := 0),
       |        struct_pack(tag := 'div', txt := 'Tweet this Share on FB now', lc := 21),
       |        struct_pack(tag := 'footer', txt := 'Copyright © 2026 ' || source ||
       |          ' & partners — Terms of Service Privacy', lc := 23)]
       |    AS blocks
       |  FROM para),
       |flat AS (
       |  SELECT doc_id, generate_subscripts(blocks, 1)::INT AS block_idx,
       |    unnest(blocks) AS b
       |  FROM blk),
       |m AS (
       |  SELECT doc_id, block_idx, b.tag AS tag, b.txt AS text,
       |    (CASE WHEN length(b.txt) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(b.txt), '\\s+')) END)::INT AS n_words,
       |    b.lc::DOUBLE / greatest(length(b.txt), 1) AS link_density,
       |    len(regexp_extract_all(lower(b.txt), '\\b(the|and|of|to|a|in|is|it|that|for)\\b'))::DOUBLE
       |      / greatest(CASE WHEN length(b.txt) = 0 THEN 0
       |          ELSE len(regexp_split_to_array(trim(b.txt), '\\s+')) END, 1) AS stop_density
       |  FROM flat)""".stripMargin

  private val htmlDecisionSql: String =
    """CASE WHEN link_density > 1.0/3 THEN 'boilerplate'
      | WHEN n_words < 5 THEN 'short'
      | WHEN stop_density < 0.05 THEN 'neargood'
      | ELSE 'good' END""".stripMargin

  /** q68/q87's shared oracle prefix: the full 2-iteration deterministic
    * k-means replayed in SQL (same init, sequential-fold distances,
    * explicit 6-dp rounding as Similarity.kmeansAssign); `a3` = the final
    * (id, vec, cell) assignment. */
  /** k-means replay CTE chain — the SQL twin of `Similarity.kmeansFit`
    * (same smallest-id init with 6-dp rounding, same sequential-fold
    * distances, same rounded grouped means, same lower-id tie-break), over
    * a source CTE `src`(grp, id, vec). The `grp` column replays
    * INDEPENDENT trainings in one chain (grp = PQ subspace index; a plain
    * single training uses grp = 0 everywhere). `kSql` is any scalar SQL
    * expression for k, so q87 can scale k with the corpus
    * (ceil(sqrt(n))) and still be hash-verified. Emits CTE text without
    * the leading WITH; the final assignment is `{p}a` (grp, id, vec,
    * cell) and the trained codebook `{p}cb` (grp, cid, cent).
    * (0 + t0) + t1 + … ≡ list_reduce's t0 + t1 + … because 0.0 + t0 == t0. */
  private def kmeansReplayCte(p: String, src: String, kSql: String,
                              iters: Int, dim: Int): String = {
    val dist = (cent: String) =>
      s"""list_reduce(list_transform(range(1, len(s.vec) + 1),
         |  i -> (s.vec[i]::DOUBLE - $cent[i]) * (s.vec[i]::DOUBLE - $cent[i])),
         |  (x, y) -> x + y)""".stripMargin
    def assign(name: String, cb: String) =
      s"""$name AS (SELECT grp, id, vec, cid AS cell FROM (
         |  SELECT s.grp, s.id, s.vec, c.cid,
         |    row_number() OVER (PARTITION BY s.grp, s.id
         |      ORDER BY ${dist("c.cent")}, c.cid) AS rn
         |  FROM $src s JOIN $cb c ON c.grp = s.grp) WHERE rn = 1)""".stripMargin
    val init =
      s"""${p}c0 AS (SELECT grp, cid, cent FROM (
         |  SELECT grp, row_number() OVER (PARTITION BY grp ORDER BY id) - 1 AS cid,
         |    list_transform(vec, x -> floor(x::DOUBLE * 1000000 + 0.5) / 1000000) AS cent
         |  FROM $src) WHERE cid < ($kSql))""".stripMargin
    val steps = (1 to iters).map { r =>
      s"""${assign(s"${p}a$r", s"${p}c${r - 1}")},
         |${p}m$r AS (SELECT grp, cell, list(m ORDER BY i) AS cent FROM (
         |  SELECT a.grp, a.cell, t.i,
         |    floor(avg(a.vec[t.i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
         |  FROM ${p}a$r a, range(1, ${dim + 1}) t(i)
         |  GROUP BY a.grp, a.cell, t.i)
         |  GROUP BY grp, cell),
         |${p}c$r AS (SELECT c.grp, c.cid, coalesce(m.cent, c.cent) AS cent
         |  FROM ${p}c${r - 1} c LEFT JOIN ${p}m$r m
         |    ON m.grp = c.grp AND m.cell = c.cid)""".stripMargin
    }
    (Seq(init) ++ steps ++ Seq(
      s"${p}cb AS (SELECT grp, cid, cent FROM ${p}c$iters)",
      assign(s"${p}a", s"${p}cb"))).mkString(",\n")
  }

  /** Full-embedding k-means source CTE (grp = 0) for q68/q87. */
  private val embKmeansSrc =
    "v AS (SELECT 0 AS grp, vec_id AS id, embedding AS vec FROM embeddings)"

  /** Naive-Bayes replay (q135/q136/q138): char-trigram counts per label,
    * add-one smoothing, ln-prior + Σ ln P(gram|label), argmax with
    * lexicographic ties — the full training AND scoring in SQL.
    * `trainSrc` must yield the labeled corpus `(doc_id, lang, t)` (label
    * column named `lang`, `t` = normalized text); `scoreSrc` yields the
    * docs to classify `(doc_id, t)` — pass the same docs for
    * self-consistency runs, a superset for weak-supervision runs (q138
    * trains on quality quartiles, scores everything). Ends in
    * `nbest(doc_id, pred_lang, sc, rn)`; rn = 1 is the prediction. */
  private def nbCte(trainSrc: String, scoreSrc: String,
                    gramExpr: String = "substr(t, i, 3)"): String =
    s"""nd AS ($trainSrc),
       |sd AS ($scoreSrc),
       |ng AS (SELECT doc_id, lang, CASE WHEN length(t) < 3 THEN []
       |  ELSE list_transform(range(1, length(t) - 1), i -> $gramExpr) END AS gs
       |  FROM nd),
       |nge AS (SELECT doc_id, lang, unnest(gs) AS gram FROM ng),
       |ncnt AS (SELECT lang, gram, count(*)::BIGINT AS c FROM nge GROUP BY 1, 2),
       |ntot AS (SELECT lang, sum(c)::BIGINT AS tl FROM ncnt GROUP BY 1),
       |nvoc AS (SELECT count(DISTINCT gram)::BIGINT AS v FROM ncnt),
       |npri AS (SELECT lang, ln(count(*)::DOUBLE /
       |  (SELECT count(*) FROM nd)::DOUBLE) AS lp FROM nd GROUP BY 1),
       |nlang AS (SELECT DISTINCT lang AS cand FROM nd),
       |sg AS (SELECT doc_id, CASE WHEN length(t) < 3 THEN []
       |  ELSE list_transform(range(1, length(t) - 1), i -> $gramExpr) END AS gs
       |  FROM sd),
       |sge AS (SELECT doc_id, unnest(gs) AS gram FROM sg),
       |nterm AS (SELECT e.doc_id, l.cand,
       |    sum(ln((coalesce(c.c, 0) + 1)::DOUBLE / (t.tl + nvoc.v)::DOUBLE)) AS s
       |  FROM sge e
       |  CROSS JOIN nlang l
       |  JOIN ntot t ON t.lang = l.cand
       |  CROSS JOIN nvoc
       |  LEFT JOIN ncnt c ON c.lang = l.cand AND c.gram = e.gram
       |  GROUP BY 1, 2),
       |nscore AS (SELECT d.doc_id, l.cand, p.lp + coalesce(tm.s, 0.0) AS sc
       |  FROM (SELECT doc_id FROM sd) d
       |  CROSS JOIN nlang l
       |  JOIN npri p ON p.lang = l.cand
       |  LEFT JOIN nterm tm ON tm.doc_id = d.doc_id AND tm.cand = l.cand),
       |nbest AS (SELECT doc_id, cand AS pred_lang, sc,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, cand ASC) AS rn
       |  FROM nscore)""".stripMargin

  private val nbNormDoc =
    "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private lazy val nbLangCte = nbCte(
    s"SELECT doc_id, lang, $nbNormDoc AS t FROM documents",
    s"SELECT doc_id, $nbNormDoc AS t FROM documents")
  /** q141's feature-hashed gram: md5-prefix base-16 mod 2^12 — the exact
    * cross-engine twin of `LangModel.hashedBucket` (Spark `conv` ≡ DuckDB
    * 0x-cast; both render the bucket id in decimal). */
  private lazy val nbHashedCte = nbCte(
    s"SELECT doc_id, lang, $nbNormDoc AS t FROM documents",
    s"SELECT doc_id, $nbNormDoc AS t FROM documents",
    "((('0x' || substr(md5(substr(t, i, 3)), 1, 8))::BIGINT % 4096)::VARCHAR)")

  /** PQ oracle preamble: float-cast unit normalization (the SQL twin of
    * `ProductQuant.normalizedVec` — `(x/‖v‖)::REAL`, zero vectors pass
    * through) plus the m=4 × subDim=16 subspace slicing that feeds the
    * grp-keyed codebook replay. */
  private lazy val pqNormCte =
    s"""pnr AS (SELECT vec_id AS id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
       |nv AS (SELECT id, CASE WHEN nrm = 0.0 THEN embedding
       |  ELSE list_transform(embedding, x -> (x::DOUBLE / nrm)::REAL) END AS nvec
       |  FROM pnr),
       |sl AS (SELECT t.j AS grp, id, list_slice(nvec, t.j * 16 + 1, t.j * 16 + 16) AS vec
       |  FROM nv, range(0, 4) t(j))""".stripMargin
}
