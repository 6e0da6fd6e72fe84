package graft

import graft.functions.{MinHash, SimHash, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Curation, Dedup, Multimodal, Similarity}
import graft.ops.{Scd2, StarSchema}
import graft.pipeline.FixedClock
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from
  * SURVEY.md §2 (or one of the LLM-pipeline extensions) through the graft
  * library, and [[oracleSql]] carries the equivalent DuckDB SQL. Column
  * names are aligned between both sides; computed doubles either mirror the
  * exact fp expression tree (per-row math) or are rounded (shuffled
  * aggregates, where summation order is nondeterministic in any engine).
  */
object SparkEntry extends QueriesRelational with QueriesPipeline
    with QueriesScaleOps with QueriesIndexStream {


  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q04StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_join_agg" -> (q03 _),
    "q04_star_join" -> (q04StarJoin _),
    "q05_anti_join" -> (q05 _),
    "q06_semi_join" -> (q06 _),
    "q07_distinct" -> (q07 _),
    "q08_dedup_latest_order" -> (q08 _),
    "q09_union_buckets" -> (q09 _),
    "q10_surrogate_keys" -> (q10 _),
    "q11_fill_none" -> (q11 _),
    "q12_clean_strings" -> (q12 _),
    "q13_split_parts" -> (q13 _),
    "q14_ts_format_quirk" -> (q14 _),
    "q15_running_total" -> (q15 _),
    "q16_topn_per_brand" -> (q16 _),
    "q17_events_hourly" -> (q17 _),
    "q18_scd2_faithful" -> (q18 _),
    "q19_conditional_agg" -> (q19 _),
    "q20_rollup" -> (q20 _),
    "q21_doc_fingerprint" -> (q21 _),
    "q22_exact_dedup" -> (q22 _),
    "q23_token_stats" -> (q23 _),
    "q24_quality_score" -> (q24 _),
    "q25_lang_id" -> (q25 _),
    "q26_ngram_jaccard" -> (q26 _),
    "q27_minhash_sig" -> (q27 _),
    "q28_minhash_neardup" -> (q28 _),
    "q29_simhash" -> (q29 _),
    "q30_embed_topk" -> (q30 _),
    "q31_embed_neardup" -> (q31 _),
    "q32_sessionize" -> (q32 _),
    "q33_multimodal_meta" -> (q33 _),
    "q34_asof_join" -> (q34 _),
    "q35_percentile" -> (q35 _),
    "q36_count_distinct" -> (q36 _),
    "q37_top_tokens" -> (q37 _),
    "q38_ivf_topk" -> (q38 _),
    "q39_cube" -> (q39 _),
    "q40_edit_distance" -> (q40 _),
    "q41_dropna" -> (q41 _),
    "q42_rlike_filter" -> (q42 _),
    "q43_left_join" -> (q43 _),
    "q44_frame_sample" -> (q44 _),
    "q45_approx_sketches" -> (q45 _),
    "q46_stream_hourly" -> (q46 _),
    "q47_lsh_buckets" -> (q47 _),
    "q48_csv_roundtrip" -> (q48 _),
    "q49_corpus_filter" -> (q49 _),
    "q50_scd2_merge1" -> (q50 _),
    "q51_salted_join" -> (q51 _),
    "q52_pivot" -> (q52 _),
    "q53_unpivot" -> (q53 _),
    "q54_set_ops" -> (q54 _),
    "q55_rank_funcs" -> (q55 _),
    "q56_json_roundtrip" -> (q56 _),
    "q57_stream_join" -> (q57 _),
    "q58_stream_sessions" -> (q58 _),
    "q59_pii_redact" -> (q59 _),
    "q60_hash_split" -> (q60 _),
    "q61_quantize_int8" -> (q61 _),
    "q62_orc_roundtrip" -> (q62 _),
    "q63_stratified_sample" -> (q63 _),
    "q64_rolling_window" -> (q64 _),
    "q65_sessions_tws" -> (q65 _),
    "q66_json_props" -> (q66 _),
    "q67_bloom_join" -> (q67 _),
    "q68_kmeans_ivf" -> (q68 _),
    "q69_dedup_clusters" -> (q69 _),
    "q70_gap_fill" -> (q70 _),
    "q71_curation_pipeline" -> (q71 _),
    "q72_variant_props" -> (q72 _),
    "q73_asof_forward" -> (q73 _),
    "q74_incremental_agg" -> (q74 _),
    "q75_source_mixing" -> (q75 _),
    "q76_source_overlap" -> (q76 _),
    "q77_json_quarantine" -> (q77 _),
    "q78_schema_evolution" -> (q78 _),
    "q79_corr_subquery" -> (q79 _),
    "q80_grouping_sets" -> (q80 _),
    "q81_stream_availablenow" -> (q81 _),
    "q82_bucketed_star" -> (q82 _),
    "q83_dedup_latest_agg" -> (q83 _),
    "q84_tfidf_topterms" -> (q84 _),
    "q85_repetition_filter" -> (q85 _),
    "q86_decontamination" -> (q86 _),
    "q87_semantic_neardup" -> (q87 _),
    "q88_scd2_partitioned" -> (q88 _),
    "q89_table_profile" -> (q89 _),
    "q90_pq_codes" -> (q90 _),
    "q91_ivfpq_topk" -> (q91 _),
    "q92_stream_scd2" -> (q92 _),
    "q93_doc_chunks" -> (q93 _),
    "q94_seq_packing" -> (q94 _),
    "q95_unigram_lm" -> (q95 _),
    "q96_winnow_fingerprints" -> (q96 _),
    "q97_zorder_value" -> (q97 _),
    "q98_ivfpq_residual" -> (q98 _),
    "q99_filtered_ann" -> (q99 _),
    "q100_stream_dedup" -> (q100 _),
    "q101_range_join" -> (q101 _),
    "q102_table_diff" -> (q102 _),
    "q103_zonemap_scan" -> (q103 _),
    "q104_heavy_hitters" -> (q104 _),
    "q105_histogram" -> (q105 _),
    "q106_hll_union" -> (q106 _),
    "q107_incr_star_agg" -> (q107 _),
    "q108_source_winnow_overlap" -> (q108 _),
    "q109_weighted_sample" -> (q109 _),
    "q110_stream_incr_agg" -> (q110 _),
    "q111_pack_offsets" -> (q111 _),
    "q112_zorder3" -> (q112 _),
    "q113_binaryfile_scan" -> (q113 _),
    "q114_stream_static_join" -> (q114 _),
    "q115_sql_zorder" -> (q115 _),
    "q116_session_window" -> (q116 _),
    "q117_dpp_join" -> (q117 _),
    "q118_priority_dedup" -> (q118 _),
    "q119_curriculum_bins" -> (q119 _),
    "q120_token_truncate" -> (q120 _),
    "q121_bigram_lm" -> (q121 _),
    "q122_pmi_collocations" -> (q122 _),
    "q123_hard_negatives" -> (q123 _),
    "q124_repeated_spans" -> (q124 _),
    "q125_span_strip" -> (q125 _),
    "q126_bpe_merges" -> (q126 _),
    "q127_bpe_segment" -> (q127 _),
    "q128_bpe_token_counts" -> (q128 _),
    "q129_paragraph_neardup" -> (q129 _),
    "q130_stream_ann_index" -> (q130 _),
    "q131_dedup_survivors" -> (q131 _),
    "q132_ivf_topk_bc" -> (q132 _),
    "q133_kmeans_bc" -> (q133 _),
    "q134_semantic_bc" -> (q134 _),
    "q135_nb_langid" -> (q135 _),
    "q136_nb_curation" -> (q136 _),
    "q137_multimodal_av" -> (q137 _),
    "q138_quality_classifier" -> (q138 _),
    "q139_stream_classify" -> (q139 _),
    "q140_delta_roundtrip" -> (q140 _),
    "q141_nb_hashed" -> (q141 _),
    "q142_wav_pcm" -> (q142 _),
    "q143_bucket_survivors" -> (q143 _),
    "q144_stream_nb_train" -> (q144 _),
    "q145_delta_checkpoint" -> (q145 _),
    "q146_delta_foreign" -> (q146 _),
    "q147_delta_optimize" -> (q147 _),
    "q148_bpe_packing" -> (q148 _),
    "q149_video_frames" -> (q149 _),
    "q150_delta_stream" -> (q150 _),
    "q151_delta_skipping" -> (q151 _)
  )

  // ───────────────────────── DuckDB oracle SQL ──────────────────────────
  // The oracle registry lives in graft.OracleSql (one file per concern:
  // query builders here, DuckDB replay SQL there).

  def oracleSql: Map[String, String] = OracleSql.all
}
