package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N× scale smoke: replicate the sf0.1 tables (shifted keys per copy) in
  * a temp dir, run the headline queries, and report per-query scaling vs
  * the sf0.1 bench. A query scaling much worse than ~N× on N× data has a
  * superlinear bottleneck to fix. Run manually:
  *   sbt "runMain graft.tools.ScaleSmoke"                 # ×10, all
  *   SMOKE_COPIES=100 sbt "runMain graft.tools.ScaleSmoke q01_ q03_"
  *     # ×100 (~sf10, 60M lineitem), only queries matching the prefixes
  */
object ScaleSmoke {

  /** Replicate the sf0.1 tables ×`copies` (shifted keys per copy) into
    * `out` — shared by the manual smoke below and the recorded
    * [[graft.BenchScale]] artifact. */
  def replicateInto(spark: SparkSession, src: String, out: String,
                    copies: Int): Unit = {
    def replicate(table: String, keyCols: Map[String, Long]): Unit = {
      val base = if (table == "events") graft.io.Readers.parquetNanos(spark, s"$src/$table.parquet", Seq("ts"))
                 else spark.read.parquet(s"$src/$table.parquet")
      val replicated = base
        .crossJoin(spark.range(copies).withColumnRenamed("id", "__copy"))
        .select(base.columns.map { c =>
          keyCols.get(c) match {
            case Some(stride) => (col(c) + col("__copy") * stride).as(c)
            case None         => col(c)
          }
        }.toIndexedSeq: _*)
      replicated.write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    // shift the join/entity keys so copies don't collide; dims stay as-is
    replicate("lineitem", Map("l_orderkey" -> 10000000L))
    replicate("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
    replicate("customer", Map("c_custkey" -> 1000000L))
    spark.read.parquet(s"$src/part.parquet").write.mode("overwrite").parquet(s"$out/part.parquet")
    spark.read.parquet(s"$src/nation.parquet").write.mode("overwrite").parquet(s"$out/nation.parquet")
    spark.read.parquet(s"$src/region.parquet").write.mode("overwrite").parquet(s"$out/region.parquet")
    spark.read.parquet(s"$src/supplier.parquet").write.mode("overwrite").parquet(s"$out/supplier.parquet")
    replicate("events", Map("event_id" -> 100000000L, "user_id" -> 10000000L))
    replicate("documents", Map("doc_id" -> 10000000L))
    replicate("embeddings", Map("vec_id" -> 10000000L))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scale-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val out = graft.io.TempDirs.scratch("graft-sf1")
    val copies = sys.env.getOrElse("SMOKE_COPIES", "10").toInt
    replicateInto(spark, src, out, copies)
    println(s"[scale-smoke] replicated x$copies into $out")

    // events replicate wrote micro timestamps (already converted) — read plainly
    val all = Seq("q01_pricing_summary", "q03_join_agg", "q04_star_join",
      "q08_dedup_latest_order", "q15_running_total", "q17_events_hourly",
      "q18_scd2_faithful", "q21_doc_fingerprint", "q26_ngram_jaccard",
      "q27_minhash_sig", "q28_minhash_neardup", "q29_simhash",
      "q30_embed_topk", "q32_sessionize", "q34_asof_join", "q38_ivf_topk",
      "q47_lsh_buckets", "q50_scd2_merge1", "q69_dedup_clusters",
      "q83_dedup_latest_agg", "q84_tfidf_topterms", "q86_decontamination",
      "q87_semantic_neardup", "q93_doc_chunks", "q94_seq_packing",
      "q95_unigram_lm", "q96_winnow_fingerprints", "q98_ivfpq_residual",
      "q108_source_winnow_overlap", "q121_bigram_lm", "q122_pmi_collocations",
      "q124_repeated_spans", "q125_span_strip", "q126_bpe_merges",
      "q127_bpe_segment", "q128_bpe_token_counts", "q129_paragraph_neardup",
      "q131_dedup_survivors", "q132_ivf_topk_bc", "q134_semantic_bc",
      "q135_nb_langid", "q136_nb_curation", "q137_multimodal_av",
      "q138_quality_classifier", "q139_stream_classify",
      "q130_stream_ann_index", "q140_delta_roundtrip", "q141_nb_hashed",
      "q142_wav_pcm", "q143_bucket_survivors", "q144_stream_nb_train",
      "q145_delta_checkpoint", "q146_delta_foreign", "q147_delta_optimize",
      "q148_bpe_packing", "q149_video_frames", "q150_delta_stream",
      "q151_delta_skipping", "q152_delta_row_ops", "q153_delta_merge", "q154_delta_colmap", "q155_delta_dv", "q156_delta_zorder",
      "q158_delta_dv_delete", "q159_delta_source", "q160_delta_cdf",
      "q161_delta_dv_update", "q162_delta_restore", "q163_delta_rename", "q164_delta_cdf_stream",
      "q165_delta_addcol", "q166_delta_sql", "q167_sql_ddl",
      "q168_sql_merge_clauses", "q169_convert_to_delta",
      "q170_sql_catalog_names", "q171_merge_by_source",
      "q172_identity_lifecycle", "q173_iceberg_read",
      "q174_iceberg_evolution", "q175_delta_clustered",
      "q176_iceberg_pruned", "q177_sql_federation", "q178_row_tracking",
      "q179_iceberg_partitioned", "q180_sql_row_tracking",
      "q181_iceberg_day_partition", "q182_iceberg_bucket",
      "q183_sql_merge_row_tracking", "q184_uniform_lifecycle",
      "q185_uniform_partitioned", "q186_iceberg_v3_dv", "q187_iceberg_row_lineage",
      "q188_drop_feature", "q189_column_defaults",
      "q190_iceberg_write", "q191_iceberg_stream", "q192_iceberg_sink", "q193_iceberg_write_partitioned", "q194_iceberg_delete", "q195_iceberg_write_evolution",
      "q196_iceberg_maintenance", "q197_iceberg_upsert",
      "q198_iceberg_sql_dml", "q199_iceberg_bucket_write",
      "q200_iceberg_eq_delete", "q201_iceberg_dv_delete",
      "q202_iceberg_rollback", "q203_iceberg_meta_tables",
      "q204_iceberg_multi_partition", "q205_iceberg_named_sql",
      "q206_iceberg_changelog", "q207_iceberg_lineage_native", "q208_iceberg_zorder", "q209_iceberg_stats", "q210_iceberg_upsert_stream", "q211_iceberg_partition_stats", "q212_stream_dedup", "q213_lineage_changelog", "q214_lineage_replication",
      "q215_iceberg_defaults", "q216_iceberg_wap", "q217_changelog_rollback",
      "q218_html_blocks", "q219_html_extract", "q220_iceberg_cherrypick",
      "q221_branch_stream", "q222_html_refine", "q223_warc_extract",
      "q224_warc_stream", "q225_url_dedup", "q226_robots_filter",
      "q227_robots_wildcards", "q228_warc_framed", "q229_extract_lang",
      "q230_url_normalize", "q231_corpus_front_door", "q232_crawl_schedule",
      "q233_wet_roundtrip", "q234_crawl_frontier")
    val headline =
      if (args.isEmpty) all else all.filter(n => args.exists(n.startsWith))
    spark.range(1000).selectExpr("sum(id)").collect()
    val ticksBefore = HostTelemetry.cpuTicks()
    headline.foreach { name =>
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, out).count()
        println(f"[scale-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch {
        case e: Throwable => println(s"[scale-smoke] $name FAILED: ${e.getMessage.take(120)}")
      }
    }
    // contention telemetry over the whole timed sweep — same fields as
    // the Bench JSON, so a contended host is visible in the smoke log
    println(s"[scale-smoke] host {${HostTelemetry.deltaJson(ticksBefore, HostTelemetry.cpuTicks())}}")
    spark.stop()
  }
}
