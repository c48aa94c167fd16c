package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for the headline queries — the
  * ".explain and iterate" artifact: broadcast placement, pushed filters,
  * codegen spans and exchange counts are all visible per round.
  * Usage: runMain graft.tools.Explain [sfDir] [outFile] */
object Explain {
  private val headline = Seq(
    "q04_star_join", "q08_anti_join", "q24_fingerprint_dedup",
    "q25_minhash_signatures", "q26_minhash_pairs", "q27_simhash",
    "q29_ann_bruteforce", "q30_ann_lsh",
    "q32_embedding_neardup", "q35_view_agent_metrics_v1",
    "q36_view_agent_metrics_v2", "q37_simhash_pairs", "q38_ann_ivf",
    "q40_chunk_overlap", "q42_stratified_sample",
    "q43_curation_audit", "q44_salted_join", "q45_sequence_packing",
    "q46_exact_quantiles", "q47_decontamination", "q48_dedup_clusters",
    "q49_conditional_merge", "q50_metrics_pivot",
    "q52_minhash_signatures_fast", "q54_simhash_fast",
    "q55_simhash_pairs_fast", "q57_ann_ivf_amortized",
    "q58_gopher_rules", "q59_line_dedup", "q60_pii_scrub",
    "q61_repetition_stats", "q62_paragraph_dedup", "q63_tfidf_terms",
    "q64_bm25_rank", "q65_range_join", "q66_unigram_logprob",
    "q67_top_ngrams", "q68_url_canonical", "q69_snapshot_diff",
    "q70_overlap_join", "q71_heavy_hitters", "q72_domain_quota",
    "q73_corpus_split", "q74_sliding_chunks", "q75_winsorize",
    "q76_bloom_semi_join", "q77_bloom_anti_join", "q78_group_sample",
    "q79_zorder_value", "q80_incremental_dedup", "q81_key_skew",
    "q82_sessionize", "q83_funnel", "q84_rolling_agg",
    "q85_table_checksum", "q86_rollup", "q87_mix_corpus",
    "q88_incremental_neardup", "q89_retention", "q90_weighted_sample",
    "q91_cube", "q92_ngram_decontaminate", "q93_classifier_score",
    "q94_blocklist_filter", "q95_semantic_prune",
    "q96_embedding_centroids", "q97_corpus_report", "q98_pagerank",
    "q99_pseudonymize", "q100_perplexity_buckets",
    "q101_standardize_embeddings", "q102_image_resize_stats",
    "q103_bpe_token_count", "q104_bpe_sequence_packing",
    "q107_audio_decode_stats", "q108_audio_resample_stats",
    "q109_repeated_spans", "q110_cut_repeated_spans",
    "q111_bpe_chunks", "q112_bpe_weighted_mix", "q113_ann_ivf_persisted",
    "q114_training_pipeline", "q115_perceptron_training",
    "q116_kmeans_distributed", "q117_pq_encode", "q118_pq_ann",
    "q119_semantic_decontaminate", "q120_training_order",
    "q121_hard_negatives", "q122_pq_ann_persisted",
    "q123_leak_safe_split", "q124_keep_best_per_cluster",
    "q125_perceptron_inference", "q126_embedding_pipeline",
    "q127_ivfpq_ann", "q128_ivfpq_persisted",
    "q129_scalar_quantize", "q130_ann_recall", "q132_ivfpq_nprobe_sweep",
    "q133_corpus_to_shards", "q134_nprobe_autotune",
    "q135_streaming_sessionize", "q136_streaming_funnel",
    "q137_streaming_heavy_hitters", "q138_ivfpq_production",
    "q139_decontaminate_scaled", "q140_bpe1k_tokens", "q141_bpe1k_mass",
    "q142_jpeg_decode", "q143_ivfpq_production_serve",
    "q144_bpe1k_quality", "q145_bpe1k_packing",
    "q146_bpe1k_token_ids", "q147_token_shards", "q148_ivfpq_100k",
    "q149_streaming_rolling", "q150_mixed_serving",
    "q151_shards_with_ids", "q152_bpe1k_roundtrip",
    "q153_ivfpq_sampled_train", "q154_incremental_shards")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append(s"# Physical plans (formatted) — $sfDir\n")
    headline.foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $q\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[explain] wrote ${headline.size} plans to $out")
    spark.stop()
  }
}
