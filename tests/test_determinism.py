"""Cross-partitioning determinism: the same query at different
`spark.sql.shuffle.partitions` must produce identical results — catches
order-dependent aggregation, nondeterministic tie-breaks, and
partition-count leakage. (Datagen has its own golden check; this covers
the round-2 operator entries end-to-end.)"""

from __future__ import annotations

import pytest

from gpu_bdb_spark.queries.registry import all_specs

from .conftest import assert_frames_match

QUERIES = [
    "asof_join_last_view",
    "range_join_windows",
    "hypertable_rollup_events",
    "funnel_join_batch",
    "curation_pipeline",
    "dedup_clusters",
    "dedup_minhash_lsh",
    # round-3 entries
    "dedup_clusters_star",
    "decontaminate",
    "repetition_stats",
    "profile_orders",
    "histogram_prices",
    # round-4 entries
    "shard_export",
    "tfidf_keywords",
    "winnow_fingerprints",
    "winnow_reuse_pairs",
    "chunk_documents",
    "unigram_nll",
    "per_group_sample",
    "dedup_incremental",
    "semantic_dedup",
    "winnow_containment",
    "source_overlap",
    "domain_repeat_plan",
    "corpus_diff",
    # round-5 entries
    "char_entropy",
    "leakage_safe_split",
    "diversity_sample_fps",
    "pagerank_neardup",
    "winnow_positions",
    "bpe_learn_merges",
    "bpe_encode_docs",
    "bigram_lm",
    "minhash_portable",
    "shard_roundtrip_pyds",
    "corpus_health",
    "project_embeddings_srp",
    "winnow_positions_robust",
    "quantile_bins",
    "gapfill_locf_events",
    "sentence_explode_udtf",
    "quantile_bins_approx",
    "variant_props",
    "zorder_keys",
    "upsert_roundtrip",
    "normalize_unicode",
    "weighted_sample",
    # round-6 entries
    "cohort_retention",
    "event_transitions",
    "decayed_engagement",
    "inverted_index",
    "cooccurrence_pmi",
    "fuzzy_name_pairs",
    "triangle_count_parts",
    "hard_negatives",
    "random_walks_parts",
    "hybrid_search_rrf",
    "rolling_user_24h",
    "cms_user_counts",
    "ab_test_conversion",
    "delete_roundtrip",
    "frequent_triples",
    "outliers_mad",
    "label_centroids",
    "mask_tokens_mlm",
    "association_rules",
    "scd2_intervals",
    "media_decode_stats",
    "ordered_funnel",
    "chi_square_lang_source",
    "user_360",
    "attribution_linear",
    # round-7 entries
    "remove_boilerplate",
    "jaccard_join_prefix",
    "rfm_segments",
    "frequent_sequences",
    "time_weighted_avg",
    "mutual_knn",
    "session_paths",
    "rolling_zscore",
    "skew_report",
    "conversion_lag",
    "new_vs_returning",
    "expanding_zscore",
    "robust_scale",
    "traffic_heatmap",
    "spend_cume_dist",
    "interpurchase_time",
    "pareto_share",
    "dedup_lsh_verified",
    "diversity_sample_parallel",
    "ner_orgs",
    "ks_test",
    "dsir_select",
    "phrase_search",
    "embedding_gram",
    "pca_power",
    "grouping_sets_orders",
    "unpivot_metrics",
    "except_all_parts",
    "intersect_all_parts",
    "psi_drift",
    "ols_price_model",
    "item_cf_topk",
    "kcore_parts",
    "m4_downsample",
    "weighted_median_price",
    "concurrency_curve",
    "bloom_filter_probe",
    "target_encode",
    "calibration_bins",
    "bmp_decode_stats",
    "wav_decode_stats",
    "recursive_reachability",
    "gini_spend",
    "ewma_daily_revenue",
    "dq_report",
    "pinball_loss",
    "mom_growth",
    "auc_exact",
    "cohort_ltv",
    "simhash_portable",
    "benford_check",
    "kmv_set_ops",
    "survival_km",
    "cusum_changepoint",
    # round-9/10 entries
    "view_then_purchase_windowed",
    "jaccard_lsh_verified",
    "dedup_clusters_lsh",
    "dedup_spans",
    "decontaminate_spans",
    "holt_trend_daily",
    "seasonal_decompose_daily",
    "sprt_conversion",
    # round-12 entries
    "view_then_purchase_auto",
    # round-13 entries
    "range_join_auto",
    "simhash_pairs_auto",
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_independent_of_shuffle_partitions(name, spark, sf_dir):
    spec = all_specs()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = spec.fn(spark, sf_dir).toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = spec.fn(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert_frames_match(a, b, name=name)
