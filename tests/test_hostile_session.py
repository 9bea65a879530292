"""The driver builds its OWN SparkSession with arbitrary confs; every
registered query must still match its oracle because the registry wrapper
applies `ensure_runtime_conf` at call time. This simulates the worst
realistic session — non-UTC time zone + ANSI mode on — against the
timestamp-heaviest entries and asserts the oracles still match.
(The manual probe in .claude/skills/verify/SKILL.md, pinned as a test.)"""

from __future__ import annotations

import pytest

from gpu_bdb_spark.queries.registry import all_specs

from .conftest import assert_frames_match

QUERIES = [
    "asof_join_last_view",
    "range_join_windows",
    "hypertable_rollup_events",
    "sessionize_events",
    "date_buckets",
    "session_window_batch",
    # round-3: star CC's set-signature sum overflowed long under ANSI
    # until cast to decimal — keep these pinned under a hostile session
    "dedup_clusters_star",
    "decontaminate",
    "profile_orders",
    # round-4 entries: ln/round/conv arithmetic and hash ranking must be
    # tz/ANSI-independent too
    "tfidf_keywords",
    "unigram_nll",
    "winnow_fingerprints",
    "shard_export",
    "chunk_documents",
    # round-5: iterative decimal accumulation (pagerank), md5-threshold
    # split, ln-based entropy — all must be tz/ANSI-independent
    "pagerank_neardup",
    "leakage_safe_split",
    "char_entropy",
    "diversity_sample_fps",
    "bigram_lm",
    "minhash_portable",
    "project_embeddings_srp",
    "corpus_health",
    "winnow_positions",
    # gapfill buckets epoch micros — the #1 tz-sensitive shape;
    # zorder/upsert/weighted/udtf pin the round-5 long tail
    "gapfill_locf_events",
    "zorder_keys",
    "upsert_roundtrip",
    "weighted_sample",
    "sentence_explode_udtf",
    "quantile_bins",
    # round-6: cohort/decay bucket epoch micros and datediff (tz-shape),
    # transitions order by timestamp, pmi has an edge ln under ANSI
    "cohort_retention",
    "event_transitions",
    "decayed_engagement",
    "cooccurrence_pmi",
    "inverted_index",
    "fuzzy_name_pairs",
    "triangle_count_parts",
    "random_walks_parts",
    "hybrid_search_rrf",
    "rolling_user_24h",
    "cms_user_counts",
    "ab_test_conversion",
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
    # round-7: twa/rfm/sequences order by epoch micros (tz-shape);
    # boilerplate + jaccard pin string segmentation under ANSI
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

HOSTILE = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.ansi.enabled": "true",
}


@pytest.mark.parametrize("name", QUERIES)
def test_query_survives_hostile_session_confs(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    saved = {k: spark.conf.get(k) for k in HOSTILE}
    try:
        for k, v in HOSTILE.items():
            spark.conf.set(k, v)
        got = spec.fn(spark, sf_dir).toPandas()
        # the wrapper must have reset the runtime confs for the query...
        expect = duck.execute(spec.oracle).df()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    # ...and the post-call session state doesn't matter for the compare
    for df in (got, expect):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
    assert_frames_match(got, expect, name=name)
