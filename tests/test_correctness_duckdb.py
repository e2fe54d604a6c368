"""Driver-style correctness gate: each Ray query vs its DuckDB oracle.

Mirrors what the round driver does at sf0.01 (here at sf0.001 so the
suite stays fast): run the Ray pipeline AND the oracle SQL, then compare
row counts, column names and order-insensitive values.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        else:
            df[c] = df[c].astype(object).where(df[c].notna(), None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERY_NAMES = [
    "parse_3164",
    "parse_5424",
    "severity_counts",
    "conv_counts",
    "conv_error_rate",
    "conv_assemble",
    "conv_windows",
    "assistant_spans",
    "parse_errors",
    "route_sinks",
    "enrich_route",
    "hourly_traffic",
    "traffic_rollup",
    "host_traffic",
    "dedup_exact",
    "dedup_incremental",
    "render_3164",
    "repetition",
    "stratified_sample",
    "sample_k_per_lang",
    "token_budget_sample",
    "domain_mix",
    "decontaminate",
    "decontam_survivors",
    "contamination_report",
    "dup_spans",
    "top_docs_by_lang",
    "distinct_users_by_type",
    "shuffle_shards",
    "quality_filter",
    "length_band_filter",
    "curation",
    "pack_sequences",
    "pack_assemble",
    "token_quantiles_by_lang",
    # r5 rows-only promotions (lossless-at-this-scale KLL rule /
    # frozen-hyperplane LSH literals)
    "approx_quantiles",
    "approx_quantiles_by_lang",
    "cosine_dups_lsh",
    # r5 new operators
    "severity_runs",
    "conv_first_error",
    "tag_top_hosts",
    "daily_new_users",
    "sole_late_supplier",
    "forecast_revenue",
    "late_shipments",
    "dominant_suppliers",
    "quiet_days",
    "host_peak_hour",
    "value_streaks",
    "order_totals_check",
    "vocab_by_lang",
    "bigram_pmi",
    "turn_latency_hist",
    "biggest_order_per_customer",
    "user_activity_span",
    "source_quality_profile",
    "trimmed_mean_value",
    "segment_nation_lift",
    "peak_active_users",
    "value_minmax_scaled",
    "daily_type_matrix",
    "content_len_by_tag",
    "table_freshness",
    "rolling_max",
    "first_number",
    "length_neighbor",
    "monthly_active_customers",
    "tool_usage",
    "supplier_balance_pctrank",
    "value_ecdf_probes",
    "ship_latency_quantiles",
    "top_value_events_per_type",
    "region_nation_rollup",
    "conv_rfc_mix",
    "idle_users",
    "conv_role_balance",
    "customer_rfm",
    "brand_return_rate",
    "conv_severity_drift",
    "embedding_norms",
    "doc_top_token",
    "prefix_blocking_stats",
    "conv_max_gap",
    "role_alternation",
    "weighted_sample",
    "levenshtein_pairs",
    "supplier_balance_rank",
    "value_median_cont",
    "conv_severity_entropy",
    "value_quartiles_by_type",
    "event_throttle",
    "dataset_split",
    "dedup_simhash",
    "dedup_minhash_keep",
    "event_inversions",
    "tf_idf",
    "inverted_index",
    "bm25_search",
    "bm25_search_incr",
    "fielded_search",
    "phrase_search",
    "redact_pii",
    "top_ngrams",
    "approx_top_ngrams",
    "doc_freq",
    "text_quality",
    "token_counts",
    "normalize_text",
    "lang_id",
    "dedup_minhash",
    "dup_clusters",
    "dedup_survivors_cc",
    "dedup_survivors_best",
    "ngram_jaccard",
    "ann_topk",
    "embed_kmeans",
    "diverse_sample_per_cluster",
    "cluster_profile",
    "embed_dedup_cc",
    "lm_score",
    "ann_ivf",
    "ann_ivf_incr",
    "cosine_dups_ivf",
    "cosine_dups",
    "events_filtered",
    "asof_attribution",
    "asof_attribution_partitioned",
    "price_bands",
    "value_quantiles",
    "events_funnel",
    "props_stats",
    "events_tumbling",
    "events_sessionize",
    "events_sessionize_partitioned",
    "events_sliding",
    "lineitem_pricing",
    "top_customers",
    "mktsegment_revenue",
    "regional_revenue",
    "order_priority",
    "cust_order_dist",
    "promo_revenue",
    "returned_top_customers",
    "large_orders",
    "brand_supplier_counts",
    "idle_customers",
    "ship_latency",
    "event_gaps",
    "co_purchase_pairs",
    "lang_quartiles",
    "rolling_avg",
    "drop_reconcile",
    "events_cube",
    "event_pivot",
    "above_avg_orders",
    "triangle_count",
    "rolling_time",
    "value_variance",
    "last_event_per_user",
    "dominant_event_type",
    "value_histogram",
    "nation_trade_volume",
    "user_retention",
    "top_open_orders",
    "special_deal_revenue",
    "user_value_running",
    "distinct_parts_by_supplier",
    "page_rank",
    "min_cost_supplier",
    "nation_market_share",
    "important_parts",
    "quantity_price_corr",
    "event_transitions",
    "co_purchase_degree",
    "customer_spend_pctile",
    "product_profit",
    "top_supplier",
    "small_qty_revenue",
    "monthly_growth",
    "doc_length_zscore",
    "action_trigrams",
    "customers_per_supplier",
    "full_coverage_suppliers",
    "part_skyline",
    "order_value_deciles",
    "repeat_order_share",
    "value_mad_by_type",
    "cohort_revenue",
    "weekday_profile",
    "keyword_hits",
    "user_event_sets",
    "rolling_dau",
    "followed_within",
    "hybrid_search",
    "weighted_median_price",
    "conversion_delay",
    "customer_spend_deciles",
    "order_linecount_hist",
    "traffic_anomaly_days",
    "lang_confusion",
    "dup_rate_by_source",
    "order_gap_median_hist",
    "session_length_hist",
    "session_duration_hist",
    "turn_dup_stats",
    # r5 session 8
    "log_templates",
    "procid_churn",
    "conv_ffill_severity",
    "maintenance_windows",
    "daily_autocorr",
    # r5 session 9
    "sd_params",
    "wow_traffic",
    "user_type_profile",
    "time_weighted_value",
    "value_gini",
    "host_handoffs",
    "value_trend_by_type",
    "type_dow_independence",
    "basket_rules",
    "embedding_dim_range",
    "session_type_pairs",
    "token_gini_by_lang",
    "conv_tool_path",
    "top_events_with_ties",
    "embedding_argmax",
    "df_split_drift",
    "value_percent_rank_global",
    "nation_customer_hhi",
    "type_traffic_similarity",
    "value_drift_ks",
    "user_day_streaks",
    "price_benford",
    "value_collision_stats",
    "conv_reply_latency_by_role",
    "value_drift_wasserstein",
    "value_mode",
    "null_profile",
]

ROWS_ONLY = ["doc_fingerprint",
             "media_features", "approx_distinct"]


@pytest.fixture(scope="module")
def query_results(ray_session):
    import duckdb

    import __ray_entry__ as entrymod
    from rayslog.sqloracle import oracle_queries, training_oracle_queries

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    sqls = {**oracle_queries(SF_DIR), **training_oracle_queries(SF_DIR)}
    out = {}
    for name in QUERY_NAMES:
        ray_df = qs[name](SF_DIR).to_pandas()
        sql_df = con.sql(sqls[name]).df()
        out[name] = (ray_df, sql_df)
    for name in ROWS_ONLY:
        res = qs[name](SF_DIR)
        out[name] = (res.to_pandas() if hasattr(res, "to_pandas") else res, None)
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(query_results, name):
    ray_df, sql_df = query_results[name]
    assert sorted(ray_df.columns) == sorted(sql_df.columns), name
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    # Driver hashes TYPED values: an int64 engine column vs a float64
    # oracle column (DuckDB HUGEINT sums surface as float64) mismatches
    # even when values are equal (round-3 pack_sequences red row).
    # Catch it here — kinds must agree unless the float side is merely
    # null-forced (an all-finite float64 vs int64 is a real type bug).
    for c in ray_df.columns:
        ka = ray_df[c].dtype.kind
        kb = sql_df[c].dtype.kind
        if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
            fcol = ray_df[c] if ka == "f" else sql_df[c]
            assert fcol.isna().any(), (
                name, c, ka, kb, "int/float kind mismatch not due to nulls")
    a = _normalize(ray_df)
    b = _normalize(sql_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(query_results, name):
    ray_df, _ = query_results[name]
    assert ray_df is not None
    assert len(ray_df.columns) > 0
