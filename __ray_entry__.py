"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→aggregate pipeline at
sf0.001; ``queries()`` exposes one callable per implemented pipeline
(each takes ``sf_dir``); ``oracle_sql()`` returns the equivalent DuckDB
SQL.  The syslog pipelines run over the deterministic synthetic
transcripts table (BASELINE.json input_hint) generated under
/tmp/rayslog_data/<sf>/ — both the Ray queries and the oracle SQL read
the same parquet file, so the comparison is apples-to-apples.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from rayslog import pipeline

    return pipeline.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rayslog import pipeline as p

    # ORDER MATTERS: the round driver oracle-checks only the FIRST 50
    # entries.  Layout (see CLAUDE.md "driver window rotation"):
    #   1-12   north-rule syslog set (always in-window)
    #   13-50  oracle-backed queries never driver-checked (r4-new ones
    #          prioritized) or longest-unchecked
    #   51-99  remaining oracle-backed (fell out this rotation; rotate
    #          them in over r5)
    #   100-   rows-only entries (can never earn a hash row) — always last
    return {
        # --- north rule: syslog parse -> enrich -> route -> aggregate ---
        # (pinned slots 1-12, every round)
        "parse_3164": p.q_parse_3164,
        "parse_5424": p.q_parse_5424,
        "severity_counts": p.q_severity_counts,
        "conv_counts": p.q_conv_counts,
        "conv_error_rate": p.q_conv_error_rate,
        "conv_assemble": p.q_conv_assemble,
        "parse_errors": p.q_parse_errors,
        "route_sinks": p.q_route_sinks,
        "enrich_route": p.q_enrich_route,
        "hourly_traffic": p.q_hourly_traffic,
        "traffic_rollup": p.q_traffic_rollup,
        "host_traffic": p.q_host_traffic,
        # --- slots 13-50: the never-driver-checked oracle-backed set ---
        # (r5 rotation: all 38 slots go to session-4/5 operators that have
        #  never earned a CORRECTNESS row; all preflight-green at sf0.01)
        "top_open_orders": p.q_top_open_orders,
        "special_deal_revenue": p.q_special_deal_revenue,
        "user_value_running": p.q_user_value_running,
        "distinct_parts_by_supplier": p.q_distinct_parts_by_supplier,
        "page_rank": p.q_page_rank,
        "min_cost_supplier": p.q_min_cost_supplier,
        "nation_market_share": p.q_nation_market_share,
        "important_parts": p.q_important_parts,
        "quantity_price_corr": p.q_quantity_price_corr,
        "event_transitions": p.q_event_transitions,
        "co_purchase_degree": p.q_co_purchase_degree,
        "customer_spend_pctile": p.q_customer_spend_pctile,
        "product_profit": p.q_product_profit,
        "top_supplier": p.q_top_supplier,
        "small_qty_revenue": p.q_small_qty_revenue,
        "monthly_growth": p.q_monthly_growth,
        "doc_length_zscore": p.q_doc_length_zscore,
        "action_trigrams": p.q_action_trigrams,
        "full_coverage_suppliers": p.q_full_coverage_suppliers,
        "part_skyline": p.q_part_skyline,
        "order_value_deciles": p.q_order_value_deciles,
        "repeat_order_share": p.q_repeat_order_share,
        "value_mad_by_type": p.q_value_mad_by_type,
        "cohort_revenue": p.q_cohort_revenue,
        "weekday_profile": p.q_weekday_profile,
        "keyword_hits": p.q_keyword_hits,
        "user_event_sets": p.q_user_event_sets,
        "rolling_dau": p.q_rolling_dau,
        "followed_within": p.q_followed_within,
        "hybrid_search": p.q_hybrid_search,
        "weighted_median_price": p.q_weighted_median_price,
        "conversion_delay": p.q_conversion_delay,
        "customer_spend_deciles": p.q_customer_spend_deciles,
        "order_linecount_hist": p.q_order_linecount_hist,
        "traffic_anomaly_days": p.q_traffic_anomaly_days,
        "session_length_hist": p.q_session_length_hist,
        "session_duration_hist": p.q_session_duration_hist,
        "turn_dup_stats": p.q_turn_dup_stats,
        # ---------------- driver window ends here (50) ----------------
        # --- session-6 (r5) additions: oracle-backed, preflight-green ---
        # (new this round, after the rotation window was already filled
        #  with the older never-checked set)
        "severity_runs": p.q_severity_runs,
        "conv_first_error": p.q_conv_first_error,
        "tag_top_hosts": p.q_tag_top_hosts,
        "daily_new_users": p.q_daily_new_users,
        "sole_late_supplier": p.q_sole_late_supplier,
        "role_alternation": p.q_role_alternation,
        "weighted_sample": p.q_weighted_sample,
        "levenshtein_pairs": p.q_levenshtein_pairs,
        "supplier_balance_rank": p.q_supplier_balance_rank,
        "value_median_cont": p.q_value_median_cont,
        "conv_severity_entropy": p.q_conv_severity_entropy,
        "value_quartiles_by_type": p.q_value_quartiles_by_type,
        "event_throttle": p.q_event_throttle,
        "dataset_split": p.q_dataset_split,
        "dedup_simhash": p.q_dedup_simhash,  # promoted r5: frozen-signature oracle
        "dedup_minhash_keep": p.q_dedup_minhash_keep,  # promoted r5: frozen band-hash oracle
        "event_inversions": p.q_event_inversions,  # r5: vectorized mergesort counter
        # --- session-7 (r5) additions: oracle-backed ---
        "forecast_revenue": p.q_forecast_revenue,  # TPC-H Q6 shape
        "late_shipments": p.q_late_shipments,  # Q12-adapted
        "dominant_suppliers": p.q_dominant_suppliers,  # Q20-adapted
        "quiet_days": p.q_quiet_days,  # calendar-spine anti-join
        "host_peak_hour": p.q_host_peak_hour,  # north-rule argmax-per-group
        "value_streaks": p.q_value_streaks,  # islands: increasing runs
        "order_totals_check": p.q_order_totals_check,  # money reconciliation
        "vocab_by_lang": p.q_vocab_by_lang,  # exact distinct tokens per lang
        "bigram_pmi": p.q_bigram_pmi,  # collocations: top-20 + exact PMI
        "turn_latency_hist": p.q_turn_latency_hist,  # north-rule LAG deltas
        "biggest_order_per_customer": p.q_biggest_order_per_customer,
        "user_activity_span": p.q_user_activity_span,  # profile build
        "source_quality_profile": p.q_source_quality_profile,
        "trimmed_mean_value": p.q_trimmed_mean_value,  # p5-p95 robust mean
        "segment_nation_lift": p.q_segment_nation_lift,  # contingency lift
        "peak_active_users": p.q_peak_active_users,  # interval sweep
        "value_minmax_scaled": p.q_value_minmax_scaled,  # feature scaling
        "daily_type_matrix": p.q_daily_type_matrix,  # dense spine x type
        "content_len_by_tag": p.q_content_len_by_tag,  # north-rule quantiles
        "table_freshness": p.q_table_freshness,  # multi-table audit
        "rolling_max": p.q_rolling_max,  # frame-window sliding max
        "first_number": p.q_first_number,  # typed regex extraction
        "length_neighbor": p.q_length_neighbor,  # sorted-adjacency 1-NN
        "monthly_active_customers": p.q_monthly_active_customers,  # MAU
        "tool_usage": p.q_tool_usage,  # north-rule per-tool error rate
        "supplier_balance_pctrank": p.q_supplier_balance_pctrank,
        "value_ecdf_probes": p.q_value_ecdf_probes,  # calibration curve
        "ship_latency_quantiles": p.q_ship_latency_quantiles,  # join+CDF
        "top_value_events_per_type": p.q_top_value_events_per_type,
        "region_nation_rollup": p.q_region_nation_rollup,  # ROLLUP
        "conv_rfc_mix": p.q_conv_rfc_mix,  # north-rule dialect profile
        "idle_users": p.q_idle_users,  # time-threshold churn audit
        "conv_role_balance": p.q_conv_role_balance,  # raw-table ratio
        "customer_rfm": p.q_customer_rfm,  # RFM feature build
        "brand_return_rate": p.q_brand_return_rate,
        "conv_severity_drift": p.q_conv_severity_drift,  # escalation audit
        "embedding_norms": p.q_embedding_norms,  # sequential-fold floats
        "doc_top_token": p.q_doc_top_token,  # per-doc argmax token
        "prefix_blocking_stats": p.q_prefix_blocking_stats,  # blocking audit
        "conv_max_gap": p.q_conv_max_gap,  # worst inter-turn latency
        "log_templates": p.q_log_templates,  # digit-masked template mining
        "procid_churn": p.q_procid_churn,  # restart audit (5424)
        "conv_ffill_severity": p.q_conv_ffill_severity,  # IGNORE-NULLS ffill
        "maintenance_windows": p.q_maintenance_windows,  # range join
        "daily_autocorr": p.q_daily_autocorr,  # lag-1 autocorrelation
        "sd_params": p.q_sd_params,  # 5424 STRUCTURED-DATA introspection
        "wow_traffic": p.q_wow_traffic,  # calendar-shifted self-join
        "user_type_profile": p.q_user_type_profile,  # set-agg to string
        "time_weighted_value": p.q_time_weighted_value,  # ordered fold
        "value_gini": p.q_value_gini,  # sort-free ranked-sum identity
        "host_handoffs": p.q_host_handoffs,  # north-rule transition graph
        "value_trend_by_type": p.q_value_trend_by_type,  # grouped OLS
        "type_dow_independence": p.q_type_dow_independence,  # chi2 cells
        "basket_rules": p.q_basket_rules,  # confidence/lift mining
        "embedding_dim_range": p.q_embedding_dim_range,  # drift screen
        "session_type_pairs": p.q_session_type_pairs,  # sessionized basket
        "token_gini_by_lang": p.q_token_gini_by_lang,  # corpus balance
        "conv_tool_path": p.q_conv_tool_path,  # first-use tool journey
        "top_events_with_ties": p.q_top_events_with_ties,  # DENSE_RANK<=k
        "embedding_argmax": p.q_embedding_argmax,  # dominant dimension
        "df_split_drift": p.q_df_split_drift,  # train/holdout vocab skew
        "value_percent_rank_global": p.q_value_percent_rank_global,
        "nation_customer_hhi": p.q_nation_customer_hhi,  # concentration
        "type_traffic_similarity": p.q_type_traffic_similarity,  # wJaccard
        "value_drift_ks": p.q_value_drift_ks,  # exact integer-sup KS
        "user_day_streaks": p.q_user_day_streaks,  # gaps-and-islands
        "price_benford": p.q_price_benford,  # exact-digit Benford screen
        "value_collision_stats": p.q_value_collision_stats,  # birthday mass
        "conv_reply_latency_by_role": p.q_conv_reply_latency_by_role,
        "value_drift_wasserstein": p.q_value_drift_wasserstein,
        "value_mode": p.q_value_mode,  # global exact mode, min-tie
        "null_profile": p.q_null_profile,  # whole-lake null audit
        # --- oracle-backed, driver-green in r1-r4, out of rotation ---
        # (plus 7 never-checked leftovers: brand_supplier_counts,
        #  idle_customers, ship_latency, lang_confusion, dup_rate_by_source,
        #  customers_per_supplier, order_gap_median_hist — transitively
        #  evidenced by driver-checked cousins + scripts/preflight.py)
        "conv_windows": p.q_conv_windows,
        "assistant_spans": p.q_assistant_spans,
        "pack_sequences": p.q_pack_sequences,
        "pack_assemble": p.q_pack_assemble,
        "regional_revenue": p.q_regional_revenue,
        "order_priority": p.q_order_priority,
        "cust_order_dist": p.q_cust_order_dist,
        "events_funnel": p.q_events_funnel,
        "props_stats": p.q_props_stats,
        "dedup_incremental": p.q_dedup_incremental,
        "bm25_search_incr": p.q_bm25_search_incr,
        "fielded_search": p.q_fielded_search,
        "value_variance": p.q_value_variance,
        "last_event_per_user": p.q_last_event_per_user,
        "rolling_time": p.q_rolling_time,
        "dominant_event_type": p.q_dominant_event_type,
        "value_histogram": p.q_value_histogram,
        "nation_trade_volume": p.q_nation_trade_volume,
        "co_purchase_pairs": p.q_co_purchase_pairs,
        "lang_quartiles": p.q_lang_quartiles,
        "rolling_avg": p.q_rolling_avg,
        "drop_reconcile": p.q_drop_reconcile,
        "user_retention": p.q_user_retention,
        "triangle_count": p.q_triangle_count,
        "events_cube": p.q_events_cube,
        "event_pivot": p.q_event_pivot,
        "above_avg_orders": p.q_above_avg_orders,
        "token_budget_sample": p.q_token_budget_sample,
        "promo_revenue": p.q_promo_revenue,
        "returned_top_customers": p.q_returned_top_customers,
        "large_orders": p.q_large_orders,
        "event_gaps": p.q_event_gaps,
        "diverse_sample_per_cluster": p.q_diverse_sample_per_cluster,
        "contamination_report": p.q_contamination_report,
        "dedup_survivors_best": p.q_dedup_survivors_best,
        "ann_ivf": p.q_ann_ivf,
        "ann_ivf_incr": p.q_ann_ivf_incr,
        "cosine_dups_ivf": p.q_cosine_dups_ivf,
        "customers_per_supplier": p.q_customers_per_supplier,
        "lang_confusion": p.q_lang_confusion,
        "dup_rate_by_source": p.q_dup_rate_by_source,
        "order_gap_median_hist": p.q_order_gap_median_hist,
        "events_filtered": p.q_events_filtered,
        "asof_attribution": p.q_asof_attribution,
        "asof_attribution_partitioned": p.q_asof_attribution_partitioned,
        "events_sessionize_partitioned": p.q_events_sessionize_partitioned,
        "dedup_minhash": p.q_dedup_minhash,
        "dup_clusters": p.q_dup_clusters,
        "curation": p.q_curation,
        "shuffle_shards": p.q_shuffle_shards,
        "brand_supplier_counts": p.q_brand_supplier_counts,
        "idle_customers": p.q_idle_customers,
        "ship_latency": p.q_ship_latency,
        "price_bands": p.q_price_bands,
        "value_quantiles": p.q_value_quantiles,
        "events_sliding": p.q_events_sliding,
        "events_tumbling": p.q_events_tumbling,
        "events_sessionize": p.q_events_sessionize,
        "lineitem_pricing": p.q_lineitem_pricing,
        "mktsegment_revenue": p.q_mktsegment_revenue,
        "top_customers": p.q_top_customers,
        "cosine_dups": p.q_cosine_dups,
        "ngram_jaccard": p.q_ngram_jaccard,
        "ann_topk": p.q_ann_topk,
        "text_quality": p.q_text_quality,
        "token_counts": p.q_token_counts,
        "normalize_text": p.q_normalize_text,
        "lang_id": p.q_lang_id,
        "render_3164": p.q_render_3164,
        "repetition": p.q_repetition,
        "stratified_sample": p.q_stratified_sample,
        "sample_k_per_lang": p.q_sample_k_per_lang,
        "top_docs_by_lang": p.q_top_docs_by_lang,
        "distinct_users_by_type": p.q_distinct_users_by_type,
        "quality_filter": p.q_quality_filter,
        "length_band_filter": p.q_length_band_filter,
        "token_quantiles_by_lang": p.q_token_quantiles_by_lang,
        "tf_idf": p.q_tf_idf,
        "inverted_index": p.q_inverted_index,
        "bm25_search": p.q_bm25_search,
        "phrase_search": p.q_phrase_search,
        "redact_pii": p.q_redact_pii,
        "top_ngrams": p.q_top_ngrams,
        "approx_top_ngrams": p.q_approx_top_ngrams,
        "doc_freq": p.q_doc_freq,
        "lm_score": p.q_lm_score,
        "domain_mix": p.q_domain_mix,
        "dup_spans": p.q_dup_spans,
        "cluster_profile": p.q_cluster_profile,
        "embed_kmeans": p.q_embed_kmeans,
        "dedup_survivors_cc": p.q_dedup_survivors_cc,
        "decontam_survivors": p.q_decontam_survivors,
        "decontaminate": p.q_decontaminate,
        "dedup_exact": p.q_dedup_exact,
        "embed_dedup_cc": p.q_embed_dedup_cc,
        # --- r5 rows-only promotions (oracle-checked now: lossless-
        #     at-driver-scale KLL rule; frozen-hyperplane LSH SQL) ---
        "approx_quantiles": p.q_approx_quantiles,
        "approx_quantiles_by_lang": p.q_approx_quantiles_by_lang,
        "cosine_dups_lsh": p.q_cosine_dups_lsh,
        # --- rows-only (no SQL oracle possible) — always the tail ---
        "doc_fingerprint": p.q_doc_fingerprint,
        "media_features": p.q_media_features,
        "media_decode": p.q_media_decode,
        "approx_distinct": p.q_approx_distinct,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents; the correctness run uses sf0.01 (the paths are
    baked into the SQL — generation is triggered here so the parquet
    exists before DuckDB reads it)."""
    from rayslog.sqloracle import oracle_queries, training_oracle_queries

    return {
        **oracle_queries("/root/testdata/sf0.01"),
        **training_oracle_queries("/root/testdata/sf0.01"),
    }
