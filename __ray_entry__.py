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
        # --- oracle-backed, never driver-checked (or red) before r4 ---
        "conv_windows": p.q_conv_windows,
        "assistant_spans": p.q_assistant_spans,
        "pack_sequences": p.q_pack_sequences,  # r3 red (oracle type, fixed)
        "pack_assemble": p.q_pack_assemble,  # new r4, oracle-checked
        "regional_revenue": p.q_regional_revenue,
        "order_priority": p.q_order_priority,
        "cust_order_dist": p.q_cust_order_dist,
        "events_funnel": p.q_events_funnel,
        "props_stats": p.q_props_stats,
        "dedup_incremental": p.q_dedup_incremental,
        "bm25_search_incr": p.q_bm25_search_incr,
        "fielded_search": p.q_fielded_search,
        # --- oracle-backed, r2-green but outside the r3 window ---
        "value_variance": p.q_value_variance,  # new r4, oracle-checked
        "last_event_per_user": p.q_last_event_per_user,  # new r4
        "rolling_time": p.q_rolling_time,  # new r4, oracle-checked
        "dominant_event_type": p.q_dominant_event_type,  # new r4 (grouped mode)
        "value_histogram": p.q_value_histogram,  # new r4 (fixed-bin hist)
        "nation_trade_volume": p.q_nation_trade_volume,  # new r4 (Q7 shape)
        "co_purchase_pairs": p.q_co_purchase_pairs,  # new r4, oracle-checked
        "lang_quartiles": p.q_lang_quartiles,  # new r4, oracle-checked
        "rolling_avg": p.q_rolling_avg,  # new r4, oracle-checked
        "drop_reconcile": p.q_drop_reconcile,  # new r4 (FULL OUTER join)
        "user_retention": p.q_user_retention,  # new r4 (cohort retention)
        "triangle_count": p.q_triangle_count,  # new r4, oracle-checked
        "events_cube": p.q_events_cube,  # new r4, oracle-checked
        "event_pivot": p.q_event_pivot,  # new r4, oracle-checked
        "above_avg_orders": p.q_above_avg_orders,  # new r4, oracle-checked
        # --- rotation slots (never-checked first; rotate per round) ---
        "token_budget_sample": p.q_token_budget_sample,  # new r4, oracle-checked
        "promo_revenue": p.q_promo_revenue,  # new r4, oracle-checked
        "returned_top_customers": p.q_returned_top_customers,  # new r4
        "large_orders": p.q_large_orders,  # new r4, oracle-checked
        "event_gaps": p.q_event_gaps,  # new r4, oracle-checked
        "diverse_sample_per_cluster": p.q_diverse_sample_per_cluster,  # new r4
        "contamination_report": p.q_contamination_report,  # new r4, oracle-checked
        "dedup_survivors_best": p.q_dedup_survivors_best,  # new r4, oracle-checked
        "ann_ivf": p.q_ann_ivf,  # oracle-checked since r4 (frozen centroids)
        "ann_ivf_incr": p.q_ann_ivf_incr,  # oracle-checked since r4
        "cosine_dups_ivf": p.q_cosine_dups_ivf,  # new r4, oracle-checked
        # ---------------- driver window ends here (50) ----------------
        # --- oracle-backed, r3-green, out of this round's rotation ---
        # (the four session-4 late additions lead: never driver-checked,
        #  first in line for the r5 rotation)
        "top_open_orders": p.q_top_open_orders,  # new r4 (Q3 shape)
        "special_deal_revenue": p.q_special_deal_revenue,  # new r4 (Q19)
        "user_value_running": p.q_user_value_running,  # new r4 (cum window)
        "distinct_parts_by_supplier": p.q_distinct_parts_by_supplier,  # new r4
        "page_rank": p.q_page_rank,  # new r4 (iterative BSP graph)
        "min_cost_supplier": p.q_min_cost_supplier,  # new r4 (Q2 argmin)
        "nation_market_share": p.q_nation_market_share,  # new r4 (Q8 share)
        "important_parts": p.q_important_parts,  # new r4 (Q11 threshold)
        "quantity_price_corr": p.q_quantity_price_corr,  # new r4 (grouped corr)
        "event_transitions": p.q_event_transitions,  # new r4 (Markov matrix)
        "co_purchase_degree": p.q_co_purchase_degree,  # new r4 (graph summary)
        "customer_spend_pctile": p.q_customer_spend_pctile,  # new r4 (PERCENT_RANK)
        "product_profit": p.q_product_profit,  # new r4 (Q9 profit)
        "top_supplier": p.q_top_supplier,  # new r4 (Q15 global-max ties)
        "small_qty_revenue": p.q_small_qty_revenue,  # new r4 (Q17 corr avg)
        "monthly_growth": p.q_monthly_growth,  # new r4 (LAG on agg series)
        "doc_length_zscore": p.q_doc_length_zscore,  # new r4 (grouped z)
        "action_trigrams": p.q_action_trigrams,  # new r4 (sequence mining)
        "customers_per_supplier": p.q_customers_per_supplier,  # new r4
        "full_coverage_suppliers": p.q_full_coverage_suppliers,  # new r4 (division)
        "part_skyline": p.q_part_skyline,  # new r4 (Pareto dominance)
        "order_value_deciles": p.q_order_value_deciles,  # new r4 (global NTILE)
        "repeat_order_share": p.q_repeat_order_share,  # new r4 (window+regroup)
        "value_mad_by_type": p.q_value_mad_by_type,  # new r4 (grouped MAD)
        "cohort_revenue": p.q_cohort_revenue,  # new r4 (cohort LTV triangle)
        "weekday_profile": p.q_weekday_profile,  # new r4 (dow profile)
        "keyword_hits": p.q_keyword_hits,  # new r4 (multi-pattern scan)
        "user_event_sets": p.q_user_event_sets,  # new r4 (INTERSECT/EXCEPT)
        "rolling_dau": p.q_rolling_dau,  # new r4 (rolling COUNT DISTINCT)
        "followed_within": p.q_followed_within,  # new r4 (A-then-B pattern)
        "hybrid_search": p.q_hybrid_search,  # new r4 (BM25+vector RRF)
        "weighted_median_price": p.q_weighted_median_price,  # new r4
        "conversion_delay": p.q_conversion_delay,  # new r4 (next-match delta)
        "customer_spend_deciles": p.q_customer_spend_deciles,  # new r4
        "order_linecount_hist": p.q_order_linecount_hist,  # new r4
        "traffic_anomaly_days": p.q_traffic_anomaly_days,  # new r4
        "lang_confusion": p.q_lang_confusion,  # new r4 (eval cross-tab)
        "dup_rate_by_source": p.q_dup_rate_by_source,  # new r4 (curation health)
        "order_gap_median_hist": p.q_order_gap_median_hist,  # new r4
        "session_length_hist": p.q_session_length_hist,  # new r4
        "session_duration_hist": p.q_session_duration_hist,  # new r4
        "turn_dup_stats": p.q_turn_dup_stats,  # new r4 (north-table dedup)
        "events_filtered": p.q_events_filtered,  # r2-green, demoted for r4-new
        "asof_attribution": p.q_asof_attribution,  # r2-green, demoted for r4-new
        "asof_attribution_partitioned": p.q_asof_attribution_partitioned,  # r2-green
        "events_sessionize_partitioned": p.q_events_sessionize_partitioned,  # r2-green
        "dedup_minhash": p.q_dedup_minhash,
        "dup_clusters": p.q_dup_clusters,
        "curation": p.q_curation,
        "shuffle_shards": p.q_shuffle_shards,
        "brand_supplier_counts": p.q_brand_supplier_counts,  # new r4
        "idle_customers": p.q_idle_customers,  # new r4, oracle-checked
        "ship_latency": p.q_ship_latency,  # new r4, oracle-checked
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
        "approx_top_ngrams": p.q_approx_top_ngrams,  # oracle-checked (lossless here)
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
        # --- rows-only (no SQL oracle possible) — always the tail ---
        "doc_fingerprint": p.q_doc_fingerprint,  # rows-only (rolling hash)
        "dedup_minhash_keep": p.q_dedup_minhash_keep,  # rows-only (LSH structure)
        "dedup_simhash": p.q_dedup_simhash,  # rows-only (hamming buckets)
        "media_features": p.q_media_features,  # rows-only (stubbed decode)
        "media_decode": p.q_media_decode,    # rows-only (real BMP/WAV decode)
        "approx_distinct": p.q_approx_distinct,  # rows-only (HLL sketch)
        "approx_quantiles": p.q_approx_quantiles,  # rows-only (KLL sketch)
        "approx_quantiles_by_lang": p.q_approx_quantiles_by_lang,  # rows-only (KLL)
        "cosine_dups_lsh": p.q_cosine_dups_lsh,  # rows-only (approximate)
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
