"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus oracle SQL.

Every graded operator registers here via the ``@query`` decorator. The
driver contract (``__spark_entry__.py``) simply re-exports these dicts.

Oracle SQL strings are ANSI SQL runnable by DuckDB over the same parquet
tables (pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings). Queries without an oracle get a
rows-only check (used only for genuinely non-SQL-expressible operators:
LSH, streaming demos, mocked enrichment UDFs).

Column-name parity rule: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness run records exactly the first 50 registry
# entries (observed r1 AND r2: 50 rows each). Registration order alone
# filled r2's window with relational+agg queries, leaving windows,
# set-ops, dedup, similarity, text, sampling, multimodal, and funnel
# with no driver row at all. The fix (r2 verdict, task 2): curate the
# first 50 as a cross-family panel — at least one oracle-backed anchor
# per SURVEY §2 family — so every family gets a driver-grade hash check
# every round. Queries whose failures were fixed but never
# driver-confirmed (ansi_try_safety_suite r2-red fix,
# window_session_30min_gap r1-red fix) are pinned in-window.
# r4 rotation (r3 verdict, task 2): every family anchor is now
# driver-green, most twice, so ~12 redundant slots (7 of the 9 join
# shapes, one of the two sampling splits, one setop, three basic
# relational/window shapes — all with 2+ driver-green rounds) rotate
# out in favor of high-value oracle-backed queries that have NEVER
# received a driver row: the TPC-H siblings, connected components,
# incremental dedup, the decontamination gate, split-leakage, SCD2,
# interval concurrency, and the regression aggregate. Rotated-out
# queries remain oracle-checked locally every round via
# tools/check_oracle.py.
# r5 rotation candidates (oracle-backed, still no driver row after r4;
# swap in once this round's 15 first-timers confirm green):
# tpch_q3/q6/q7/q8/q10/q12/q14/q15/q18, dedup_cluster_representatives,
# text_token_entropy, text_bpe_merge_candidates, reference_render_functions,
# mixture_token_budget_allocation, multimodal_dedup_binary,
# window_sliding_panes, plus the remaining never-graded long tail
# (see CORRECTNESS_r0* row history).
_PANEL_50 = [
    # r10 panel. The r9 panel came back 50/50 green (CORRECTNESS_r09)
    # — the fifth consecutive fully-green round — so ALL 50 retire
    # per the r9 verdict. This round's composition: 50
    # never-driver-graded oracle-backed queries from the COVERAGE.md
    # residue, oldest-wave-first — the ENTIRE remaining r4/r5 old
    # wave (38 queries) plus 12 r6-wave picks: 6 chosen so every
    # family that still HAS never-graded members keeps a member
    # in-window (joins/aggregates/sketches/dedup/multimodal/
    # corpus_cleaning), and 6 for device leverage — the r10-rewritten
    # shard_consistent_hash_ring (bucketed ring LUT — external
    # confirmation of the new lookup), the three rank-localization /
    # sharded-device carriers (quantile_bucket_localized_exact,
    # sample_pps_systematic, storage_zonemap_skipping_audit), the 2-D
    # DP device (timeseries_dtw_monthly_segments), and the iterative
    # recursive-peel oracle (graph_kcore_peel). No green anchors this
    # round: the five families with zero residue (setops, fidelity,
    # json, urls, fuzzy_dedup) are FULLY driver-confirmed — every
    # member has a green row — so re-burning slots on them delays the
    # real gap (the never-confirmed residue); the family-coverage
    # test exempts exactly those five on that ground. Rotated-out
    # queries stay oracle-checked locally every round via
    # tools/check_oracle.py. Residue after r10: 104 (all r6-wave).
    # old wave (r4/r5 registrations — the final 38)
    "mixture_temperature_weights",
    "mrr_movement_waterfall",
    "outlier_mad_orders",
    "outlier_zscore_orders",
    "panel_fixed_effects_slope",
    "pattern_sequence_regex_match",
    "price_elasticity_grouped",
    "privacy_deterministic_tokenization",
    "process_edge_latency",
    "profile_column_entropy",
    "repurchase_interval_histogram",
    "retrieval_binary_quantization",
    "retrieval_coarse_to_fine_rerank",
    "retrieval_hybrid_bm25_vector",
    "revenue_mom_growth",
    "sample_importance_by_length",
    "sample_mixture_weighted_sources",
    "seasonality_heatmap_events",
    "sql_group_order_by_all_suite",
    "sql_session_variables_suite",
    "streak_revenue_growth",
    "territory_snake_balanced_assignment",
    "text_fingerprint",
    "text_kwic_concordance",
    "text_lexical_diversity",
    "text_ngram_novelty",
    "text_term_burstiness",
    "topk_distinct_prices_dense_rank",
    "tpcds_q47_sales_deviation",
    "tpcds_q51_cumulative_compare",
    "tpcds_q88_time_band_counts",
    "trending_parts_decayed",
    "twap_purchase_value_per_user",
    "variance_price_volume_mix",
    "window_distribution_ranks",
    "window_range_interval_counts",
    "winsorize_orders_by_segment",
    "zorder_locality_buckets",
    # r6-wave family fillers (families with residue left keep a
    # member in-window)
    "join_bloom_runtime_filter_audit",  # joins
    "agg_percentile_cont_exact",  # aggregates
    "sketch_count_sketch_estimates",  # sketches
    "dedup_cdc_chunking",  # dedup
    "multimodal_pack_vision_batches",  # multimodal
    "text_perplexity_ccnet_buckets",  # corpus_cleaning
    # r6-wave device picks
    "shard_consistent_hash_ring",  # r10 bucketed-LUT rewrite
    "sample_pps_systematic",  # r9 prefix-sharded cumsum device
    "quantile_bucket_localized_exact",  # the rank-localize device
    "storage_zonemap_skipping_audit",  # r9 sharded-rank rewrite
    "timeseries_dtw_monthly_segments",  # 2-D DP single-fold device
    "graph_kcore_peel",  # iterative peel, MATERIALIZED-CTE oracle
]

# Rows-only (no-oracle) queries, cheapest first — the expensive demo
# pipelines (mock-transport enrich, streaming micro-batch runs) go last:
# any budget cut lands on the weakest signal (rows-only) instead of
# dropping hash-checked queries.
_ROWS_ONLY_COST_ORDER = [
    "agg_approx_count_distinct",
    "agg_approx_percentiles",
    "embedding_quantize_int8",
    "sketch_hll_mergeable",
    "sketch_misra_gries_heavy_hitters",
    "neardup_simhash",
    "kmeans_train_embeddings",  # 3 Lloyd iterations ≈ 5 s — after the one-pass sketches
    "embedding_pq_quantize",  # iterative PQ trainer (per-iteration collect jobs)
    "multimodal_feature_extract",
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "knn_cosine_ivf_pruned",
    "ann_recall_report",  # runs bruteforce + both ANN paths
    "neardup_minhash_lsh",
    "leakage_minhash_cross_split",  # 16x2 banding + full-corpus verify
    "streaming_progress_events",
    "streaming_static_enrich_join",
    "streaming_stream_stream_join",
    "streaming_dedup_watermarked",
    "leadsight_enrich_pipeline",
    "streaming_windowed_counts",
    "streaming_session_window_native",
    "streaming_user_totals_stateful",
    "streaming_sessionize_stateful",
]


def ordered_queries() -> dict[str, QueryFn]:
    """Registry in driver-check order: the curated 50-slot cross-family
    panel first, then the remaining oracle-backed queries in
    registration order, then rows-only queries cheapest-first."""
    panel = [n for n in _PANEL_50 if n in QUERIES]
    in_panel = set(panel)
    oracle_backed = [n for n in QUERIES if n in ORACLES and n not in in_panel]
    rows_only = [n for n in QUERIES if n not in ORACLES and n not in in_panel]
    rank = {n: i for i, n in enumerate(_ROWS_ONLY_COST_ORDER)}
    rows_only.sort(key=lambda n: rank.get(n, len(rank)))
    return {n: QUERIES[n] for n in [*panel, *oracle_backed, *rows_only]}


def load_all() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import leadsight_sales_agent_spark.operators.relational  # noqa: F401
    import leadsight_sales_agent_spark.operators.aggregates  # noqa: F401
    import leadsight_sales_agent_spark.operators.windows  # noqa: F401
    import leadsight_sales_agent_spark.operators.setops  # noqa: F401
    import leadsight_sales_agent_spark.operators.dedup  # noqa: F401
    import leadsight_sales_agent_spark.operators.sampling  # noqa: F401
    import leadsight_sales_agent_spark.operators.behavior  # noqa: F401
    import leadsight_sales_agent_spark.operators.layout  # noqa: F401
    import leadsight_sales_agent_spark.operators.features  # noqa: F401
    import leadsight_sales_agent_spark.operators.graph  # noqa: F401
    import leadsight_sales_agent_spark.operators.similarity  # noqa: F401
    import leadsight_sales_agent_spark.operators.text  # noqa: F401
    import leadsight_sales_agent_spark.operators.multimodal  # noqa: F401
    import leadsight_sales_agent_spark.operators.enrich  # noqa: F401
    import leadsight_sales_agent_spark.streaming.demo  # noqa: F401
