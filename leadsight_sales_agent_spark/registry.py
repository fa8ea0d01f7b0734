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
    # r11 panel. The r10 panel came back 50/50 green (CORRECTNESS_r10)
    # — the sixth consecutive fully-green round — so ALL 50 retire per
    # the r10 verdict. This round's composition: 50 never-driver-graded
    # oracle-backed queries drawn from the 104-query COVERAGE.md
    # residue (all r6-wave), leaving 54 for r12. Every SURVEY §2
    # family that still has never-graded members keeps at least one in
    # the window (relational, aggregates, windows, datetime, dedup,
    # sampling, behavior, similarity, text, corpus_cleaning,
    # multimodal); three more families joined the zero-residue
    # exemption this round (joins, sketches, curation — every member
    # driver-confirmed after r10), alongside setops/fidelity/json/
    # urls/fuzzy_dedup. Composition favors family spread across the
    # residue's statistical/forecast/storage/ops subfamilies so the
    # r12 leftover is as diverse as possible. Rotated-out queries
    # stay oracle-checked locally every round via
    # tools/check_oracle.py. Residue after r11: 54 (see COVERAGE.md).
    "ab_cuped_variance_reduction",
    "ab_permutation_test_hashed",
    "agg_gini_mean_difference",
    "agg_theil_inequality_decomposition",
    "agg_trimmed_mean_exact",  # aggregates family rep
    "anomaly_seasonal_hybrid_esd",
    "attribution_markov_removal",
    "attribution_shapley_channels",
    "bandit_ucb1_allocation",
    "bootstrap_poisson_ci_mean",  # sampling family rep (resampling CI)
    "dq_simpsons_paradox_audit",
    "embedding_pca_power_iteration",  # similarity family rep
    "embedding_random_projection_jl",
    "eval_auc_delong_ci",  # behavior family rep
    "eval_bradley_terry_strengths",
    "eval_fairness_group_metrics",
    "eval_harrell_c_index",
    "eval_mann_whitney_u",
    "eval_markov_next_event_backtest",
    "eval_mcnemar_paired",
    "eval_welch_t_test",
    "finance_npv_monthly_cashflows",
    "forecast_causal_impact_counterfactual",
    "forecast_granger_urgent_revenue",
    "forecast_pacf_durbin_levinson",
    "forecast_piecewise_trend_changepoints",
    "graph_hits_hubs_authorities",
    "holt_winters_seasonal_smoothing",
    "incremental_topk_maintenance",
    "inventory_newsvendor_fractile",
    "layout_hilbert_locality_buckets",
    "multimodal_video_gop_plan",  # multimodal family rep
    "neardup_incremental_prefix_join",  # dedup family rep
    "ops_cache_belady_vs_lru",
    "ops_queueing_mm1_metrics",
    "privacy_release_gate",
    "recsys_coverage_novelty_audit",
    "replication_merkle_diff",
    "sample_coreset_kcenter_greedy",  # sampling family rep
    "storage_gorilla_ts_encoding_audit",
    "storage_sort_key_advisor",
    "streaming_watermark_eviction_audit",
    "survival_logrank_test",
    "text_bpe_encode_fixed_merges",
    "text_rake_keyphrases",  # text family rep
    "text_readability_flesch",  # corpus_cleaning family rep (quality signal)
    "timeseries_hurst_rs",  # windows family rep (rolling R/S)
    "tpcds_q34_frequent_ticket_bands",  # relational family rep
    "tpcds_q59_week_over_week_sales",  # datetime family rep
    "window_bollinger_bands",  # windows family rep
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
