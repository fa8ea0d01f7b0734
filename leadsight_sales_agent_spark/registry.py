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
    # r6 panel. Composition:
    # (a) the 5 array-output queries fixed this round (serialize to CSV
    #     strings — the r5 driver-red failure mode) plus the 2 queries
    #     whose half-up device moved from floor(/) to DIV per ADVICE —
    #     all 7 need a driver row to confirm the fix under the driver's
    #     own canonicalizer;
    # (b) 3 second confirmations (url_resolution_suite keeps the urls
    #     family covered; KMV/Bloom per the r5 verdict);
    # (c) 40 slots of never-driver-graded queries (208 remain after r5
    #     — full residue enumerated in COVERAGE.md), spread across
    #     every SURVEY §2 family (contract:
    #     tests/test_registry_contract.py checks family MEMBERSHIP).
    # Rotated-out r5 first-timers (48 green) stay oracle-checked
    # locally every round via tools/check_oracle.py.
    # -- (a) this round's fixes, driver reconfirmation --
    "agg_collect_ordered_topk",
    "embedding_feature_scale",
    "array_functions_suite",
    "text_inverted_index",
    "map_functions_suite",
    "eval_spearman_rank_corr",
    "agg_grouped_ols_trend",
    # -- (b) second confirmations --
    "url_resolution_suite",
    "sketch_kmv_distinct_userdays",
    "sketch_bloom_membership",
    "union_schema_evolution",
    # -- (c) never-graded rotation --
    # joins / spatial
    "join_asof_forward_tolerance",
    "spatial_grid_neighbor_join",
    # relational / SQL surface
    "explode_outer_null_preservation",
    "topk_orders_with_ties",
    "sql_star_except_suite",
    # aggregates
    "agg_listagg_native",
    "agg_percentile_disc_prices",
    "agg_weighted_median_price",
    "agg_skew_kurtosis_moments",
    # sketches
    "sketch_kmv_intersection",
    "sketch_hll_deterministic",
    # windows / time series
    "window_ewma_dyadic_smoothing",
    "window_rolling_correlation",
    "window_first_last_nth",
    "window_running_distinct_users",
    # datetime
    "datetime_timezone_suite",
    "date_business_day_fiscal_suite",
    # dedup / near-dup
    "dedup_sorted_neighborhood",
    "dedup_phonetic_soundex_blocking",
    "neardup_prefix_filter_join",
    "dedup_repeated_spans",
    "neardup_simhash_exact",
    # sampling / splits
    "sample_kfold_assignment",
    "sample_cap_per_source",
    "sample_neyman_allocation",
    # behavior / sequences
    "markov_event_transitions",
    "market_basket_apriori_triples",
    "path_top_sequences",
    # text / corpus cleaning
    "text_bm25_scores",
    "text_trigram_lm_score",
    "text_zipf_rank_frequency",
    "text_repetition_signals",
    # fidelity / json
    "string_functions_suite",
    "json_variant_extraction",
    # multimodal
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    # curation capstone
    "pipeline_curate_and_pack",
    # graph
    "graph_pagerank_trade",
    "graph_triangle_coparts",
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
