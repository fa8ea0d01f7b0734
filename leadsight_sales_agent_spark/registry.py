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
    # r9 panel. The r8 panel came back 50/50 green (CORRECTNESS_r08) —
    # every slot confirmed, so ALL 50 retire per the r8 verdict. This
    # round's composition: 46 never-driver-graded oracle-backed
    # queries drawn oldest-wave-first from the COVERAGE.md residue
    # (40 from the r4/r5 old wave; 6 r6-wave picks only where the
    # family has no old-wave residue left: the nearest as-of join,
    # the rolling KMV sketch, SemDeDup, the ViT patch plan, the
    # encoding-damage audit, and the repeat-epochs mixture plan) +
    # 4 anchors for families whose every member is already
    # driver-green (setops, fidelity, json, urls — the family test
    # checks MEMBERSHIP, so one confirmed anchor each keeps the
    # family in-window; each anchor rotates to a different confirmed
    # member than r8 used, to spread confirmations). fuzzy_dedup
    # needs no anchor this round: eval_linkage_quality (old-wave,
    # never graded) composes the registered entity linker and is the
    # family's natural scorecard. Rotated-out queries stay
    # oracle-checked locally every round via tools/check_oracle.py.
    # family picks (one fresh member per family with residue left)
    "join_asof_nearest_tolerance",  # joins (r6 wave)
    "late_arriving_dim_handling",  # relational
    "eval_qq_quantile_pairs",  # aggregates
    "sketch_kmv_rolling_distinct_7d",  # sketches (r6 wave)
    "ops_error_budget_burn",  # windows
    "temporal_coalesce_pack",  # datetime
    "dedup_semantic_semdedup",  # dedup (r6 wave)
    "eval_linkage_quality",  # fuzzy_dedup
    "leakage_embedding_cosine_cross_split",  # sampling
    "survival_kaplan_meier",  # behavior
    "retrieval_mmr_diversified",  # similarity
    "text_token_count_bpe",  # text
    "multimodal_vit_patch_plan",  # multimodal (r6 wave)
    "text_encoding_damage_audit",  # corpus_cleaning (r6 wave)
    "mixture_repeat_epochs_plan",  # curation (r6 wave)
    # oldest-wave fill (r4/r5 alphabetical residue)
    "eval_label_silhouette",
    "eval_langid_confusion",
    "eval_langid_precision_recall_f1",
    "eval_map_retrieval",
    "eval_mutual_information",
    "eval_qini_uplift_curve",
    "feature_hashing_trick",
    "feature_target_encoding_loo",
    "feature_woe_iv",
    "finance_ar_aging_buckets",
    "forecast_conformal_interval",
    "forecast_croston_intermittent",
    "forecast_mann_kendall_trend",
    "forecast_seasonal_decomposition",
    "forecast_seasonal_mann_kendall",
    "forecast_seasonal_naive_backtest",
    "forecast_theil_sen_trend",
    "graph_degree_assortativity",
    "graph_degree_distribution",
    "graph_link_prediction_common_suppliers",
    "graph_reachability_recursive_sql",
    "graph_rich_club_coefficient",
    "impute_group_median_balance",
    "impute_linear_interpolation",
    "incremental_agg_maintenance",
    "inventory_abc_xyz_matrix",
    "inventory_clamped_running_balance",
    "label_centroid_similarity",
    "market_basket_part_pairs",
    "market_basket_rules",
    "mining_contrastive_triplets",
    # green anchors (families with no never-graded residue)
    "setop_intersect_nations",  # setops
    "reference_render_functions",  # fidelity
    "json_flatten_struct",  # json
    "dedup_url_canonicalization",  # urls
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
