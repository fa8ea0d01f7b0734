"""Repo-wide physical-plan lint: every ORACLE-BACKED registered query's
plan is checked for scale-killers, with a documented allowlist for the
queries whose shape is intentional. Run:

    python tools/plan_lint.py            # writes PLAN_LINT.json, exit 1 on new findings

Rules (per query, formatted physical plan at sf0.001):
  R1 cartesian      — CartesianProduct / BroadcastNestedLoopJoin present.
                      Allowed where the operator IS a bounded non-equi
                      pair expansion on a calendar/grain-bounded side
                      (documented in ALLOW_NON_EQUI).
  R2 global-sort    — Exchange rangepartitioning outside the documented
                      global-order operators (top-k uses
                      TakeOrderedAndProject instead, which is fine).
  R4 exchange-storm — more than 12 Exchange nodes (audited-composition
                      queries carry a higher named cap; the rule still
                      fires if they grow 8 past it) — a plan that
                      re-shuffles that often usually lost a shared
                      partitioning somewhere.

This is the continuous form of the per-query plan audits in
tests/test_plans.py: those pin the headline shapes deeply; this lint
keeps the OTHER ~300 queries from silently regressing into a
scale-killer as they evolve.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from leadsight_sales_agent_spark import registry  # noqa: E402
from leadsight_sales_agent_spark.plans import formatted_plan  # noqa: E402
from leadsight_sales_agent_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# R1: operators whose non-equi / nested-loop join is the documented
# algorithm on a bounded grain (month grid, score grain, pair panel...).
ALLOW_NON_EQUI = {
    "join_range_price_brackets",  # range join: bracket dim is 4 rows, broadcast NL is the plan
    "forecast_mann_kendall_trend",  # month-grain pair expansion (~80 rows/side)
    "forecast_theil_sen_trend",  # month-grain pair expansion
    "eval_kendall_tau_brands",  # brand-grain (~25 rows) pair expansion + 1-row n anchor
    "skyline_parts_pareto",  # NOT-EXISTS dominance check on the pruned survivor set
    "quantified_all_subquery",  # > ALL rewrite leaves a 1-row scalar NL probe
    "market_basket_rules",  # antecedent->consequent direction pairs on the pair panel
    "interval_max_concurrency",  # +-1 delta self-alignment on the instant grain
    "window_ratio_to_report",  # 1-row total broadcast NL
    "eval_mutual_information",  # 25-cell grid x 1-row total
    "variance_price_volume_mix",  # 1-row totals join
    "mixture_temperature_weights",  # 1-row totals join
    "eval_cohens_kappa",  # 1-row totals cross join
    "forecast_seasonal_naive_backtest",  # 1-row scalar anchor
    "cusum_change_detection",  # 1-row target broadcast
    "ab_sprt_sequential_boundary",  # 1-row terminal x 0/1-row crossing anchors
    "bandit_ucb1_allocation",  # 1-row total-plays anchor on the 4-arm frame
    "inventory_ss_policy_replay",  # 36-month literal grid onto the brand frame
    "replication_merkle_diff",  # 1-row repair x divergence-stats anchors
    "dq_t_closeness_audit",  # 5-slot sens grid + 5-row global CDF broadcast
    "survival_logrank_test",  # dense arm x duration grid (observation-window bounded)
    "privacy_release_gate",  # embeds the t-closeness stage
    "revenue_max_drawdown",  # 1-row argmin anchor
    "dedup_cross_source_matrix",  # |sources|^2 grid
    "chi_square_priority_status",  # 5x3 grid x totals
    "drift_psi_event_mix",  # 1-row totals cross join
    "forecast_pacf_durbin_levinson",  # 3-row lag panel + 1-row stats cross joins
    "embedding_pca_power_iteration",  # 1-row n / l-inf-norm scalar anchors per round
    "embedding_random_projection_jl",  # 16-row sign-matrix dim cross join
    "layout_pack_shard_balance",  # 1-row totals cross join
    "sketch_ams_f2_moment",  # estimator panel + 1-row truth cross joins
    "sketch_count_sketch_estimates",  # 5-row depth panel cross joins
    "sketch_ams_join_size_estimate",  # estimator panel + 1-row truth cross joins
    "text_bleu_source_similarity",  # 1-row reference-length scalar cross join + per-order clip anchors
    "join_bloom_runtime_filter_audit",  # 1-row build-key-count anchor
    "agg_theil_inequality_decomposition",  # 1-row totals anchors onto the row/group grains
    "eval_harrell_c_index",  # 10-row literal decile grid onto the duration frame
    "graph_modularity_regions",  # 1-row edge-count anchor onto the 5-region stats frame
    "eval_rank_biased_overlap",  # 20-row depth grid x <=20 entry depths
    "eval_krippendorff_alpha_langid",  # 1-row label-totals anchor
    "sample_coreset_kcenter_greedy",  # 1-row center broadcast per greedy round
    "anomaly_seasonal_hybrid_esd",  # 1-row median/MAD/argmax anchors per ESD round (36-row series)
    "forecast_causal_impact_counterfactual",  # 1-row pre-period sums onto 12 post months
    "eval_brier_murphy_decomposition",  # 1-row global sums onto the bin grain
    "forecast_theta_method",  # 1-row trend-coefficient / SES-sum anchors on the 36-month series
    "attribution_markov_removal",  # 1-row count-matrix x 1-row visits anchors
    "window_downsample_lttb",  # 1-row prev-pick/next-centroid anchors per bucket round
    "recsys_coverage_novelty_audit",  # 1-row baskets/catalog/top10 anchors on the slot frame
    "ab_permutation_test_hashed",  # 200-row replicate grid + 1-row group-sums anchors
    "storage_sort_key_advisor",  # 1-row best-layout anchor onto the 3-row candidate frame
    "ab_cuped_variance_reduction",  # (defensive) single-row moment frame ops
    "text_rouge_l_source_similarity",  # 1-row reference-name/sequence anchors (the BLEU shape)
    "sketch_kmv_rolling_distinct_7d",  # day-grid range join (31 rows x <=k hashes)
    "sample_ht_estimator_check",  # 1-row truth anchor
    "benford_first_digit_audit",  # 9-row digit grid
    "resample_gap_filled_30min",  # dense grid expansion (bounded by calendar)
    "seasonality_heatmap_events",  # 168-cell grid
    "fifo_cogs_matching",  # interval-overlap non-equi join per part (bounded layers)
    "scd2_point_in_time_join",  # as-of validity range probe (<=2 versions/key)
    "scd2_customer_segment_history",  # validity-interval construction
    "join_asof_purchase_last_click",  # as-of non-equi by design
    "join_asof_forward_tolerance",  # as-of with tolerance
    "markov_event_transitions",  # 25-cell matrix x totals
    "attribution_shapley_channels",  # 16-coalition grid + 1-row span anchor
    "corpus_greedy_source_cover",  # 1-row universe anchor on the 5-row trace
    "path_top_sequences",  # alphabet-bounded rollup x literal rank
    "topk_orders_with_ties",  # literal-bound rank compare
    "sketch_kmv_distinct_userdays",  # k-th order statistic scalar probe
    "incremental_topk_maintenance",  # 1-row old-kth-boundary scalar broadcast
    "eval_kruskal_wallis",  # 1-row tie-term scalar combine
    "dq_simpsons_paradox_audit",  # 1-row pooled-stats cross join
    "forecast_durbin_watson_residuals",  # 1-row OLS-stats cross join onto 36 months
    "forecast_ljung_box_q",  # composes the ACF stage + 1-row n anchor
    "forecast_engle_granger_cointegration",  # 1-row OLS-stats + quantizer scalar broadcasts
    "forecast_granger_urgent_revenue",  # 1-row Gram-sums anchor
    "forecast_dickey_fuller_unit_root",  # 1-row Gram-sums anchor
    "timeseries_dtw_monthly_segments",  # 1-row reference-vector broadcast onto 5 segments
    "timeseries_hurst_rs",  # three 1-row R/S-leg anchors
    "text_good_turing_unseen_mass",  # 1-row summary cross join onto the bounded histogram
    "storage_dictionary_encoding_advisor",  # 1-row stats x 1-row dict-size per column
    "shard_consistent_hash_ring",  # 8x8 literal vnode grid cross join
    "mixture_repeat_epochs_plan",  # 1-row budget scalar onto the source-grain grid
    "sketch_kmv_intersection",  # sketch-union scalar probes
    "agg_approx_percentiles",  # envelope compare vs exact scalars
    "ann_recall_report",  # recall join between shortlist panels
    "eval_qq_quantile_pairs",  # decile-index pair alignment
    "sql_session_variables_suite",  # 1-row threshold anchor
    "conversion_latency_percentiles",  # scalar median anchors
    "agg_weighted_median_price",  # scalar threshold anchor
    "outlier_mad_orders",  # broadcast stats anchors
    "impute_group_median_balance",  # per-group median anchor
    "window_rolling_median_events",  # bounded frame median
    "leakage_jaccard_cross_split",  # cross-split pair verify on blocked candidates
    "neardup_ngram_jaccard",  # blocked pair verify
    "text_pmi_cooccurrence",  # vocab-capped pair space
    "spatial_grid_neighbor_join",  # exact distance filter inside cell candidates
    "retrieval_mmr_diversified",  # bounded 20x20 pair matrix
    "retrieval_rrf_fusion",  # shortlist fusion (50-row sides)
    "retrieval_hybrid_bm25_vector",  # shortlist full-outer fuse
    "retrieval_coarse_to_fine_rerank",  # 50-candidate rerank probe
    "retrieval_binary_quantization",  # hamming shortlist x query row
    "knn_cosine_bruteforce",  # broadcast query side by design
    "text_bm25_scores",  # 1-row corpus stats anchor
    "text_tfidf_top_terms",  # 1-row doc-count anchor
    "text_vocab_coverage",  # 100-row vocab broadcast
    "text_decontamination_gate",  # eval-fingerprint broadcast probe
    "corpus_curation_full",  # composes the anchors above
    "corpus_curation_verdict",
    "pipeline_curate_and_pack",
    "pipeline_full_release",  # inherits the curation + mixture 1-row anchors
    "eval_ks_two_sample",  # 1-row extrema anchor on the score grain
    "eval_decile_lift_table",  # 1-row totals anchor
    "eval_pr_curve",  # grain windows + totals anchor
    "survival_kaplan_meier",  # duration-grain windows + totals
    "forecast_croston_intermittent",
    "agg_skew_kurtosis_moments",
    "dedup_strategy_overlap_matrix",  # 4x4 name grid
    "market_basket_apriori_triples",  # basket-bounded triple expansion
    "market_basket_part_pairs",
    "recsys_item_item_cosine",
    "dedup_fuzzy_levenshtein",  # blocked pair verify
    "dedup_fuzzy_levenshtein_full",  # blocked + banded verify
    "dedup_sorted_neighborhood",
    "neardup_prefix_filter_join",  # prefix-filter candidate verify
    "entity_link_customers_billing",  # blocked linkage scoring
    "dedup_incremental_batch",
    "graph_link_prediction_common_suppliers",
    "graph_triangle_coparts",
    "graph_degree_distribution",
    "zorder_locality_buckets",
    "compaction_bin_packing",
    "ab_wilson_significance",  # 1-row z anchor
    "ab_deterministic_assignment",
    "incremental_agg_maintenance",  # delta-vs-history 1-row reconcile
    "incremental_join_maintenance",
    "snapshot_diff_reconciliation",
    "values_inline_dim_join",  # literal VALUES dim
    "late_arriving_dim_handling",
    "share_of_parent_revenue",
    "agg_grouping_id_labels",
    "concentration_gini_hhi_by_segment",
    "rolling_active_users_7d",  # bounded x7 projection
    "repurchase_interval_histogram",
    "cohort_ltv_curve",  # 1-row cohort-size anchors
    "window_ewma_dyadic_smoothing",
    "tpch_q17_small_quantity_revenue",
    "tpch_q2_min_cost_supplier",  # correlated min rewrite keeps scalar probe
    "tpch_q11_important_parts",  # global-threshold scalar anchor
    "tpch_q15_top_supplier",  # max-revenue scalar anchor
    "tpch_q22_dormant_rich_customers",  # avg-balance scalar anchor
    "tpcds_q51_cumulative_compare",
    "tpcds_q47_sales_deviation",
    "date_business_day_fiscal_suite",
    "sample_fair_interleave",
    "text_ngram_novelty",
    "eval_roc_auc_scores",
    "eval_calibration_bins",
    "eval_langid_confusion",
    "eval_langid_precision_recall_f1",
    "window_cume_dist_purchases",
    "window_range_interval_counts",
    "funnel_windowed_deadline",
    "funnel_ordered_stages",
    "text_repetition_signals",
    "dedup_repeated_spans",
    "text_bpe_merge_candidates",
    "mixture_token_budget_allocation",
    "pack_sequences_token_budget",
    "leakage_check_splits",
    "leakage_embedding_cosine_cross_split",
    "twap_purchase_value_per_user",
    "ohlc_monthly_orders",
    "forecast_seasonal_decomposition",
    "window_rolling_correlation",
    "inventory_abc_xyz_matrix",
    "interval_union_coverage",
    "join_cross_region_pairs",  # the cross-join operator itself
    "skew_diagnostics_orders",  # key-distribution grid x totals
    "diag_join_skew_advisor",  # advisor grid x totals
    "datetime_timezone_suite",  # 3-row zone VALUES grid
    "neardup_embedding_cosine",  # documented brute-force cosine baseline
    "feature_target_encoding_loo",  # 1-row global-mean anchor
    "feature_woe_iv",  # 1-row global-counts anchor
    "mining_contrastive_triplets",  # anchor-positive-negative pair mining
    "allocation_invoice_rounding",  # 1-row invoice-total anchor
    "sketch_hll_deterministic",  # 1-row global-truth anchor for '__all__'
    "trending_parts_decayed",  # 1-row max-month anchor
    "sample_neyman_allocation",  # 1-row weight-total anchor
    "forecast_acf_monthly",  # 12-row lag grid + 1-row stats anchor
    "territory_snake_balanced_assignment",  # 1-row total anchor
    "eval_ndcg_retrieval",  # composes the broadcast-NL knn baseline
    "eval_map_retrieval",  # composes the broadcast-NL knn baseline
    "sample_walk_forward_folds",  # 5-fold x month-grain design grid
    "ab_diff_in_diff",  # 1-row 2x2 wide pivot broadcast
    "forecast_conformal_interval",  # 1-row q-hat anchor
    "eval_expected_calibration_error",  # 1-row max-score normalizer
    "eval_label_silhouette",  # documented corpus-bounded all-pairs matrix
    "neardup_simhash_exact",  # 32-row bit grid broadcast for the votes
    "eval_linkage_quality",  # 1-row truth anchor
    "text_term_burstiness",  # 1-row corpus-size anchor
    "graph_rich_club_coefficient",  # 4-row degree-cutoff grid join
    "graph_hits_hubs_authorities",  # 1-row max-normalizer anchor per half-round
    "sketch_ddsketch_quantiles",  # 1-row exact-quantile audit anchor
    "dedup_semantic_semdedup",  # 4x64 sign-matrix dim cross join (the JL device)
    "text_burrows_delta",  # 20-row top-word grid cross join onto source totals
    "eval_bradley_terry_strengths",  # 1-row max-renormalizer anchor per MM round
}

# R2: documented global-order operators (range partition IS the plan).
ALLOW_GLOBAL_SORT = {
    "sample_fair_interleave",  # rank-major merge order
    "sample_pps_systematic",  # the systematic pass IS the hash-ordered cumulative
    "dedup_sorted_neighborhood",  # the sort IS the blocking key
    "storage_zonemap_skipping_audit",  # the sort IS the layout under audit
    "storage_sort_key_advisor",  # the sorts ARE the candidate layouts under ranking
    "topk_distinct_prices_dense_rank",
    "pareto_abc_parts",
    "inventory_abc_xyz_matrix",
    "eval_roc_auc_scores",
    "eval_auc_delong_ci",  # same collapsed score-grain cumulative windows
    "eval_ks_two_sample",
    "eval_mann_whitney_u",  # collapsed value-grain rank windows
    "eval_kruskal_wallis",  # collapsed value-grain rank windows
    "eval_pr_curve",
    "eval_decile_lift_table",
    "survival_kaplan_meier",
    "survival_nelson_aalen",  # duration-grain cumulative windows (the KM shape)
    "agg_histogram_equidepth",
    "skyline_parts_pareto",
    "window_ewma_dyadic_smoothing",  # month-grain series window
    "forecast_theil_u2_accuracy",  # month-grain lag windows
    "window_bollinger_bands",  # month-grain trailing ROWS frame + output order
    "text_burrows_delta",  # vocab-grain top-word rank + 190-pair output order
    "forecast_seasonal_decomposition",
    "forecast_theil_sen_trend",
    "window_rolling_correlation",
    "revenue_mom_growth",
    "revenue_max_drawdown",
    "cusum_change_detection",
    "ab_sprt_sequential_boundary",  # the time-ordered LLR walk IS the monitor
    "tpcds_q51_cumulative_compare",
    "window_ratio_to_report",
    "agg_string_concat_ordered",
    "sketch_kmv_distinct_userdays",
    "sketch_kmv_intersection",
    "text_vocab_coverage",  # top-100 vocabulary rank
    "text_tfidf_top_terms",
    "text_pmi_cooccurrence",
    "text_bpe_merge_candidates",
    "market_basket_rules",
    "mixture_token_budget_allocation",
    "mixture_repeat_epochs_plan",  # greedy order over the bounded source x epoch grid
    "conversion_latency_percentiles",
    "agg_weighted_median_price",
    "interval_max_concurrency",
    "text_zipf_rank_frequency",
    "zorder_locality_buckets",
    "storage_rle_sortedness_audit",  # the sort IS the audited layout
    "text_vocab_accumulation_curve",  # hash-order ntile + 10-row decile cumulative
    "ops_multiwindow_burn_alerts",  # 8 trailing RANGE frames share one minute-grain sort
    "text_heaps_law_fit",  # same curve + 10-point log-log fit
    "shard_consistent_hash_ring",  # ring-position order IS the placement table
    "compaction_bin_packing",
    "pack_sequences_token_budget",
    "pipeline_curate_and_pack",
    "pipeline_full_release",
    "corpus_curation_full",
    "corpus_curation_verdict",
    "text_ngram_novelty",
    "sketch_ddsketch_quantiles",  # collapsed bucket/value-grain rank windows
    "agg_percentile_cont_exact",  # collapsed value-grain rank windows (per-priority)
    "agg_median_ci_order_statistic",  # same collapsed value-grain rank windows
    "dedup_semantic_semdedup",  # 16-row cell-summary output order
    "ops_cache_belady_vs_lru",  # 5-row event-type code dim rank
    "timeseries_hurst_rs",  # 84-row month-index series rank
    "eval_page_trend_test",  # 5-row priority weight rank
}

# R4: compositions that legitimately chain many shuffling stages — the
# multi-strategy/meta reports and multi-leg retrieval stacks. The storm
# rule still fires if they GROW past their audited count + 8.
ALLOW_MANY_EXCHANGES = {
    "dedup_strategy_overlap_matrix": 124,  # 4 composed strategies + 10-cell matrix
    "graph_triangle_coparts": 94,  # orientation build + wedge join + spec twin
    "market_basket_apriori_triples": 37,  # pair table + prune + triple expansion
    "graph_link_prediction_common_suppliers": 31,
    "neardup_prefix_filter_join": 21,  # rarity order + prefix + verify
    "neardup_incremental_prefix_join": 14,  # delta-vs-corpus prefix + verify
    "recsys_item_item_cosine": 21,  # pair counts + sym union + per-item rank
    "pipeline_curate_and_pack": 14,
    "pipeline_full_release": 120,  # 4-stage composition: curation(5 signals) + dedup + mixture + pack stage plans stitched by 3 semi-joins
    "retrieval_hybrid_bm25_vector": 14,
    "mixture_token_budget_allocation": 13,
    "storage_dictionary_encoding_advisor": 30,  # 6 independent column profiles (tiny dims), 5 exchanges each
    "storage_entropy_compression_bound": 24,  # 6 independent column histograms unioned
    "eval_harrell_c_index": 14,  # user-grain fold + duration x decile grid windows (4 specs on a bounded grid)
    "timeseries_dtw_monthly_segments": 13,  # dense month grid build + ordered-vector rollup + ref broadcast
    "forecast_ljung_box_q": 18,  # inherits the ACF stage's 12-way lag alignment exchanges
    "dq_t_closeness_audit": 20,  # dense grid build + per-group and global CDF windows
    "privacy_release_gate": 24,  # inherits the t-closeness stage + the k/l rollup
    "survival_logrank_test": 22,  # spell build + dense grid + at-risk cumulative windows
    "sketch_kmv_intersection": 13,
    "sketch_kmv_rolling_distinct_7d": 7,  # daily rank + window rank + exact-truth twin
    "attribution_shapley_channels": 9,  # pre-purchase mask join + coalition grid + span anchor
    "market_basket_rules": 13,
    "text_pmi_cooccurrence": 13,
    "text_bm25_scores": 13,
    "dq_referential_integrity": 14,  # 7-edge audit union
    "dq_primary_key_uniqueness": 14,  # 7-table audit union
    "sketch_hll_deterministic": 13,  # per-type + merged register paths
    "neardup_simhash_exact": 65,  # 8 band-keyed joins + dedup + verify
    "graph_rich_club_coefficient": 39,  # projection + degree + per-k club joins
    "graph_hits_hubs_authorities": 16,  # W build + 6 checkpointed half-rounds
    "timeseries_hurst_rs": 13,  # three R/S window legs on the checkpointed 84-row series
    "dedup_semantic_semdedup": 22,  # sign-projection agg + cell join + within-cell pair leg + summary join
    "text_burrows_delta": 19,  # token explode + vocab rank + totals/count grid joins + pair leg
    "text_bleu_source_similarity": 16,  # 4-order gram union + reference clip join + length legs
}

FACT_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")


def lint_one(name: str, plan: str) -> list[dict]:
    findings = []
    if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) and (
        name not in ALLOW_NON_EQUI
    ):
        findings.append({"rule": "R1-cartesian", "query": name})
    if "Exchange rangepartitioning" in plan and name not in ALLOW_GLOBAL_SORT:
        findings.append({"rule": "R2-global-sort", "query": name})
    n_exchanges = plan.count("Exchange ")
    cap = ALLOW_MANY_EXCHANGES.get(name, 4) + 8
    if n_exchanges > cap:
        findings.append(
            {"rule": "R4-exchange-storm", "query": name, "exchanges": n_exchanges}
        )
    return findings


def main() -> None:
    registry.load_all()
    spark = get_spark("plan-lint", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    oracle_backed = [n for n in registry.ordered_queries() if n in registry.ORACLES]
    findings: list[dict] = []
    errors: list[dict] = []
    for name in oracle_backed:
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 — lint must survive one bad query
            errors.append({"query": name, "error": str(e)[:200]})
            continue
        findings.extend(lint_one(name, plan))
        spark.catalog.clearCache()
    out = {
        "checked": len(oracle_backed),
        "findings": findings,
        "errors": errors,
    }
    with open("PLAN_LINT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"checked": len(oracle_backed), "n_findings": len(findings), "n_errors": len(errors)}))
    for x in findings:
        print("FINDING", x)
    spark.stop()
    # errors (queries that crashed at plan construction) must fail the
    # gate too — a broken query is NOT a clean lint. Errors take
    # precedence over findings so a crash is never masked by a
    # co-occurring finding; findings are still printed above either way.
    sys.exit(2 if errors else (1 if findings else 0))


if __name__ == "__main__":
    main()
