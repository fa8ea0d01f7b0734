"""Empty-input totality pins (r10): the queries the first
tools/empty_audit.py run caught crashing or diverging on zero-row
input, re-run here against an empty fixture on every test pass. The
full 507-query audit lives in tools/empty_audit.py (runs both
engines); this fast subset pins the FIXED bug classes so they cannot
regress silently:

- degenerate-denominator DIVIDE_BY_ZERO under ANSI (nullif device),
- VOID-typed empty-collect literals in the similarity anchors,
- NULL-vs-0 aggregate seams,
- the rollup-family contract (Spark emits no rows on empty input —
  the oracles adopt that via no-op HAVING count(*) > 0).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from leadsight_sales_agent_spark import registry

registry.load_all()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# every query the first audit flagged, by fixed class
ZERO_DENOMINATOR = [
    "ab_sprt_sequential_boundary",
    "attribution_markov_removal",
    "attribution_shapley_channels",
    "eval_krippendorff_alpha_langid",
    "eval_mcc_langid_binary",
    "forecast_causal_impact_counterfactual",
    "forecast_piecewise_trend_changepoints",
    "forecast_seasonal_trend_strength",
    "recsys_coverage_novelty_audit",
    "replication_merkle_diff",
    "sketch_kmv_distinct_userdays",
    "storage_bloom_sizing_advisor",
    "storage_zonemap_skipping_audit",
    "ann_recall_report",
]
EMPTY_ANCHORS = [
    "kmeans_train_embeddings",
    "knn_cosine_ivf",
    "knn_cosine_ivf_pruned",
    "embedding_pq_quantize",
]
NULL_VS_ZERO = [
    "agg_bitmap_distinct_users",
    "forecast_durbin_watson_residuals",
]
ROLLUP_EMPTY_IS_EMPTY = [
    "agg_cube_flag_status",
    "agg_grouping_id_labels",
    "agg_grouping_sets",
    "agg_rollup_region_nation_revenue",
    "agg_rollup_time_hierarchy",
    "tpcds_q67_rollup_topk",
]
PROVENANCE = ["provenance_file_row_index"]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


class TestEmptyInputTotality:
    @pytest.mark.parametrize(
        "name",
        ZERO_DENOMINATOR + EMPTY_ANCHORS + NULL_VS_ZERO + PROVENANCE,
    )
    def test_runs_on_zero_rows(self, spark, empty_dir, name):
        # must neither raise nor emit complex-typed columns; rowcounts
        # are engine-agreed in tools/empty_audit.py — here we pin
        # "total" (collectable without error)
        rows = registry.QUERIES[name](spark, empty_dir).collect()
        assert isinstance(rows, list)

    @pytest.mark.parametrize("name", ROLLUP_EMPTY_IS_EMPTY)
    def test_rollup_family_emits_no_rows_on_empty(self, spark, empty_dir, name):
        # Spark's grouping-sets-on-empty semantics: NO rows, including
        # the () grouping set (the oracles adopt this via the no-op
        # HAVING count(*) > 0 — see the r10 empty-input audit)
        assert registry.QUERIES[name](spark, empty_dir).count() == 0

    def test_sprt_reports_continue_on_no_traffic(self, spark, empty_dir):
        rows = registry.QUERIES["ab_sprt_sequential_boundary"](
            spark, empty_dir
        ).collect()
        assert len(rows) == 1 and rows[0]["decision"] == "continue"


# single-row classes: n-1 variances, zero ranges, absent classes,
# single-node graphs, empty quantifier sets — the second audit wave
ONE_ROW_FIXED = [
    "ab_cuped_variance_reduction",
    "agg_gini_mean_difference",
    "agg_grouped_ols_trend",
    "agg_skew_kurtosis_moments",
    "agg_stats_moments",
    "drift_psi_event_mix",
    "embedding_feature_scale",
    "embedding_pca_power_iteration",
    "eval_auc_by_fold",
    "eval_auc_delong_ci",
    "eval_decile_lift_table",
    "eval_jarque_bera_normality",
    "eval_ks_two_sample",
    "eval_pr_curve",
    "eval_qini_uplift_curve",
    "eval_roc_auc_scores",
    "eval_spearman_rank_corr",
    "feature_woe_iv",
    "graph_degree_assortativity",
    "graph_hits_hubs_authorities",
    "sample_neyman_allocation",
]


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        tb = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(tb.slice(0, 1), str(d / f"{t}.parquet"))
    return str(d)


class TestSingleRowTotality:
    @pytest.mark.parametrize("name", ONE_ROW_FIXED)
    def test_runs_on_one_row(self, spark, one_row_dir, name):
        rows = registry.QUERIES[name](spark, one_row_dir).collect()
        assert isinstance(rows, list)

    def test_all_quantifier_is_vacuously_true_on_empty_set(
        self, spark, one_row_dir
    ):
        # the 1-row part catalog has no Brand#1 part, so S is empty and
        # `> ALL (S)` must keep every row (the max(S)=NULL rewrite
        # dropped them before the r10 total rewrite)
        parts = registry.QUERIES["quantified_all_subquery"](
            spark, one_row_dir
        ).count()
        assert parts == 1

    def test_pq_refuses_codebook_larger_than_corpus(self, spark, one_row_dir):
        # documented LOUD seam: misconfiguration fails, never trains a
        # degenerate codebook (tools/empty_audit.py allowlists exactly
        # this error on 1 <= rows < PQ_K fixtures)
        with pytest.raises(Exception, match="PQ needs at least"):
            registry.QUERIES["embedding_pq_quantize"](
                spark, one_row_dir
            ).collect()


class TestPlantedNullSemantics:
    """Pins for the r10 nulls-wave stances (the full 3-fixture audit
    lives in tools/empty_audit.py; these pin the two API-visible
    semantic decisions)."""

    @pytest.fixture(scope="class")
    def nulls_docs_dir(self, tmp_path_factory, spark):
        d = tmp_path_factory.mktemp("sf_nulldocs")
        rows = [
            (1, None, "en", "srcA", 0),
            (2, "shared words here", "en", "srcA", 0),
            (3, None, None, "srcB", 0),
            (4, "more shared words here", "de", "srcB", 0),
        ]
        spark.createDataFrame(
            rows,
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        return str(d)

    def test_null_text_fingerprint_is_null_not_md5_empty(
        self, spark, nulls_docs_dir
    ):
        # md5('') would collide every null doc into ONE dedup bucket
        fps = {
            r["doc_id"]: r["fingerprint"]
            for r in registry.QUERIES["text_fingerprint"](
                spark, nulls_docs_dir
            ).collect()
        }
        assert fps[1] is None and fps[3] is None
        assert fps[2] is not None and fps[2] != fps[4]

    def test_quality_ratios_skip_null_text(self, spark, nulls_docs_dir):
        rows = registry.QUERIES["text_stopword_punct_ratio"](
            spark, nulls_docs_dir
        ).collect()
        assert sorted(r["doc_id"] for r in rows) == [2, 4]
