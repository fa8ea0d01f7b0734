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
