"""Physical-plan quality gates (the 100 TB design contract).

Correctness says the query returns the right rows; these tests pin HOW:
filters reach the parquet scan, projections prune columns, small
dimensions broadcast, aggregates run partial+final, and nothing
degenerates into a cartesian product or a global single-partition sort
unless that is the operator's documented semantics.
"""

from __future__ import annotations

import re

import pytest

from leadsight_sales_agent_spark import registry
from leadsight_sales_agent_spark.plans import (
    formatted_plan,
    optimized_logical_plan,
    pushed_filters,
    simple_plan,
)

registry.load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    return formatted_plan(registry.QUERIES[name](spark, sf_dir))


class TestScanHygiene:
    def test_flagship_pushes_filters_and_prunes_columns(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "flagship_revenue_by_segment_month")
        pushed = pushed_filters(plan)
        assert any("l_shipdate" in p for p in pushed), "shipdate range not pushed to scan"
        # lineitem has 16 columns; the query needs 4
        m = re.search(r"ReadSchema: struct<([^>]*l_extendedprice[^>]*)>", plan)
        assert m and m.group(1).count(":") <= 4, "lineitem scan not column-pruned"

    def test_filter_query_pushdown(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "filter_compound_predicates")
        assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split(
            "Scan parquet"
        )[1].split("(2)")[0]


class TestJoinStrategy:
    @pytest.mark.parametrize(
        "name",
        [
            "flagship_revenue_by_segment_month",
            "join_inner_orders_customer",
            "join_left_customer_order_counts",
            "join_semi_customers_with_urgent_orders",
        ],
    )
    def test_dimension_joins_broadcast(self, spark, sf_dir, name):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name}: dimension join did not broadcast"
        assert "CartesianProduct" not in plan

    def test_no_cartesian_outside_cross_join(self, spark, sf_dir):
        for name in ("join_range_price_brackets", "join_asof_purchase_last_click"):
            plan = plan_of(spark, sf_dir, name)
            assert "CartesianProduct" not in plan, f"{name} degenerated to cartesian"

    def test_tfidf_vocabulary_join_not_hinted_broadcast(self, spark, sf_dir):
        # The df (document-frequency) side is one row per distinct term —
        # an unbounded vocabulary at 100 TB. A broadcast HINT forces the
        # OOM plan at any scale; Catalyst choosing broadcast from size
        # STATS at tiny sf is fine (it flips to SMJ when stats grow), so
        # gate on the logical-plan hint, not the physical join pick.
        df = registry.QUERIES["text_tfidf_top_terms"](spark, sf_dir)
        logical = optimized_logical_plan(df)
        assert "strategy=broadcast" not in logical, "vocabulary join carries a broadcast hint"


class TestAggregation:
    def test_partial_final_hash_agg(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "agg_pricing_summary")
        # partial + final pair → two HashAggregate nodes around one Exchange
        assert plan.count("HashAggregate") >= 2
        assert "WholeStageCodegen" in plan or "*" in plan  # codegen'd

    def test_topk_uses_ordered_limit_not_global_sort(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "topk_orders_by_price")
        assert "TakeOrderedAndProject" in plan, "top-k should not globally sort"


class TestWindowHygiene:
    @pytest.mark.parametrize(
        "name",
        [
            "window_topk_orders_per_customer",
            "window_running_revenue_per_customer",
            "window_rank_lag_lead_events",
        ],
    )
    def test_windows_are_partitioned(self, spark, sf_dir, name):
        plan = simple_plan(registry.QUERIES[name](spark, sf_dir))
        # An unpartitioned window shows 'Window [...], [x ASC...]' with no
        # partition spec and Spark logs a perf WARN; cheap proxy: every
        # Window node must carry a partition expression list
        for line in plan.splitlines():
            if "Window [" in line and "windowspecdefinition" in line:
                assert re.search(r"\], \[[^\]]+\], \[", line), f"unpartitioned window: {line}"

    def test_per_group_topk_uses_group_limit(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "window_topk_orders_per_customer")
        # Spark ≥3.5 pushes rank<=k into WindowGroupLimit before the shuffle
        assert "WindowGroupLimit" in plan
