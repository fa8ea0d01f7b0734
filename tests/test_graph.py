"""Graph analytics: invariants + plan gates (oracle equality runs via
tools/check_oracle.py — these pin the algorithm-level properties the
hash check can't express)."""

from __future__ import annotations

import pytest

from leadsight_sales_agent_spark import registry
from tests.test_plans import plan_of

registry.load_all()


class TestPageRank:
    def test_mass_and_ordering(self, spark, sf_dir):
        rows = registry.QUERIES["graph_pagerank_trade"](spark, sf_dir).collect()
        assert len(rows) == 25
        ranks = [r["pagerank"] for r in rows]
        # total-ordered output, positive ranks, and no single node holds
        # a majority of the mass (undirected trade graph is connected-ish)
        assert ranks == sorted(ranks, reverse=True)
        assert all(r > 0 for r in ranks)
        assert sum(ranks) < 1.0  # top-25 of a >25-node distribution

    def test_deterministic_across_runs(self, spark, sf_dir):
        q = registry.QUERIES["graph_pagerank_trade"]
        a = [tuple(r) for r in q(spark, sf_dir).collect()]
        b = [tuple(r) for r in q(spark, sf_dir).collect()]
        assert a == b  # iterative float loop is bit-stable by design


class TestTriangles:
    def test_profile_sane(self, spark, sf_dir):
        row = registry.QUERIES["graph_triangle_coparts"](spark, sf_dir).collect()[0]
        assert row["n_nodes"] > 0 and row["n_edges"] > 0
        assert row["max_degree"] < row["n_nodes"]
        # orientation can never invent triangles beyond the closed-wedge
        # bound n_edges * max_degree
        assert 0 <= row["n_triangles"] <= row["n_edges"] * row["max_degree"]

    def test_adjacency_joins_are_equi(self, spark, sf_dir):
        # r8 shape: triangles are counted per edge via
        # size(array_intersect(N+(u), N+(v))) — the two out-adjacency
        # array joins must be equi-joins, and only the 1-row profile
        # cross-joins may be nested-loop; a third nested-loop would
        # mean the intersect stage degenerated to the quadratic wedge
        # form the orientation exists to avoid. (Upstream edge-build /
        # degree joins sit behind localCheckpoint boundaries and do not
        # print in this plan; their shapes are pinned by the oracle.)
        plan = plan_of(spark, sf_dir, "graph_triangle_coparts")
        import re

        def op_ids(kind):
            # formatted plans print each operator in the tree AND in the
            # details section — count distinct operator ids, not lines
            return set(re.findall(rf"{kind}[^\n(]*\((\d+)\)", plan))

        nested = op_ids("BroadcastNestedLoopJoin") | op_ids("CartesianProduct")
        assert len(nested) <= 2, (
            f"{len(nested)} nested-loop joins (only the two 1-row profile "
            f"cross-joins are allowed): {sorted(nested)}"
        )
        equi = op_ids("BroadcastHashJoin") | op_ids("SortMergeJoin")
        assert len(equi) >= 2, (
            f"only {len(equi)} equi-joins (the two adjacency-array joins)"
        )
        assert "array_intersect" in plan
