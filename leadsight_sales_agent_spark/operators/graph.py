"""Graph analytics over derived relationship graphs.

The reference has no graph surface; this module supplies the iterative
Pregel-style algorithms a relationship-shaped workload needs on Spark —
the same driver-loop + localCheckpoint device as the min-label
connected-components pass (operators/dedup.py::dedup_connected_components,
the large-star step of Kiveris et al.), applied to rank propagation.

Cross-engine exactness for an ITERATIVE float algorithm: each
iteration's incoming mass accumulates in DECIMAL(25,18) (order-
independent — summands are <1 contributions of identical doubles), the
damping update then evaluates as the identical double expression in
both engines, and every iteration ROUNDS ranks at 12 dp before the
next round — so floating-point state can never drift engine-sides
apart across iterations. The DuckDB oracle replays the same fixed
iteration count inside a recursive CTE (aggregation in the recursive
member — DuckDB allows it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.registry import query
from leadsight_sales_agent_spark.sources.catalog import load

PR_ITERS = 5
PR_DAMP = "CAST(0.85 AS DOUBLE)"
PR_JUMP = "CAST(0.15 AS DOUBLE)"


@query(
    "graph_pagerank_trade",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS c,
                        's:' || CAST(l.l_suppkey AS VARCHAR) AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s, c FROM pairs
    ), deg AS (
        SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1
    ), nn AS (
        SELECT count(*) AS n_nodes FROM deg
    ), pr(it, node, r) AS (
        SELECT 0, node, CAST(1 AS DOUBLE) / (SELECT n_nodes FROM nn)
        FROM deg
        UNION ALL
        SELECT p.it + 1, e.dst,
               round({PR_JUMP} / (SELECT n_nodes FROM nn)
                     + {PR_DAMP} * CAST(sum(CAST(p.r / d.outdeg
                                                 AS DECIMAL(25,18)))
                                        AS DOUBLE), 12)
        FROM pr p
        JOIN edges e ON e.src = p.node
        JOIN deg d ON d.node = p.node
        WHERE p.it < {PR_ITERS}
        GROUP BY p.it, e.dst
    )
    SELECT node, r AS pagerank
    FROM pr WHERE it = {PR_ITERS}
    ORDER BY pagerank DESC, node
    LIMIT 25
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer-supplier trade graph (undirected:
    each distinct trading pair contributes an arc both ways), damping
    0.85, {PR_ITERS} synchronous iterations from a uniform start — the
    top-25 most central parties with a total-ordered tie-break. Every
    node has out-degree >= 1 by construction, so there is no dangling
    mass to redistribute.

    The per-iteration contract that makes an iterative double
    algorithm hash-checkable is in the module docstring: decimal-exact
    mass accumulation + identical double update + 12 dp round per
    round, so state is bit-equal at every iteration boundary.

    At 100 TB: the rank table is node-grain and each iteration is ONE
    shuffle (contributions grouped by destination) against a static
    edge list — the standard Pregel message round. The edge list would
    be co-partitioned/bucketed by src on a real cluster so the
    rank-to-edge join never reshuffles the big side, and
    `localCheckpoint` truncates the otherwise-exponential lineage each
    round (without it round k replays rounds 1..k-1). Driver traffic
    is zero between rounds (no collect in the loop — the iteration
    count is fixed, not convergence-polled).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    # edge list + degrees are reused every round: cache once, release at end
    edges = edges.localCheckpoint(eager=False)
    deg = deg.localCheckpoint(eager=False)
    nn = deg.agg(F.count("*").alias("n_nodes"))

    ranks = deg.join(F.broadcast(nn), how="cross").select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(PR_ITERS):
        contribs = (
            ranks.join(deg, "node")
            .join(edges, F.col("node") == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("r") / F.col("outdeg"))
                .cast("decimal(25,18)")
                .alias("contrib"),
            )
        )
        ranks = (
            contribs.groupBy("node")
            .agg(F.sum("contrib").cast("double").alias("mass"))
            .join(F.broadcast(nn), how="cross")
            .select(
                "node",
                F.round(
                    F.expr(f"{PR_JUMP} / n_nodes") + F.expr(f"{PR_DAMP} * mass"),
                    12,
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select("node", F.col("r").alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(25)
    )
