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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.functions.numeric import d53, ddbl, sql_d53
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
                     + {PR_DAMP} * ((CAST(CAST((CAST(CAST(sum(CAST(p.r / d.outdeg AS DECIMAL(25,18))) * 1000000000000000000 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(sum(CAST(p.r / d.outdeg AS DECIMAL(25,18))) * 1000000000000000000 AS HUGEINT) AS HUGEINT) - (CAST(CAST(sum(CAST(p.r / d.outdeg AS DECIMAL(25,18))) * 1000000000000000000 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(1000000000000000000 AS DOUBLE)), 12)
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
    # ckpt-grain: slim-exception — 2-col distinct bipartite edge keys, reused every PageRank round
    edges = edges.localCheckpoint(eager=False)
    # ckpt-grain: slim-exception — 2-col node out-degree frame, reused every round
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
            # r13 (plan-lint R9, pre-checkpoint pass): the mass sum's
            # unscaled DECIMAL(35,18) value is ~1e18 — d53s split.
            .agg(ddbl(F.sum("contrib"), 18).alias("mass"))
            .join(F.broadcast(nn), how="cross")
            .select(
                "node",
                F.round(
                    F.expr(f"{PR_JUMP} / n_nodes") + F.expr(f"{PR_DAMP} * mass"),
                    12,
                ).alias("r"),
            )
            # ckpt-grain: iterative-loop — PageRank rank vector; checkpoint truncates per-round lineage
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select("node", F.col("r").alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(25)
    )


@query(
    "graph_triangle_coparts",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT x AS node FROM e UNION ALL SELECT y FROM e)
        GROUP BY 1
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT max(d) FROM deg) AS max_degree,
           (SELECT count(*)
            FROM e e1
            JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
            JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y) AS n_triangles
    """,
)
def graph_triangle_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts linked when
    some order contains both): the standard cohesion/clustering
    primitive, plus node/edge/max-degree profile — one summary row,
    all integers.

    The ORACLE counts triangles the spec way (triple self-join with
    x < y < z). The ENGINE counts them the way that survives 100 TB:
    degree-ordered ORIENTATION (Suri & Vassilvitskii's MapReduce
    trick) — orient every edge from its (degree, id)-smaller endpoint
    to the larger, so each triangle has EXACTLY ONE apex with two
    out-edges and is counted exactly once as a common out-neighbor of
    one oriented edge's endpoints. Orientation caps every node's
    out-degree at O(sqrt(edges)) for any graph — the skewed hub that
    makes naive wedge generation quadratic (a 10^6-degree hub =>
    10^12 wedges) generates almost nothing, because a hub is the
    (degree,id)-LARGEST endpoint of nearly all its edges. Same
    answer, hash-proven by the oracle.

    Plan (r8 rewrite — the original materialized the wedge set through
    a shuffle, 41M rows at sf0.1): edges come from a per-order sorted
    part ARRAY exploded into ordered pairs (two shuffles, no
    self-join; per-order fan-out is bounded by items-per-order);
    degrees broadcast onto edges for the orientation; triangles are
    counted per EDGE as size(array_intersect(N+(u), N+(v))) after
    joining the out-adjacency arrays onto both endpoints — the wedge
    volume is touched map-side inside one stage, never shuffled
    (9.5 -> ~4.5 s warm at sf0.1, count identical). The out-adjacency
    arrays are orientation-bounded at O(sqrt m) elements, so the
    per-edge intersect is bounded too. e/deg/oriented/adj each feed
    2+ consumers -> localCheckpoint(eager=False) so each builds once.
    At 100 TB the edge list would be bucketed by src so the adjacency
    joins co-locate.
    """
    parts = load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    e = (
        parts.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice("ps", i + F.lit(2), F.size("ps")),
                            lambda y: F.struct(x.alias("x"), y.alias("y")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .distinct()
        # ckpt-grain: slim-exception — 2-col distinct edge keys
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .union(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        # ckpt-grain: slim-exception — 2-col node-degree frame
        .localCheckpoint(eager=False)
    )
    # orient each edge (degree, id)-ascending: src = smaller endpoint
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    ed = e.join(F.broadcast(dx), "x").join(F.broadcast(dy), "y")
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oriented = ed.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
    ).persist()  # edge grain: data-proportional (r11 rule)
    adj = (
        oriented.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .persist()  # adjacency arrays carry the edge mass (r11 rule)
    )
    au = adj.select(F.col("src").alias("u_key"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("v_key"), F.col("nbrs").alias("nv"))
    # inner joins: an edge whose endpoint has no out-neighbors closes
    # no triangle and contributes 0 either way; coalesce covers the
    # degenerate graph where the joins produce ZERO rows (sum(k) over
    # an empty frame is NULL, the oracle's count(*) is 0 — r8 ADVICE)
    tri = (
        oriented.join(au, oriented.src == au.u_key)
        .join(av, oriented.dst == av.v_key)
        .select(F.size(F.array_intersect("nu", "nv")).alias("k"))
        .agg(
            F.coalesce(F.sum("k"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    profile = deg.agg(
        F.count("*").alias("n_nodes"), F.max("d").alias("max_degree")
    ).crossJoin(e.agg(F.count("*").alias("n_edges")))
    return profile.crossJoin(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "max_degree", "n_triangles"
    )


# ONE SQL text, two engines: Spark 4's native WITH RECURSIVE support
# means the bounded BFS below is graded by running the IDENTICAL query
# string on both sides — the strongest possible form of cross-engine
# parity (no reimplementation to diverge).
REACH_SQL = """
WITH RECURSIVE pairs AS (
    SELECT DISTINCT 'c:' || CAST(o.o_custkey AS STRING) AS c,
                    's:' || CAST(l.l_suppkey AS STRING) AS s
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
), edges AS (
    SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs
), walk(node, hop) AS (
    SELECT CAST('s:1' AS STRING), 0
    UNION ALL
    SELECT e.dst, w.hop + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hop < 3
)
SELECT node, CAST(min(hop) AS BIGINT) AS min_hop,
       CAST(count(*) AS BIGINT) AS n_walks
FROM walk GROUP BY node
"""


@query("graph_reachability_recursive_sql", oracle=REACH_SQL)
def graph_reachability_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS via a NATIVE recursive CTE (Spark 4's WITH
    RECURSIVE): minimum hop count and walk multiplicity from seed
    supplier 's:1' within 3 hops over the high-value (order total >
    400k) trade graph. The oracle is the SAME SQL string — DuckDB's
    STRING alias and shared recursion semantics make the query text
    portable verbatim, so the check grades Spark's recursive-CTE
    implementation itself against an independent one.

    The hop bound is what makes UNION ALL recursion safe on a cyclic
    graph (an unbounded walk would never terminate); min(hop) is BFS
    distance, n_walks the path-counting by-product. At 100 TB the same
    shape runs as the driver-loop frontier join (graph_pagerank_trade's
    device) — the recursive CTE is the declarative twin the optimizer
    unrolls into exactly those iterated joins.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(REACH_SQL)


CN_HUB_CAP = 50  # suppliers with more trading partners than this are skipped


@query(
    "graph_link_prediction_common_suppliers",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 450000
    ), deg_s AS (
        SELECT s, count(*) AS ds FROM pairs GROUP BY 1
    ), kept AS (
        SELECT p.c, p.s FROM pairs p
        JOIN deg_s d ON d.s = p.s
        WHERE d.ds <= {CN_HUB_CAP}
    ), deg_c AS (
        SELECT c, count(*) AS dc FROM kept GROUP BY 1
    ), inter AS (
        SELECT a.c AS c1, b.c AS c2, count(*) AS n_common
        FROM kept a JOIN kept b ON a.s = b.s AND a.c < b.c
        GROUP BY 1, 2
    )
    SELECT i.c1, i.c2, CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common * 10000
                // (da.dc + db.dc - i.n_common) AS BIGINT) AS jaccard_bp
    FROM inter i
    JOIN deg_c da ON da.c = i.c1
    JOIN deg_c db ON db.c = i.c2
    ORDER BY n_common DESC, jaccard_bp DESC, c1, c2
    LIMIT 20
    """,
)
def graph_link_prediction_common_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Common-neighbors link prediction on the bipartite high-value
    trade graph: score customer pairs by shared suppliers (count +
    Jaccard in basis points), top-20 with a total-ordered tie-break —
    the 'you trade with who I trade with' similarity that drives
    account-matching and lead-clustering recommendations.

    The quadratic hazard of every common-neighbor computation is the
    hub: a supplier serving d customers emits C(d,2) pairs, so one
    10^6-degree hub would emit 5*10^11 rows. The standard mitigation is
    applied IN the spec, not as an afterthought: suppliers above
    {CN_HUB_CAP} trading partners are excluded from pair generation
    (they carry near-zero similarity signal precisely because they
    connect everyone), and the exclusion lives in both engine and
    oracle so it's graded. Remaining shape: wedge join on supplier,
    pair-grain hash agg, degree broadcast, TakeOrdered top-20.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey", "o_custkey")
    )
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        # r8: pairs feeds the hub-degree agg AND the kept projection,
        # kept feeds deg_c + both wedge legs — checkpoint both so the
        # join+distinct lineage runs once
        # ckpt-grain: slim-exception — 2-col distinct cust x supplier pairs shared by both wedge legs
        .localCheckpoint(eager=False)
    )
    deg_s = pairs.groupBy("s").agg(F.count("*").alias("ds"))
    kept = (
        pairs.join(F.broadcast(deg_s.filter(F.col("ds") <= CN_HUB_CAP)), "s")
        .select("c", "s")
        # ckpt-grain: slim-exception — hub-capped pair subset
        .localCheckpoint(eager=False)
    )
    deg_c = kept.groupBy("c").agg(F.count("*").alias("dc"))
    a = kept.toDF("c1", "s")
    b = kept.toDF("c2", "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count("*").alias("n_common"))
    )
    da = deg_c.toDF("c1", "d1")
    db = deg_c.toDF("c2", "d2")
    return (
        inter.join(F.broadcast(da), "c1")
        .join(F.broadcast(db), "c2")
        .select(
            "c1",
            "c2",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.expr(
                "CAST(n_common * 10000 DIV (d1 + d2 - n_common) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
        .orderBy(
            F.desc("n_common"), F.desc("jaccard_bp"), F.asc("c1"), F.asc("c2")
        )
        .limit(20)
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT x AS node FROM e UNION ALL SELECT y FROM e)
        GROUP BY 1
    )
    SELECT CAST(length(bin(d)) - 1 AS INTEGER) AS log2_bucket,
           count(*) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree histogram of the part co-purchase graph —
    the first diagnostic of any graph workload, because the tail
    decides the plan: a power-law tail forces the degree-ordered
    orientation (graph_triangle_coparts) and hub-exclusion
    (link-prediction) devices; a flat tail doesn't. The log2 bucket
    is computed WITHOUT floating log: length(bin(d)) − 1 is the
    integer position of the highest set bit in BOTH engines — the
    floor(log2) that needs no libm and can't disagree at
    power-of-two boundaries.

    Same edge relation as the triangle count (exchange-reusable when
    profiled together); degrees from one union-all aggregate; the
    histogram grain is <= 64 rows at any scale.
    """
    op = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .distinct()
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    return deg.groupBy(
        (F.length(F.bin(F.col("d"))) - 1).cast("int").alias("log2_bucket")
    ).agg(
        F.count("*").alias("n_nodes"),
        F.min("d").alias("min_degree"),
        F.max("d").alias("max_degree"),
    )


@query(
    "graph_degree_assortativity",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    sdeg AS (SELECT s, count(*) AS ds FROM edges GROUP BY 1),
    pdeg AS (SELECT p, count(*) AS dp FROM edges GROUP BY 1),
    pairs AS (
        SELECT CAST(sd.ds AS BIGINT) AS x, CAST(pd.dp AS BIGINT) AS y
        FROM edges e
        JOIN sdeg sd ON sd.s = e.s
        JOIN pdeg pd ON pd.p = e.p
    ),
    s AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           round((CAST(n AS DOUBLE) * {sql_d53("sxy")} - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * {sql_d53("sxx")} - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * {sql_d53("syy")} - CAST(sy AS DOUBLE) * sy)),
                 6) AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier-part bipartite graph: the
    Pearson correlation between endpoint degrees ACROSS EDGES —
    positive means hub suppliers connect to popular parts
    (rich-club), negative means hubs serve the long tail; the
    number that predicts whether hub-targeted optimizations (the
    triangle-orientation device, skew salting) will pay off on this
    graph. Newman's r computed from five exact integer sufficient
    statistics over the edge list (degrees are integers), one fixed
    IEEE tree, 6dp — the rolling-correlation device on graph
    structure.

    Plan: degree tables are two aggregations of the edge list; the
    per-edge join brings each endpoint's degree (dimension-sized
    sides broadcast at this grain), then one reduce.
    """
    edges = (
        load(spark, sf_dir, "lineitem").select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        )
    ).distinct()
    sdeg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("ds"))
    pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("dp"))
    pairs = (
        edges.join(F.broadcast(sdeg), "s")
        .join(F.broadcast(pdeg), "p")
        .select(
            F.col("ds").cast("bigint").alias("x"),
            F.col("dp").cast("bigint").alias("y"),
        )
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    # r13 (plan-lint R9): sxy/sxx/syy are DECIMAL(38,0) sums of degree
    # products — past 2^53 on a hub-heavy graph at scale — so they
    # convert through the d53 split; sx/sy are BIGINT (exact).
    return s.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.round(
            (nd * F.expr(d53("sxy")) - F.col("sx").cast("double") * F.col("sy"))
            / F.nullif(
                F.sqrt(nd * F.expr(d53("sxx")) - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(
                    nd * F.expr(d53("syy")) - F.col("sy").cast("double") * F.col("sy")
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("assortativity"),
    )


@query(
    "graph_rich_club_coefficient",
    oracle="""
    WITH bip AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s
    ),
    deg AS (
        SELECT u AS node, count(*) AS d FROM (
            SELECT u FROM edges UNION ALL SELECT v FROM edges
        ) t(u) GROUP BY 1
    ),
    ks AS (SELECT unnest([5, 10, 20, 40]) AS k),
    club AS (
        SELECT k.k, d.node
        FROM ks k JOIN deg d ON d.d > k.k
    ),
    club_n AS (
        SELECT k, count(*) AS n_k FROM club GROUP BY 1
    ),
    club_e AS (
        SELECT c1.k, count(*) AS e_k
        FROM edges e
        JOIN club c1 ON c1.node = e.u
        JOIN club c2 ON c2.node = e.v AND c2.k = c1.k
        GROUP BY 1
    )
    SELECT n.k, CAST(n.n_k AS BIGINT) AS n_nodes,
           CAST(coalesce(e.e_k, 0) AS BIGINT) AS n_edges,
           CAST(CASE WHEN n.n_k >= 2
                THEN (2 * 10000 * 2 * coalesce(e.e_k, 0)
                      + n.n_k * (n.n_k - 1))
                     // (2 * n.n_k * (n.n_k - 1))
                ELSE NULL END AS BIGINT) AS phi_bp
    FROM club_n n LEFT JOIN club_e e ON e.k = n.k
    """,
)
def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the supplier co-supply graph: for each
    degree cutoff k, the edge density among nodes of degree > k —
    rising φ(k) means hub suppliers preferentially interconnect (a
    "rich club"), the structural fact that decides whether hub
    failures cascade and whether hub-first optimizations compound.
    Completes the graph-topology kit: degree distribution (tail
    shape), assortativity (edge-level mixing), rich club
    (subgraph-level mixing).

    φ = 2·E_k / (N_k(N_k−1)) as half-up integer bp; the co-supply
    projection is part-bounded (the market-basket device on the
    bipartite graph), degrees one reduce, and the per-k club
    membership joins are dimension-sized.
    """
    bip = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = bip.select(F.col("p").alias("pa"), F.col("s").alias("u"))
    b = bip.select(F.col("p").alias("pb"), F.col("s").alias("v"))
    edges = (
        a.join(b, (F.col("pa") == F.col("pb")) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
        # r8: edges feeds 3 consumers (both degree legs + the club-edge
        # join) and club feeds 3 (count + both membership legs) —
        # checkpoint both so the co-supply projection runs once
        # ckpt-grain: slim-exception — 2-col distinct co-supply edge keys shared by 3 consumers
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ks = spark.createDataFrame([(5,), (10,), (20,), (40,)], "k bigint")
    club = (
        F.broadcast(ks)
        .join(deg, F.col("d") > F.col("k"))
        .select("k", "node")
        # ckpt-grain: slim-exception — k x qualifying-node membership (4 k values)
        .localCheckpoint(eager=False)
    )
    club_n = club.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))
    c1 = club.select(F.col("k").alias("k1"), F.col("node").alias("nu"))
    c2 = club.select(F.col("k").alias("k2"), F.col("node").alias("nv"))
    club_e = (
        edges.join(c1, F.col("u") == F.col("nu"))
        .join(c2, (F.col("v") == F.col("nv")) & (F.col("k1") == F.col("k2")))
        .groupBy(F.col("k1").alias("k"))
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    return (
        club_n.join(club_e, "k", "left")
        .select(
            "k",
            F.col("n_k").cast("bigint").alias("n_nodes"),
            F.coalesce("e_k", F.lit(0)).cast("bigint").alias("n_edges"),
            F.expr(
                "CAST(CASE WHEN n_k >= 2"
                " THEN (2 * 10000 * 2 * coalesce(e_k, 0) + n_k * (n_k - 1))"
                " DIV (2 * n_k * (n_k - 1)) ELSE NULL END AS BIGINT)"
            ).alias("phi_bp"),
        )
    )


K_CORE_K = 80  # degree floor; chosen so the sf0.01 co-purchase graph
# shows a real multi-round cascade AND a nonempty fixpoint (~1857 of
# 2000 nodes) within the iteration budget
K_CORE_ITERS = 6  # fixed peel rounds — the bounded-iteration contract


def _kcore_oracle() -> str:
    """Unrolled fixed-iteration peel (DuckDB recursive CTEs allow only
    one self-reference in the recursive member; the peel needs the
    previous generation TWICE — once per edge endpoint — so the
    k-core oracle unrolls the {K_CORE_ITERS} rounds as chained CTEs
    instead, which is also the honest spelling of the fixed-iteration
    contract)."""
    ctes = [
        """alive0 AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
    )"""
    ]
    for i in range(K_CORE_ITERS):
        ctes.append(f"""alive{i + 1} AS MATERIALIZED (
        SELECT e.src AS node
        FROM edges e
        JOIN alive{i} a1 ON e.src = a1.node
        JOIN alive{i} a2 ON e.dst = a2.node
        GROUP BY e.src
        HAVING count(*) >= {K_CORE_K}
    )""")
    counts = "\n        UNION ALL\n".join(
        f"        SELECT {i} AS iteration, count(*) AS n_alive FROM alive{i}"
        for i in range(K_CORE_ITERS + 1)
    )
    return f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), p AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), edges AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM p
        UNION ALL
        SELECT pb, pa FROM p
    ), {", ".join(ctes)},
    curve AS (
{counts}
    )
    SELECT CAST(iteration AS INTEGER) AS iteration,
           CAST(n_alive AS BIGINT) AS n_alive,
           CAST(coalesce(lag(n_alive) OVER (ORDER BY iteration)
                         - n_alive, 0) AS BIGINT) AS n_removed,
           coalesce(n_alive = lag(n_alive) OVER (ORDER BY iteration),
                    FALSE) AS converged
    FROM curve
    """


@query("graph_kcore_peel", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition of the part co-purchase graph —
    closing the declared k-core thin spot with the same device that
    made PageRank gradable: a FIXED iteration count instead of
    iterate-to-convergence (unbounded loops cannot be a graded
    contract; a converged flag column reports whether the fixpoint
    was reached inside the budget, and at k={K_CORE_K} the sf0.01
    graph converges in 5 of the {K_CORE_ITERS} rounds with a nonempty
    core).

    Peel round: keep nodes with >= k neighbors still alive — two
    semi-join-shaped hash joins of the static edge list against the
    alive set plus one count per node, i.e. ONE shuffle per round
    (the Pregel degree-message round). The graded output is the peel
    CURVE (iteration, n_alive, n_removed, converged): node-level core
    membership is alive_{K_CORE_ITERS}'s content, deliberately
    rolled up so the output is scale-stable. At 100 TB the edge list
    is bucketed by src so the per-round joins never reshuffle it, and
    `localCheckpoint` truncates lineage exactly as in PageRank.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    p = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    edges = p.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).union(
        p.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    # ckpt-grain: slim-exception — 2-col symmetric edge keys, reused every peel round
    edges = edges.localCheckpoint(eager=False)

    alive = edges.select(F.col("src").alias("node")).distinct()
    gens = [alive]
    for _ in range(K_CORE_ITERS):
        e1 = edges.join(alive.select(F.col("node").alias("src")), "src")
        e2 = e1.join(alive.select(F.col("node").alias("dst")), "dst")
        alive = (
            e2.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= K_CORE_K)
            .select("node")
            # ckpt-grain: iterative-loop — k-core alive-set state; checkpoint truncates per-round lineage
            .localCheckpoint(eager=False)
        )
        gens.append(alive)

    curve = None
    for i, g in enumerate(gens):
        row = g.agg(F.count(F.lit(1)).cast("bigint").alias("n_alive")).select(
            F.lit(i).cast("int").alias("iteration"), "n_alive"
        )
        curve = row if curve is None else curve.unionAll(row)

    w = Window.orderBy("iteration")
    return curve.select(
        "iteration",
        "n_alive",
        F.coalesce(
            F.lag("n_alive").over(w) - F.col("n_alive"), F.lit(0)
        ).cast("bigint").alias("n_removed"),
        F.coalesce(
            F.col("n_alive") == F.lag("n_alive").over(w), F.lit(False)
        ).alias("converged"),
    )


HITS_ROUNDS = 3
HITS_PPM = 1_000_000  # per-round fixed-point rescale: x <- x*1e6 DIV max(x)


def _hits_oracle() -> str:
    """Unrolled HITS oracle: 3 rounds of h = W·a, a = Wᵀ·h, each half
    renormalized to 1e6 fixed point by integer division by the round
    max. Every CTE is MATERIALIZED — raw/normalized pairs are
    referenced twice and DuckDB otherwise re-inlines the whole chain
    exponentially (playbook: graph_kcore_peel's >80GB spill)."""
    sql = [
        """
    WITH w AS MATERIALIZED (
        SELECT s.s_nationkey AS s_nat, c.c_nationkey AS c_nat,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    a0 AS MATERIALIZED (
        SELECT n_nationkey AS node, CAST(1000000 AS BIGINT) AS x
        FROM nation
    )"""
    ]
    prev_a = "a0"
    for r in range(1, HITS_ROUNDS + 1):
        sql.append(f""",
    h{r}r AS MATERIALIZED (
        SELECT n.n_nationkey AS node,
               coalesce(sum(w.w * a.x), 0) AS x
        FROM nation n
        LEFT JOIN w ON w.s_nat = n.n_nationkey
        LEFT JOIN {prev_a} a ON a.node = w.c_nat
        GROUP BY 1
    ),
    h{r} AS MATERIALIZED (
        SELECT node,
               CAST((CAST(x AS HUGEINT) * {HITS_PPM})
                    // (SELECT max(x) FROM h{r}r) AS BIGINT) AS x
        FROM h{r}r
    ),
    a{r}r AS MATERIALIZED (
        SELECT n.n_nationkey AS node,
               coalesce(sum(w.w * h.x), 0) AS x
        FROM nation n
        LEFT JOIN w ON w.c_nat = n.n_nationkey
        LEFT JOIN h{r} h ON h.node = w.s_nat
        GROUP BY 1
    ),
    a{r} AS MATERIALIZED (
        SELECT node,
               CAST((CAST(x AS HUGEINT) * {HITS_PPM})
                    // (SELECT max(x) FROM a{r}r) AS BIGINT) AS x
        FROM a{r}r
    )""")
        prev_a = f"a{r}"
    sql.append(f"""
    SELECT n.n_name, h.x AS hub_ppm, a.x AS auth_ppm
    FROM nation n
    JOIN h{HITS_ROUNDS} h ON h.node = n.n_nationkey
    JOIN a{HITS_ROUNDS} a ON a.node = n.n_nationkey
    ORDER BY n.n_name
    """)
    return "".join(sql)


@query("graph_hits_hubs_authorities", oracle=_hits_oracle())
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) on the DIRECTED nation trade
    graph — supplier nation -> customer nation, weighted by shipped
    lineitem count. Hubs are nations whose suppliers feed the big
    buying nations; authorities are the nations that buy from the big
    supplying ones — the directed complement of graph_pagerank_trade's
    undirected centrality. 3 synchronous rounds of h = W·a, a = Wᵀ·h.

    Exactness device (all-integer, unlike PageRank's 12dp-round float
    contract): scores live in 1e6 FIXED POINT and every half-round
    renormalizes by x <- (x*1e6) DIV max(x) — exact integer division
    identical in both engines (Spark DECIMAL DIV with a small quotient;
    DuckDB HUGEINT //), so state is bit-equal at every boundary and no
    float exists anywhere. Unnormalized HITS would grow like
    ||W||^(2k) and overflow any fixed width; max-normalizing per half
    keeps scores <= 1e6 and raw sums <= W_total*1e6 (BIGINT to ~9e12
    total edges; the DECIMAL(38,0) product path carries past that).

    100 TB plan: the data-sized stage is ONE pass building the 625-cell
    W matrix (three keyed joins + hash collapse, map-side partials);
    every iteration then runs on nation-grain frames (25 rows) with
    1-row max anchors — zero driver round-trips, no lineage growth
    worth checkpointing. The oracle unrolls the same rounds as
    MATERIALIZED CTEs.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("s_nat"),
            F.col("c_nationkey").alias("c_nat"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        # ckpt-grain: bounded — nation x nation grain (25 x 25)
        .localCheckpoint(eager=False)
    )
    nodes = nat.select(F.col("n_nationkey").alias("node"))

    def norm(raw: DataFrame) -> DataFrame:
        # raw is referenced twice (max anchor + rescale): checkpoint it
        # or the lineage DOUBLES per half-round (2^6 plan blow-up —
        # 1500+ Exchange nodes in the unchecked plan, vs ~30 after).
        # ckpt-grain: bounded — nation-grain HITS vector, re-checkpointed per half-round
        raw = raw.localCheckpoint(eager=False)
        mx = raw.agg(F.max("x").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(
                f"CAST((CAST(x AS DECIMAL(38,0)) * {HITS_PPM})"
                " DIV nullif(mx, 0) AS BIGINT)"
            ).alias("x"),
        )

    def pull(vec: DataFrame, src_key: str, dst_key: str) -> DataFrame:
        # one message round: for each node, sum w * vec over incoming arcs
        msgs = (
            w.join(vec, w[src_key] == vec.node)
            .select(F.col(dst_key).alias("node"), (F.col("w") * F.col("x")).alias("m"))
            .groupBy("node")
            .agg(F.sum("m").alias("mass"))
        )
        return nodes.join(msgs, "node", "left").select(
            "node", F.coalesce("mass", F.lit(0)).cast("bigint").alias("x")
        )

    a = nodes.select("node", F.lit(HITS_PPM).cast("bigint").alias("x"))
    for _ in range(HITS_ROUNDS):
        h = norm(pull(a, "c_nat", "s_nat"))
        a = norm(pull(h, "s_nat", "c_nat"))
    return (
        nat.join(h.withColumnRenamed("x", "hub_ppm"), nat.n_nationkey == F.col("node"))
        .drop("node")
        .join(a.withColumnRenamed("x", "auth_ppm"), nat.n_nationkey == F.col("node"))
        .select("n_name", "hub_ppm", "auth_ppm")
        .orderBy("n_name")
    )


@query(
    "graph_modularity_regions",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS (
        SELECT cn.n_regionkey AS rc, sn.n_regionkey AS rs
        FROM pairs p
        JOIN customer c ON c.c_custkey = p.ck
        JOIN supplier s ON s.s_suppkey = p.sk
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS m FROM edges
    ), intra AS (
        SELECT rc AS rk, CAST(count(*) AS BIGINT) AS e_c
        FROM edges WHERE rc = rs GROUP BY 1
    ), ends AS (
        SELECT rk, CAST(count(*) AS BIGINT) AS d_c FROM (
            SELECT rc AS rk FROM edges
            UNION ALL
            SELECT rs FROM edges
        ) GROUP BY 1
    ), stats AS (
        SELECT e.rk, coalesce(i.e_c, 0) AS e_c, e.d_c, m.m
        FROM ends e LEFT JOIN intra i ON i.rk = e.rk CROSS JOIN m
    ), contrib AS (
        SELECT r_name AS community, e_c AS intra_edges,
               d_c AS degree_endpoints,
               CAST((2 * (4 * CAST(e_c AS HUGEINT) * m
                          - CAST(d_c AS HUGEINT) * d_c) * 1000000
                     + 4 * CAST(m AS HUGEINT) * m)
                    // (2 * 4 * CAST(m AS HUGEINT) * m) AS BIGINT)
                   AS q_contrib_e6
        FROM stats JOIN region ON r_regionkey = rk
    ), total AS (
        SELECT 'TOTAL' AS community,
               CAST(sum(e_c) AS BIGINT) AS intra_edges,
               CAST(sum(d_c) AS BIGINT) AS degree_endpoints,
               CAST((2 * (4 * sum(CAST(e_c AS HUGEINT)) * max(m)
                          - sum(CAST(d_c AS HUGEINT) * d_c)) * 1000000
                     + 4 * max(CAST(m AS HUGEINT)) * max(m))
                    // (2 * 4 * max(CAST(m AS HUGEINT)) * max(m)) AS BIGINT)
                   AS q_contrib_e6
        FROM stats
    )
    SELECT * FROM contrib UNION ALL SELECT * FROM total
    """,
)
def graph_modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the region partition over the
    customer-supplier trade graph: edges are distinct trading
    (customer, supplier) pairs projected to nation regions; Q_c =
    e_c/m - (d_c/2m)^2 per community (region), plus the TOTAL row
    recomputed exactly from the summed sufficient statistics (not by
    summing the rounded per-region contributions). Q near 0 is the
    null expectation — trade in TPC-H-ish data is region-uniform — and
    that near-zero verdict is itself the graded fact; the operator is
    the partition-quality score every community-detection pipeline
    (Louvain/label-propagation) optimizes, here graded exactly.

    Exact end-to-end: edge/endpoint/intra counts are integers, Q's
    rational (4*e_c*m - d_c^2) / (4m^2) ships as a half-up e6 integral
    quotient on DECIMAL/HUGEINT products (no floats anywhere).

    100 TB: one distinct-pair shuffle (the dedup-exact shape) then
    everything folds to the 5-region grain; the region dimension
    broadcasts; degree endpoints come from one unioned projection of
    the edge frame, not a self-join.
    """
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    edges = (
        pairs.join(F.broadcast(cust), F.col("ck") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("cnk"),
                                   F.col("n_regionkey").alias("rc"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("snk"),
                                   F.col("n_regionkey").alias("rs"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("rc", "rs")
        .persist()  # edge grain: data-proportional (r11 rule)
    )
    m = edges.agg(F.count("*").cast("long").alias("m"))
    intra = (
        edges.filter(F.col("rc") == F.col("rs"))
        .groupBy(F.col("rc").alias("rk"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    ends = (
        edges.select(F.col("rc").alias("rk"))
        .unionAll(edges.select(F.col("rs").alias("rk")))
        .groupBy("rk")
        .agg(F.count("*").cast("long").alias("d_c"))
    )
    stats = (
        ends.join(intra, "rk", "left")
        .select("rk", F.coalesce("e_c", F.lit(0)).alias("e_c"), "d_c")
        .crossJoin(F.broadcast(m))
        # ckpt-grain: bounded — region grain
        .localCheckpoint(eager=False)
    )
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    q_expr = (
        "CAST((2 * (4 * CAST(e_c AS DECIMAL(38,0)) * m"
        " - CAST(d_c AS DECIMAL(38,0)) * d_c) * 1000000"
        " + 4 * CAST(m AS DECIMAL(38,0)) * m)"
        " DIV (2 * 4 * CAST(m AS DECIMAL(38,0)) * m) AS BIGINT)"
    )
    contrib = stats.join(
        F.broadcast(reg), F.col("r_regionkey") == F.col("rk")
    ).select(
        F.col("r_name").alias("community"),
        F.col("e_c").alias("intra_edges"),
        F.col("d_c").alias("degree_endpoints"),
        F.expr(q_expr).alias("q_contrib_e6"),
    )
    total = stats.agg(
        F.sum("e_c").cast("bigint").alias("intra_edges"),
        F.sum("d_c").cast("bigint").alias("degree_endpoints"),
        F.expr(
            "CAST((2 * (4 * sum(CAST(e_c AS DECIMAL(38,0))) * max(m)"
            " - sum(CAST(d_c AS DECIMAL(38,0)) * d_c)) * 1000000"
            " + 4 * max(CAST(m AS DECIMAL(38,0))) * max(m))"
            " DIV (2 * 4 * max(CAST(m AS DECIMAL(38,0))) * max(m)) AS BIGINT)"
        ).alias("q_contrib_e6"),
    ).select(
        F.lit("TOTAL").alias("community"),
        "intra_edges",
        "degree_endpoints",
        "q_contrib_e6",
    )
    return contrib.unionAll(total)
