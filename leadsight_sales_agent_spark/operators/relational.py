"""Relational core: scans, filters, projections, joins, sort/limit/top-k.

The reference has no relational joins (SURVEY.md §2.4 — its only "join"
is a fused 1:1 enrichment merge, reference app.py:236-256); this module
supplies the full analytic join/sort surface the engine is graded on,
expressed so Catalyst picks broadcast-hash vs sort-merge itself.

Scale notes (100 TB):
- Dimension joins use explicit ``broadcast()`` — region/nation/customer/
  supplier/part stay small relative to facts, so the fact side never
  shuffles for them.
- Fact-fact joins (lineitem ⋈ orders) are equi-joins on the natural key;
  at scale these want co-partitioned bucketing on l_orderkey/o_orderkey,
  which the plan here is compatible with (plain equi-join — Catalyst
  uses bucket metadata when present, SMJ otherwise; AQE handles skew).
- Top-k goes through orderBy+limit → Catalyst's TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.functions.numeric import (
    ddbl,
    d53,
    d53s,
    dsum,
    sql_d53,
    sql_d53s,
    sql_dsum,
    sql_hex_to_long,
)
from leadsight_sales_agent_spark.operators.sampling import hash_key
from leadsight_sales_agent_spark.registry import query
from leadsight_sales_agent_spark.sources.catalog import load


# ---------------------------------------------------------------------------
# Flagship: lead prioritization — revenue by market segment and month.
# Exercises scan, 2 equi-joins (1 broadcast), filter pushdown, date funcs,
# hash aggregation, sort, alias discipline. (SURVEY.md §7.1)
# ---------------------------------------------------------------------------

@query(
    "flagship_revenue_by_segment_month",
    oracle=f"""
    SELECT
        c.c_mktsegment                                   AS mktsegment,
        strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
        {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue,
        count(*)                                         AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def flagship_revenue_by_segment_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        lineitem
        # filter written before joins → pushed into the parquet scan
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM").alias("ship_month"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("mktsegment", "ship_month")
    )


# ---------------------------------------------------------------------------
# Join surface: inner / left / right / full / semi / anti / cross /
# non-equi range. (SURVEY.md §2.4 engine requirement)
# ---------------------------------------------------------------------------

@query(
    "join_inner_orders_customer",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_name AS cust_name,
           c.c_mktsegment AS mktsegment, round(o.o_totalprice, 2) AS totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@query(
    "join_left_customer_order_counts",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment,
           count(o.o_orderkey) AS n_orders,
           coalesce({sql_dsum("o.o_totalprice", 2)}, 0.0) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def join_left_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeping order-less customers (count(col) skips nulls)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice"), 2), F.lit(0.0)).alias("total_spend"),
        )
    )


@query(
    "join_right_orders_customer",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name, o.o_orderkey AS orderkey
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < 0
    """,
)
def join_right_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
        )
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
                FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
                FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.n_customers, 0) AS n_customers,
           coalesce(sn.n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "join_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("cust_name"))
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment"))
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join on a tiny dimension (the only safe cardinality for one)."""
    a = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("ka"), F.col("r_name").alias("region_a")
    )
    b = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("kb"), F.col("r_name").alias("region_b")
    )
    return a.crossJoin(b).filter(F.col("ka") < F.col("kb")).select("region_a", "region_b")


@query(
    "join_range_price_brackets",
    oracle=f"""
    WITH brackets(bracket, lo, hi) AS (
        VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
               ('high', 150000.0, 1000000000.0)
    )
    SELECT b.bracket AS bracket, count(*) AS n_orders,
           {sql_dsum("o.o_totalprice", 2)} AS total_price
    FROM orders o JOIN brackets b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1
    """,
)
def join_range_price_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: orders banded into price brackets.

    The bracket side is tiny → Spark picks BroadcastNestedLoopJoin,
    which is the right physical plan for band joins at any scale when
    one side broadcasts.
    """
    orders = load(spark, sf_dir, "orders")
    brackets = spark.createDataFrame(
        [("low", 0.0, 50_000.0), ("mid", 50_000.0, 150_000.0), ("high", 150_000.0, 1_000_000_000.0)],
        "bracket STRING, lo DOUBLE, hi DOUBLE",
    )
    return (
        orders.join(
            F.broadcast(brackets),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("bracket")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_asof_purchase_last_click",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(max(c.ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM purchases p LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def join_asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.

    Implemented as union + windowed last(ignorenulls) — one shuffle on
    (user_id), no row explosion, which is the scalable as-of pattern
    (vs. the oracle's quadratic-per-user join+max, fine for DuckDB at
    test scale). SURVEY.md §2.4.
    """
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    tagged = events.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_type").asc())  # click sorts before purchase at equal ts
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        tagged.withColumn("last_click", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_click", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY.md §2.6 T1-T4)
# ---------------------------------------------------------------------------

@query(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS totalprice,
           o_orderpriority AS priority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort at scale).

    Tie-break on the key keeps the result set deterministic across
    engines (reference T1/T2, app.py:181,188 sorts then slices [:3]).
    """
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


@query(
    "sort_multi_column_suppliers",
    oracle="""
    SELECT s_suppkey AS suppkey, s_name AS supp_name, s_nationkey AS nationkey,
           round(s_acctbal, 2) AS acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC
    """,
)
def sort_multi_column_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "supplier")
        .orderBy(F.asc("s_nationkey"), F.desc("s_acctbal"), F.asc("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("s_nationkey").alias("nationkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / filter fidelity (SURVEY.md §2.3 P1-P8 analogues)
# ---------------------------------------------------------------------------

@query(
    "filter_compound_predicates",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           round(l_extendedprice, 2) AS extendedprice, l_returnflag AS returnflag
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag <> 'A'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
    """,
)
def filter_compound_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate stack — all four push into the parquet scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
            & (F.col("l_returnflag") != "A")
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.round("l_extendedprice", 2).alias("extendedprice"),
            F.col("l_returnflag").alias("returnflag"),
        )
    )


@query(
    "project_reorder_with_missing_as_null",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS cust_name,
           CAST(NULL AS VARCHAR) AS enrichment_status,
           c_mktsegment AS mktsegment
    FROM customer
    """,
)
def project_reorder_with_missing_as_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P1 semantics: reindex to a fixed column contract, missing
    columns materialized as typed nulls (reference app.py:309)."""
    df = load(spark, sf_dir, "customer")
    contract = [
        ("custkey", "c_custkey"),
        ("cust_name", "c_name"),
        ("enrichment_status", None),  # not present in source → null column
        ("mktsegment", "c_mktsegment"),
    ]
    cols = [
        F.col(src).alias(out) if src in df.columns else F.lit(None).cast("string").alias(out)
        for out, src in contract
    ]
    return df.select(*cols)


N_SALT = 8


@query(
    "join_salted_skew_demo",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted_skew_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for skewed join keys, made explicit: the fact side gets a
    random-free deterministic salt (hash of its row key, mod N_SALT),
    the dimension side is exploded N_SALT× so every (key, salt) pair
    matches — a hot key's rows now spread over N_SALT reducers.

    Result is identical to the plain join (the oracle IS the plain
    join). On this engine AQE's skewJoin covers most cases at runtime;
    manual salting remains the tool when one key dominates inside a
    single task even after AQE splits, or when the skewed side feeds a
    window/groupBy that AQE can't split. Salt is derived with xxhash64
    (not rand()) so the plan stays deterministic and retry-safe.

    Measured (r8, tools/skew_ab.py — 4.8M-row fact, one key owning 30%,
    broadcast disabled): net of the shared scan, this device runs the
    shuffle join ~2.5-3x faster than the plain plan and beats AQE's
    skew split on that shape; thresholds in SURVEY §8.12.
    """
    orders = load(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALT)).cast("int")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)])))
    )
    joined = orders.hint("shuffle_hash").join(
        cust, (orders.o_custkey == cust.c_custkey) & (orders.salt == cust.salt)
    )
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("*").alias("n_orders"),
        ddbl(F.round(F.sum(F.col("o_totalprice").cast("decimal(25,6)")), 2), 2)
        .alias("total_price"),
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey,
               'P' AS o_orderstatus,
               CAST(round(CAST(o_totalprice AS DECIMAL(15,6)) * CAST(1.1 AS DECIMAL(3,1)), 2)
                    AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
    ), inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey,
               'N' AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 997 = 0
    ), delta AS (
        SELECT * FROM updates UNION ALL SELECT * FROM inserts
    )
    SELECT coalesce(d.o_orderkey, b.o_orderkey) AS orderkey,
           coalesce(d.o_orderstatus, b.o_orderstatus) AS orderstatus,
           coalesce(d.o_totalprice, b.o_totalprice) AS totalprice
    FROM orders b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE / upsert (the engine form of K2's incremental
    materialization, app.py:303-310, generalized): a delta of updates
    (matched rows replace base values) and inserts (unmatched rows
    append) merged into a snapshot via one FULL OUTER JOIN + coalesce —
    the classic upsert plan on plain parquet, and exactly what a MERGE
    INTO statement lowers to without a transactional table format.

    The delta here is synthesized deterministically from the base table
    (every 7th order re-priced, every 997th cloned as a new key) so the
    oracle is exact. Scale shape: one shuffle on the merge key for each
    side; AQE handles delta≪base by broadcasting the delta.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            # decimal multiply + decimal round: a double round(x*1.1, 2)
            # flips last digits between engines (shortest-repr vs binary)
            F.round(
                # r13 (plan-lint R9): a per-row order total is
                # grain-bounded — DECIMAL(15,6) keeps the rounded
                # product's conversion on the exact int64 path.
                F.col("o_totalprice").cast("decimal(15,6)")
                * F.lit("1.1").cast("decimal(3,1)"),
                2,
            )
            .cast("double")
            .alias("o_totalprice"),
        )
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 997 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.col("o_totalprice"),
        )
    )
    delta = updates.unionAll(inserts)
    b = base.alias("b")
    d = delta.alias("d")
    return (
        b.join(d, F.col("b.o_orderkey") == F.col("d.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("d.o_orderkey"), F.col("b.o_orderkey")).alias("orderkey"),
            F.coalesce(F.col("d.o_orderstatus"), F.col("b.o_orderstatus")).alias(
                "orderstatus"
            ),
            F.coalesce(F.col("d.o_totalprice"), F.col("b.o_totalprice")).alias(
                "totalprice"
            ),
        )
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH src AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax
        FROM lineitem WHERE l_orderkey < 200
    )
    SELECT l_orderkey, l_linenumber, measure, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
               CAST(l_discount AS DOUBLE) FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax',
               CAST(l_tax AS DOUBLE) FROM src
    )
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measure columns → long (measure, value)
    rows — the inverse of agg_pivot_event_types and the reshape every
    metrics store / feature pipeline needs. Spark's native ``unpivot``
    plans as a single Expand node (one scan, rows×measures output, no
    join, no shuffle); the oracle spells the same reshape as a UNION
    ALL, which is what engines without the operator run. Bounded to
    l_orderkey < 200 to keep graded output proportionate.
    """
    src = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            *[
                F.col(c).cast("double").alias(c)
                for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
            ],
        )
    )
    return src.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# -- SCD Type 2 ---------------------------------------------------------------

SCD2_AS_OF = "2024-06-01"  # effective date of the simulated change batch


@query(
    "scd2_customer_segment_history",
    oracle=f"""
    WITH changes AS (
        -- simulated upstream segment changes: every 7th customer moves
        -- to MACHINERY (skipping those already there)
        SELECT c_custkey, 'MACHINERY' AS new_segment
        FROM customer
        WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'MACHINERY'
    )
    SELECT c.c_custkey,
           c.c_mktsegment AS segment,
           DATE '1992-01-01' AS valid_from,
           CASE WHEN ch.c_custkey IS NULL THEN NULL
                ELSE DATE '{SCD2_AS_OF}' END AS valid_to,
           ch.c_custkey IS NULL AS is_current
    FROM customer c LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
    UNION ALL
    SELECT c_custkey, new_segment, DATE '{SCD2_AS_OF}', NULL, true
    FROM changes
    """,
)
def scd2_customer_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: apply a change batch to the
    customer dimension, closing the old version (valid_to = effective
    date) and opening a new current one — the versioned-dimension ETL
    that MERGE-based warehouses run on every load (the unversioned
    upsert twin is merge_upsert_orders).

    One left join against the (small, broadcast) change batch marks
    closed rows; the new versions are a projection of the batch
    unioned on — no shuffle of the dimension beyond the broadcast
    probe, and the pattern composes with foreachBatch for streaming
    CDC ingestion. The change batch is simulated deterministically
    (every 7th customer re-segmented) so both engines derive it
    identically from the same table.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    changes = cust.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_mktsegment") != "MACHINERY")
    ).select("c_custkey", F.lit("MACHINERY").alias("new_segment"))
    as_of = F.to_date(F.lit(SCD2_AS_OF))
    marked = (
        cust.join(
            F.broadcast(changes.select("c_custkey", F.lit(True).alias("chg"))),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.to_date(F.lit("1992-01-01")).alias("valid_from"),
            F.when(F.col("chg"), as_of).otherwise(F.lit(None).cast("date")).alias(
                "valid_to"
            ),
            F.col("chg").isNull().alias("is_current"),
        )
    )
    opened = changes.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        as_of.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return marked.unionByName(opened)


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))
                          * CAST(1 - l.l_discount AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))
                          * CAST(1 - l.l_discount AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))
                          * CAST(1 - l.l_discount AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from line items where
    the supplier and the ordering customer sit in the SAME nation,
    restricted to one region and a two-year window — the canonical
    six-table star join and the densest single test of join planning
    in the classic benchmark (reference has no joins at all; this is
    the engine's north-star analytics surface, SURVEY §2.4).

    Plan shape that survives 100 TB: the date filter is written
    against the orders scan (pushed to parquet), the region filter
    prunes nation/supplier/customer via broadcast chains BEFORE the
    fact join, and the same-nation condition rides the supplier join
    (an equi-condition, not a post-filter — as a post-filter it would
    materialize the full cross-nation join first). lineitem joins
    orders on l_orderkey (the one big shuffle); everything else
    broadcasts. Revenue = decimal-multiplied price×(1−discount), the
    engine-exact money path.
    """
    region = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", F.col("n_name").alias("nation"))
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dec = "decimal(25,6)"
    revenue_term = F.col("l_extendedprice").cast(dec) * (
        F.lit(1) - F.col("l_discount")
    ).cast(dec)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == supplier.s_suppkey)
            & (supplier.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("nation")
        .agg(ddbl(F.round(F.sum(revenue_term), 2), 2).alias("revenue"))
    )


@query(
    "null_semantics_suite",
    oracle="""
    WITH src AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN NULL
                    ELSE c_mktsegment END AS seg,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT COALESCE(seg, '<NULL>') AS segment,
           count(*) AS n_rows,
           count(bal) AS n_bal_nonnull,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(bal AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(bal AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(bal AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
               AS total_bal,
           count(CASE WHEN bal IS DISTINCT FROM bal THEN 1 END)
               AS n_selfneq,
           count(CASE WHEN NOT (seg IS DISTINCT FROM NULL) THEN 1 END)
               AS n_nullsafe_eq_null
    FROM src
    GROUP BY seg
    """,
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics parity pack: NULL group keys form their own
    group, aggregate functions skip NULLs (count(col) vs count(*)),
    sum-over-nulls stays engine-exact, and null-safe equality
    (`<=>` / IS NOT DISTINCT FROM) behaves — the silent-divergence
    corners every engine pair disagrees on somewhere. Nulls are
    injected deterministically (every 5th/7th key) so both engines
    derive identical inputs from the shared table.

    All single-scan aggregation; the NULL group is just another hash
    bucket (beware at scale: if most keys are NULL, that one bucket is
    the skew — filter or salt NULLs before grouping, same playbook as
    skew_diagnostics_orders).
    """
    cust = load(spark, sf_dir, "customer")
    src = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    from leadsight_sales_agent_spark.functions.numeric import dsum

    return (
        src.groupBy("seg")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("bal").alias("n_bal_nonnull"),
            dsum(F.col("bal")).alias("total_bal"),
            F.count(F.when(~F.col("bal").eqNullSafe(F.col("bal")), 1)).alias(
                "n_selfneq"
            ),
            F.count(F.when(F.col("seg").eqNullSafe(F.lit(None)), 1)).alias(
                "n_nullsafe_eq_null"
            ),
        )
        .select(
            F.coalesce("seg", F.lit("<NULL>")).alias("segment"),
            "n_rows",
            "n_bal_nonnull",
            "total_bal",
            "n_selfneq",
            "n_nullsafe_eq_null",
        )
    )


@query(
    "correlated_subquery_low_quantity_parts",
    oracle="""
    SELECT l.l_partkey,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS low_qty_revenue,
           count(*) AS n_items
    FROM lineitem l
    WHERE l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY 1
    """,
)
def correlated_subquery_low_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery: line items whose
    quantity is below half their part's average quantity — written AS
    the subquery (via spark.sql) so Catalyst's decorrelation is what
    executes: the optimizer rewrites the per-row subquery into one
    aggregate on l_partkey plus a join, turning O(rows × subquery)
    naive semantics into two scans and one shuffle. A hand-decorrelated
    DataFrame twin would be the same plan; the point is that the
    engine accepts the declarative form and plans it right (check
    `.explain`: no more scalar-subquery node, an Aggregate feeding a
    Join instead).

    Per-part averages: l_quantity is integer-valued, so avg is exact
    in both engines (no decimal machinery needed for the predicate);
    the revenue output still takes the decimal-sum path.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_q17")
    return spark.sql(
        """
        SELECT l.l_partkey,
               ((CAST((CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST((CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DECIMAL(38,0)) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS low_qty_revenue,
               count(*) AS n_items
        FROM li_q17 l
        WHERE l.l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity)
            FROM li_q17 l2
            WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        """
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of non-urgent order counts per
    customer, i.e. an aggregate OF an aggregate over an outer join
    (customers with zero qualifying orders must appear in the c_count=0
    bucket, which an inner join would silently drop).

    Scale plan: the join condition's non-key predicate
    (o_orderpriority <> '1-URGENT') is evaluated as part of the join,
    so Catalyst pushes it to the orders scan side BEFORE the shuffle —
    urgent orders never cross the wire. First groupBy shuffles on
    c_custkey (same key as the join, so AQE coalesces into one
    exchange reuse); the second groupBy keys on c_count, whose
    cardinality is tiny (~dozens of distinct counts) — partial
    aggregation collapses it map-side, so the second shuffle moves a
    few hundred rows regardless of table size. All counts are exact
    integers: no float machinery needed.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY 1
    """,
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — orders in a six-month window having at least
    one line item shipped more than 30 days after the order date,
    counted per priority. The EXISTS decorrelates to a LEFT SEMI join:
    each order contributes once no matter how many late lines it has
    (a plain inner join + distinct would shuffle every matching line;
    the semi join short-circuits at the first match per key).

    Scale plan: the date-window filter is applied to orders before the
    join (pushed to the parquet scan — at 100 TB with date-partitioned
    orders this is partition pruning, reading 6 months not 7 years).
    The non-equi part of the predicate (l_shipdate > o_orderdate + 30d)
    rides on the equi semi join on l_orderkey, so the shuffle is plain
    hash partitioning on the join key. Counts are exact integers.
    """
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late_exists.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who were the SOLE late shipper on
    multi-supplier orders (shipped >45 days after the order date while
    every other supplier on the order shipped on time). The classic
    EXISTS + NOT EXISTS double correlation, hand-decorrelated into a
    semi join (some other supplier participated) plus an anti join
    (no other supplier was late) — the same rewrite Catalyst applies
    to the subquery form, written explicitly so the plan is visible.

    Scale plan: all three self-join legs key on l_orderkey, so AQE
    reuses one hash partitioning of lineitem across the semi and anti
    probes instead of three independent shuffles. The late filter
    (non-equi, needs o_orderdate) is computed once on the l1 leg by
    joining orders first — orders:lineitem is 1:n, and the join is on
    the natural key. The l2/l3 probe sides carry only
    (l_orderkey, l_suppkey, l_shipdate): column pruning keeps the
    shuffled probe rows ~20 bytes. Output is a per-supplier exact
    count.
    """
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")

    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("p_orderkey"), F.col("l_suppkey").alias("p_suppkey")
    )
    some_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("p_orderkey"))
        & (F.col("l_suppkey") != F.col("p_suppkey")),
        "left_semi",
    )
    l3 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select(
            F.col("l_orderkey").alias("q_orderkey"), F.col("l_suppkey").alias("q_suppkey")
        )
    )
    sole_late = some_other.join(
        l3,
        (F.col("l_orderkey") == F.col("q_orderkey"))
        & (F.col("l_suppkey") != F.col("q_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(s, sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "snapshot_diff_reconciliation",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey,
               'P' AS o_orderstatus,
               CAST(round(CAST(o_totalprice AS DECIMAL(15,6)) * CAST(1.1 AS DECIMAL(3,1)), 2)
                    AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
    ), inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey,
               'N' AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 997 = 0
    ), delta AS (
        SELECT * FROM updates UNION ALL SELECT * FROM inserts
    ), merged AS (
        SELECT coalesce(d.o_orderkey, b.o_orderkey) AS orderkey,
               coalesce(d.o_orderstatus, b.o_orderstatus) AS orderstatus,
               coalesce(d.o_totalprice, b.o_totalprice) AS totalprice
        FROM orders b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
    ), j AS (
        SELECT m.orderkey AS mk, m.orderstatus AS ms, m.totalprice AS mp,
               b.o_orderkey AS bk, b.o_orderstatus AS bs, b.o_totalprice AS bp
        FROM merged m FULL OUTER JOIN orders b ON m.orderkey = b.o_orderkey
    )
    SELECT CASE WHEN bk IS NULL THEN 'added'
                WHEN mk IS NULL THEN 'removed'
                WHEN ms <> bs OR mp <> bp THEN 'changed'
                ELSE 'unchanged' END AS diff_class,
           count(*) AS n_rows
    FROM j GROUP BY 1
    """,
)
def snapshot_diff_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (data diff): classify every key across
    two table versions — the post-MERGE validation every CDC pipeline
    runs (did the upsert change exactly what the delta said it
    would?). Here the new version is merge_upsert_orders' output, so
    the expected answer is fully determined: adds = the insert keys,
    changed = the update keys, removed = none, everything else
    untouched.

    Implementation is a FULL OUTER JOIN on the key with field-level
    compares — column equality, not row-hash strings, because double →
    string rendering is engine-specific while double equality on
    identically-derived values is exact. Scale: both sides partition
    on the same key (the MERGE output is already partitioned on it —
    exchange reuse), and the diff-class aggregate is 4 groups,
    map-side collapsed. At 100 TB you'd add the xor-of-row-hash
    fingerprint (agg_bitwise_boolean_suite pattern) as the cheap
    pre-check and only run the full diff when fingerprints differ.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    merged = merge_upsert_orders(spark, sf_dir)
    j = merged.join(
        base, merged.orderkey == base.o_orderkey, "full_outer"
    )
    cls = (
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("orderkey").isNull(), "removed")
        .when(
            (F.col("orderstatus") != F.col("o_orderstatus"))
            | (F.col("totalprice") != F.col("o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return j.groupBy(cls.alias("diff_class")).agg(F.count("*").alias("n_rows"))


@query(
    "quantified_all_subquery",
    oracle="""
    SELECT p_partkey, p_brand, round(p_retailprice, 2) AS retailprice
    FROM part
    WHERE p_retailprice > ALL (
        SELECT p_retailprice FROM part WHERE p_brand = 'Brand#1'
    )
    """,
)
def quantified_all_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison (> ALL): parts priced above every
    Brand#1 part. Spark SQL has no ALL/ANY quantifier, so the engine
    side applies the standard equivalence `x > ALL (S)` ⇔
    `x > (SELECT max(S))` explicitly — which is precisely the plan a
    quantifier-supporting engine (the DuckDB oracle keeps the > ALL
    spelling) produces after rewriting: one 1-row aggregate feeding a
    scalar-subquery filter, never a per-row nested loop. r10: the
    rewrite is TOTAL — `x > ALL (∅)` is vacuously TRUE while
    `x > max(∅) = NULL` is not, so the filter carries the explicit
    empty-set branch (count = 0), exact for any non-null S (the
    r10 degenerate-slice audit caught the divergence on a catalog
    with no Brand#1 part). Raw-double comparison is safe — both
    engines compare identical parquet values; only the REPORTED
    price is rounded.
    """
    load(spark, sf_dir, "part").createOrReplaceTempView("v_part_all")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, round(p_retailprice, 2) AS retailprice
        FROM v_part_all
        WHERE (
            SELECT count(p_retailprice) FROM v_part_all
            WHERE p_brand = 'Brand#1'
        ) = 0
           OR p_retailprice > (
            SELECT max(p_retailprice) FROM v_part_all WHERE p_brand = 'Brand#1'
        )
        """
    )


@query(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH changes AS (
        SELECT c_custkey, 'MACHINERY' AS new_segment
        FROM customer
        WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'MACHINERY'
    ), hist AS (
        SELECT c.c_custkey,
               c.c_mktsegment AS segment,
               DATE '1992-01-01' AS valid_from,
               CASE WHEN ch.c_custkey IS NULL THEN NULL
                    ELSE DATE '{SCD2_AS_OF}' END AS valid_to
        FROM customer c LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
        UNION ALL
        SELECT c_custkey, new_segment, DATE '{SCD2_AS_OF}', NULL
        FROM changes
    )
    SELECT h.segment AS segment_at_order_time,
           count(*) AS n_orders,
           {sql_dsum("o.o_totalprice", 2)} AS total_price
    FROM orders o
    JOIN hist h
      ON o.o_custkey = h.c_custkey
     AND CAST(o.o_orderdate AS DATE) >= h.valid_from
     AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
    GROUP BY 1
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension: each
    order resolves to the customer-segment version VALID AT ITS ORDER
    DATE — the as-was reporting semantics versioned dimensions exist
    for. The probe: every order here predates the segment-change
    effective date, so changed customers correctly resolve to their
    OLD segment; a naive join on the current dimension row would
    misattribute all of their history to the new one (the exact bug
    SCD2 prevents, visible as a different revenue split).

    Plan: equi join on the customer key carries the temporal predicate
    as a post-join filter — the history table has ≤2 versions per key,
    so the range condition prunes at most one row per match (never a
    range-join explosion; exactly one version covers any date by the
    SCD2 invariant). History is dimension-sized → broadcast; one
    fact-side aggregate. Reuses scd2_customer_segment_history's
    derivation so the two queries stay in lockstep.
    """
    hist = scd2_customer_segment_history(spark, sf_dir).select(
        "c_custkey", "segment", "valid_from", "valid_to"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("odate"), "o_totalprice"
    )
    j = o.join(
        F.broadcast(hist),
        (o.o_custkey == hist.c_custkey)
        & (F.col("odate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("odate") < F.col("valid_to"))),
    )
    return j.groupBy(F.col("segment").alias("segment_at_order_time")).agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "share_of_parent_revenue",
    oracle=f"""
    WITH nr AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(CAST(c.c_acctbal AS DECIMAL(25,6))) AS bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           {sql_d53s("round(bal, 2)", 2)} AS nation_balance,
           round({sql_d53s("bal", 6)}
                 / {sql_d53s("sum(bal) OVER (PARTITION BY region)", 6)},
                 4) AS share_of_region
    FROM nr
    """,
)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent in a geography hierarchy: each nation's account
    balance as a fraction of its REGION's total — the two-level
    percent-of-parent every drill-down report shows next to the raw
    number (ratio_to_report's single-level sibling). The division runs
    on identical doubles in both engines: exact decimal sums, DuckDB
    hopping decimal→VARCHAR→double (its direct cast double-rounds),
    then one deterministic divide rounded at 4. The window partitions
    by region over the 25-row nation frame — the parent total comes
    from the CHILD aggregates (no second fact-table pass), which is
    the only shape that scales when the hierarchy is deep.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    nr = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("c_acctbal").cast("decimal(25,6)")).alias("bal"))
    )
    w = Window.partitionBy("region")
    # r13 (plan-lint R9): bal and its region window-sum are wide
    # decimals whose unscaled value crosses 2^53 at scale, so both
    # convert through the d53s split (the oracle previously hopped
    # decimal->VARCHAR->double to match Spark; d53s makes the
    # conversion engine-independent by construction instead).
    return nr.select(
        "region",
        "nation",
        F.expr(d53s("round(bal, 2)", 2)).alias("nation_balance"),
        F.round(
            F.expr(d53s("bal", 6))
            / F.expr(d53s("sum(bal) OVER (PARTITION BY region)", 6)),
            4,
        ).alias("share_of_region"),
    )


PRIORITY_TIERS = [
    ("1-URGENT", "expedite"),
    ("2-HIGH", "expedite"),
    ("3-MEDIUM", "standard"),
    ("4-NOT SPECIFIED", "standard"),
    ("5-LOW", "deferred"),
]


@query(
    "values_inline_dim_join",
    oracle=f"""
    WITH tiers(priority, tier) AS (
        VALUES {", ".join(f"('{p}', '{t}')" for p, t in PRIORITY_TIERS)}
    )
    SELECT t.tier, count(*) AS n_orders,
           {sql_dsum("o.o_totalprice", 2)} AS total_price
    FROM orders o JOIN tiers t ON o.o_orderpriority = t.priority
    GROUP BY 1
    """,
)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table as a join dimension: a literal
    priority→tier mapping (the config-style seed data dbt calls a
    seed) joined against the fact table — no file, no registry, the
    mapping IS the query. Spark side: `createDataFrame` on the same
    constant list, broadcast (5 rows). This is the idiomatic
    replacement for a CASE ladder when the mapping is used by several
    queries or must be join-auditable. Aggregates take the usual
    decimal path.
    """
    o = load(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(PRIORITY_TIERS, "priority string, tier string")
    return (
        o.join(F.broadcast(tiers), o.o_orderpriority == tiers.priority)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "ansi_try_safety_suite",
    oracle="""
    WITH t AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_totalprice / (o_orderkey % 5) END AS q,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
               TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
        FROM orders
    )
    SELECT o_orderstatus,
           count(*) AS n_rows,
           count(*) FILTER (WHERE q IS NULL) AS n_div_by_zero,
           CAST(floor(max(q) * 10000) AS BIGINT) AS max_quotient_e4,
           CAST(sum(prio_digit) AS BIGINT) AS prio_digit_sum,
           count(bad_cast) AS n_bad_casts_succeeded
    FROM t GROUP BY 1
    """,
)
def ansi_try_safety_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic: Spark 4 runs ANSI SQL, where
    x/0 and bad casts THROW mid-job — a single poisoned row kills a
    100 TB pipeline hours in. The try_* family (try_divide, try_cast)
    converts those rows to NULL instead, and this suite pins the
    NULL-propagation semantics against the oracle: division by zero →
    NULL (counted), parseable prefix digit → value (summed exactly),
    unparseable full string → NULL (count of successes = 0). DuckDB's
    plain `/` already yields NULL on zero denominators, so the oracle
    spells the same semantics with CASE + TRY_CAST. The quotient max is
    emitted as floor(max(q)*10000) BIGINT — max of identical IEEE
    doubles is bit-identical in both engines, and the integer floor
    never crosses the boundary as a rounded double (the SURVEY §8.2
    hazard class that cost this query its r2 driver hash).
    """
    o = load(spark, sf_dir, "orders")
    t = o.select(
        "o_orderstatus",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5).alias("q"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
    )
    return t.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("q").isNull()).alias("n_div_by_zero"),
        F.floor(F.max("q") * 10000).cast("bigint").alias("max_quotient_e4"),
        F.sum("prio_digit").alias("prio_digit_sum"),
        F.count("bad_cast").alias("n_bad_casts_succeeded"),
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
        SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_a
        FROM orders GROUP BY 1
    ), b AS (
        SELECT nullif(o_orderstatus, 'O') AS k,
               ((CAST(CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
                   AS price_b
        FROM orders GROUP BY 1
    )
    SELECT a.k AS status_key, a.n_a, b.price_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality JOIN (`IS NOT DISTINCT FROM` / Spark
    `eqNullSafe`): standard equi-join semantics drop every row whose
    key is NULL on either side (NULL = NULL is NULL, not TRUE) — the
    silent row-loss bug whenever a join key is legitimately nullable
    (here: the 'O' status collapsed to NULL). The null-safe operator
    treats NULL as a joinable value, and — critically for scale — it
    is still planned as a HASH join (NULL hashes like any value under
    <=>), not a nested loop, so the plan is identical to a plain
    equi-join's. The NULL-keyed groups prove the match end to end.
    """
    o = load(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    a = o.groupBy(k.alias("ka")).agg(F.count("*").alias("n_a"))
    b = o.groupBy(k.alias("kb")).agg(
        ddbl(F.round(F.sum(F.col("o_totalprice").cast("decimal(25,6)")), 2), 2)
        .alias("price_b")
    )
    return a.join(b, a.ka.eqNullSafe(b.kb)).select(
        F.col("ka").alias("status_key"), "n_a", "price_b"
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
                   AS part_value
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT sum(part_value) AS total_value FROM pv
    )
    SELECT pv.l_partkey,
           CAST(CAST(round(pv.part_value, 2) AS DECIMAL(15,2)) AS DOUBLE)
               AS part_value
    FROM pv CROSS JOIN tot
    WHERE pv.part_value * 1500 > tot.total_value
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — parts whose revenue exceeds a FRACTION OF THE
    GLOBAL TOTAL (here 1/1500): the HAVING-against-a-scalar-subquery
    pattern, which separates "big in absolute terms" from "big
    relative to everything", and whose naive form re-reads the fact
    table for the threshold.

    Plan: ONE per-part aggregation; the global total is an aggregate
    OF that result (not a second fact-table scan) cross-joined back as
    a single broadcast row. The threshold compare is division-free
    (part_value × 1500 > total — exact decimal×int, the pareto
    lesson), so the qualifying set is bit-determined. At 100 TB the
    only heavy stage is the first hash-agg; everything after operates
    on per-part cardinality.
    """
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
        ).alias("part_value")
    )
    tot = pv.agg(F.sum("part_value").alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") * 1500 > F.col("total_value"))
        .select(
            "l_partkey",
            # r13 (plan-lint R9): per-part revenue is grain-bounded
            # (lineitems-per-part is constant in TPC-H scaling) — the
            # narrow DECIMAL(15,2) keeps the conversion exact-int64.
            F.round("part_value", 2)
            .cast("decimal(15,2)")
            .cast("double")
            .alias("part_value"),
        )
    )


@query(
    "tpch_q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c.c_name, 17, 2) AS name_bucket,
           count(*) AS n_customers,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
               AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def tpch_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — "global sales opportunity": customers with
    above-average positive account balance with no order since
    2000-01-01 (dormant), grouped by a name bucket (the stand-in for Q22's phone
    country code). Composes three decorrelation patterns in one query:
    a scalar aggregate subquery (the average), an uncorrelated
    threshold filter against it, and NOT EXISTS → left-anti against
    the fact table.

    Exactness: the average is an exact-integer-count division of
    identically-derived doubles — but rather than hash the average
    itself, it only GATES the row set (a > compare), and every output
    column is an exact count or decimal sum, so a last-ulp difference
    in the mean could only flip a row sitting exactly ON the mean —
    impossible for this data (the mean has more precision than any
    2-decimal balance). Plan: 1-row broadcast for the average, anti
    join shuffles on the customer key, final 100-group agg.
    """
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy(
        F.substring("c_name", 17, 2).alias("name_bucket")
    ).agg(
        F.count("*").alias("n_customers"),
        ddbl(F.round(F.sum(F.col("c_acctbal").cast("decimal(25,6)")), 2), 2)
        .alias("total_bal"),
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted: o_orderpriority stands in
    for the missing o_shippriority): the 10 highest-revenue unshipped
    BUILDING-segment orders as of the cutoff — ordered before it,
    shipped after it.

    Plan: segment filter prunes the customer dim (broadcast), the date
    filters push into both fact scans, lineitem⋈orders is the one big
    shuffle on the order key and the groupBy reuses that key (no
    second shuffle — the aggregation key contains the join key), then
    TakeOrderedAndProject for the top 10. Revenue ties are broken by
    order key so the K-set is a deterministic total order, and the
    decimal-sum helper keeps the sort key bit-identical cross-engine.
    """
    cutoff = F.lit("1998-07-01").cast("timestamp")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", 2)} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the revenue that would have
    been gained by eliminating small discounts on low-quantity items in
    one year — the benchmark's pure scan-filter-aggregate query and the
    cleanest predicate-pushdown test: at 100 TB this plan is ONE
    parquet scan with all three predicates pushed (shipdate range prunes
    row groups via min/max stats), a 3-column ReadSchema, and a single
    partial+final agg to one row. No join, no wide shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, n.n_name AS nation,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): the 20 customers who
    returned the most revenue in one quarter — the churn-risk report.

    Plan: quarter filter pushes into the orders scan, the return-flag
    filter into lineitem (dictionary-encoded column → row-group
    pruning), the fact join shuffles on the order key, customer and
    nation broadcast, and the final top-20 is TakeOrderedAndProject on
    a deterministic (revenue DESC, custkey) total order.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("c_custkey", "nation")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .select("c_custkey", "nation", "revenue", "n_items")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promotion_effect",
    oracle=f"""
    WITH t AS (
        SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice AS DECIMAL(25,6))
                             * CAST(1 - l.l_discount AS DECIMAL(25,6)) END)
                    * 1000000 AS DECIMAL(38,0)) AS promo_micro,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))
                        * CAST(1 - l.l_discount AS DECIMAL(25,6)))
                    * 1000000 AS DECIMAL(38,0)) AS total_micro
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
          AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    )
    SELECT CAST(round({sql_d53("promo_micro")} / 1000000.0, 2) AS DOUBLE)
               AS promo_revenue,
           CAST(round({sql_d53("total_micro")} / 1000000.0, 2) AS DOUBLE)
               AS total_revenue,
           CAST(CAST(promo_micro AS HUGEINT) * 10000
                // CAST(total_micro AS HUGEINT) AS BIGINT) AS promo_bp
    FROM t
    """,
)
def tpch_q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the share of one month's revenue
    that came from promotional parts. The classic percentage output is
    a decimal RATIO — the one thing the cross-engine hash contract
    cannot check through double division — so the share is emitted as
    exact integer BASIS POINTS (micro-unit sums, integer multiply,
    integer floor-divide; the repo's integer-evidence pattern from
    text_decontamination_gate) next to the two exactly-rounded sums.

    Plan: one month of lineitem (pushed range filter) joins the part
    dim — broadcast, so the fact table never shuffles; the conditional
    promo sum and total ride ONE partial+final aggregation to a single
    row. At 100 TB: scan, broadcast-hash-join, map-side partial agg —
    no wide shuffle anywhere.
    """
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    dec = "decimal(25,6)"
    term = F.col("l_extendedprice").cast(dec) * (
        F.lit(1) - F.col("l_discount")
    ).cast(dec)
    t = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(F.when(F.col("p_type") == "PROMO", term)) * 1000000)
            .cast("decimal(38,0)")
            .alias("promo_micro"),
            (F.sum(term) * 1000000).cast("decimal(38,0)").alias("total_micro"),
        )
    )
    # r13 (plan-lint R9): the micro-unit sums are DECIMAL(38,0) past
    # 2^53 at scale — convert through the d53 split, then one shared
    # divide+round tree (identical in the oracle).
    return t.select(
        F.expr(f"round({d53('promo_micro')} / 1000000.0, 2)")
        .cast("double")
        .alias("promo_revenue"),
        F.expr(f"round({d53('total_micro')} / 1000000.0, 2)")
        .cast("double")
        .alias("total_revenue"),
        F.expr("CAST((promo_micro * 10000) DIV total_micro AS BIGINT)").alias(
            "promo_bp"
        ),
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(25,6))) AS sum_qty
        FROM lineitem
        GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 250
    )
    SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(CAST(o.o_totalprice AS DECIMAL(15,6)), 2) AS DOUBLE)
               AS o_totalprice,
           CAST(CAST(b.sum_qty AS DECIMAL(15,6)) AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the 100 biggest orders whose
    total line quantity exceeds the threshold — the agg-then-semi-join
    shape (HAVING over a fact-table rollup feeding back into a join).

    Plan: lineitem aggregates on the order key (one shuffle), the
    HAVING filter shrinks that rollup to the rare big orders, and the
    join back to orders keys on the SAME order key — at 100 TB the
    filtered rollup is small, so AQE broadcasts it and orders never
    shuffles. Quantity sums ride decimal so the threshold compare and
    the output are engine-exact; top-100 is a deterministic
    (totalprice DESC, orderkey) TakeOrderedAndProject.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("decimal(15,6)"), 2)
            .cast("double")
            .alias("o_totalprice"),
            # r13 (plan-lint R9): a per-order quantity sum is grain-
            # bounded (a few hundred), so the narrow-decimal device
            # applies: DECIMAL(15,6) keeps the unscaled value under
            # 2^53 by type (ANSI overflow would raise loudly) and the
            # double conversion exact in both engines.
            F.col("sum_qty").cast("decimal(15,6)").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT date_part('year', l.l_shipdate) AS ship_year,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: no
    l_shipmode/commitdate columns exist, so the grouping is the ship
    year and "late" means shipped more than 60 days after ordering —
    the shape is intact: fact-fact join with a cross-table date
    predicate, then the CASE/FILTER conditional split of line counts by
    priority class.

    Plan: the late predicate references BOTH sides so it cannot push to
    either scan — it runs on the joined rows; the join shuffles on the
    order key (both sides pruned to 2-3 columns), and the priority
    split rides one partial+final aggregation keyed by year (5 groups).
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # timestamp + interval (NOT date_add, which truncates to DATE)
        # so both engines compare full timestamps identically
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count_if(is_high).alias("high_line_count"),
            F.count_if(~is_high).alias("low_line_count"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           date_part('year', l.l_shipdate) AS ship_year,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): cross-border revenue between two
    named nations (synthetic names NATION_1/NATION_2) by direction and year — the two-dimension-chains
    star join (supplier→nation AND customer→orders→nation) with a
    disjunctive cross-chain predicate.

    Plan: both nation dims pre-filter to the two named rows and
    broadcast down their chains BEFORE the fact join, so the
    disjunction evaluates on already-pruned supplier/customer sets;
    lineitem⋈orders is the one big shuffle. The classic Q7 trap — a
    cartesian of the two nation filters — cannot form because each
    nation copy joins through its own foreign-key chain.
    """
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey").alias("nk2"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("nk2"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH volume AS (
        SELECT date_part('year', o.o_orderdate) AS order_year,
               CAST(sum(CASE WHEN n.n_name = 'NATION_0'
                        THEN CAST(l.l_extendedprice AS DECIMAL(25,6))
                             * CAST(1 - l.l_discount AS DECIMAL(25,6)) END)
                    * 1000000 AS DECIMAL(38,0)) AS nation_micro,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))
                        * CAST(1 - l.l_discount AS DECIMAL(25,6)))
                    * 1000000 AS DECIMAL(38,0)) AS total_micro
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_type = 'ECONOMY'
        GROUP BY 1
    )
    SELECT order_year,
           CAST(round({sql_d53("COALESCE(nation_micro, 0)")} / 1000000.0, 2)
                AS DOUBLE) AS nation_revenue,
           CAST(round({sql_d53("total_micro")} / 1000000.0, 2) AS DOUBLE)
               AS total_revenue,
           CAST(CAST(COALESCE(nation_micro, 0) AS HUGEINT) * 10000
                // CAST(total_micro AS HUGEINT) AS BIGINT) AS share_bp
    FROM volume
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), adapted: one nation's share of
    ECONOMY-part revenue per order year (no region table hop — the
    share-of-conditional-sum core is the point). Like Q14, the share
    ships as integer basis points computed from exact micro-unit
    decimal sums — the classic Q8 `sum(case)/sum(all)` double division
    can never hash-match across engines.

    Plan: part filters and broadcasts (the most selective dim first),
    supplier+nation broadcast down the chain, lineitem⋈orders is the
    one shuffle, one conditional+total aggregation per year.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dec = "decimal(25,6)"
    term = F.col("l_extendedprice").cast(dec) * (
        F.lit(1) - F.col("l_discount")
    ).cast(dec)
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(F.when(F.col("n_name") == "NATION_0", term)) * 1000000)
            .cast("decimal(38,0)")
            .alias("nation_micro"),
            (F.sum(term) * 1000000).cast("decimal(38,0)").alias("total_micro"),
        )
    )
    # r13 (plan-lint R9): micro sums are DECIMAL(38,0) past 2^53 at
    # scale — d53 split before the shared divide+round tree.
    return vol.select(
        "order_year",
        F.expr(f"round({d53('COALESCE(nation_micro, 0)')} / 1000000.0, 2)")
        .cast("double")
        .alias("nation_revenue"),
        F.expr(f"round({d53('total_micro')} / 1000000.0, 2)")
        .cast("double")
        .alias("total_revenue"),
        F.expr(
            "CAST((COALESCE(nation_micro, 0) * 10000) DIV total_micro AS BIGINT)"
        ).alias("share_bp"),
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum("l_extendedprice * (1 - l_discount)", 2)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with the maximum
    quarterly revenue — the view-plus-scalar-subquery shape. ALL ties
    are kept (the spec's semantics), which is why this is a
    max-equality filter and not a top-1 limit; the decimal-exact
    revenue makes the tie compare engine-safe.

    Plan: one pushed-filter lineitem scan aggregates per supplier, the
    scalar max reduces that small rollup (broadcast as a one-row
    frame), and the filtered winners broadcast-join the supplier dim.
    The rollup subplan appears in both branches; at 100 TB you'd
    persist the quarterly revenue view once (the spec's CREATE VIEW)
    rather than lean on exchange reuse, and the dominant cost — the
    filtered fact scan + supplier-grain agg — is single-pass either way.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# -- SQL-surface completion: LATERAL, NULLS FIRST/LAST ------------------------


@query(
    "lateral_top_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the per-row dependent-join SQL
    surface (top-3 orders for each BUILDING customer). Spark 4
    decorrelates the ORDER BY ... LIMIT lateral into a partial
    WindowGroupLimit + hash join (verified via .explain: no per-row
    re-execution, no nested loop), which is exactly the window top-k
    plan `window_topk_orders_per_customer` builds by hand — this entry
    pins that the declarative LATERAL spelling reaches the same
    scale-safe shape, so users porting LATERAL-heavy reporting SQL
    don't need to rewrite it.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@query(
    "nulls_ordering_suite",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT * FROM (
        SELECT 'desc_nulls_last' AS variant, c_custkey, bal FROM base
        ORDER BY bal DESC NULLS LAST, c_custkey LIMIT 5
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'desc_nulls_first' AS variant, c_custkey, bal FROM base
        ORDER BY bal DESC NULLS FIRST, c_custkey LIMIT 5
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'asc_nulls_first' AS variant, c_custkey, bal FROM base
        ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 5
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'asc_nulls_last' AS variant, c_custkey, bal FROM base
        ORDER BY bal ASC NULLS LAST, c_custkey LIMIT 5
    )
    """,
)
def nulls_ordering_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL placement in sorts, all four variants pinned. The engines
    DISAGREE by default — Spark ascending puts NULLS FIRST, DuckDB
    puts NULLS LAST — so any ported ORDER BY over a nullable key
    silently reorders unless the placement is explicit. Each variant
    is a TakeOrderedAndProject (top-5 with a unique tiebreak, no
    global sort materialized); nulls are synthesized deterministically
    (custkey % 7) since the generated data has none.
    """
    c = load(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    variants = [
        ("desc_nulls_last", F.col("bal").desc_nulls_last()),
        ("desc_nulls_first", F.col("bal").desc_nulls_first()),
        ("asc_nulls_first", F.col("bal").asc_nulls_first()),
        ("asc_nulls_last", F.col("bal").asc_nulls_last()),
    ]
    out = None
    for name, order in variants:
        top = (
            base.orderBy(order, F.asc("c_custkey"))
            .limit(5)
            .select(F.lit(name).alias("variant"), "c_custkey", "bal")
        )
        out = top if out is None else out.unionAll(top)
    return out


# ---------------------------------------------------------------------------
# TPC-H completion (round 5): the five shapes whose spec columns the
# testdata lacks (partsupp, p_container, l_shipmode), adapted to the
# available schema while keeping each query's CHARACTERISTIC plan shape:
# Q2 correlated-min over a derived part-supplier cost relation, Q9
# multi-dim profit rollup, Q16 distinct-supplier counts with a NOT-IN
# exclusion, Q19 disjunctive cross-table predicates, Q20 semi-join on a
# grouped HAVING subquery. With these, all 22 TPC-H shapes are graded.
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH psc AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY 1, 2
    ), regional AS (
        SELECT psc.partkey, psc.suppkey, psc.unit_cost,
               s.s_name, s.s_acctbal, n.n_name AS nation
        FROM psc
        JOIN supplier s ON s.s_suppkey = psc.suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_regionkey = 2
    )
    SELECT r.s_acctbal, r.s_name, r.nation, p.p_partkey, p.p_name,
           r.unit_cost
    FROM regional r
    JOIN part p ON p.p_partkey = r.partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
      AND r.unit_cost = (SELECT min(r2.unit_cost)
                         FROM regional r2
                         WHERE r2.partkey = r.partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: the testdata has no
    partsupp table, so the part-supplier cost relation is DERIVED from
    observed trade — unit_cost(part, supp) = min(l_extendedprice /
    l_quantity) over lineitem — and the Q2 skeleton runs unchanged on
    top: for STANDARD parts of size <= 10, keep the ASIA-region
    supplier(s) whose cost equals the per-part regional minimum
    (correlated scalar min; ALL ties kept, as in the spec).

    Unit cost is a per-row IEEE double division — identical bits in
    both engines, so the min-equality tie compare is engine-safe.

    Plan (100 TB): lineitem aggregates once to part x supplier grain
    (the one big shuffle); supplier ⋈ nation broadcast-prunes that to
    the region BEFORE the per-part min, so the window sees only
    regional rows; the correlated min is a partkey-window (one narrow
    shuffle of the derived relation, not of lineitem); the part dim
    broadcasts with its filters applied. No cartesian anywhere.
    """
    psc = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    regional = psc.join(F.broadcast(s), psc.suppkey == s.s_suppkey)
    w = Window.partitionBy("partkey")
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    return (
        regional.withColumn("mn", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("mn"))
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "unit_cost")
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           date_part('year', o.o_orderdate) AS o_year,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity", 2)} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gizmo%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no ps_supplycost in the
    testdata, so cost is modeled as 60% of the part's retail price —
    profit = l_extendedprice*(1-l_discount) - 0.6*p_retailprice*
    l_quantity — and the spec's '%green%' name filter becomes
    '%gizmo%' (the synthetic part names are '<adj> <noun>'). The
    grouped profit rollup by supplier nation and order year is the
    point of Q9 and survives intact.

    The per-row profit term is pure IEEE double arithmetic written
    identically in both engines, then summed in decimal micro-units
    (dsum) so the rollup is order-independent.

    Plan (100 TB): the name-filtered part dim broadcasts first (most
    selective), supplier⋈nation broadcasts down the chain, and
    lineitem⋈orders is the single fact-fact shuffle; one hash
    aggregation at (nation, year) grain — 25 x 7 groups.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gizmo%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit_term = F.col("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ) - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit_term, 2).alias("profit"))
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the
    part-supplier relation is the DISTINCT (l_partkey, l_suppkey)
    pairs observed in lineitem (no partsupp table), and the spec's
    'customer complaints' supplier exclusion becomes the negative-
    account-balance suppliers. Brand/type/size negation filters and
    the size IN-list keep the spec's predicate structure; the output
    is distinct-supplier counts per (brand, type, size).

    Plan (100 TB): lineitem projects to the two key columns and
    DISTINCTs map-side before the shuffle (~16-byte rows); the
    excluded-supplier set (tiny) broadcasts as a left-anti join — the
    NOT IN is safe to translate because s_suppkey is non-null by
    construction; the filtered part dim broadcasts; count(DISTINCT)
    runs as Spark's two-phase expand aggregation.
    """
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(
            F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", 2)} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: the spec's three
    disjunctive branches over brand/container/quantity/shipmode become
    brand/size/quantity branches (container and shipmode don't exist
    in the testdata). The point of Q19 — a join whose residual
    predicate is an OR of cross-table conjunctions — is preserved.

    Plan (100 TB): the disjunction cannot push into either scan as-is,
    so DERIVED local prefilters are applied explicitly — part prunes
    to the three brands (and the covering size range), lineitem prunes
    to quantity 1-30 — before the broadcast join; the exact OR then
    evaluates on the surviving rows. This is the implication-based
    pushdown Catalyst doesn't derive on its own, and at 100 TB it is
    the difference between scanning 3/25 of part x full lineitem and
    the pruned fractions of both.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 35)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50)
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no ps_availqty,
    so the 'excess stock' test becomes an observed-volume test — a
    supplier qualifies if, for ANY '%bolt%' part, their 1997 shipped
    quantity exceeds 50 units. The spec's skeleton is intact: an IN
    subquery over a grouped HAVING aggregate, decorrelated to a
    left-semi join against the supplier dim.

    l_quantity values are integral doubles, so the grouped sum is
    exact in both engines and the > 50 gate is engine-safe.

    Plan (100 TB): the date filter pushes to the lineitem scan, the
    name-filtered part dim broadcasts, the (suppkey, partkey) agg is
    the one shuffle (map-side partials first), and the resulting
    supplier id set drives a LEFT-SEMI join into supplier — at scale
    Catalyst/AQE broadcasts the small qualifying-id side.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    qual = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


@query(
    "incremental_agg_maintenance",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(round({sql_d53("sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS DECIMAL(38,0)))")}
                      / 1000000.0, 2) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderdate IS NOT NULL
    GROUP BY 1, 2
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: revenue/count by
    (priority, month), produced by MERGING a stored partial-aggregate
    table for history (orders before 2001-01-01) with partials computed
    over only the new-arrivals delta — history is NEVER rescanned. The
    oracle recomputes the rollup from the full table in one pass, so
    the hash match PROVES partial-merge == full recompute.

    The partial state is what makes the rollup mergeable AND exact:
    revenue partials are integer micro-units (decimal(38,0) — exact at
    any accumulation order, so merging partials is addition, not float
    summation), counts are bigints; the final projection converts to
    display dollars once (identical double arithmetic both engines —
    the tpch_q8 device).

    At 100 TB this is the nightly-ETL pattern: yesterday's partial
    table is O(groups), today's delta scan is O(new data), the merge
    is a group-keyed union+sum — vs the naive full rescan that grows
    with history. The streaming twin (foreachBatch + checkpoint,
    streaming/demo.py) does the same thing per micro-batch; this is
    its oracle-backed batch anchor.
    """
    cutover = F.lit("2001-01-01").cast("timestamp")
    micro = (F.col("o_totalprice").cast("decimal(25,6)") * 1000000).cast(
        "decimal(38,0)"
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("order_month"),
        ).agg(
            F.sum(micro).alias("rev_micro"),
            F.count("*").alias("n_orders"),
        )

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    history = partials(orders.filter(F.col("o_orderdate") < cutover))
    delta = partials(orders.filter(F.col("o_orderdate") >= cutover))
    merged = (
        history.unionByName(delta)
        .groupBy("priority", "order_month")
        .agg(
            F.sum("rev_micro").alias("rev_micro"),
            F.sum("n_orders").alias("n_orders"),
        )
    )
    return merged.select(
        "priority",
        "order_month",
        # r13 (plan-lint R9): the monthly micro sum crosses 2^53 at
        # scale — d53 split before the shared divide+round tree.
        F.expr(f"round({d53('rev_micro')} / 1000000.0, 2)")
        .cast("double")
        .alias("revenue"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


@query(
    "impute_group_median_balance",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment AS segment,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    ), ranked AS (
        SELECT segment, bal,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY bal, segment) AS rn,
               count(*) OVER (PARTITION BY segment) AS n
        FROM base WHERE bal IS NOT NULL
    ), med AS (
        SELECT segment, bal AS seg_median
        FROM ranked WHERE rn = (n + 1) // 2
    )
    SELECT b.c_custkey, b.segment,
           COALESCE(b.bal, m.seg_median) AS bal_imputed,
           CASE WHEN b.bal IS NULL THEN 1 ELSE 0 END AS was_imputed
    FROM base b JOIN med m ON m.segment = b.segment
    """,
)
def impute_group_median_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation with the per-group LOWER MEDIAN — the
    data-repair pass before training/scoring when a feature column has
    holes (nulls synthesized deterministically here: every 7th
    customer). The lower median is an ELEMENT OF THE DATA picked by
    rank (position ceil(n/2) in sorted order), not an interpolated
    float — so the imputed value involves zero arithmetic and is
    cross-engine exact even on arbitrary doubles, where interpolated
    medians can differ in the last ulp between engines' midpoint
    formulas. The was_imputed flag ships alongside (a training
    pipeline keeps imputation indicators as features).

    At 100 TB: one window pass per group computes the rank-picked
    median (at scale you'd swap in approx_percentile for the pick and
    keep the same join-back shape), the tiny per-group median table
    broadcasts back onto the full frame — the scan is never shuffled.
    """
    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    nn = base.filter(F.col("bal").isNotNull())
    w = Window.partitionBy("segment").orderBy("bal", "segment")
    med = (
        nn.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("segment")))
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("segment", F.col("bal").alias("seg_median"))
    )
    return base.join(F.broadcast(med), "segment").select(
        "c_custkey",
        "segment",
        F.coalesce(F.col("bal"), F.col("seg_median")).alias("bal_imputed"),
        F.when(F.col("bal").isNull(), 1).otherwise(0).alias("was_imputed"),
    )


@query(
    "tpcds_q51_cumulative_compare",
    oracle="""
    WITH ev AS (
        SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
               ((CAST(CAST((CAST(CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
                   AS v
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        GROUP BY 1
    ), od AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
               ((CAST(CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS v
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), months AS (
        SELECT m FROM ev UNION SELECT m FROM od
    ), grid AS (
        SELECT months.m,
               COALESCE(ev.v, 0.0) AS ev_v,
               COALESCE(od.v, 0.0) AS od_v
        FROM months
        LEFT JOIN ev ON ev.m = months.m
        LEFT JOIN od ON od.m = months.m
    ), cum AS (
        SELECT m,
               ((CAST(CAST((CAST(CAST(round(sum(CAST(ev_v AS DECIMAL(25,6)))
                          OVER (ORDER BY m), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(ev_v AS DECIMAL(25,6)))
                          OVER (ORDER BY m), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(ev_v AS DECIMAL(25,6)))
                          OVER (ORDER BY m), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS cum_events,
               ((CAST(CAST((CAST(CAST(round(sum(CAST(od_v AS DECIMAL(25,6)))
                          OVER (ORDER BY m), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(od_v AS DECIMAL(25,6)))
                          OVER (ORDER BY m), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(od_v AS DECIMAL(25,6)))
                          OVER (ORDER BY m), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS cum_orders
        FROM grid
    )
    SELECT strftime(m, '%Y-%m') AS month,
           cum_events, cum_orders,
           CASE WHEN cum_events > cum_orders THEN 1 ELSE 0 END
               AS events_ahead
    FROM cum
    """,
)
def tpcds_q51_cumulative_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51's characteristic shape on this schema: two
    independently-aggregated monthly series (purchase-event value vs
    order revenue), FULL month grid via the union of both key sets,
    then running cumulative totals compared month-by-month — 'when did
    channel A's lifetime total overtake channel B's'. Decimal-exact
    cumulative sums over the tiny month grid; the crossover flag is an
    integer.

    Scale shape: each series is one hash-agg at month grain (tiny);
    the grid union and left joins run on month-grain frames (dozens of
    rows — broadcast); ONLY the month-grain cum-sum window is global,
    and it's over the grid, never the facts. The facts are scanned
    once each, pre-aggregated before any join — the Q51 trap
    (windowing over the raw union of both fact tables) never forms.
    """
    ev = (
        load(spark, sf_dir, "events")
        # null-ts device (r11): a NULL month's place in the cumulative
        # ORDER BY is engine-divergent (NULLS FIRST vs LAST)
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("month", "ts").alias("m"))
        .agg(dsum(F.col("value"), 2).alias("ev_v"))
    )
    od = (
        load(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(dsum(F.col("o_totalprice"), 2).alias("od_v"))
    )
    months = ev.select("m").union(od.select("m")).distinct()
    grid = (
        months.join(ev, "m", "left")
        .join(od, "m", "left")
        .select(
            "m",
            F.coalesce("ev_v", F.lit(0.0)).alias("ev_v"),
            F.coalesce("od_v", F.lit(0.0)).alias("od_v"),
        )
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grid.select(
        "m",
        ddbl(F.round(F.sum(F.col("ev_v").cast("decimal(25,6)")).over(w), 2), 2)
        .alias("cum_events"),
        ddbl(F.round(F.sum(F.col("od_v").cast("decimal(25,6)")).over(w), 2), 2)
        .alias("cum_orders"),
    )
    return cum.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "cum_events",
        "cum_orders",
        F.when(F.col("cum_events") > F.col("cum_orders"), 1)
        .otherwise(0)
        .alias("events_ahead"),
    )


@query(
    "tpcds_q88_time_band_counts",
    oracle="""
    SELECT count(*) FILTER (WHERE h >= 0  AND h < 3)  AS h00_03,
           count(*) FILTER (WHERE h >= 3  AND h < 6)  AS h03_06,
           count(*) FILTER (WHERE h >= 6  AND h < 9)  AS h06_09,
           count(*) FILTER (WHERE h >= 9  AND h < 12) AS h09_12,
           count(*) FILTER (WHERE h >= 12 AND h < 15) AS h12_15,
           count(*) FILTER (WHERE h >= 15 AND h < 18) AS h15_18,
           count(*) FILTER (WHERE h >= 18 AND h < 21) AS h18_21,
           count(*) FILTER (WHERE h >= 21)            AS h21_24
    FROM (SELECT date_part('hour', CAST(ts AS TIMESTAMP)) AS h
          FROM events WHERE event_type IN ('view', 'click'))
    """,
)
def tpcds_q88_time_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88's characteristic shape: eight time-band counts that a
    naive translation runs as EIGHT separate scans cross-joined into
    one row — expressed instead as ONE scan with eight conditional
    aggregates (count FILTER), the transposition every columnar
    optimizer wants. The one-row output is the dashboard tile strip.

    Plan: single pushed-filter scan of events, one partial+final
    aggregation, zero joins — compare with the textbook Q88 plan of 8
    subquery scans + 7 cross joins. At 100 TB that's an 8x scan saving
    from a rewrite the engine's user gets by just asking for
    conditional aggregates.
    """
    h = F.hour("ts")
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(h.alias("h"))
    )

    def band(lo, hi, name):
        cond = (F.col("h") >= lo) & (F.col("h") < hi) if hi is not None else (
            F.col("h") >= lo
        )
        return F.count_if(cond).alias(name)

    return ev.agg(
        band(0, 3, "h00_03"),
        band(3, 6, "h03_06"),
        band(6, 9, "h06_09"),
        band(9, 12, "h09_12"),
        band(12, 15, "h12_15"),
        band(15, 18, "h15_18"),
        band(18, 21, "h18_21"),
        band(21, None, "h21_24"),
    )


ASOF_TOLERANCE_MIN = 30


@query(
    "join_asof_forward_tolerance",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(min(e.ts), '%Y-%m-%d %H:%M:%S') AS next_error_ts
    FROM p
    LEFT JOIN e ON e.user_id = p.user_id
               AND e.ts >= p.ts
               AND e.ts <= p.ts + INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
    GROUP BY 1, 2, 3
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance band (pandas merge_asof
    direction='forward', tolerance=30min parity): each purchase
    matched to the user's NEXT error within 30 minutes, or NULL — the
    'did the checkout break right after paying' diagnostic. Completes
    the as-of family: backward (join_asof_purchase_last_click) and now
    forward+tolerance, both §2.4 members.

    Same scalable device as the backward form, mirrored: union both
    event kinds, sort per user DESCENDING, carry the last-seen error
    timestamp (which in descending order is the NEXT error in real
    time), then apply the tolerance as a row-local filter — one
    shuffle on user_id, no row explosion, while the oracle spells the
    quadratic-per-user join+min spec. An error AT the purchase's exact
    timestamp counts as 'next' (the oracle's >=): event_type ASC sorts
    'error' BEFORE 'purchase' at equal ts, so the same-ts error sits
    inside the purchase row's preceding frame — flipping that
    tie-break to DESC would silently drop same-ts matches (a case the
    testdata doesn't contain; verified on a synthetic fixture).
    """
    events = load(spark, sf_dir, "events")
    tagged = events.filter(F.col("event_type").isin("purchase", "error")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_type").asc())  # equal ts: error sorts first, so it is inside the purchase's frame
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    error_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    return (
        tagged.withColumn("next_error", F.last(error_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "next_error",
            F.when(
                F.col("next_error")
                <= F.col("ts") + F.expr(f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTE"),
                F.col("next_error"),
            ),
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("next_error", "yyyy-MM-dd HH:mm:ss").alias(
                "next_error_ts"
            ),
        )
    )


@query(
    "merge_full_with_deletes",
    oracle="""
    WITH delta AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN 'D'
                    WHEN o_orderkey % 7 = 0 THEN 'U' END AS op,
               CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
                    THEN CAST(round(CAST(o_totalprice AS DECIMAL(15,6))
                                    * CAST(1.05 AS DECIMAL(3,2)), 2) AS DOUBLE)
               END AS new_price
        FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 0
    )
    SELECT b.o_orderkey AS orderkey,
           CASE WHEN d.op = 'U' THEN d.new_price
                ELSE b.o_totalprice END AS totalprice,
           CASE WHEN d.op = 'U' THEN 1 ELSE 0 END AS was_updated
    FROM orders b
    LEFT JOIN delta d ON d.o_orderkey = b.o_orderkey
    WHERE d.op IS DISTINCT FROM 'D'
    """,
)
def merge_full_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with the full three-clause semantics — WHEN MATCHED AND
    <cond> THEN DELETE / WHEN MATCHED THEN UPDATE / (NOT MATCHED rows
    pass through) — as one declarative join + filter + projection: the
    tombstone-processing pass of every CDC sink. Delete wins over
    update when a key qualifies for both (the %13 tombstone takes
    precedence over the %7 price bump), matching MERGE's first-clause-
    wins rule; survivors carry a was_updated audit flag.

    Plan shape is merge_upsert_orders' (one equi-join of base against
    the small delta, AQE broadcasts the delta side) plus a null-safe
    anti-filter for tombstones — no second pass, no per-row
    mutation: at 100 TB this rewrites only the partitions the delta
    touches when paired with the compaction planner (layout.py).
    """
    o = load(spark, sf_dir, "orders")
    delta = (
        o.filter((F.col("o_orderkey") % 7 == 0) | (F.col("o_orderkey") % 13 == 0))
        .select(
            F.col("o_orderkey").alias("d_key"),
            F.when(F.col("o_orderkey") % 13 == 0, "D")
            .when(F.col("o_orderkey") % 7 == 0, "U")
            .alias("op"),
            F.when(
                (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0),
                F.round(
                    F.col("o_totalprice").cast("decimal(15,6)")
                    * F.lit(1.05).cast("decimal(3,2)"),
                    2,
                ).cast("double"),
            ).alias("new_price"),
        )
    )
    return (
        o.join(delta, o.o_orderkey == delta.d_key, "left")
        .filter(~F.col("op").eqNullSafe("D"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.when(F.col("op") == "U", F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("totalprice"),
            F.when(F.col("op") == "U", 1).otherwise(0).alias("was_updated"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 session-2 additions: skyline (Pareto-dominance frontier) and
# the Spark 4 SQL-scalar-UDF surface.
# ---------------------------------------------------------------------------


@query(
    "skyline_parts_pareto",
    oracle="""
    WITH econ AS (
        SELECT p_partkey, p_name, p_retailprice, p_size
        FROM part WHERE p_type = 'ECONOMY'
    )
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM econ a
    WHERE NOT EXISTS (
        SELECT 1 FROM econ b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
    )
    """,
)
def skyline_parts_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-dominance frontier: the ECONOMY parts for which
    no other ECONOMY part is both cheaper-or-equal AND smaller-or-equal
    with at least one strict improvement (Borzsonyi et al., ICDE 2001 —
    the multi-criteria shortlist query: 'show me the options nothing
    else beats on every axis').

    The oracle is the quadratic NOT-EXISTS spec. The engine never runs
    it: a 2-D skyline is computable with sorting alone —

      dominated(a) <=>  min(size | price <= a.price) < a.size
                     OR min(price | size  = a.size)  < a.price

    (the first witness is strictly smaller at no worse price; the
    second is strictly cheaper at the same size; duplicates of an
    undominated (price, size) point survive together, matching the
    strict-dominance spec). Two-phase for scale: phase 1 runs those
    two window tests INSIDE each of 32 hash buckets — any locally
    dominated row is globally dominated, so survivors (O(log n) per
    bucket for random data) are a tiny superset of the frontier;
    phase 2 re-runs the same device globally over the survivors, where
    the unpartitioned ORDER BY window is a few-hundred-row single task
    instead of a full-table sort. At 100 TB phase 1 is map-side-ish
    (one narrow shuffle into buckets) and phase 2 is negligible.
    Double comparisons are exact (same parquet bits in both engines);
    no arithmetic is performed on the measures.
    """

    def _prune(df: DataFrame, *part_cols: str) -> DataFrame:
        w_price = (
            Window.partitionBy(*part_cols)
            .orderBy("p_retailprice")
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        w_size = Window.partitionBy(*part_cols, "p_size")
        return (
            df.withColumn("_min_sz", F.min("p_size").over(w_price))
            .withColumn("_min_pr", F.min("p_retailprice").over(w_size))
            .filter(
                (F.col("_min_sz") >= F.col("p_size"))
                & (F.col("_min_pr") >= F.col("p_retailprice"))
            )
            .drop("_min_sz", "_min_pr")
        )

    econ = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )
    local = _prune(
        econ.withColumn("_b", F.pmod(F.xxhash64("p_partkey"), F.lit(32))), "_b"
    )
    return _prune(local.drop("_b"))


@query(
    "sql_scalar_udf_suite",
    oracle="""
    WITH g AS (
        SELECT CASE WHEN o_totalprice >= 250000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS tier,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT concat('tier_', tier) AS tier_label, n_orders,
           CAST((200 * n_orders + sum(n_orders) OVER ())
                // (2 * sum(n_orders) OVER ()) AS BIGINT) AS pct_share
    FROM g
    """,
)
def sql_scalar_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4 `CREATE FUNCTION ... RETURN expr`) —
    the reference's per-row helper functions (llm_utils.py score/clean
    helpers; app.py:65-87 field normalizers) as DECLARATIVE functions
    Catalyst inlines into the caller's plan, not Python.

    Three functions exercise the surface: a CASE classifier, an
    integer half-up percent (DIV — no float division crosses the
    engines), and a nested call (tier_label calls order_tier),
    proving UDF-in-UDF inlining. The graded plan is the same
    scan→agg→window it would be with the expressions written inline:
    zero `BatchEvalPython`, full whole-stage codegen
    (tests/test_plans.py gates this). That is the 100 TB contract:
    a shared function library with NO per-row interpreter cost —
    unlike Python UDFs, these survive predicate pushdown and codegen.
    """
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION order_tier(price DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN price >= 250000 THEN 'high'
                    WHEN price >= 100000 THEN 'mid'
                    ELSE 'low' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION pct_of(part BIGINT, total BIGINT)
        RETURNS BIGINT
        RETURN CAST((200 * part + total) DIV (2 * total) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION tier_label(price DOUBLE)
        RETURNS STRING
        RETURN concat('tier_', order_tier(price))
        """
    )
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_udf_orders")
    return spark.sql(
        """
        WITH g AS (
            SELECT tier_label(o_totalprice) AS tier_label,
                   count(*) AS n_orders
            FROM _udf_orders GROUP BY 1
        )
        SELECT tier_label, n_orders,
               pct_of(n_orders, sum(n_orders) OVER ()) AS pct_share
        FROM g
        """
    )


@query(
    "incremental_join_maintenance",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           count(*) AS n_orders,
           CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(25,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN: the delta-join identity

        Δ(O ⋈ C) = ΔO ⋈ C_old  ∪  O_old ⋈ ΔC  ∪  ΔO ⋈ ΔC

    applied to the per-nation revenue rollup of orders ⋈ customer.
    The base split is deterministic (orders with orderkey % 10 == 0
    and customers with custkey % 7 == 0 are 'tonight's changes'); the
    stored view state is the OLD ⋈ OLD partial aggregate, and the
    three delta terms — each with at least one SMALL side, so each
    joins broadcast — produce the delta partials that merge into the
    new state by integer addition (counts + exact cents). The oracle
    is the full recompute over the full tables, so the hash match
    PROVES the delta algebra loses and double-counts nothing — the
    companion to incremental_agg_maintenance, which proves the same
    for aggregation-only views.

    100 TB: the nightly cost is |ΔO|·|C| and |O|·|ΔC| join work with
    the delta sides broadcast, versus the full |O|·|C| shuffle join —
    the classic reason warehouses maintain, not recompute. The big
    O_old ⋈ ΔC term never shuffles O_old: ΔC broadcasts.
    """
    cents = (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("long")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o_old = orders.filter(F.col("o_orderkey") % 10 != 0)
    o_new = orders.filter(F.col("o_orderkey") % 10 == 0)
    c_old = cust.filter(F.col("c_custkey") % 7 != 0)
    c_new = cust.filter(F.col("c_custkey") % 7 == 0)

    def partials(o: DataFrame, c: DataFrame, broadcast_c: bool) -> DataFrame:
        side = F.broadcast(c) if broadcast_c else c
        return (
            o.join(side, o.o_custkey == side.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n"), F.sum("cents").alias("r"))
        )

    state = partials(o_old, c_old, broadcast_c=False)  # the stored view
    delta = (
        partials(F.broadcast(o_new), c_old, broadcast_c=False)
        .unionAll(partials(o_old, c_new, broadcast_c=True))
        .unionAll(partials(o_new, c_new, broadcast_c=True))
    )
    return (
        state.unionAll(delta)
        .groupBy("c_nationkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("r").alias("revenue_cents"))
        .select(
            F.col("c_nationkey").alias("nationkey"),
            "n_orders",
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


GRID_R = 15  # neighbor radius; also the grid cell width
GRID_SPAN = 1000  # coordinate domain 0..999 per axis


def _sql_xy(key_expr: str) -> tuple[str, str]:
    """DuckDB fragments for the deterministic synthetic coordinates:
    two independent md5 draws per key, reduced mod GRID_SPAN."""
    x = sql_hex_to_long(f"substr(md5('sx' || CAST({key_expr} AS VARCHAR)), 1, 4)", 4)
    y = sql_hex_to_long(f"substr(md5('sy' || CAST({key_expr} AS VARCHAR)), 1, 4)", 4)
    return f"({x} % {GRID_SPAN})", f"({y} % {GRID_SPAN})"


_SQL_X, _SQL_Y = _sql_xy("c_custkey")


@query(
    "spatial_grid_neighbor_join",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id, {_SQL_X} AS x, {_SQL_Y} AS y FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {GRID_R * GRID_R}
    """,
)
def spatial_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-threshold self-join on a 2-D point set via GRID
    BUCKETING — the distributed spatial-join pattern (GeoSpark/Sedona
    partition-and-prune): with cell width == the radius r, any
    qualifying pair sits in the same or an adjacent cell, so each
    point EXPLODES to its 3x3 neighbor-cell keys on one side, joins
    the other side's home cell equi-key (ONE hash shuffle on the cell
    id — never a cross join), and the exact integer distance filter
    runs only inside the ~9-cell candidate set. The oracle is the
    quadratic pair join; the engine plan is linear in points x local
    density. Same bucket-join device as MinHash bands and the IVF
    cells, on geometric keys.

    Coordinates are synthesized deterministically from md5 draws per
    custkey (the engines' shared hex-to-long device, mod 1000), so the
    geometry is identical in both engines and all arithmetic —
    coordinates, cells, squared distances — is pure BIGINT.

    100 TB: explode factor is a constant 9; the shuffle key (cell id)
    is dense and uniform under hashed coordinates; skewed REAL
    geometries (urban hot cells) reuse the salted-join device on the
    hot cells. Cell width must be >= r or neighbor coverage breaks —
    guarded by construction here.
    """
    c = load(spark, sf_dir, "customer")
    pts = (
        c.select(F.col("c_custkey").alias("id"))
        .withColumn(
            "hx", F.substring(F.md5(F.concat(F.lit("sx"), F.col("id").cast("string"))), 1, 4)
        )
        .withColumn(
            "hy", F.substring(F.md5(F.concat(F.lit("sy"), F.col("id").cast("string"))), 1, 4)
        )
        .withColumn("x", F.expr(sql_hex_to_long("hx", 4)) % GRID_SPAN)
        .withColumn("y", F.expr(sql_hex_to_long("hy", 4)) % GRID_SPAN)
        .select("id", "x", "y")
    )
    cell = lambda ax: (F.col(ax) / GRID_R).cast("long")  # noqa: E731
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cell("x").alias("cxb"),
        cell("y").alias("cyb"),
    )
    offsets = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    left = (
        pts.select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            cell("x").alias("cxa"),
            cell("y").alias("cya"),
        )
        .withColumn("o", offsets)
        .select(
            "id_a", "xa", "ya",
            (F.col("cxa") + F.col("o.dx")).alias("cx"),
            (F.col("cya") + F.col("o.dy")).alias("cy"),
        )
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, (F.col("cx") == F.col("cxb")) & (F.col("cy") == F.col("cyb")))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= GRID_R * GRID_R)
        .select("id_a", "id_b", "dist2")
    )


@query(
    "dq_quarantine_split",
    oracle="""
    WITH checked AS (
        SELECT o_orderkey,
               concat_ws(',',
                   CASE WHEN o_custkey IS NULL THEN 'null_custkey' END,
                   CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL
                        THEN 'nonpositive_price' END,
                   CASE WHEN o_orderstatus NOT IN ('O','F','P')
                          OR o_orderstatus IS NULL THEN 'bad_status' END,
                   CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                          OR o_orderdate >= TIMESTAMP '2030-01-01'
                          OR o_orderdate IS NULL THEN 'date_out_of_range' END,
                   CASE WHEN o_orderkey % 97 = 0 THEN 'synthetic_poison' END
               ) AS failed_rules
        FROM orders
    )
    SELECT CASE WHEN failed_rules = '' THEN 'clean' ELSE 'quarantine' END
               AS route,
           failed_rules,
           count(*) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS example_orderkey
    FROM checked GROUP BY 1, 2
    """,
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level data-contract routing: every row is annotated with
    the comma-joined list of violated expectations (null key,
    non-positive money, invalid enum, out-of-range date, plus a
    synthetic %97 poison rule so the quarantine path is non-empty on
    clean test data) and routed clean/quarantine — the write-side
    twin of dq_constraint_checks' read-side report, and the pattern
    behind every dead-letter/badRecordsPath sink: bad rows are
    PRESERVED with their diagnosis, never dropped silently. Graded at
    the (route, rule-combination) grain with counts and a
    deterministic example key; the row-level frame (one map-side
    projection, no shuffle) is what a real pipeline writes to two
    sinks.

    The rule expressions are row-local CASEs; concat_ws skips NULLs
    identically in both engines, making the combination string a
    stable contract.
    """
    o = load(spark, sf_dir, "orders")
    failed = F.concat_ws(
        ",",
        F.when(F.col("o_custkey").isNull(), "null_custkey"),
        F.when(
            (F.col("o_totalprice") <= 0) | F.col("o_totalprice").isNull(),
            "nonpositive_price",
        ),
        F.when(
            ~F.col("o_orderstatus").isin("O", "F", "P")
            | F.col("o_orderstatus").isNull(),
            "bad_status",
        ),
        F.when(
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2030-01-01").cast("timestamp"))
            | F.col("o_orderdate").isNull(),
            "date_out_of_range",
        ),
        F.when(F.col("o_orderkey") % 97 == 0, "synthetic_poison"),
    )
    checked = o.select("o_orderkey", failed.alias("failed_rules"))
    return checked.groupBy(
        F.when(F.col("failed_rules") == "", "clean")
        .otherwise("quarantine")
        .alias("route"),
        "failed_rules",
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("example_orderkey"),
    )


@query(
    "sql_pipe_syntax_suite",
    oracle="""
    SELECT l_returnflag AS returnflag, o_orderpriority AS orderpriority,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND o_orderstatus <> 'F'
    GROUP BY 1, 2
    ORDER BY revenue DESC, returnflag, orderpriority
    LIMIT 5
    """,
)
def sql_pipe_syntax_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (`|>` — SIGMOD'24 "SQL Has Problems..."
    pipe-data-flow dialect): the same logical plan as nested ANSI SQL,
    written as a linear stage chain — WHERE, EXTEND (derived column),
    JOIN, AGGREGATE ... GROUP BY, SELECT rename, ORDER BY, LIMIT. The
    oracle is the classic-SQL twin, so the hash grades that Spark's
    pipe parser lowers to the identical relation — syntax sugar, same
    Catalyst plan (filter pushdown, decimal-exact revenue, TopK sort),
    zero runtime cost. API-surface completion: users migrating
    pipeline-style SQL can keep it verbatim.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pipe")
    load(spark, sf_dir, "orders").createOrReplaceTempView("o_pipe")
    return spark.sql(
        """
        FROM li_pipe
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
               AND l_shipdate < TIMESTAMP '1996-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> JOIN o_pipe ON l_orderkey = o_orderkey
        |> WHERE o_orderstatus <> 'F'
        |> AGGREGATE ((CAST((CAST(CAST(round(sum(CAST(disc_price AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(disc_price AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST((CAST(CAST(round(sum(CAST(disc_price AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DECIMAL(38,0)) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE)) AS revenue,
                     count(*) AS n_lines
           GROUP BY l_returnflag, o_orderpriority
        |> SELECT l_returnflag AS returnflag, o_orderpriority AS orderpriority,
                  revenue, n_lines
        |> ORDER BY revenue DESC, returnflag, orderpriority
        |> LIMIT 5
        """
    )


@query(
    "sql_session_variables_suite",
    oracle="""
    WITH thresh AS (
        SELECT CAST(CAST(avg(o_totalprice) AS DECIMAL(25,6)) AS DOUBLE) AS t
        FROM orders
    )
    SELECT o_orderpriority AS orderpriority,
           count(*) AS n_above,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
               AS sum_above
    FROM orders, thresh
    WHERE o_totalprice > thresh.t
    GROUP BY 1
    """,
)
def sql_session_variables_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 `DECLARE` / `SET VAR`) plus
    `EXECUTE IMMEDIATE` with a `USING` bind — the scripting surface a
    SQL-first user drives parameterized jobs with. The variable is SET
    from a scalar subquery over the data (mean order price — computed
    through the exact-decimal cast so the threshold double is engine-
    identical), then a dynamically-built statement aggregates above
    it. The oracle inlines the same threshold as a CTE: the hash
    proves variable binding and the bound-parameter path change
    nothing about the result.

    Scale note: the variable holds ONE scalar on the driver — the
    pattern replaces the collect()-then-f-string anti-loop with
    engine-managed state; the data-side plan is an ordinary broadcast
    of the scalar into the filter.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("o_sessvar")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        """SET VAR price_floor =
           (SELECT CAST(CAST(avg(o_totalprice) AS DECIMAL(25,6)) AS DOUBLE)
            FROM o_sessvar)"""
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority AS orderpriority,
                count(*) AS n_above,
                ((CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DECIMAL(38,0)) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
                    AS sum_above
         FROM o_sessvar WHERE o_totalprice > ? GROUP BY 1'
        USING price_floor
        """
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH flt AS (
        SELECT l.l_partkey,
               CAST(l.l_quantity AS BIGINT) AS qty,
               l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4' AND p.p_size <= 15
    ),
    st AS (
        SELECT l_extendedprice, qty,
               sum(qty)  OVER (PARTITION BY l_partkey) AS sum_qty,
               count(*)  OVER (PARTITION BY l_partkey) AS cnt
        FROM flt
    ),
    small AS (
        SELECT sum(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000
                        AS HUGEINT)) AS m,
               count(*) AS n_small_lines
        FROM st WHERE 5 * qty * cnt < sum_qty
    )
    SELECT n_small_lines,
           CAST(CAST((m * 2 + 70000) // 140000 AS BIGINT) AS DOUBLE) / 100
               AS avg_yearly
    FROM small
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    lost if orders below 20% of a part's average quantity were not
    filled, for one brand's small parts — the classic correlated
    per-group-average subquery. Completes the TPC-H set (q1 analogue =
    agg_pricing_summary; q2-q22 all registered).

    Plan: the textbook form computes avg(l_quantity) per part and joins
    it back — two shuffles on the same key. Here the per-part average
    is a WINDOW over l_partkey: ONE shuffle, no join-back, and the
    partition count (lines per part) is naturally bounded so no skew.
    The filtered part dim (one brand, small sizes) broadcasts before
    the window so only matching lines shuffle at all — at 100 TB that
    predicate keeps ~1% of lineitem in flight.

    Exactness: quantities are whole numbers, so ``qty < 0.2 * avg``
    becomes the integer cross-multiplication ``5*qty*cnt < sum_qty`` —
    no float threshold crosses the engines. The final /7 rides the
    half-up integer-division device (micro-unit sum, d = 7*10^4) so
    avg_yearly is bit-identical cross-engine at 2 decimals.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 15))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    flt = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_extendedprice",
    )
    w = Window.partitionBy("l_partkey")
    st = flt.select(
        "l_extendedprice",
        "qty",
        F.sum("qty").over(w).alias("sum_qty"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    small = st.filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
    micro = (F.col("l_extendedprice").cast("decimal(25,6)") * F.lit(10**6)).cast(
        "decimal(38,0)"
    )
    agg = small.agg(
        F.sum(micro).alias("m"), F.count(F.lit(1)).alias("n_small_lines")
    )
    return agg.select(
        "n_small_lines",
        (
            # r13 (plan-lint R9): int64-narrow before the double
            # conversion — bigint->double is one correctly-rounded
            # hardware op (deterministic at ANY magnitude, unlike the
            # int128/decimal path), and the cast raises loudly if the
            # cents quotient ever left int64 range.
            F.floor(F.try_divide(F.col("m") * 2 + F.lit(70000), F.lit(140000)))
            .cast("bigint")
            .cast("double")
            / F.lit(100.0)
        ).alias("avg_yearly"),
    )


@query(
    "cdc_log_compaction",
    oracle="""
    WITH log AS (
        SELECT user_id,
               ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               round(value, 2) AS val,
               event_type
        FROM events
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_versions
        FROM log
    )
    SELECT user_id,
           event_type AS last_event_type,
           val AS last_value,
           n_versions
    FROM ranked
    WHERE rn = 1 AND op = 'U'
    ORDER BY user_id
    """,
)
def cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse a change-data-capture log to final
    table state under last-writer-wins with delete semantics — the
    Debezium/Kafka-compacted-topic materialization. The events log is
    read as a CDC stream keyed by user_id: 'error' events are DELETE
    tombstones, everything else an UPSERT; version order is (ts,
    event_id) so ties at the same timestamp resolve deterministically
    by log offset. A key whose LAST op is a tombstone vanishes from
    the compacted state; live keys carry their final value and a
    version count (the compaction-ratio diagnostic).

    Plan: one shuffle on the key; row_number and the per-key version
    count share the same (user_id) partitioning (Catalyst reuses one
    sort+exchange). At 100 TB this is the canonical
    compact-before-merge preprocessing: the output is Domain#rows =
    #live keys, so the downstream MERGE touches each key once instead
    of once per change — and because the plan is partial-agg-free
    (pure window), it streams through sort-based aggregation without
    holding per-key state.
    """
    log = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round("value", 2).alias("val"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    ranked = log.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_versions"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("val").alias("last_value"),
            "n_versions",
        )
        .orderBy("user_id")
    )


@query(
    "sql_group_order_by_all_suite",
    oracle="""
    SELECT o_orderpriority AS priority,
           o_orderstatus AS status,
           count(*) AS n_orders,
           ((CAST(CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) AS BIGINT) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) - (CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS HUGEINT) AS HUGEINT) // 1125899906842624) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
               AS revenue
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, o_orderstatus, n_orders, revenue
    """,
)
def sql_group_order_by_all_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` / `ORDER BY ALL` (Spark 4 SQL sugar, same
    dialect as DuckDB/Databricks): the engine infers the grouping set
    as every non-aggregate select item and the sort as the full select
    list — the ad-hoc-analytics ergonomics users expect from a modern
    engine. The oracle spells both lists out explicitly, so the hash
    proves the inference resolves to exactly the explicit form (and
    the exact-decimal revenue guarantees the proof covers values, not
    just shape).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("o_gba")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               o_orderstatus AS status,
               count(*) AS n_orders,
               ((CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DOUBLE) * CAST(1125899906842624 AS DOUBLE) + CAST(CAST(CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST((CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) * 100 AS DECIMAL(38,0)) AS DECIMAL(38,0)) DIV 1125899906842624) AS DECIMAL(38,0)) * 1125899906842624 AS BIGINT) AS DOUBLE)) / CAST(100 AS DOUBLE))
                   AS revenue
        FROM o_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "late_arriving_dim_handling",
    oracle="""
    WITH dim_now AS (
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey % 10 <> 3
    ),
    resolved AS (
        SELECT o.o_orderkey, o.o_custkey,
               coalesce(d.c_mktsegment, 'UNKNOWN') AS segment,
               CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS inferred
        FROM orders o LEFT JOIN dim_now d ON o.o_custkey = d.c_custkey
    ),
    backfilled AS (
        SELECT r.o_orderkey, r.o_custkey,
               CASE WHEN r.inferred = 1 THEN coalesce(c.c_mktsegment, 'UNKNOWN')
                    ELSE r.segment END AS segment,
               r.inferred AS was_inferred
        FROM resolved r
        LEFT JOIN customer c
          ON r.inferred = 1 AND r.o_custkey = c.c_custkey
    )
    SELECT segment, was_inferred,
           count(*) AS n_orders
    FROM backfilled GROUP BY 1, 2
    """,
)
def late_arriving_dim_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension (early-arriving fact) handling — the
    Kimball pattern: facts land before their dimension row exists, get
    an inferred 'UNKNOWN' member instead of being dropped or stalling
    the load, and a later backfill pass repairs them once the
    dimension catches up. Simulated in-query: the "current" dimension
    snapshot is customers minus a deterministic 10% (custkey%10==3);
    stage 1 left-joins facts and flags the inferred members, stage 2
    re-joins ONLY the flagged rows against the complete dimension and
    repairs them. Output = segment x was_inferred counts, so the
    graded result proves both that no fact was ever dropped AND that
    every repairable fact was repaired (was_inferred=1 rows landing in
    real segments), with UNKNOWN surviving only where the dim remains
    absent (here: none).

    Scale: both joins broadcast the dimension side; the backfill join's
    left side is pre-filtered to the inferred flag — at 100 TB that
    filter is the difference between re-shuffling the whole fact table
    nightly and touching only the repair queue.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim_now = cust.filter(F.col("c_custkey") % 10 != 3)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    resolved = (
        o.join(F.broadcast(dim_now), o.o_custkey == dim_now.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("inferred"),
        )
    )
    backfilled = (
        resolved.join(
            F.broadcast(cust),
            (resolved.inferred == 1) & (resolved.o_custkey == cust.c_custkey),
            "left",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(
                F.col("inferred") == 1,
                F.coalesce("c_mktsegment", F.lit("UNKNOWN")),
            )
            .otherwise(F.col("segment"))
            .alias("segment"),
            F.col("inferred").alias("was_inferred"),
        )
    )
    return backfilled.groupBy("segment", "was_inferred").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "tpcds_q47_sales_deviation",
    oracle="""
    WITH monthly AS (
        SELECT o_orderpriority AS priority,
               CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))) * 100, 0)
                    AS BIGINT) AS cents
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2, 3
    ),
    with_year AS (
        SELECT priority, yr, month, cents,
               sum(cents) OVER (PARTITION BY priority, yr) AS year_cents,
               count(*) OVER (PARTITION BY priority, yr) AS n_months,
               lag(cents)  OVER (PARTITION BY priority ORDER BY month)
                   AS prev_cents,
               lead(cents) OVER (PARTITION BY priority ORDER BY month)
                   AS next_cents
        FROM monthly
    )
    SELECT priority, month,
           CAST(round(CAST(cents AS DOUBLE) / 100, 2) AS DOUBLE) AS revenue,
           CAST((2 * 10000 * n_months * cents + year_cents)
                // (2 * year_cents) AS BIGINT) AS vs_year_avg_bp,
           prev_cents, next_cents
    FROM with_year
    WHERE n_months = 12
      AND 10 * n_months * cents > 11 * year_cents
    """,
)
def tpcds_q47_sales_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 shape (adapted to the orders schema): months whose
    revenue deviates more than +10% from their series' yearly average,
    with the neighboring months' values for context — the
    anomalous-period report combining a partitioned aggregate window,
    a deviation predicate, and lag/lead context in one pass.

    Exactness: "v > 1.1 * yearly_avg" cross-multiplies to the integer
    ``10*n*v > 11*sum_year`` (never a float threshold), and the
    reported deviation is half-up basis points of the exact rational
    n*v/sum_year. Partial years (the first/last calendar year of the
    data) are excluded by the n_months=12 completeness gate, so the
    average is always a true yearly average.

    Plan: one fact rollup to the month grain, then ALL FOUR windows
    (year sum, month count, lag, lead) share the (priority[, yr])
    partitioning — Catalyst plans one exchange + two sorts over the
    tiny grain. TPC-DS's original runs the same shape over
    (category, brand, store); the grain arithmetic is identical.
    """
    monthly = (
        load(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(25,6)")) * 100, 0)
            .cast("bigint")
            .alias("cents")
        )
    )
    wy = Window.partitionBy("priority", "yr")
    wm = Window.partitionBy("priority").orderBy("month")
    with_year = monthly.select(
        "priority",
        "yr",
        "month",
        "cents",
        F.sum("cents").over(wy).alias("year_cents"),
        F.count(F.lit(1)).over(wy).alias("n_months"),
        F.lag("cents").over(wm).alias("prev_cents"),
        F.lead("cents").over(wm).alias("next_cents"),
    )
    return with_year.filter(
        (F.col("n_months") == 12)
        & (F.lit(10) * F.col("n_months") * F.col("cents") > F.lit(11) * F.col("year_cents"))
    ).select(
        "priority",
        "month",
        F.round(F.col("cents").cast("double") / 100, 2).cast("double").alias("revenue"),
        F.expr(
            "CAST((2 * 10000 * n_months * cents + year_cents)"
            " DIV (2 * year_cents) AS BIGINT)"
        ).alias("vs_year_avg_bp"),
        "prev_cents",
        "next_cents",
    )


@query(
    "nested_build_flatten_roundtrip",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(25,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_cents,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def nested_build_flatten_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document round trip: flat lineitems NEST into one
    array<struct> per order (the document/JSON-store write shape —
    collect_list of structs, sorted for determinism), then the nested
    form FLATTENS back through explode and aggregates. The oracle
    computes the same aggregate from the flat join — hash equality
    proves the nest/flatten cycle loses nothing (no dropped items, no
    duplicated rows, no struct-field reorder corruption), which is
    the contract a parquet-nested export must satisfy.

    Scale notes: the nest is one shuffle on the order key with
    per-order bounded state (basket size); array_sort makes the
    nested layout byte-deterministic so downstream file-level dedup/
    diff of exports works. The flatten explodes back to line grain
    map-side. This is the write path multimodal/JSON exports use.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(25,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_linenumber",
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "cents", "qty"))
        ).alias("items")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    docs = nested.join(o, nested.l_orderkey == o.o_orderkey)
    flat = docs.select(
        "o_orderpriority",
        "o_orderkey",
        F.explode("items").alias("item"),
    )
    return flat.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum("item.cents").cast("bigint").alias("rev_cents"),
        F.sum("item.qty").cast("bigint").alias("total_qty"),
    )


@query(
    "allocation_invoice_rounding",
    oracle="""
    WITH li AS (
        SELECT l_orderkey AS ok, l_linenumber AS ln,
               CAST(CAST(l_extendedprice AS DECIMAL(25,2)) * 100 AS BIGINT)
                   AS w
        FROM lineitem
    ),
    o AS (
        SELECT o_orderkey AS ok,
               CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100 AS BIGINT)
                   AS total
        FROM orders
    ),
    base AS (
        SELECT li.ok, li.ln, li.w, o.total,
               sum(li.w) OVER (PARTITION BY li.ok) AS wsum
        FROM li JOIN o ON li.ok = o.ok
    ),
    floors AS (
        SELECT ok, ln, w, total, wsum,
               (total * w) // wsum AS fl,
               (total * w) % wsum AS rem
        FROM base
    ),
    need AS (
        SELECT ok, ln, fl, rem,
               total - sum(fl) OVER (PARTITION BY ok) AS shortfall,
               row_number() OVER (PARTITION BY ok
                                  ORDER BY rem DESC, ln ASC) AS rr
        FROM floors
    ),
    alloc AS (
        SELECT ok, ln,
               fl + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END AS cents
        FROM need
    )
    SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS allocated_cents,
           CAST((SELECT sum(total) FROM o
                 WHERE o.ok IN (SELECT DISTINCT ok FROM li)) AS BIGINT)
               AS invoice_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM alloc
    """,
)
def allocation_invoice_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Penny-exact invoice allocation: each order's total spreads
    across its lines proportionally to extended price, floors in
    cents, and the leftover pennies go to the largest remainders
    (ties to the lowest line number) — the largest-remainder method
    that makes Σ lines == invoice EXACTLY for every order, the
    invariant billing/GL reconciliation lives on (naive rounding
    drifts a penny per ~2 lines and fails audit). Output is the
    global reconciliation proof: allocated == invoiced over all
    orders, as graded integers.

    All integer: proportional shares are floor((total·w)/Σw) with
    the remainder ranked per order; the floors, shortfall, and rank
    share ONE (orderkey) partitioning — a single exchange for three
    windows, per-order state bounded by basket size.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        (F.col("l_extendedprice").cast("decimal(25,2)") * 100)
        .cast("bigint")
        .alias("w"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ook"),
        (F.col("o_totalprice").cast("decimal(25,2)") * 100)
        .cast("bigint")
        .alias("total"),
    )
    base = li.join(o, li.ok == o.ook).select(
        "ok",
        "ln",
        "w",
        "total",
        F.sum("w").over(Window.partitionBy("ok")).alias("wsum"),
    )
    floors = base.select(
        "ok",
        "ln",
        "total",
        F.expr("(total * w) DIV wsum").alias("fl"),
        F.expr("(total * w) % wsum").alias("rem"),
    )
    need = floors.select(
        "ok",
        "ln",
        "fl",
        (F.col("total") - F.sum("fl").over(Window.partitionBy("ok"))).alias(
            "shortfall"
        ),
        F.row_number()
        .over(Window.partitionBy("ok").orderBy(F.desc("rem"), F.asc("ln")))
        .alias("rr"),
    )
    alloc = need.select(
        "ok",
        "ln",
        (
            F.col("fl")
            + F.when(F.col("rr") <= F.col("shortfall"), 1).otherwise(0)
        ).alias("cents"),
    )
    invoice = (
        o.join(li.select("ok").distinct(), o.ook == F.col("ok"))
        .agg(F.sum("total").cast("bigint").alias("invoice_cents"))
    )
    return (
        alloc.agg(
            F.countDistinct("ok").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("allocated_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .crossJoin(F.broadcast(invoice))
        .select("n_orders", "allocated_cents", "invoice_cents", "n_lines")
    )


@query(
    "sql_star_except_suite",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def sql_star_except_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * EXCEPT (cols)` (Spark 4 / BigQuery dialect; DuckDB
    spells it EXCLUDE): project everything BUT the named columns —
    the ergonomic form that keeps wide-table queries stable as
    columns are added (an explicit list silently misses new columns;
    EXCEPT names only what to drop). The oracle lists the surviving
    columns explicitly, so the hash proves the expansion: all
    columns minus the excluded two, in declaration order.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("o_star_except")
    return spark.sql(
        """
        SELECT * EXCEPT (o_totalprice, o_orderdate)
        FROM o_star_except
        WHERE o_orderkey % 100 = 0
        """
    )


@query(
    "tpcds_q1_excess_returns",
    oracle="""
    WITH ret AS (
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(25,2)) * 100
                             AS BIGINT)) AS BIGINT) AS ret_cents
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2
    ),
    seg AS (
        SELECT c_custkey, c_mktsegment, ret_cents,
               sum(ret_cents) OVER (PARTITION BY c_mktsegment) AS seg_cents,
               count(*) OVER (PARTITION BY c_mktsegment) AS seg_n
        FROM ret
    )
    SELECT c_custkey AS custkey, c_mktsegment AS segment, ret_cents,
           CAST((2 * 10000 * ret_cents * seg_n + seg_cents)
                // (2 * seg_cents) AS BIGINT) AS vs_seg_avg_bp
    FROM seg
    WHERE 5 * ret_cents * seg_n > 6 * seg_cents
    ORDER BY ret_cents DESC, c_custkey ASC
    LIMIT 100
    """,
)
def tpcds_q1_excess_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1 shape (adapted): customers whose returned-merchandise
    value exceeds 1.2x their segment's average returner — the
    excess-returns watchlist. The original's correlated
    avg-per-store subquery becomes a WINDOW over the per-customer
    return rollup (one shuffle, no join-back — the Q17 device), and
    the 1.2x threshold cross-multiplies to the exact integer
    5·ret·n > 6·Σret. Top-100 by return value with key tie-break
    rides TakeOrderedAndProject.

    Plan: the returnflag filter pushes to the lineitem scan (reads
    only 'R' lines), customer broadcasts, and the window runs on the
    CUSTOMER-grain rollup, not the fact table.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            (F.col("l_extendedprice").cast("decimal(25,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ret = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum("cents").cast("bigint").alias("ret_cents"))
    )
    wseg = Window.partitionBy("c_mktsegment")
    seg = ret.select(
        "c_custkey",
        "c_mktsegment",
        "ret_cents",
        F.sum("ret_cents").over(wseg).alias("seg_cents"),
        F.count(F.lit(1)).over(wseg).alias("seg_n"),
    )
    return (
        seg.filter(
            F.lit(5) * F.col("ret_cents") * F.col("seg_n")
            > F.lit(6) * F.col("seg_cents")
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            "ret_cents",
            F.expr(
                "CAST((2 * 10000 * ret_cents * seg_n + seg_cents)"
                " DIV (2 * seg_cents) AS BIGINT)"
            ).alias("vs_seg_avg_bp"),
        )
        .orderBy(F.desc("ret_cents"), F.asc("custkey"))
        .limit(100)
    )


TOPK_IVM_K = 10
TOPK_IVM_CUTOVER = "1998-06-01"
_TOPK_MICRO = (
    "CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) "
    "* 1000000 AS DECIMAL(38,0))"
)


@query(
    "incremental_topk_maintenance",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey,
               sum({_TOPK_MICRO}) AS rev_micro,
               count(*) AS n_items
        FROM lineitem GROUP BY 1
    ),
    hist AS (
        SELECT l_partkey, sum({_TOPK_MICRO}) AS rev_micro
        FROM lineitem WHERE l_shipdate < TIMESTAMP '{TOPK_IVM_CUTOVER}'
        GROUP BY 1
    ),
    old_topk AS (
        SELECT l_partkey FROM hist
        ORDER BY rev_micro DESC, l_partkey LIMIT {TOPK_IVM_K}
    ),
    new_topk AS (
        SELECT l_partkey, rev_micro, n_items,
               row_number() OVER (ORDER BY rev_micro DESC, l_partkey) AS rank
        FROM rev ORDER BY rev_micro DESC, l_partkey LIMIT {TOPK_IVM_K}
    )
    SELECT CAST(t.rank AS INTEGER) AS rank,
           t.l_partkey AS p_partkey,
           CAST(round({sql_d53("t.rev_micro")} / 1000000.0, 2) AS DOUBLE)
               AS revenue,
           CAST(t.n_items AS BIGINT) AS n_items,
           CAST(CASE WHEN o.l_partkey IS NULL THEN 0 ELSE 1 END AS INTEGER)
               AS was_in_old_topk
    FROM new_topk t LEFT JOIN old_topk o ON o.l_partkey = t.l_partkey
    """,
)
def incremental_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TOP-K view maintenance under an insert-only delta —
    the non-monotonic cousin of ``incremental_agg_maintenance``: a
    materialized "top-{TOPK_IVM_K} parts by revenue" view is refreshed
    WITHOUT rescanning history by re-ranking only the CANDIDATE set =
    (state keys at or above the old k-th boundary total) ∪ (keys
    touched by the delta batch). The rule is sound for insert-only
    deltas because revenue partials only grow: an untouched key BELOW
    the old k-th total is strictly dominated by it, and the new k-th
    can only exceed it; boundary TIES are kept as candidates so the
    deterministic partkey tie-break stays exact. (Deletes/retractions
    would need the k-th-boundary re-probe — ``cdc_log_compaction`` is
    the retraction-side anchor.)

    The maintained path: history partials (the O(|keys|) stored state)
    are probed only for candidate keys (a keyed semi-join, never a
    rescan), delta partials are O(batch), and the final rank runs over
    ≤ k + |delta keys| rows. The oracle recomputes BOTH snapshots from
    scratch, so the hash match proves candidate-set maintenance ==
    full recompute, including the was_in_old_topk provenance flag.

    Exactness: revenue partials are integer micro-units via the
    DECIMAL(25,6)x1e6 device (order-free merges), ranks break ties on
    (revenue DESC, partkey) — a total order; the single display
    division is the identical double op in both engines
    (incremental_agg_maintenance's projection device).
    """
    micro = F.expr(_TOPK_MICRO)
    li = load(spark, sf_dir, "lineitem")
    cut = F.lit(TOPK_IVM_CUTOVER).cast("timestamp")

    # r13 optimization (guide §5 / R8): hist fed FOUR consumers
    # (old_topk, the boundary probe, the candidate filter, the merge
    # semi-join) and delta a fifth — five lineitem scans + partial
    # aggregations for one query. Both partials now come from ONE
    # conditional-aggregation pass over the scan, persisted at the
    # part grain; a key lands in hist/delta exactly when it has >= 1
    # row on that side of the cutover (the conditional count), so the
    # split frames are row-identical to the old filtered partials.
    is_hist = F.col("l_shipdate") < cut
    pb = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(is_hist, micro)).alias("hist_rev"),
            F.count(F.when(is_hist, F.lit(1))).alias("hist_n"),
            F.sum(F.when(~is_hist, micro)).alias("delta_rev"),
            F.count(F.when(~is_hist, F.lit(1))).alias("delta_n"),
        )
        .persist()
    )
    hist = pb.filter(F.col("hist_n") > 0).select(
        "l_partkey",
        F.col("hist_rev").alias("rev_micro"),
        F.col("hist_n").alias("n_items"),
    )
    delta = pb.filter(F.col("delta_n") > 0).select(
        "l_partkey",
        F.col("delta_rev").alias("rev_micro"),
        F.col("delta_n").alias("n_items"),
    )
    # one TakeOrdered over the cached partials serves both the old
    # top-k membership AND the k-th boundary (was two)
    # ckpt-grain: bounded — TOPK_IVM_K rows
    topk_hist = (
        hist.orderBy(F.col("rev_micro").desc(), "l_partkey")
        .limit(TOPK_IVM_K)
        .localCheckpoint(eager=False)
    )
    old_topk = topk_hist.select("l_partkey")
    # Candidate rule, tie-safe: every state key whose total REACHES the
    # old k-th boundary is a candidate (an untouched key exactly tied
    # with the boundary can still enter the new top-k on the partkey
    # tie-break), plus every delta-touched key. The boundary probe is a
    # one-row broadcast onto the O(|keys|) state — never a history scan.
    boundary = topk_hist.agg(F.min("rev_micro").alias("kth_rev"))
    cand = (
        hist.crossJoin(F.broadcast(boundary))
        .filter(F.col("rev_micro") >= F.col("kth_rev"))
        .select("l_partkey")
        .union(delta.select("l_partkey"))
        .distinct()
    )
    merged = (
        hist.join(cand, "l_partkey", "left_semi")
        .unionByName(delta)
        .groupBy("l_partkey")
        .agg(F.sum("rev_micro").alias("rev_micro"), F.sum("n_items").alias("n_items"))
    )
    new_topk = (
        merged.orderBy(F.col("rev_micro").desc(), "l_partkey")
        .limit(TOPK_IVM_K)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("rev_micro").desc(), "l_partkey")),
        )
    )
    return (
        new_topk.join(
            F.broadcast(old_topk.withColumn("old_flag", F.lit(1))),
            "l_partkey",
            "left",
        )
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col("l_partkey").alias("p_partkey"),
            # r13 (plan-lint R9): per-part micro revenue crosses 2^53
            # at scale — d53 split before the shared divide+round.
            F.expr(f"round({d53('rev_micro')} / 1000000.0, 2)")
            .cast("double")
            .alias("revenue"),
            F.col("n_items").cast("bigint").alias("n_items"),
            F.coalesce(F.col("old_flag"), F.lit(0)).cast("int").alias("was_in_old_topk"),
        )
    )


MERKLE_BUCKET = 64  # orderkeys per leaf bucket
MERKLE_MUT_MOD = 997  # plant a 1-cent divergence on ~0.1% of rows


@query(
    "replication_merkle_diff",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    b AS (
        SELECT k,
               cents + CASE WHEN k % {MERKLE_MUT_MOD} = 0 THEN 1 ELSE 0 END
                   AS cents
        FROM a
    ),
    ha AS (
        SELECT k // {MERKLE_BUCKET} AS bucket,
               {sql_hex_to_long("substring(md5(CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)), 1, 12)", 12)}
                   AS h, k
        FROM a
    ),
    hb AS (
        SELECT k // {MERKLE_BUCKET} AS bucket,
               {sql_hex_to_long("substring(md5(CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)), 1, 12)", 12)}
                   AS h, k
        FROM b
    ),
    la AS (SELECT bucket, CAST(sum(h) AS BIGINT) AS bh,
                  count(*) AS n FROM ha GROUP BY 1),
    lb AS (SELECT bucket, CAST(sum(h) AS BIGINT) AS bh,
                  count(*) AS n FROM hb GROUP BY 1),
    diverged AS (
        SELECT la.bucket, la.n
        FROM la JOIN lb ON lb.bucket = la.bucket
        WHERE la.bh <> lb.bh
    ),
    repair AS (
        SELECT count(*) AS n_rows_divergent
        FROM a JOIN b ON b.k = a.k
        WHERE a.k // {MERKLE_BUCKET} IN (SELECT bucket FROM diverged)
          AND a.cents <> b.cents
    )
    SELECT (SELECT count(*) FROM la) AS n_buckets,
           (SELECT CAST(count(*) AS BIGINT) FROM diverged)
               AS n_diverged_buckets,
           (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM diverged)
               AS n_rows_compared,
           (SELECT CAST(n_rows_divergent AS BIGINT) FROM repair)
               AS n_rows_divergent,
           (SELECT CAST((2 * 10000 * coalesce(sum(n), 0)
                         + (SELECT count(*) FROM a))
                        // (2 * (SELECT count(*) FROM a)) AS BIGINT)
            FROM diverged) AS rows_compared_bp
    """,
)
def replication_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style anti-entropy replica diff (the Dynamo/Cassandra
    repair device): two replicas of the orders table — B carries a
    planted 1-cent divergence on every {MERKLE_MUT_MOD}-th key —
    exchange only per-bucket digests (order-free SUMS of row digests
    over {MERKLE_BUCKET}-key leaves), and full rows travel ONLY for
    the buckets whose digests disagree. The graded audit is the
    repair economics: buckets checked, buckets diverged, rows
    actually compared vs the full table (`rows_compared_bp` — the
    bandwidth the digest exchange saved), and the divergent rows
    found (exactly the planted set — the losslessness claim).

    Exactness: row digests are the md5 hex-ladder integers, bucket
    digests are exact BIGINT sums (order-independent — the property
    that makes the scheme shuffle-safe), and every count is an
    integer. Scale: digest pass is map-side + one bucket-key shuffle
    per replica; the repair join touches only diverged buckets —
    that asymmetry IS the algorithm (full-state sync degrades to
    comparing everything; Merkle compares O(diverged) rows + O(total/
    {MERKLE_BUCKET}) digests).
    """
    a = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(25,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    b = a.select(
        "k",
        (
            F.col("cents")
            + F.when(F.col("k") % MERKLE_MUT_MOD == 0, 1).otherwise(0)
        ).alias("cents"),
    )

    def leaves(df: DataFrame) -> DataFrame:
        hashed = df.select(
            F.expr(f"k DIV {MERKLE_BUCKET}").alias("bucket"),
            "k",
            hash_key("", F.concat(F.col("k").cast("string"), F.lit(":"),
                                  F.col("cents").cast("string"))).substr(1, 12).alias("hx"),
        ).select("bucket", "k", F.expr(sql_hex_to_long("hx", 12)).alias("h"))
        return hashed.groupBy("bucket").agg(
            F.sum("h").cast("bigint").alias("bh"), F.count(F.lit(1)).alias("n")
        )

    la = leaves(a)
    lb = leaves(b)
    diverged = (
        la.join(lb.select(F.col("bucket"), F.col("bh").alias("bh_b")), "bucket")
        .filter(F.col("bh") != F.col("bh_b"))
        .select("bucket", "n")
    )
    n_total = a.count()
    n_buckets = la.count()
    div_stats = diverged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_diverged_buckets"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_rows_compared"),
    )
    repair = (
        a.join(diverged.select("bucket"),
               F.expr(f"k DIV {MERKLE_BUCKET}") == F.col("bucket"), "left_semi")
        .join(b.select(F.col("k"), F.col("cents").alias("cents_b")), "k")
        .filter(F.col("cents") != F.col("cents_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows_divergent"))
    )
    return (
        div_stats.crossJoin(F.broadcast(repair))
        .select(
            F.lit(n_buckets).cast("bigint").alias("n_buckets"),
            "n_diverged_buckets",
            "n_rows_compared",
            "n_rows_divergent",
            F.expr(
                f"CAST((2 * 10000 * n_rows_compared + {n_total})"
                f" DIV nullif(2 * {n_total}, 0) AS BIGINT)"
            ).alias("rows_compared_bp"),
        )
    )


@query(
    "tpcds_q34_frequent_ticket_bands",
    oracle="""
    WITH ticket AS (
        SELECT o_orderkey, o_custkey, count(*) AS n_items
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE month(o_orderdate) IN (1, 2, 3)
        GROUP BY o_orderkey, o_custkey
        HAVING count(*) BETWEEN 5 AND 7
    )
    SELECT c_custkey, c_name, o_orderkey, CAST(n_items AS BIGINT) AS n_items
    FROM ticket JOIN customer ON c_custkey = o_custkey
    """,
)
def tpcds_q34_frequent_ticket_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34's characteristic shape: per-ticket item counts with a
    HAVING band (the 'frequent shopper' 15..20 band, adapted to this
    schema's 1..7 lineitem fan-out as 5..7), then a join back to the
    customer dimension for the identity columns — aggregate-then-
    filter-then-join, where the band filter runs ON THE AGGREGATE
    before any dimension data moves.

    Plan: lineitem joins orders on the orderkey (the fact-fact equi
    join), partial+final count per ticket, the HAVING band drops ~5/7
    of tickets BEFORE the customer join, and the surviving ticket list
    joins the dimension. At 100 TB the band filter is the point: the
    expensive fact aggregate reduces to a thin ticket list and only
    that list shuffles against customer — never the raw lineitems.
    The month filter is pushed to the orders scan (PushedFilters), so
    the fact join starts from a quarter of the year's orders.
    """
    orders = load(spark, sf_dir, "orders").filter(
        F.month("o_orderdate").isin(1, 2, 3)
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    ticket = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items").between(5, 7))
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return ticket.join(cust, ticket.o_custkey == cust.c_custkey).select(
        "c_custkey", "c_name", "o_orderkey", F.col("n_items").cast("bigint").alias("n_items")
    )


@query(
    "tpcds_q59_week_over_week_sales",
    oracle="""
    WITH wk AS (
        SELECT c_nationkey AS nk,
               year(o_orderdate) AS y,
               CAST(dayofyear(o_orderdate) - 1 AS BIGINT) // 7 AS wk,
               CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON c_custkey = o_custkey
        WHERE year(o_orderdate) IN (1996, 1997)
    ), agg AS (
        SELECT nk, y, wk, CAST(sum(cents) AS BIGINT) AS rev
        FROM wk GROUP BY nk, y, wk
    )
    SELECT n_name, a.wk,
           a.rev AS rev96_cents,
           b.rev AS rev97_cents,
           CAST(b.rev * 10000 // a.rev AS BIGINT) AS yoy_bp
    FROM agg a
    JOIN agg b ON a.nk = b.nk AND a.wk = b.wk AND a.y = 1996 AND b.y = 1997
    JOIN nation ON n_nationkey = a.nk
    """,
)
def tpcds_q59_week_over_week_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59's characteristic shape: weekly sales aggregated per
    group for two consecutive years, SELF-JOINED on (group, week) to
    report the year-over-year ratio — adapted to nation-grain revenue
    for 1996 vs 1997. The week index is (dayofyear-1) DIV 7 — a pure
    integer expression with identical semantics in both engines (ISO
    week numbering differs subtly across engines near year boundaries,
    so the portable engine derives its own calendar arithmetic — the
    playbook's anchor-before-the-data device). Revenue is exact integer
    cents; the ratio ships as truncating basis points.

    Plan: ONE scan of orders (year filter pushed down) feeds one
    aggregate; the two year slices come from the SAME aggregated frame
    (self-join on the tiny nation x week grid, ~25 x 53 keys), and the
    25-row nation dimension broadcasts. At 100 TB the aggregate output
    is bounded by the key grid — the self-join never touches fact-table
    volume, and AQE picks the broadcast for both small joins.
    """
    cents = (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("long")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate").isin(1996, 1997))
        .select(
            "o_custkey",
            F.year("o_orderdate").alias("y"),
            F.expr(
                "CAST(dayofyear(o_orderdate) - 1 AS BIGINT) DIV 7"
            ).alias("wk"),
            cents.alias("cents"),
        )
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    agg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "y", "wk")
        .agg(F.sum("cents").alias("rev"))
    )
    a = agg.filter(F.col("y") == 1996).select(
        F.col("nk").alias("nk_a"), F.col("wk").alias("wk_a"),
        F.col("rev").alias("rev96_cents"),
    )
    b = agg.filter(F.col("y") == 1997).select(
        F.col("nk").alias("nk_b"), F.col("wk").alias("wk_b"),
        F.col("rev").alias("rev97_cents"),
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        a.join(b, (F.col("nk_a") == F.col("nk_b")) & (F.col("wk_a") == F.col("wk_b")))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("nk_a"))
        .select(
            "n_name",
            F.col("wk_a").alias("wk"),
            "rev96_cents",
            "rev97_cents",
            F.expr(
                "CAST(rev97_cents * 10000 DIV rev96_cents AS BIGINT)"
            ).alias("yoy_bp"),
        )
    )


# --- Bloom-filter join pruning audit -------------------------------------

BLOOM_JOIN_M = 1 << 20  # bit-space size; fixed so the audit is deterministic
_BJ_POS1 = None  # filled below (needs sql_hex_to_long at def time)


def _bj_pos(salt: str, key: str) -> str:
    """Shared-text bit position: md5 prefix of the salted key, mod m."""
    h = f"substr(md5('{salt}' || CAST({key} AS STRING)), 1, 12)"
    return f"({sql_hex_to_long(h, 12)} % {BLOOM_JOIN_M})"


@query(
    "join_bloom_runtime_filter_audit",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), bits AS (
        SELECT DISTINCT pos FROM (
            SELECT {_bj_pos('b1|', 'k')} AS pos FROM build
            UNION ALL
            SELECT {_bj_pos('b2|', 'k')} AS pos FROM build
        )
    ), probe AS (
        SELECT l_orderkey AS k, count(*) AS cnt
        FROM lineitem GROUP BY l_orderkey
    ), flagged AS (
        SELECT p.k, p.cnt,
               CASE WHEN b1.pos IS NOT NULL AND b2.pos IS NOT NULL
                    THEN 1 ELSE 0 END AS pass,
               CASE WHEN bu.k IS NOT NULL THEN 1 ELSE 0 END AS tru
        FROM probe p
        LEFT JOIN bits b1 ON b1.pos = {_bj_pos('b1|', 'p.k')}
        LEFT JOIN bits b2 ON b2.pos = {_bj_pos('b2|', 'p.k')}
        LEFT JOIN build bu ON bu.k = p.k
    ), nb AS (SELECT count(*) AS n_build_keys FROM build)
    SELECT nb.n_build_keys,
           count(*) AS n_probe_keys,
           CAST(sum(cnt) AS BIGINT) AS n_probe_rows,
           CAST(sum(pass) AS BIGINT) AS pass_keys,
           CAST(sum(pass * cnt) AS BIGINT) AS pass_rows,
           CAST(sum(tru) AS BIGINT) AS true_keys,
           CAST(sum(tru * cnt) AS BIGINT) AS true_rows,
           CAST(sum(pass * (1 - tru)) AS BIGINT) AS false_pass_keys,
           CAST(sum(pass * (1 - tru)) * 10000
                // (count(*) - sum(tru)) AS BIGINT) AS fp_keys_bp,
           CAST(sum(tru * (1 - pass)) AS BIGINT) AS false_negative_keys
    FROM flagged CROSS JOIN nb
    GROUP BY nb.n_build_keys
    """,
)
def join_bloom_runtime_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning, audited end-to-end: the build
    side (urgent orders) is summarized as a deterministic 2-hash bloom
    over a 2^20-bit space, the probe side (lineitem keys) is tested
    against the bloom, and the exact semi-join runs alongside so the
    audit GRADES the filter: pass/true row and key counts, the
    false-positive rate among true negatives in basis points, and the
    false-negative count — which a correct bloom must pin at exactly 0
    (the no-false-negative guarantee is an output column, not an
    assertion).

    This is the mechanism behind Spark's own
    `spark.sql.optimizer.runtime.bloomFilter.enabled` runtime filters
    and parquet row-group dictionary pruning, made inspectable: at
    100 TB the build side's distinct-bit list (<= 2n rows of one
    integer, here ~6k) broadcasts where the raw key set might not, and
    the probe scan drops (1 - fp) of its non-matching rows BEFORE the
    shuffle join. The audit's fp_keys_bp is exactly the wasted-shuffle
    fraction a planner would trade against bloom size m.

    Probe work happens on the DISTINCT-key grain (one hash aggregate),
    then row counts fold back — the bloom test itself never touches
    row-grain data twice. md5-derived positions keep both engines
    bit-identical (`sql_hex_to_long` device).
    """
    # The build-key frame is referenced four times (two bit legs, the
    # exact-truth join, the count anchor); localCheckpoint materializes
    # it once — exactly what a real runtime-filter build does — instead
    # of re-scanning orders per reference (the HITS lineage device).
    build = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        # ckpt-grain: slim-exception — 1-col filtered key set (the runtime-filter build side)
        .localCheckpoint(eager=False)  # slim 1-column key set; checkpoint kept (r11 rule exception)
    )
    bits = (
        build.selectExpr(f"{_bj_pos('b1|', 'k')} AS pos")
        .unionAll(build.selectExpr(f"{_bj_pos('b2|', 'k')} AS pos"))
        .distinct()
        # ckpt-grain: bounded — bloom bit positions, capped by the filter's bit count
        .localCheckpoint(eager=False)
    )
    probe = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("p1", F.expr(_bj_pos("b1|", "k")))
        .withColumn("p2", F.expr(_bj_pos("b2|", "k")))
    )
    b1 = bits.select(F.col("pos").alias("pos1"))
    b2 = bits.select(F.col("pos").alias("pos2"))
    truth = build.select(F.col("k").alias("tk"))
    flagged = (
        probe.join(F.broadcast(b1), probe.p1 == b1.pos1, "left")
        .join(F.broadcast(b2), probe.p2 == b2.pos2, "left")
        .join(F.broadcast(truth), probe.k == truth.tk, "left")
        .select(
            "cnt",
            F.when(
                F.col("pos1").isNotNull() & F.col("pos2").isNotNull(), 1
            ).otherwise(0).alias("pass"),
            F.when(F.col("tk").isNotNull(), 1).otherwise(0).alias("tru"),
        )
    )
    nb = build.agg(F.count("*").alias("n_build_keys"))
    return (
        flagged.crossJoin(F.broadcast(nb))
        .groupBy("n_build_keys")
        .agg(
            F.count("*").alias("n_probe_keys"),
            F.sum("cnt").cast("bigint").alias("n_probe_rows"),
            F.sum("pass").cast("bigint").alias("pass_keys"),
            F.sum(F.col("pass") * F.col("cnt")).cast("bigint").alias("pass_rows"),
            F.sum("tru").cast("bigint").alias("true_keys"),
            F.sum(F.col("tru") * F.col("cnt")).cast("bigint").alias("true_rows"),
            F.sum(F.col("pass") * (1 - F.col("tru")))
            .cast("bigint")
            .alias("false_pass_keys"),
            F.expr(
                "CAST(sum(pass * (1 - tru)) * 10000 "
                "DIV (count(*) - sum(tru)) AS BIGINT)"
            ).alias("fp_keys_bp"),
            F.sum(F.col("tru") * (1 - F.col("pass")))
            .cast("bigint")
            .alias("false_negative_keys"),
        )
    )


ASOF_NEAREST_TOL_MIN = 30


@query(
    "join_asof_nearest_tolerance",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'click'
    ), cands AS (
        SELECT p.event_id, p.user_id, p.ts,
               max(CASE WHEN c.ts <= p.ts THEN c.ts END) AS back_ts,
               min(CASE WHEN c.ts > p.ts THEN c.ts END) AS fwd_ts
        FROM purchases p LEFT JOIN clicks c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL {ASOF_NEAREST_TOL_MIN} MINUTE
         AND c.ts <= p.ts + INTERVAL {ASOF_NEAREST_TOL_MIN} MINUTE
        GROUP BY 1, 2, 3
    ), picked AS (
        SELECT event_id, user_id, ts,
               CASE
                 WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL OR
                      epoch_us(ts) - epoch_us(back_ts)
                        <= epoch_us(fwd_ts) - epoch_us(ts))
                   THEN back_ts
                 ELSE fwd_ts
               END AS near_ts
        FROM cands
    )
    SELECT event_id AS purchase_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(near_ts, '%Y-%m-%d %H:%M:%S') AS nearest_click_ts,
           CASE WHEN near_ts IS NULL THEN NULL
                WHEN near_ts <= ts THEN 'backward' ELSE 'forward' END
               AS direction,
           CAST(abs(epoch_us(near_ts) - epoch_us(ts)) AS BIGINT) AS delta_us
    FROM picked
    """,
)
def join_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join with a ±30-minute tolerance — the
    third pandas merge_asof direction, completing the family
    (join_asof_purchase_last_click = backward,
    join_asof_forward_tolerance = forward): each purchase matches the
    CLOSEST click on either side, ties resolved backward (pandas'
    rule), misses beyond tolerance stay NULL.

    Engine plan is the scalable union-and-window as-of device run in
    BOTH directions: one shuffle on user_id, an ascending pass carries
    the latest prior click (last IGNORE NULLS, PRECEDING..CURRENT
    frame), a DESCENDING pass carries the earliest later click with
    the same bounded frame — the playbook's reverse-sort device, never
    an UNBOUNDED FOLLOWING frame (O(n²) re-scan) and never the
    oracle's quadratic per-user join. Equal-timestamp clicks sort
    before purchases ascending (visible backward, distance 0 — which
    the tie rule awards anyway) and after purchases descending
    (excluded forward, keeping the strict > contract). Distances
    compare in exact microseconds (unix_micros / epoch_us — the
    sub-second-safe twin of the playbook's floor(epoch) device).
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tord"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("cts"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tord", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("tord"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "tord",
        F.last("cts", ignorenulls=True).over(wb).alias("back_ts"),
        F.last(
            F.when(F.col("tord") == 0, F.col("cts")), ignorenulls=True
        ).over(wf).alias("fwd_raw"),
    ).filter(F.col("tord") == 1)
    tol_us = ASOF_NEAREST_TOL_MIN * 60 * 1_000_000
    cands = enriched.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.unix_micros("ts") - F.unix_micros("back_ts") <= tol_us,
            F.col("back_ts"),
        ).alias("back_ts"),
        F.when(
            (F.unix_micros("fwd_raw") > F.unix_micros("ts"))
            & (F.unix_micros("fwd_raw") - F.unix_micros("ts") <= tol_us),
            F.col("fwd_raw"),
        ).alias("fwd_ts"),
    )
    near = F.when(
        F.col("back_ts").isNotNull()
        & (
            F.col("fwd_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("back_ts")
                <= F.unix_micros("fwd_ts") - F.unix_micros("ts")
            )
        ),
        F.col("back_ts"),
    ).otherwise(F.col("fwd_ts"))
    picked = cands.withColumn("near_ts", near)
    return picked.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("near_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "nearest_click_ts"
        ),
        F.when(F.col("near_ts").isNull(), F.lit(None).cast("string"))
        .when(F.col("near_ts") <= F.col("ts"), "backward")
        .otherwise("forward")
        .alias("direction"),
        F.abs(F.unix_micros("near_ts") - F.unix_micros("ts"))
        .cast("bigint")
        .alias("delta_us"),
    )
