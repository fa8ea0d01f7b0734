"""Set operations: union / unionByName / intersect / except (+ ALL).

Not present in the reference (SURVEY.md §2.7 — its only set-shaped op is
the visited-URL dedup D1); required engine surface. All Catalyst
built-ins: UNION is a zero-shuffle concat; INTERSECT/EXCEPT plan as
aggregated semi/anti joins (one shuffle on the full row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.registry import query
from leadsight_sales_agent_spark.sources.catalog import load


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


@query(
    "setop_union_all_nation_mentions",
    oracle="""
    SELECT nationkey, count(*) AS n_mentions FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) u GROUP BY 1
    """,
)
def setop_union_all_nation_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — unionByName keeps it positional-safe."""
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n_mentions"))
    )


@query(
    "setop_union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that have both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (EXCEPT = set semantics:
    subtract(), not exceptAll().distinct() which keeps keys whose
    left-multiplicity merely exceeds the right's)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@query(
    "setop_intersect_all_langs",
    oracle="""
    SELECT lang FROM documents WHERE source = 'src0'
    INTERSECT ALL
    SELECT lang FROM documents WHERE source = 'src1'
    """,
)
def setop_intersect_all_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection, min of multiplicities)."""
    docs = load(spark, sf_dir, "documents")
    a = docs.filter(F.col("source") == "src0").select("lang")
    b = docs.filter(F.col("source") == "src1").select("lang")
    return a.intersectAll(b)


@query(
    "setop_except_all_langs",
    oracle="""
    SELECT lang FROM documents WHERE source = 'src0'
    EXCEPT ALL
    SELECT lang FROM documents WHERE source = 'src1'
    """,
)
def setop_except_all_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference of multiplicities)."""
    docs = load(spark, sf_dir, "documents")
    a = docs.filter(F.col("source") == "src0").select("lang")
    b = docs.filter(F.col("source") == "src1").select("lang")
    return a.exceptAll(b)


@query(
    "union_schema_evolution",
    oracle="""
    SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS acctbal,
           NULL AS nation_key, 'v1' AS schema_version
    FROM customer WHERE c_custkey < 500
    UNION ALL
    SELECT c_custkey, c_mktsegment, NULL, c_nationkey, 'v2'
    FROM customer WHERE c_custkey >= 500 AND c_custkey < 1000
    """,
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: combine two table versions whose columns
    drifted (v1 carries acctbal, v2 replaced it with nation_key) via
    `unionByName(allowMissingColumns=True)` — missing columns become
    typed nulls, position is irrelevant. This is the reference's P1
    missing→null projection (app.py:309 `reindex`) applied across
    FILES instead of columns, and the everyday reality of reading
    months of parquet written by evolving pipelines (Spark's parquet
    reader does the same alignment with mergeSchema; this is the
    explicit DataFrame form).

    By-NAME alignment matters: positional `unionAll` would silently
    pair acctbal with nation_key — wrong data, no error. Plain
    narrow-map plan, no shuffle.
    """
    cust = load(spark, sf_dir, "customer")
    v1 = (
        cust.filter(F.col("c_custkey") < 500)
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("v1").alias("schema_version"),
        )
    )
    v2 = (
        cust.filter((F.col("c_custkey") >= 500) & (F.col("c_custkey") < 1000))
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("int").alias("nation_key"),
            F.lit("v2").alias("schema_version"),
        )
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "c_custkey",
        "segment",
        "acctbal",
        F.col("nation_key").cast("int").alias("nation_key"),
        "schema_version",
    )
