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
