"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus oracle SQL.

Every graded operator registers here via the ``@query`` decorator. The
driver contract (``__spark_entry__.py``) simply re-exports these dicts.

Oracle SQL strings are ANSI SQL runnable by DuckDB over the same parquet
tables (pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings). Queries without an oracle get a
rows-only check (used only for genuinely non-SQL-expressible operators:
LSH, streaming demos, mocked enrichment UDFs).

Column-name parity rule: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import leadsight_sales_agent_spark.operators.relational  # noqa: F401
    import leadsight_sales_agent_spark.operators.aggregates  # noqa: F401
    import leadsight_sales_agent_spark.operators.windows  # noqa: F401
    import leadsight_sales_agent_spark.operators.setops  # noqa: F401
    import leadsight_sales_agent_spark.operators.dedup  # noqa: F401
    import leadsight_sales_agent_spark.operators.similarity  # noqa: F401
    import leadsight_sales_agent_spark.operators.text  # noqa: F401
    import leadsight_sales_agent_spark.operators.multimodal  # noqa: F401
    import leadsight_sales_agent_spark.operators.enrich  # noqa: F401
    import leadsight_sales_agent_spark.streaming.demo  # noqa: F401
