"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``leadsight_sales_agent_spark`` (one module per
operator family, SURVEY.md §2); this file just re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from leadsight_sales_agent_spark import registry  # noqa: E402

registry.load_all()

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Lead prioritization: revenue by customer market segment and month
    (scan → filter → join ×2 → hash agg → sort). SURVEY.md §7.1.
    """
    return registry.QUERIES["flagship_revenue_by_segment_month"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered oracle-backed-first / cheap-before-expensive so a budgeted
    correctness run drops the weakest checks last (registry.py)."""
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (others rows-only)."""
    return dict(registry.ORACLES)
