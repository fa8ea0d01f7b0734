"""Cross-engine numeric determinism (functions/numeric.py).

The driver's value-hash gate requires aggregated doubles to be
bit-identical between Spark and DuckDB and across partitionings —
these tests pin that property.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.functions.numeric import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

VALUES = [0.1, 0.2, 0.3, 1.005, 2.675, 73.91375, 100.49999, 0.000001, 9999.999999]


def spark_agg(spark, values, col):
    df = spark.createDataFrame([(v,) for v in values], "x: double")
    return df.agg(col.alias("out")).first()["out"]


class TestDsum:
    def test_partitioning_invariant(self, spark):
        df = spark.createDataFrame([(0.1,)] * 10, "x: double")
        one = df.repartition(1).agg(dsum(F.col("x")).alias("s")).first()["s"]
        many = df.repartition(7).agg(dsum(F.col("x")).alias("s")).first()["s"]
        assert one == many == 1.0  # double sum would give 0.9999999999999999

    def test_matches_duckdb_twin(self, spark):
        got = spark_agg(spark, VALUES, dsum(F.col("x"), 2))
        want = duckdb.sql(
            f"SELECT {sql_dsum('x', 2)} FROM (SELECT unnest({VALUES}) AS x)"
        ).fetchone()[0]
        assert got == want


class TestDavg:
    def test_tie_rounds_half_up(self, spark):
        # true mean 73.91375 — naive round(sum/count, 4) flips between
        # engines (73.9137 vs 73.9138); exact integer round-half-up pins it
        got = spark_agg(spark, [73.91375] * 8, davg(F.col("x"), 4))
        assert got == 73.9138

    def test_matches_duckdb_twin(self, spark):
        got = spark_agg(spark, VALUES, davg(F.col("x"), 4))
        want = duckdb.sql(
            f"SELECT {sql_davg('x', 4)} FROM (SELECT unnest({VALUES}) AS x)"
        ).fetchone()[0]
        assert got == want

    def test_empty_group_is_null(self, spark):
        df = spark.createDataFrame([], "x: double")
        assert df.agg(davg(F.col("x")).alias("a")).first()["a"] is None

    def test_partitioning_invariant(self, spark):
        df = spark.createDataFrame([(v,) for v in VALUES * 50], "x: double")
        one = df.repartition(1).agg(davg(F.col("x")).alias("a")).first()["a"]
        many = df.repartition(13).agg(davg(F.col("x")).alias("a")).first()["a"]
        assert one == many


class TestPaneSlidingEquivalence:
    def test_pane_plan_equals_direct_sliding_rowwise(self, spark, sf_dir):
        # The incremental pane aggregation must be BIT-identical to the
        # built-in F.window direct aggregation — same windows, same
        # counts, same tie-safe rounded means (the partials are exact
        # mergeable integers, so merging cannot drift).
        from leadsight_sales_agent_spark import registry

        registry.load_all()
        direct = {
            r["window_start"]: (r["n_events"], r["avg_value"])
            for r in registry.QUERIES["window_sliding_1h_30min"](
                spark, sf_dir
            ).collect()
        }
        panes = {
            r["window_start"]: (r["n_events"], r["avg_value"])
            for r in registry.QUERIES["window_sliding_panes"](
                spark, sf_dir
            ).collect()
        }
        assert panes == direct
