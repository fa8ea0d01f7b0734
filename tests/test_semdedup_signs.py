"""Pin the Python md5 sign twin used to bake SemDeDup's JL sign matrix
into the plan (r13) against the original Spark expression it replaced.

The projection rewrite (dedup.py, dedup_semantic_semdedup) is only
value-preserving if, for every (k, i), the literal baked by
``_semd_sign`` equals what the old broadcast-sign frame computed with
``hash_key('sd:', k || ':' || i).substr(1, 1) < '8'``. This test
evaluates the ORIGINAL Spark expression over the full k x i grid the
query can ever use at the clamps (30 bits x 64 dims) and compares.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from leadsight_sales_agent_spark.operators.dedup import (
    SEMD_MAX_BITS,
    _semd_sign,
    semd_bits,
)
from leadsight_sales_agent_spark.operators.sampling import hash_key


def test_python_sign_twin_matches_spark_expression(spark):
    dim = 64
    grid = (
        spark.range(1, SEMD_MAX_BITS + 1)
        .select(F.col("id").alias("k"))
        .crossJoin(spark.range(1, dim + 1).select(F.col("id").alias("i")))
        .select(
            "k",
            "i",
            F.when(
                hash_key(
                    "sd:",
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    ),
                ).substr(1, 1)
                < "8",
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    rows = grid.collect()
    assert len(rows) == SEMD_MAX_BITS * dim
    for r in rows:
        assert _semd_sign(r["k"], r["i"]) == r["s"], (r["k"], r["i"])


def test_sign_matrix_not_degenerate():
    # sanity: at the 4-bit floor the matrix mixes both signs per k
    for k in range(1, semd_bits(0) + 1):
        ss = {_semd_sign(k, i) for i in range(1, 65)}
        assert ss == {1, -1}
