"""Skew-stress A/B for the salted twins (r7 verdict, task 7).

The graded queries ``join_salted_skew_demo`` and ``agg_salted_two_phase``
prove RESULT identity (salted == plain, oracle-hashed). This harness
measures whether the salt actually PAYS under skew — the question a
100 TB operator cares about — by synthesizing a hot key that owns ~30 %
of a replicated sf0.1 orders fact and timing, warm, in one session:

  join legs (dimension join, broadcast disabled so the shuffle is real):
    join_plain_noaqe  — shuffle join, AQE fully off: the naive plan,
                        one reducer drowns on the hot key
    join_plain_aqe    — AQE + skewJoin on (the engine's free mitigation)
    join_salted       — the manual N_SALT device from
                        operators/relational.py, AQE off

  agg legs (algebraic count+sum per key, the agg_salted_two_phase shape):
    agg_plain_noaqe   — plain groupBy, AQE off (map-side partial
                        aggregation is still on — that's Spark's default
                        skew armor for algebraic aggregates)
    agg_salted_noaqe  — the (key, salt) two-phase device, AQE off

Method: every leg runs once to warm (scan caches, JIT, shuffle services)
then reports the median of 3 timed runs; all legs share one fact frame
definition so the scan cost is identical. Prints one JSON line; the
numbers and the when-does-salting-pay threshold they support are
recorded in SURVEY.md §8.12.

Run:  python tools/skew_ab.py [sf_dir]      (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from leadsight_sales_agent_spark.operators.relational import N_SALT  # noqa: E402
from leadsight_sales_agent_spark.sources.catalog import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REP = 32  # fact replication: sf0.1 orders 150k -> ~4.8M rows
HOT_SHARE_PCT = 30  # the hot customer owns ~30% of fact rows
HOT_KEY = 1
WARMUPS = 1
RUNS = 3


def skewed_fact(spark: SparkSession) -> DataFrame:
    """Replicated orders fact with ~HOT_SHARE_PCT% of rows remapped to
    one customer key. The remap hash is xxhash64 of (orderkey, rep) so
    the skew is deterministic and row-unique — no rand() in the plan."""
    return (
        load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(REP))))
        .withColumn(
            "o_custkey",
            F.when(
                F.pmod(F.xxhash64("o_orderkey", "rep"), F.lit(100))
                < HOT_SHARE_PCT,
                F.lit(HOT_KEY).cast("long"),
            ).otherwise(F.col("o_custkey")),
        )
    )


def dim(spark: SparkSession) -> DataFrame:
    return load(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")


def join_plain(spark: SparkSession) -> DataFrame:
    fact, d = skewed_fact(spark), dim(spark)
    return (
        fact.hint("shuffle_hash")
        .join(d, fact.o_custkey == d.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("s"),
        )
    )


def join_salted(spark: SparkSession) -> DataFrame:
    # the exact device from operators/relational.py::join_salted_skew_demo
    fact = skewed_fact(spark).withColumn(
        "salt",
        F.pmod(F.xxhash64("o_orderkey", "rep"), F.lit(N_SALT)).cast("int"),
    )
    d = dim(spark).withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    return (
        fact.hint("shuffle_hash")
        .join(d, (fact.o_custkey == d.c_custkey) & (fact.salt == d.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("s"),
        )
    )


def agg_plain(spark: SparkSession) -> DataFrame:
    return skewed_fact(spark).groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("s"),
    )


def agg_salted(spark: SparkSession) -> DataFrame:
    # the exact device from operators/aggregates.py::agg_salted_two_phase
    # — salt modulus IMPORTED from there so the A/B cannot drift from
    # the production device it claims to measure (r8 ADVICE)
    from leadsight_sales_agent_spark.operators.aggregates import N_AGG_SALT

    partial = (
        skewed_fact(spark)
        .withColumn(
            "salt", F.pmod(F.xxhash64("o_orderkey", "rep"), F.lit(N_AGG_SALT))
        )
        .groupBy("o_custkey", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("ps"),
        )
    )
    return partial.groupBy("o_custkey").agg(
        F.sum("pn").alias("n"), F.sum("ps").alias("s")
    )


def fact_floor(spark: SparkSession) -> DataFrame:
    """Scan + explode + remap only (same columns the legs read, no
    shuffle): the shared fact-build cost every leg pays, so the join /
    agg numbers can be read net of it."""
    return skewed_fact(spark).groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("s"),
    )


def set_aqe(spark: SparkSession, on: bool) -> None:
    spark.conf.set("spark.sql.adaptive.enabled", str(on).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())


def timed(build, spark: SparkSession, aqe: bool) -> float:
    set_aqe(spark, aqe)
    samples = []
    for i in range(WARMUPS + RUNS):
        t0 = time.monotonic()
        rows = build(spark).collect()
        dt = time.monotonic() - t0
        assert rows, "leg produced no rows"
        if i >= WARMUPS:
            samples.append(dt)
    return round(statistics.median(samples), 3)


def main() -> None:
    from leadsight_sales_agent_spark.session import get_spark

    spark = get_spark("skew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # the scenario under test: the dimension is NOT broadcastable
    # (at 100 TB it wouldn't be); the shuffle is the object of study
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # sanity: the two join legs and the two agg legs agree exactly
    set_aqe(spark, True)
    jp = {tuple(r) for r in join_plain(spark).collect()}
    js = {tuple(r) for r in join_salted(spark).collect()}
    assert jp == js, "salted join result differs from plain"
    ap = {tuple(r) for r in agg_plain(spark).collect()}
    asalt = {tuple(r) for r in agg_salted(spark).collect()}
    assert ap == asalt, "salted agg result differs from plain"

    n_fact = skewed_fact(spark).count()
    hot = (
        skewed_fact(spark)
        .filter(F.col("o_custkey") == HOT_KEY)
        .count()
    )

    out = {
        "sf_dir": SF_DIR,
        "fact_rows": n_fact,
        "hot_key_rows": hot,
        "hot_share_pct": round(100.0 * hot / n_fact, 1),
        "n_salt": N_SALT,
        "fact_floor_s": timed(fact_floor, spark, aqe=False),
        "join_plain_noaqe_s": timed(join_plain, spark, aqe=False),
        "join_plain_aqe_s": timed(join_plain, spark, aqe=True),
        "join_salted_s": timed(join_salted, spark, aqe=False),
        "agg_plain_noaqe_s": timed(agg_plain, spark, aqe=False),
        "agg_salted_noaqe_s": timed(agg_salted, spark, aqe=False),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
