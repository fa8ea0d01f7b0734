"""Cross-engine property tests for the EXACTNESS DEVICES themselves.

Every oracle-backed query leans on a small set of devices that make
Spark and DuckDB produce bit-identical values (documented in
functions/numeric.py and SURVEY §8.8): the floor(x*1eK+0.5)/1eK
quantizer that replaced the engine-divergent round(double, s), the
double→DECIMAL(15,6)→STRING serialization for float arrays, shared-text
IEEE expression trees, integer DIV truncation, the floor(epoch())
timestamp device, and the length(bin(m-1)) bit-length rule (dictionary
advisor, r8 SemDeDup cell sizing). The queries' oracles exercise these
on the FIXED testdata; this layer pins the devices on ARBITRARY inputs,
so an engine-version drift in any of them fails here first with a
minimal counterexample instead of as an opaque hash mismatch in some
downstream query.

Each hypothesis example batches all values into ONE Spark job and one
DuckDB query (the tests would be minutes-slow row-at-a-time). Doubles
travel to both engines as native Python floats (exact C-double
transport on both), so any mismatch is the engines', not the wire's.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTLE = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)

# bounded, finite, including subnormals, signed zeros, and near-tie
# fractions — the regime every reporting quantizer runs in
_DOUBLES = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=1,
    max_size=200,
)


def _duck_rows(sql: str, rows: list[tuple], schema: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t({schema})")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' * len(rows[0]))})", rows
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


class TestFloatDevicesCrossEngine:
    @_SETTLE
    @given(_DOUBLES)
    def test_floor_quantizer_and_decimal_string_and_ieee_tree(self, spark, xs):
        """Three devices on the same batch of arbitrary doubles:
        (1) floor(x*1e4+0.5)/1e4 — the engine-identical quantizer
            (§8.8: round(double, s) is NOT safe; this is its
            replacement, floor of identical IEEE products);
        (2) CAST(CAST(x AS DECIMAL(15,6)) AS STRING) — the array
            serialization device (decimal→string is fixed-scale
            identical across engines; double→string is not);
        (3) a shared-text IEEE tree over *, +, -, abs, sqrt, floor —
            every op is a correctly-rounded IEEE-754 operation, so
            identical expression text means bit-identical doubles
            (sqrt IS correctly rounded; ln/exp/pow are NOT and are
            excluded by the playbook)."""
        rows = list(enumerate(xs))
        sdf = spark.createDataFrame(rows, "i LONG, x DOUBLE")
        got_spark = {
            r.i: (r.fq, r.dstr, r.tree)
            for r in sdf.select(
                "i",
                F.expr("floor(x * 1e4 + 0.5) / 1e4").alias("fq"),
                F.expr("CAST(CAST(x AS DECIMAL(15,6)) AS STRING)").alias(
                    "dstr"
                ),
                F.expr("sqrt(abs(x)) + x * 5e-1 - floor(x)").alias("tree"),
            ).collect()
        }
        got_duck = _duck_rows(
            "SELECT i, floor(x * 1e4 + 0.5) / 1e4,"
            " CAST(CAST(x AS DECIMAL(15,6)) AS VARCHAR),"
            " sqrt(abs(x)) + x * 5e-1 - floor(x) FROM t ORDER BY i",
            rows,
            "i BIGINT, x DOUBLE",
        )
        for i, fq, dstr, tree in got_duck:
            assert got_spark[i] == (fq, dstr, tree), (xs[i], got_spark[i], (fq, dstr, tree))

    @_SETTLE
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(10**17), max_value=10**17),
                st.integers(min_value=-(10**9), max_value=10**9).filter(
                    lambda q: q != 0
                ),
            ),
            min_size=1,
            max_size=200,
        )
    )
    def test_div_truncates_toward_zero_on_both_engines(self, spark, pairs):
        """Playbook claim: Spark `DIV` and DuckDB integer `//` BOTH
        truncate toward zero (verified -7/2 = -3 on both), so bare
        integral division needs no sign mirroring. Pinned against the
        exact Python truncation on arbitrary signed pairs."""
        rows = [(i, p, q) for i, (p, q) in enumerate(pairs)]
        sdf = spark.createDataFrame(rows, "i LONG, p LONG, q LONG")
        got_spark = {
            r.i: r.d
            for r in sdf.select("i", F.expr("p DIV q").alias("d")).collect()
        }
        got_duck = _duck_rows(
            "SELECT i, p // q FROM t ORDER BY i",
            rows,
            "i BIGINT, p BIGINT, q BIGINT",
        )
        for i, d in got_duck:
            p, q = pairs[i]
            trunc = abs(p) // abs(q) * (1 if (p < 0) == (q < 0) else -1)
            assert got_spark[i] == d == trunc, (p, q, got_spark[i], d, trunc)

    @_SETTLE
    @given(
        st.lists(
            # 1970..2100, microsecond grain — the events-table regime
            st.integers(min_value=0, max_value=4_102_444_800_000_000),
            min_size=1,
            max_size=200,
        )
    )
    def test_epoch_seconds_and_micros_devices(self, spark, micros):
        """Playbook devices: Spark unix_micros == DuckDB epoch_us
        (exact sub-second deltas), and Spark unix_timestamp ==
        DuckDB CAST(floor(epoch(ts)) AS BIGINT) — NOT CAST(epoch(ts)
        AS BIGINT), which ROUNDS the sub-second fraction (the
        storage_gorilla_ts_encoding_audit trap)."""
        rows = list(enumerate(micros))
        sdf = spark.createDataFrame(rows, "i LONG, m LONG")
        got_spark = {
            r.i: (r.us, r.sec)
            for r in sdf.select(
                "i",
                F.expr("unix_micros(timestamp_micros(m))").alias("us"),
                F.expr("unix_timestamp(timestamp_micros(m))").alias("sec"),
            ).collect()
        }
        got_duck = _duck_rows(
            "SELECT i, epoch_us(make_timestamp(m)),"
            " CAST(floor(epoch(make_timestamp(m))) AS BIGINT)"
            " FROM t ORDER BY i",
            rows,
            "i BIGINT, m BIGINT",
        )
        for i, us, sec in got_duck:
            assert got_spark[i] == (us, sec), (micros[i], got_spark[i], (us, sec))
            assert us == micros[i]
            assert sec == micros[i] // 1_000_000

    @_SETTLE
    @given(
        st.lists(
            st.integers(min_value=1, max_value=2**62),
            min_size=1,
            max_size=200,
        )
    )
    def test_bit_length_bin_device(self, spark, vals):
        """length(bin(x)) == x.bit_length() on BOTH engines — the
        integer ceil(log2) device behind the dictionary-encoding
        advisor and the r8 data-driven SemDeDup cell sizing (no float
        log2, whose rounding could disagree at exact powers of two)."""
        rows = list(enumerate(vals))
        sdf = spark.createDataFrame(rows, "i LONG, v LONG")
        got_spark = {
            r.i: r.b
            for r in sdf.select(
                "i", F.expr("length(bin(v))").alias("b")
            ).collect()
        }
        got_duck = _duck_rows(
            "SELECT i, length(bin(v)) FROM t ORDER BY i",
            rows,
            "i BIGINT, v BIGINT",
        )
        for i, b in got_duck:
            assert got_spark[i] == b == vals[i].bit_length(), (vals[i], got_spark[i], b)

    @_SETTLE
    @given(st.integers(min_value=0, max_value=6))
    def test_sequence_to_zero_is_descending_not_empty(self, spark, n):
        """The r9-ADVICE / r10 trap class: Spark sequence(1, n) with
        n <= 0 auto-infers step -1 and yields a DESCENDING array
        ([1, 0] for n=0), while DuckDB's generate_series(1, n) is
        EMPTY — so any position-transform over sequence(1, size-k)
        must filter size >= k+1 first (greatest(..., 0) is NOT a
        guard; slice/element_at on position 0 then throw under ANSI).
        Pinned so the device rule survives engine upgrades."""
        row = spark.sql(f"SELECT sequence(1, {n}) AS s").collect()[0]
        expected = list(range(1, n + 1)) if n >= 1 else list(range(1, n - 1, -1))
        assert row.s == expected
        duck = _duck_rows(
            f"SELECT 0, coalesce(len(generate_series(1, {n})), 0)", [(0, 0)], "i BIGINT, v BIGINT"
        )
        assert duck[0][1] == max(n, 0)  # DuckDB: empty for n <= 0


class TestDeviceWideSumStress:
    """r13: the graded SFs keep dsum/davg sums under 2^53, so the
    oracle gate never exercises the devices' WIDE path — the exact
    regime where the r12 driver diverged. These pins feed the devices
    sums past 2^53 on BOTH engines and require bit equality."""

    def test_dsum_past_2_53_bit_identical(self, spark):
        from leadsight_sales_agent_spark.functions.numeric import (
            dsum,
            sql_dsum,
        )

        # 3000 rows x ~9.1e12 -> sum ~2.7e16 > 2^53; cents grain
        vals = [(9.1e12 + i * 1.37,) for i in range(3000)]
        sdf = spark.createDataFrame(vals, "x double")
        got_spark = sdf.agg(dsum(F.col("x"), 2).alias("s")).collect()[0].s
        con = duckdb.connect()
        con.execute("CREATE TABLE t (x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", vals)
        got_duck = con.execute(
            f"SELECT {sql_dsum('x', 2)} AS s FROM t"
        ).fetchone()[0]
        assert got_spark == got_duck, (got_spark.hex(), got_duck.hex())
        assert got_spark > 2**53  # the stress actually reached the regime

    def test_davg_quotient_narrowing_and_overflow_canary(self, spark):
        from leadsight_sales_agent_spark.functions.numeric import (
            davg,
            sql_davg,
        )

        vals = [(7.3e9 + i,) for i in range(50)]  # mean ~7.3e9 < 1e11
        sdf = spark.createDataFrame(vals, "x double")
        got_spark = sdf.agg(davg(F.col("x"), 4).alias("a")).collect()[0].a
        con = duckdb.connect()
        con.execute("CREATE TABLE t (x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", vals)
        got_duck = con.execute(
            f"SELECT {sql_davg('x', 4)} AS a FROM t"
        ).fetchone()[0]
        assert got_spark == got_duck, (got_spark.hex(), got_duck.hex())
        # the DECIMAL(15,0) narrow means a mean >= 10^11 at scale 4
        # must raise loudly (ANSI overflow), not drift
        import pytest

        huge = spark.createDataFrame([(2.0e11,)] * 3, "x double")
        with pytest.raises(Exception):
            huge.agg(davg(F.col("x"), 4).alias("a")).collect()
