

class TestSqlHexToLong:
    def test_matches_python_int_parse_on_both_engines(self, spark):
        import duckdb
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from leadsight_sales_agent_spark.functions.numeric import sql_hex_to_long

        @settings(max_examples=30, deadline=None)
        @given(st.text(alphabet="0123456789abcdef", min_size=1, max_size=15))
        def check(h):
            frag = sql_hex_to_long(f"'{h}'", len(h))
            expect = int(h, 16)
            assert duckdb.sql(f"SELECT {frag} AS v").fetchone()[0] == expect

        check()
        # one Spark-side spot check (full property loop via Spark would
        # start a job per example; the fragment text is engine-shared)
        frag = sql_hex_to_long("'fedcba987654321'", 15)
        assert spark.sql(f"SELECT {frag} AS v").collect()[0]["v"] == int(
            "fedcba987654321", 16
        )


class TestD53SplitConversion:
    """r13: d53/sql_d53/d53s/sql_d53s must equal CPython's correctly-
    rounded int->float on BOTH engines, bit for bit — the property the
    r12 driver divergence proved bare wide-decimal casts lack."""

    def test_d53_bit_identical_to_python_on_both_engines(self, spark):
        import duckdb
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from leadsight_sales_agent_spark.functions.numeric import (
            d53,
            sql_d53,
        )

        con = duckdb.connect()

        @settings(max_examples=40, deadline=None)
        @given(
            st.integers(
                min_value=-(10**30), max_value=10**30
            )  # spans 2^53 and the int128 double-round regime
        )
        def check(w):
            expect = float(w)
            got = con.execute(f"SELECT {sql_d53(str(w))} AS v").fetchone()[0]
            assert got == expect and str(got) == str(expect), (w, got)

        check()
        # Spark spot checks at the boundary + the r12 failure regime
        for w in (2**53 + 1, -(2**53) - 1, 51 * 10**24, 10**29 + 7):
            got = spark.sql(f"SELECT {d53(str(w))} AS v").collect()[0]["v"]
            assert got == float(w), (w, got)

    def test_d53s_scaled_matches_across_engines(self, spark):
        import duckdb

        from leadsight_sales_agent_spark.functions.numeric import (
            d53s,
            sql_d53s,
        )

        con = duckdb.connect()
        cases = [
            ("123456789012345678901.654321", 6),
            ("-98765432109876543210.000001", 6),
            ("0.000001", 6),
            ("1234.123456789012", 12),
        ]
        for lit, sc in cases:
            p = 38 if sc == 6 else 20
            w = f"CAST('{lit}' AS DECIMAL({p},{sc}))"
            s_v = spark.sql(f"SELECT {d53s(w, sc)} AS v").collect()[0]["v"]
            d_v = con.execute(f"SELECT {sql_d53s(w, sc)} AS v").fetchone()[0]
            assert s_v == d_v, (lit, s_v.hex(), d_v.hex())
            # sanity: within 1 ulp of the exact value
            from decimal import Decimal

            assert abs(Decimal(s_v) - Decimal(lit)) <= abs(
                Decimal(lit)
            ) * Decimal("1e-15")
