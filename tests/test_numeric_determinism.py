

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
