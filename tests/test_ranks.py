"""Property pins for the prefix-sharded ordering devices
(functions/ranks.py) and their r9 consumers. The oracle gate proves
each consumer end-to-end at the test SFs, but sf0.001 often has too
few rows to exercise SHARD BOUNDARIES (one 65536-key block, one
month); these tests force multi-shard inputs and pin the devices
against the single global window they replace.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.functions.ranks import (
    ntile_from_rank,
    sharded_prefix,
)


def _synth(spark, n=997):
    # deliberately skewed shards, colliding order keys, a 1-row shard
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.expr("CAST(id % 37 AS STRING)").alias("k2"),
            F.expr(
                "CASE WHEN id = 0 THEN 'zz' ELSE substring(md5(CAST(id AS STRING)), 1, 1) END"
            ).alias("sh"),
            (F.col("id") % 11).cast("bigint").alias("val"),
        )
    )


class TestShardedPrefix:
    def test_rank_and_sums_match_global_window(self, spark):
        df = _synth(spark)
        got = sharded_prefix(
            df, "sh", ["k2", "id"], rank_out="rnk", sums={"cum": "val"},
            total_out="n",
        )
        w = Window.orderBy("sh", "k2", "id")
        want = df.select(
            "id",
            F.row_number().over(w).alias("rnk"),
            F.sum("val")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        )
        joined = got.select("id", "rnk", "cum", "n").join(
            want.withColumnRenamed("rnk", "wrnk").withColumnRenamed(
                "cum", "wcum"
            ),
            "id",
        )
        bad = joined.filter(
            (F.col("rnk") != F.col("wrnk")) | (F.col("cum") != F.col("wcum"))
        ).count()
        assert bad == 0
        assert joined.filter(F.col("n") != df.count()).count() == 0

    def test_null_shard_rows_survive_and_sort_first(self, spark):
        # A NULL shard key must neither drop (the old inner equi-join
        # silently discarded it) nor land anywhere but FIRST — the
        # global window's ASC NULLS FIRST placement.
        df = _synth(spark, n=200).withColumn(
            "sh", F.when(F.col("id") % 19 == 0, None).otherwise(F.col("sh"))
        )
        got = sharded_prefix(
            df, "sh", ["k2", "id"], rank_out="rnk", sums={"cum": "val"},
            total_out="n",
        )
        assert got.count() == 200  # nothing dropped
        w = Window.orderBy("sh", "k2", "id")
        want = df.select(
            "id",
            F.row_number().over(w).alias("wrnk"),
            F.sum("val")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("wcum"),
        )
        joined = got.select("id", "rnk", "cum").join(want, "id")
        bad = joined.filter(
            (F.col("rnk") != F.col("wrnk")) | (F.col("cum") != F.col("wcum"))
        ).count()
        assert bad == 0

    def test_ntile_from_rank_matches_sql_ntile(self, spark):
        # n % b != 0 (ragged buckets) and n < b (empty-bucket edge)
        for n, b in [(997, 10), (25, 10), (7, 10), (40, 8)]:
            df = spark.range(1, n + 1).select(
                F.col("id").alias("rnk"), F.lit(n).alias("n")
            )
            got = df.select(
                "rnk", ntile_from_rank("rnk", "n", b).alias("bucket")
            )
            want = df.select(
                "rnk", F.ntile(b).over(Window.orderBy("rnk")).alias("bucket")
            )
            diff = (
                got.withColumnRenamed("bucket", "g")
                .join(want, "rnk")
                .filter(F.col("g") != F.col("bucket"))
                .count()
            )
            assert diff == 0, (n, b)


class TestR9BoundaryCarry:
    def test_rle_block_boundary_merge(self, spark):
        """Run counting with 65536-key blocks must merge runs that
        straddle a block boundary — synthetic constant column spanning
        many blocks collapses to ONE run."""
        from leadsight_sales_agent_spark.operators.layout import RLE_SHARD_KEYS

        n = 10 * RLE_SHARD_KEYS // 16  # keep it small but multi-block
        step = 16
        df = spark.range(n).select(
            (F.col("id") * step).alias("o_orderkey"),
            F.lit("C").alias("v"),
            F.expr(f"(id * {step}) DIV {RLE_SHARD_KEYS}").alias("blk"),
        )
        assert df.select("blk").distinct().count() >= 3
        wb = Window.partitionBy("blk").orderBy("o_orderkey")
        within = df.withColumn("pv", F.lag("v").over(wb)).agg(
            F.sum(
                F.when(
                    F.col("pv").isNull() | (F.col("v") != F.col("pv")), 1
                ).otherwise(0)
            ).alias("w")
        )
        grid = df.groupBy("blk").agg(
            F.min_by("v", "o_orderkey").alias("first_v"),
            F.max_by("v", "o_orderkey").alias("last_v"),
        )
        wg = Window.orderBy("blk")
        merges = grid.select(
            "first_v", F.lag("last_v").over(wg).alias("prev_last")
        ).agg(
            F.count_if(
                F.col("prev_last").isNotNull()
                & (F.col("prev_last") == F.col("first_v"))
            ).alias("m")
        )
        w_runs = within.collect()[0]["w"]
        m = merges.collect()[0]["m"]
        assert w_runs - m == 1  # one global run

    def test_snm_cross_shard_pairs_survive(self, spark, sf_dir):
        """dedup_sorted_neighborhood must still emit every rank-window
        pair after sharding — re-derive the pair set from one global
        window and compare exactly."""
        from leadsight_sales_agent_spark.registry import QUERIES, load_all

        load_all()
        from leadsight_sales_agent_spark.sources.catalog import load

        got = {
            (r["doc_a"], r["doc_b"], r["key_dist"])
            for r in QUERIES["dedup_sorted_neighborhood"](spark, sf_dir).collect()
        }
        keyed = load(spark, sf_dir, "documents").select(
            "doc_id",
            F.substring(
                F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
                1,
                40,
            ).alias("skey"),
        )
        w = Window.orderBy("skey", "doc_id")
        want = set()
        for k in (1, 2, 3):
            rows = (
                keyed.select(
                    "doc_id",
                    "skey",
                    F.lead("doc_id", k).over(w).alias("nid"),
                    F.lead("skey", k).over(w).alias("nkey"),
                )
                .filter(F.col("nid").isNotNull())
                .select(
                    "doc_id",
                    "nid",
                    F.levenshtein("skey", "nkey").cast("bigint").alias("d"),
                )
                .filter(F.col("d") <= 5)
                .collect()
            )
            want |= {(r["doc_id"], r["nid"], r["d"]) for r in rows}
        assert got == want


class TestNtileClosedForm:
    """Hypothesis pin of the ntile_from_rank FORMULA against a direct
    implementation of the SQL ntile contract (first n % b buckets get
    n DIV b + 1 rows), independent of any engine."""

    @staticmethod
    def _formula(rk: int, n: int, b: int) -> int:
        q, r = divmod(n, b)
        if rk <= (q + 1) * r:
            return (rk - 1) // (q + 1) + 1
        return r + 1 + (rk - (q + 1) * r - 1) // q

    @staticmethod
    def _spec(rk: int, n: int, b: int) -> int:
        q, r = divmod(n, b)
        acc = 0
        for i in range(1, b + 1):
            acc += q + 1 if i <= r else q
            if rk <= acc:
                return i
        return b

    def test_formula_matches_spec(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(
            st.integers(1, 200_000).flatmap(
                lambda n: st.tuples(
                    st.just(n), st.integers(1, n), st.integers(1, 64)
                )
            )
        )
        def check(t):
            n, rk, b = t
            assert self._formula(rk, n, b) == self._spec(rk, n, b)

        check()


class TestExactSubstringCoverage:
    def test_planted_shared_run_coverage(self, spark, tmp_path):
        """Two docs share exactly a 10-token run (K=8 -> 3 duplicated
        gram positions whose interval union is 10 tokens); a third doc
        is unique. End-to-end through the registered query on a
        synthetic documents.parquet."""
        from leadsight_sales_agent_spark.registry import QUERIES, load_all

        load_all()
        shared = " ".join(f"s{i}" for i in range(10))
        rows = [
            (1, shared + " u1 u2 u3 u4 u5", "en", "srcA", 0),
            (2, shared + " v1 v2 v3 v4 v5", "en", "srcB", 0),
            (3, " ".join(f"w{i}" for i in range(15)), "en", "srcC", 0),
        ]
        df = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = {
            r["source"]: r
            for r in QUERIES["dedup_exact_substring_coverage"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["srcA"]["total_tokens"] == 15
        assert out["srcA"]["dup_tokens"] == 10  # overlapping grams merged
        assert out["srcB"]["dup_tokens"] == 10
        assert out["srcC"]["dup_tokens"] == 0
        assert out["srcA"]["dup_token_bp"] == 6667  # half-up 10/15


class TestDsirSelection:
    def test_exactly_top_fifth_selected(self, spark, sf_dir):
        """The Gumbel-top-k threshold device must select EXACTLY
        n DIV 5 documents across sources (full tie-break by doc_id)."""
        from leadsight_sales_agent_spark.operators.sampling import DSIR_SEL_DIV
        from leadsight_sales_agent_spark.registry import QUERIES, load_all
        from leadsight_sales_agent_spark.sources.catalog import load

        load_all()
        n = load(spark, sf_dir, "documents").count()
        rows = QUERIES["sample_dsir_importance"](spark, sf_dir).collect()
        assert sum(r["n_selected"] for r in rows) == n // DSIR_SEL_DIV
        assert sum(r["n_docs"] for r in rows) == n

    def test_one_token_and_empty_docs_survive(self, spark, tmp_path):
        """1-token / empty docs: Spark sequence(1, 0) is the DESCENDING
        [1, 0] (not empty), so the unguarded bigram transform crashed
        under ANSI (INVALID_ARRAY_INDEX on toks[1]) and silently
        inflated totals otherwise. The r10 guard keeps these docs in
        the corpus (unigram leg only) and still selects exactly
        n DIV 5."""
        from leadsight_sales_agent_spark.operators.sampling import DSIR_SEL_DIV
        from leadsight_sales_agent_spark.registry import QUERIES, load_all

        load_all()
        rows = [(1, "solo", "en", "srcA", 0), (2, "", "en", "srcA", 0)] + [
            (i, f"tok{i} tok{i + 1} common words here", "en" if i % 2 else "de",
             "srcB", 0)
            for i in range(3, 13)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = QUERIES["sample_dsir_importance"](spark, str(tmp_path)).collect()
        assert sum(r["n_docs"] for r in out) == 12  # nothing dropped/crashed
        assert sum(r["n_selected"] for r in out) == 12 // DSIR_SEL_DIV


class TestDoremiTilt:
    def test_mixture_sums_to_one_and_tilts_toward_excess(self, spark, sf_dir):
        from leadsight_sales_agent_spark.registry import QUERIES, load_all

        load_all()
        rows = QUERIES["mixture_doremi_tilt"](spark, sf_dir).collect()
        k = len(rows)
        assert abs(sum(r["alpha_bp"] for r in rows) - 10000) <= k  # half-up rounding
        assert abs(sum(r["tilt_w_bp"] for r in rows) - 10000) <= k
        # monotone: higher excess loss never gets a smaller tilt weight
        srt = sorted(rows, key=lambda r: r["excess_micro"])
        for a, b in zip(srt, srt[1:]):
            assert a["tilt_w_bp"] <= b["tilt_w_bp"] + 1  # rounding slack
