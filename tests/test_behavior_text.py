"""Invariants for the behavioral-analytics and text-pipeline operators
(cross-engine value parity is the oracle gate's job)."""

from __future__ import annotations

from pyspark.sql import functions as F

from leadsight_sales_agent_spark import registry
from leadsight_sales_agent_spark.operators.text import CHUNK_SIZE, CHUNK_STRIDE
from leadsight_sales_agent_spark.sources.catalog import load

registry.load_all()


class TestFunnel:
    def test_stage_counts_monotone_nonincreasing(self, spark, sf_dir):
        row = registry.QUERIES["funnel_ordered_stages"](spark, sf_dir).collect()[0]
        seq = [row["n_signup"], row["n_then_view"], row["n_then_click"], row["n_then_purchase"]]
        assert seq == sorted(seq, reverse=True)
        assert seq[0] > 0


class TestCohort:
    def test_offsets_nonnegative_and_cohort0_complete(self, spark, sf_dir):
        rows = registry.QUERIES["cohort_retention_weekly"](spark, sf_dir).collect()
        assert all(r["week_offset"] >= 0 for r in rows)
        # every user is active in their own cohort week by definition
        n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
        week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
        assert week0 == n_users


class TestChunking:
    def test_chunks_cover_text_with_overlap(self, spark, sf_dir):
        rows = registry.QUERIES["text_chunk_documents"](spark, sf_dir).collect()
        docs = {
            r["doc_id"]: r["n_chars"]
            for r in load(spark, sf_dir, "documents").collect()
        }
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, chunks in by_doc.items():
            chunks.sort(key=lambda r: r["chunk_id"])
            n = docs[doc_id]
            # contiguous ids, full coverage: last chunk reaches the end
            assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
            last_start = (len(chunks) - 1) * CHUNK_STRIDE
            assert last_start + chunks[-1]["chunk_len"] == n
            for c in chunks:
                start = c["chunk_id"] * CHUNK_STRIDE  # 0-based
                assert c["chunk_len"] == min(CHUNK_SIZE, n - start)


class TestRedaction:
    def test_counts_include_planted_pii(self, spark, sf_dir):
        rows = registry.QUERIES["text_pii_redaction"](spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["n_emails"] >= 1  # the planted contact line
            assert r["n_phones"] >= 1


class TestFunnelDifferential:
    def test_fold_matches_python_simulation_on_random_users(self, spark):
        """Differential: the single-pass Spark fold == a plain-Python
        chained-min simulation over 200 randomized event sequences
        (fixed seed). Catches ordering/tie/state bugs the 5-type real
        table can't reach."""
        import random
        from datetime import datetime, timedelta

        from pyspark.sql import functions as F

        from leadsight_sales_agent_spark.operators.behavior import FUNNEL_STAGES

        rng = random.Random(42)
        t0 = datetime(2024, 1, 1)
        rows = []
        truth = {"signup": 0, "view": 0, "click": 0, "purchase": 0}
        for user in range(200):
            n = rng.randint(0, 12)
            evs = sorted(
                (
                    t0 + timedelta(seconds=rng.randint(0, 10_000)),
                    rng.choice(FUNNEL_STAGES),
                )
                for _ in range(n)
            )
            rows += [(user, ts, et) for ts, et in evs]
            # python chained-min reference
            t = None
            reached = 0
            for stage in FUNNEL_STAGES:
                nxt = min(
                    (ts for ts, et in evs if et == stage and (t is None or ts > t)),
                    default=None,
                )
                if nxt is None:
                    break
                t = nxt
                reached += 1
            for i in range(reached):
                truth[FUNNEL_STAGES[i]] += 1

        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        grouped = df.groupBy("user_id").agg(
            F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
        )
        from leadsight_sales_agent_spark.operators.behavior import funnel_fold

        got = (
            grouped.select(funnel_fold("evs").alias("f"))
            .agg(
                F.count("f.t1").alias("signup"),
                F.count("f.t2").alias("view"),
                F.count("f.t3").alias("click"),
                F.count("f.t4").alias("purchase"),
            )
            .collect()[0]
        )
        assert dict(got.asDict()) == truth


class TestChunkingDifferential:
    def test_chunks_match_python_reference(self, spark):
        import hashlib

        from leadsight_sales_agent_spark.operators.text import (
            CHUNK_SIZE,
            CHUNK_STRIDE,
        )

        texts = [
            "a" * 1,
            "b" * (CHUNK_SIZE - 1),
            "c" * CHUNK_SIZE,
            "d" * (CHUNK_SIZE + 1),
            "x" * (CHUNK_STRIDE * 3 + 7),
            "".join(chr(97 + i % 26) for i in range(997)),
        ]
        df = spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        from pyspark.sql import functions as F

        max_chunk = F.floor((F.length("text") - 1) / CHUNK_STRIDE).cast("int")
        chunk = F.substring(
            F.col("text"), F.lit(1) + F.col("chunk_id") * CHUNK_STRIDE, CHUNK_SIZE
        )
        got = {
            (r["doc_id"], r["chunk_id"]): r["h"]
            for r in df.select(
                "doc_id", "text", F.explode(F.sequence(F.lit(0), max_chunk)).alias("chunk_id")
            )
            .select("doc_id", "chunk_id", F.md5(chunk).alias("h"))
            .collect()
        }
        want = {}
        for i, t in enumerate(texts):
            k = 0
            while True:
                piece = t[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_SIZE]
                if not piece:
                    break
                want[(i, k)] = hashlib.md5(piece.encode()).hexdigest()
                k += 1
        assert got == want


class TestZorderKey:
    """zorder_key16 vs an independent pure-Python Morton reference —
    the oracle SQL shares the spread algebra, so a mirrored bug would
    pass the hash gate; this catches it."""

    @staticmethod
    def _py_morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    def test_matches_bitwise_reference(self, spark):
        from leadsight_sales_agent_spark.operators.layout import zorder_key16

        cases = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535),
                 (65535, 65535), (1500, 2404), (43690, 21845), (70000, 3)]
        df = spark.createDataFrame(cases, "a long, b long")
        got = {
            (r["a"], r["b"]): r["z"]
            for r in df.select(
                "a", "b", zorder_key16(F.col("a"), F.col("b")).alias("z")
            ).collect()
        }
        for a, b in cases:
            assert got[(a, b)] == self._py_morton(a & 65535, b & 65535), (a, b)

    def test_interleave_is_monotone_in_each_dim(self, spark):
        # Fixing one dimension, the key is strictly increasing in the
        # other — the property that makes min/max pruning work.
        from leadsight_sales_agent_spark.operators.layout import zorder_key16

        rows = spark.createDataFrame(
            [(x,) for x in range(64)], "x long"
        ).select(
            zorder_key16(F.col("x"), F.lit(7)).alias("zx"),
            zorder_key16(F.lit(7), F.col("x")).alias("zy"),
            "x",
        ).orderBy("x").collect()
        zx = [r["zx"] for r in rows]
        zy = [r["zy"] for r in rows]
        assert zx == sorted(zx) and len(set(zx)) == 64
        assert zy == sorted(zy) and len(set(zy)) == 64


class TestFunnelTies:
    def test_exact_timestamp_tie_does_not_advance(self, spark):
        """An event with ts EQUAL to the previous stage's timestamp must
        not advance the funnel (the oracle requires strictly greater) —
        the divergence was latent because generated data has no ties."""
        from datetime import datetime

        from pyspark.sql import functions as F

        from leadsight_sales_agent_spark.operators.behavior import funnel_fold

        t0 = datetime(2024, 1, 1, 12, 0, 0)
        t1 = datetime(2024, 1, 1, 12, 0, 1)
        rows = [
            # user 1: view tied to signup -> view must NOT count
            (1, t0, "signup"), (1, t0, "view"),
            # user 2: strictly later view -> counts
            (2, t0, "signup"), (2, t1, "view"),
            # user 3: tie at view->click boundary -> click must NOT count
            (3, t0, "signup"), (3, t1, "view"), (3, t1, "click"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        grouped = df.groupBy("user_id").agg(
            F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
        )
        got = (
            grouped.select(funnel_fold("evs").alias("f"))
            .agg(
                F.count("f.t1").alias("signup"),
                F.count("f.t2").alias("view"),
                F.count("f.t3").alias("click"),
                F.count("f.t4").alias("purchase"),
            )
            .collect()[0]
        )
        assert dict(got.asDict()) == {
            "signup": 3,
            "view": 2,  # users 2 and 3 only
            "click": 0,  # user 3's click is tied to their view
            "purchase": 0,
        }
