"""Streaming twins: the stateful sessionizer must be batch-equivalent
(Structured Streaming's core guarantee), and the windowed-counts demo
must equal its batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from leadsight_sales_agent_spark import registry
from leadsight_sales_agent_spark.sources.catalog import load

registry.load_all()


def batch_sessions(spark, sf_dir):
    """Ground truth: gap>30min island count per user via lag().

    Exact MICROSECOND gap compare, matching the stateful operator —
    a second-truncated compare can flip boundary gaps in (1800s, 1801s)
    and make this ground truth silently data-dependent."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn("new_session", (gap_us > 30 * 60 * 1_000_000).cast("int"))
    return flagged.agg(
        (F.coalesce(F.sum("new_session"), F.lit(0)) + F.count_distinct("user_id")).alias("n")
    ).first()["n"]


class TestStatefulSessionize:
    def test_matches_batch_ground_truth(self, spark, sf_dir):
        got = registry.QUERIES["streaming_sessionize_stateful"](spark, sf_dir)
        assert got.count() == batch_sessions(spark, sf_dir)

    def test_session_invariants(self, spark, sf_dir):
        rows = registry.QUERIES["streaming_sessionize_stateful"](spark, sf_dir).collect()
        for r in rows:
            assert r["session_start"] <= r["session_end"]
            assert r["n_events"] >= 1


class TestJobManagerIntegration:
    def test_streaming_query_under_job_gate(self, spark, sf_dir):
        """ST1-ST5 together: the windowed-counts streaming demo running
        as the supervised job — single-flight gate, state transitions,
        progress events drained by offset."""
        from leadsight_sales_agent_spark.streaming.jobs import (
            DONE,
            RUNNING,
            ConcurrentJobError,
            JobManager,
        )
        import pytest as _pytest

        jm = JobManager()

        def job(m: JobManager):
            m.push_event("step", "stream-start")
            df = registry.QUERIES["streaming_windowed_counts"](spark, sf_dir)
            n = df.count()
            m.push_event("step", {"rows": n})
            return n

        jm.start(job)
        if jm.state == RUNNING:  # gate rejects a concurrent submission
            with _pytest.raises(ConcurrentJobError):
                jm.start(lambda m: None)
        jm.join(120)
        assert jm.state == DONE
        assert jm.result > 0
        events, off = jm.events_since(0)
        assert [e["type"] for e in events] == ["start", "step", "step", "done"]
        assert jm.events_since(off)[0] == []  # drained


class TestWindowedCounts:
    def test_stream_equals_batch(self, spark, sf_dir):
        from leadsight_sales_agent_spark.streaming.demo import windowed_event_counts

        got = sorted(
            map(str, registry.QUERIES["streaming_windowed_counts"](spark, sf_dir).collect())
        )
        ev = load(spark, sf_dir, "events")
        want = sorted(
            map(
                str,
                ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(
                    F.count("*").alias("n_events"),
                    F.round(F.sum("value"), 2).alias("total_value"),
                )
                .select(
                    F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                        "window_start"
                    ),
                    "event_type",
                    "n_events",
                    "total_value",
                )
                .collect(),
            )
        )
        assert got == want
