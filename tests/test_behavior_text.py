"""Invariants for the behavioral-analytics and text-pipeline operators
(cross-engine value parity is the oracle gate's job)."""

from __future__ import annotations

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
