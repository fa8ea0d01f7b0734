"""Sampling-operator invariants: determinism, stratum rates, split
totality, quota enforcement. Cross-engine value parity is covered by
the oracle gate (tools/check_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from leadsight_sales_agent_spark import registry
from leadsight_sales_agent_spark.operators import sampling
from leadsight_sales_agent_spark.sources.catalog import load

registry.load_all()


class TestHashSampling:
    def test_bernoulli_deterministic_across_runs(self, spark, sf_dir):
        q = registry.QUERIES["sample_bernoulli_hash"]
        a = {r["doc_id"] for r in q(spark, sf_dir).collect()}
        b = {r["doc_id"] for r in q(spark, sf_dir).collect()}
        assert a == b
        assert len(a) > 0

    def test_bernoulli_rate_near_20pct(self, spark, sf_dir):
        total = load(spark, sf_dir, "documents").count()
        kept = registry.QUERIES["sample_bernoulli_hash"](spark, sf_dir).count()
        assert 0.05 <= kept / total <= 0.40  # 20% ± sampling noise at sf0.001

    def test_bernoulli_independent_of_partitioning(self, spark, sf_dir):
        # the sample is a pure function of the key: repartitioning the
        # input must not change membership (the property RNG-based
        # sample() does NOT have).
        docs = load(spark, sf_dir, "documents")
        base = docs.filter(
            sampling.hash_key("bern:", F.col("doc_id"))
            < F.lit(sampling.THRESH_20PCT)
        )
        shuffled = docs.repartition(13).filter(
            sampling.hash_key("bern:", F.col("doc_id"))
            < F.lit(sampling.THRESH_20PCT)
        )
        assert {r["doc_id"] for r in base.collect()} == {
            r["doc_id"] for r in shuffled.collect()
        }

    def test_split_is_total_and_disjoint(self, spark, sf_dir):
        total = load(spark, sf_dir, "documents").count()
        rows = registry.QUERIES["sample_train_valid_test_split"](
            spark, sf_dir
        ).collect()
        assert sum(r["n_docs"] for r in rows) == total
        assert {r["split"] for r in rows} <= {"train", "valid", "test"}

    def test_mixture_quota_enforced(self, spark, sf_dir):
        rows = registry.QUERIES["sample_mixture_weighted_sources"](
            spark, sf_dir
        ).collect()
        per_source: dict[str, int] = {}
        for r in rows:
            per_source[r["source"]] = per_source.get(r["source"], 0) + 1
        for src, n in per_source.items():
            cap = (
                sampling.MIXTURE_QUOTA_HIGH
                if src in sampling.MIXTURE_UPWEIGHTED
                else sampling.MIXTURE_QUOTA_LOW
            )
            assert n <= cap, (src, n)

    def test_salts_decorrelate_operators(self, spark, sf_dir):
        # same key, different salt → different uniform draw: the
        # Bernoulli subset must not coincide with the train split
        # head (would indicate salt being ignored).
        docs = load(spark, sf_dir, "documents").limit(200)
        pairs = docs.select(
            sampling.hash_key("bern:", F.col("doc_id")).alias("a"),
            sampling.hash_key("split:", F.col("doc_id")).alias("b"),
        ).collect()
        assert any(p["a"] != p["b"] for p in pairs)

    def test_minhash_leakage_sound_and_high_recall_vs_exact_anchor(
        self, spark, sf_dir
    ):
        # Soundness is exact: the banded path's verify stage re-checks
        # exact Jaccard, so a flagged doc within the anchor's bound is
        # always truly contaminated, and its reported max_jaccard can
        # only UNDER-state the anchor's (bucket caps may drop the best
        # witness but never invent one). Doc-grain recall is
        # probabilistic by design (16 bands x 2 rows + capped buckets)
        # — pin >=98%. Deterministic xxhash64 signatures make the pins
        # stable, not flaky. NB: the banded run sees the WHOLE corpus,
        # so a flagged doc < bound may owe its flag (and max) to a
        # train doc >= bound the anchor cannot see — the subset pin
        # therefore only checks membership of docs the anchor flags.
        exact = {
            (r["eval_split"], r["doc_eval"]): r["max_jaccard"]
            for r in registry.QUERIES["leakage_jaccard_cross_split"](
                spark, sf_dir
            ).collect()
        }
        bound = sampling.LEAKAGE_ANCHOR_BOUND
        banded_all = {
            (r["eval_split"], r["doc_eval"]): r["max_jaccard"]
            for r in registry.QUERIES["leakage_minhash_cross_split"](
                spark, sf_dir
            ).collect()
        }
        banded = {k: v for k, v in banded_all.items() if k[1] < bound}
        assert exact, "anchor found no cross-split leakage — corpus changed?"
        # recall over the anchor's flagged set (split label must agree
        # because the key includes it):
        hit = {k for k in exact if k in banded}
        recall = len(hit) / len(exact)
        assert recall >= 0.98, f"recall {recall:.4f}, missed {len(exact) - len(hit)}"
        # every reported similarity is a real verified Jaccard
        for v in banded_all.values():
            assert sampling.LEAKAGE_JACCARD_MIN <= v <= 1.0

    def test_pack_sequences_invariants(self, spark, sf_dir):
        # Chop arithmetic: within a shard, sequence ids are contiguous
        # from 0, and the per-shard token sum equals the corpus token
        # count of that shard (no token lost or double-counted).
        from pyspark.sql import functions as F

        rows = registry.QUERIES["pack_sequences_token_budget"](
            spark, sf_dir
        ).collect()
        by_shard: dict[str, list] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        docs = load(spark, sf_dir, "documents")
        h = sampling.hash_key("pack:", F.col("doc_id"))
        shard_tokens = {
            r["shard"]: r["tot"]
            for r in docs.groupBy(F.substring(h, 1, 1).alias("shard"))
            .agg(
                F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("tot")
            )
            .collect()
        }
        assert set(by_shard) == set(shard_tokens)
        for shard, rs in by_shard.items():
            seqs = sorted(r["seq_id"] for r in rs)
            assert seqs == list(range(len(seqs))), shard  # contiguous from 0
            assert sum(r["n_tokens"] for r in rs) == shard_tokens[shard]
            # every full sequence boundary is crossed by at most one doc
            for r in rs:
                assert r["n_split_docs"] <= 1, r

    def test_token_budget_allocation_conserves_budget(self, spark, sf_dir):
        # Largest-remainder apportionment: per-source budgets sum to
        # EXACTLY the global budget; every source fills within budget.
        rows = registry.QUERIES["mixture_token_budget_allocation"](
            spark, sf_dir
        ).collect()
        assert sum(r["token_budget"] for r in rows) == sampling.TOKEN_BUDGET_TOTAL
        for r in rows:
            assert r["tokens_used"] <= r["token_budget"], dict(r.asDict())
            assert (r["n_docs"] == 0) == (r["tokens_used"] == 0)
