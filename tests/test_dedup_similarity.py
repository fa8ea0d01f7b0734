"""Property tests for dedup signatures and vector similarity
(operators/dedup.py, operators/similarity.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from leadsight_sales_agent_spark.operators.dedup import (
    N_MINHASH,
    minhash_signature,
    simhash_expr,
)
from leadsight_sales_agent_spark.operators.similarity import dot, l2_norm


def toks_df(spark, *docs: str):
    return spark.createDataFrame(
        [(i, d.split()) for i, d in enumerate(docs)], "doc_id: int, toks: array<string>"
    )


class TestMinHash:
    def sigs(self, spark, *docs):
        df = toks_df(spark, *docs).select(
            "doc_id", minhash_signature(F.col("toks")).alias("sig")
        )
        return {r["doc_id"]: r["sig"] for r in df.collect()}

    def test_identical_docs_identical_signature(self, spark):
        s = self.sigs(spark, "the quick brown fox", "the quick brown fox")
        assert s[0] == s[1]
        assert len(s[0]) == N_MINHASH

    def test_token_order_irrelevant(self, spark):
        s = self.sigs(spark, "alpha beta gamma delta", "delta gamma beta alpha")
        assert s[0] == s[1]  # MinHash is a set signature

    def test_similar_docs_share_most_hashes(self, spark):
        base = " ".join(f"tok{i}" for i in range(50))
        near = base + " extra"  # Jaccard 50/51 ≈ 0.98
        far = " ".join(f"other{i}" for i in range(50))
        s = self.sigs(spark, base, near, far)
        agree_near = sum(a == b for a, b in zip(s[0], s[1])) / N_MINHASH
        agree_far = sum(a == b for a, b in zip(s[0], s[2])) / N_MINHASH
        assert agree_near > 0.8
        assert agree_far < 0.3

    def test_deterministic_across_runs(self, spark):
        assert self.sigs(spark, "a b c") == self.sigs(spark, "a b c")

    def test_minhash_fold_signature_identical(self, spark, sf_dir):
        """r14: minhash_signature_hashed was rewritten from 32 separate
        array_min(transform(...)) expressions to one aggregate() fold
        with a 32-slot running-minimum state (guide §1.2 — removes the
        32 per-row n-token array materializations). This pins the fold
        bit-identical to the ORIGINAL construction on the real corpus
        plus the empty/NULL token edge (where the fold must reproduce
        array_min-over-empty's 32-NULL signature)."""
        from leadsight_sales_agent_spark.operators.dedup import (
            N_MINHASH as N,
            minhash_signature_hashed,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        def original(token_hashes):
            def perm_min(seed):
                return F.array_min(
                    F.transform(token_hashes, lambda h: F.xxhash64(h, F.lit(seed)))
                )

            return F.array(*[perm_min(i) for i in range(N)])

        base = load(spark, sf_dir, "documents").select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"), lambda t: F.xxhash64(t)
                )
            ).alias("toks"),
        )
        edge = spark.createDataFrame(
            [(1, []), (2, None), (3, [7])], "doc_id: int, toks: array<bigint>"
        )
        for df in (base, edge):
            mism = (
                df.select(
                    original(F.col("toks")).alias("old"),
                    minhash_signature_hashed(F.col("toks")).alias("new"),
                )
                .filter(F.expr("old IS DISTINCT FROM new"))
                .count()
            )
            assert mism == 0


class TestSimHash:
    def sig(self, spark, doc):
        df = toks_df(spark, doc).select(simhash_expr(F.col("toks")).alias("s"))
        return df.first()["s"]

    def test_identical_docs_hamming_zero(self, spark):
        assert self.sig(spark, "x y z w") == self.sig(spark, "x y z w")

    def test_signature_is_64_bit_string(self, spark):
        s = self.sig(spark, "a b c")
        assert len(s) == 64
        assert set(s) <= {"0", "1"}

    def test_near_docs_low_hamming_far_docs_high(self, spark):
        base = " ".join(f"tok{i}" for i in range(60))
        near = " ".join(f"tok{i}" for i in range(59)) + " changed"
        far = " ".join(f"zzz{i}" for i in range(60))
        h = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
        sb, sn, sf_ = self.sig(spark, base), self.sig(spark, near), self.sig(spark, far)
        assert h(sb, sn) < h(sb, sf_)
        assert h(sb, sn) <= 8

    def test_spark_side_hamming_matches_python(self, spark):
        from leadsight_sales_agent_spark.operators.dedup import simhash_hamming

        df = toks_df(spark, "a b c d", "a b c changed").select(
            simhash_expr(F.col("toks")).alias("s")
        )
        a, b = [r["s"] for r in df.collect()]
        got = (
            spark.createDataFrame([(a, b)], "a STRING, b STRING")
            .select(simhash_hamming(F.col("a"), F.col("b")).alias("h"))
            .first()["h"]
        )
        assert got == sum(x != y for x, y in zip(a, b))


class TestVectorMath:
    def pair(self, spark, a, b):
        df = spark.createDataFrame([(a, b)], "a: array<double>, b: array<double>")
        return df.select(
            dot(F.col("a"), F.col("b")).alias("d"),
            l2_norm(F.col("a")).alias("na"),
            l2_norm(F.col("b")).alias("nb"),
        ).first()

    def test_orthogonal(self, spark):
        r = self.pair(spark, [1.0, 0.0], [0.0, 1.0])
        assert r["d"] == 0.0 and r["na"] == 1.0 and r["nb"] == 1.0

    def test_cosine_of_identical_is_one(self, spark):
        r = self.pair(spark, [3.0, 4.0], [3.0, 4.0])
        assert math.isclose(r["d"] / (r["na"] * r["nb"]), 1.0)
        assert math.isclose(r["na"], 5.0)

    def test_known_dot(self, spark):
        r = self.pair(spark, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
        assert r["d"] == 32.0


class TestIVFPruned:
    def test_pruned_variant_matches_in_memory_ivf(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry

        registry.load_all()
        a = sorted(
            map(tuple, registry.QUERIES["knn_cosine_ivf"](spark, sf_dir).collect())
        )
        b = sorted(
            map(tuple, registry.QUERIES["knn_cosine_ivf_pruned"](spark, sf_dir).collect())
        )
        assert a == b  # same cells, same probes, same re-rank


class TestHLLSketch:
    def test_merged_estimate_within_error_envelope(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry
        from leadsight_sales_agent_spark.sources.catalog import load
        from pyspark.sql import functions as F

        registry.load_all()
        row = registry.QUERIES["sketch_hll_mergeable"](spark, sf_dir).first()
        exact = (
            load(spark, sf_dir, "events")
            .agg(F.count_distinct("user_id").alias("n"))
            .first()["n"]
        )
        est = row["est_total_users"]
        # default lgConfigK=12 HLL: well under 5% at these cardinalities
        assert abs(est - exact) / exact < 0.05, (est, exact)
        # merged estimate must deduplicate across days: no larger than
        # the summed dailies, no smaller than any single day could allow
        assert est <= row["sum_daily_exact"]


class TestConnectedComponents:
    """Synthetic-graph checks of the min-label propagation loop
    (the graded query runs it over the Jaccard anchor graph)."""

    @staticmethod
    def _cc(spark, pair_list):
        # run the same loop as dedup_connected_components on an
        # explicit edge list
        from pyspark.sql import functions as F

        pairs = spark.createDataFrame(pair_list, ["doc_a", "doc_b"])
        edges = (
            pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
            .toDF("src", "dst")
            .localCheckpoint()
        )
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("comp", F.col("id"))
        )
        for _ in range(50):
            nmin = (
                edges.join(labels, edges.src == labels.id)
                .groupBy(F.col("dst").alias("nid"))
                .agg(F.min("comp").alias("nmin"))
            )
            proposed = (
                labels.join(nmin, labels.id == nmin.nid, "left")
                .select(
                    "id",
                    F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias(
                        "comp"
                    ),
                    F.col("comp").alias("old_comp"),
                )
                .localCheckpoint()
            )
            changed = proposed.filter(F.col("comp") != F.col("old_comp")).count()
            labels = proposed.select("id", "comp")
            if changed == 0:
                break
        return {r["id"]: r["comp"] for r in labels.collect()}

    def test_path_graph_converges_to_min(self, spark):
        # worst case for min propagation: a 10-node path; every node
        # must still end labeled by the global min
        comp = self._cc(spark, [(i, i + 1) for i in range(10)])
        assert set(comp.values()) == {0}

    def test_two_components_stay_separate(self, spark):
        comp = self._cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == comp[12] == 10

    def test_graded_query_labels_match_pair_closure(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry

        registry.load_all()
        pairs = registry.QUERIES["neardup_jaccard_pairs"](spark, sf_dir).collect()
        got = {
            r["doc_id"]: r["component"]
            for r in registry.QUERIES["dedup_connected_components"](
                spark, sf_dir
            ).collect()
        }
        # union-find ground truth in plain Python
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for n in parent}
        assert got == want


class TestCountMinSketch:
    def test_estimate_upper_bounds_truth(self, spark, sf_dir):
        # One-sided error is THE count-min invariant: est >= true for
        # every key (collisions only inflate).
        from leadsight_sales_agent_spark import registry

        registry.load_all()
        rows = registry.QUERIES["sketch_countmin_heavy_hitters"](
            spark, sf_dir
        ).collect()
        assert rows, "heavy-hitter output empty"
        for r in rows:
            assert r["est_n"] >= r["true_n"], (r["o_custkey"], r["est_n"], r["true_n"])

    def test_approx_percentiles_envelope(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry
        from leadsight_sales_agent_spark.sources.catalog import load
        from pyspark.sql import functions as F

        registry.load_all()
        approx = {
            r["returnflag"]: r
            for r in registry.QUERIES["agg_approx_percentiles"](spark, sf_dir).collect()
        }
        exact = {
            r["returnflag"]: r
            for r in load(spark, sf_dir, "lineitem")
            .groupBy(F.col("l_returnflag").alias("returnflag"))
            .agg(
                F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
                F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
                F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
            )
            .collect()
        }
        for flag, a in approx.items():
            e = exact[flag]
            for ap, ep in (("p25_approx", "p25"), ("p50_approx", "p50"), ("p75_approx", "p75")):
                # accuracy=10000 → rank error ~1e-4; translate to a loose
                # 2% value tolerance on this smooth distribution
                assert abs(a[ap] - e[ep]) / e[ep] < 0.02, (flag, ap, a[ap], e[ep])


class TestKMeansAndQuantization:
    def test_kmeans_inertia_monotone_and_total_assignment(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.similarity import kmeans_fit, KM_K
        from leadsight_sales_agent_spark.sources.catalog import load

        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        centroids, inertias, assigned = kmeans_fit(spark, emb)
        assert len(centroids) == KM_K and all(len(c) == 64 for c in centroids)
        # Lloyd's algorithm never increases inertia (allow float fuzz)
        for a, b in zip(inertias, inertias[1:]):
            assert b <= a * (1 + 1e-9), inertias
        assert assigned.count() == n  # every vector assigned exactly once
        assert assigned.select("cluster").distinct().count() <= KM_K

    def test_quantization_error_bounded_by_half_step(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry

        registry.load_all()
        row = registry.QUERIES["embedding_quantize_int8"](spark, sf_dir).first()
        # affine int8 quantization: |err| <= step/2 everywhere
        assert row["max_abs_err"] <= row["max_step"] / 2 * (1 + 1e-9), dict(row.asDict())
        assert row["mse"] < (row["max_step"] / 2) ** 2
    def test_pq_profile_invariants(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry
        from leadsight_sales_agent_spark.operators.similarity import PQ_K, PQ_M
        from leadsight_sales_agent_spark.sources.catalog import load

        registry.load_all()
        n = load(spark, sf_dir, "embeddings").count()
        rows = {
            r["subspace"]: r
            for r in registry.QUERIES["embedding_pq_quantize"](spark, sf_dir).collect()
        }
        assert sorted(rows) == list(range(PQ_M))
        for r in rows.values():
            assert r["n_vectors"] == n  # every vector coded in every subspace
            assert 1 <= r["codes_used"] <= PQ_K
            assert r["wcss"] >= 0.0
        # PQ reconstruction must beat the trivial 1-codeword-per-subspace
        # quantizer (= total variance around the subspace mean): compute
        # that baseline per subspace and assert wcss <= it.
        import math

        from pyspark.sql import functions as F

        emb = load(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()["embedding"])
        sd = dim // PQ_M
        sub = emb.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("subspace"),
                            F.slice("embedding", m * sd + 1, sd).alias("subvec"),
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("s")
        ).select("s.subspace", F.posexplode("s.subvec").alias("dim", "x"))
        baseline = {
            r["subspace"]: r["tot_var"]
            for r in sub.groupBy("subspace", "dim")
            .agg((F.var_pop(F.col("x").cast("double")) * F.count("*")).alias("v"))
            .groupBy("subspace")
            .agg(F.sum("v").alias("tot_var"))
            .collect()
        }
        total_wcss = sum(r["wcss"] for r in rows.values())
        assert math.isfinite(total_wcss)
        for m, r in rows.items():
            assert r["wcss"] <= baseline[m] * (1 + 1e-9), (m, r["wcss"], baseline[m])



class TestFuzzyDedupTwoStage:
    def test_prefix_gate_is_lossless_at_test_scale(self, spark, sf_dir):
        # The banded two-stage verify (prefix gate + capped distance)
        # must equal the unbanded single-stage reference on the same
        # blocking — i.e. the prefix gate is an optimization, not a
        # semantic change, for this corpus.
        from pyspark.sql import functions as F

        from leadsight_sales_agent_spark import registry
        from leadsight_sales_agent_spark.sources.catalog import load

        registry.load_all()
        got = {
            (r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in registry.QUERIES["dedup_fuzzy_levenshtein"](spark, sf_dir).collect()
        }
        d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
        a = d.select(
            F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"),
            F.col("lang").alias("la"), F.col("n_chars").alias("na"),
            F.floor(F.col("n_chars") / 25).alias("ba"),
        )
        b = d.select(
            F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"),
            F.col("lang").alias("lb"), F.col("n_chars").alias("nb"),
            F.floor(F.col("n_chars") / 25).alias("bb"),
        )
        ref = {
            (r["doc_a"], r["doc_b"], r["ed"])
            for r in a.join(
                b,
                (F.col("la") == F.col("lb")) & (F.col("ba") == F.col("bb"))
                & (F.col("doc_a") < F.col("doc_b"))
                & (F.abs(F.col("na") - F.col("nb")) <= 15),
            )
            .withColumn("ed", F.levenshtein("ta", "tb"))  # unbanded
            .filter(
                F.col("ed") <= F.least(F.lit(20), F.floor(F.greatest("na", "nb") / 5))
            )
            .select("doc_a", "doc_b", "ed")
            .collect()
        }
        assert got == ref and got, (len(got), len(ref))


class TestANNRecallReport:
    def test_recall_bounds_and_determinism(self, spark, sf_dir):
        from leadsight_sales_agent_spark import registry

        registry.load_all()
        rows = {
            r["method"]: r
            for r in registry.QUERIES["ann_recall_report"](spark, sf_dir).collect()
        }
        assert set(rows) == {"lsh", "ivf"}
        for m, r in rows.items():
            assert r["n_expected"] > 0
            assert 0 <= r["n_hits"] <= r["n_expected"], (m, dict(r.asDict()))
            assert 0 <= r["recall_bp"] <= 10000
        # deterministic hashing => a second run reports identical recall
        again = {
            r["method"]: r["recall_bp"]
            for r in registry.QUERIES["ann_recall_report"](spark, sf_dir).collect()
        }
        assert again == {m: r["recall_bp"] for m, r in rows.items()}
