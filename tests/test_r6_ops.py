"""Round-6 operators: Holt-Winters triple smoothing (table ==
sequential recursion), PACF Durbin-Levinson closed forms, bounded
k-core peel invariants."""

from __future__ import annotations

from fractions import Fraction as Fr

from leadsight_sales_agent_spark import registry

registry.load_all()


class TestHoltWintersUnroll:
    def test_tables_equal_sequential_recursion(self):
        """The literal HW_* tables ARE the 16-step Holt-Winters
        recursion (alpha=beta=gamma=1/2, m=4, classic two-season
        init), exactly — same machine-checked equivalence that pins
        the Holt double-smoothing tables."""
        from leadsight_sales_agent_spark.operators.windows import (
            HW_B,
            HW_DEN,
            HW_F,
            HW_L,
            HW_S,
        )

        vals = [100, 120, 90, 130, 150, 110, 105, 160,
                170, 140, 135, 180, 190, 175, 200, 210]
        l = Fr(sum(vals[:4]), 4)
        b = (Fr(sum(vals[4:8]), 4) - l) / 4
        s = [None] + [Fr(v) - l for v in vals[:4]]
        for t in range(5, 17):
            v, sp = Fr(vals[t - 1]), s[t - 4]
            ln = (v - sp) / 2 + (l + b) / 2
            bn = (ln - l) / 2 + b / 2
            s.append((v - ln) / 2 + sp / 2)
            l, b = ln, bn

        def dot(table):
            return sum(Fr(table[k], HW_DEN) * vals[15 - k] for k in range(16))

        assert dot(HW_L) == l
        assert dot(HW_B) == b
        assert dot(HW_S) == s[13]  # next period's seasonal index
        assert dot(HW_F) == l + b + s[13]

    def test_weight_identities(self):
        from leadsight_sales_agent_spark.operators.windows import (
            HW_B,
            HW_DEN,
            HW_F,
            HW_L,
            HW_S,
        )

        assert sum(HW_L) == HW_DEN  # level weights sum to 1
        assert sum(HW_B) == 0  # trend weights sum to 0
        assert sum(HW_S) == 0  # seasonal index weights sum to 0
        assert sum(HW_F) == HW_DEN  # forecast = level + trend + season
        assert [x + y + z for x, y, z in zip(HW_L, HW_B, HW_S)] == list(HW_F)


class TestPacfClosedForms:
    def test_closed_forms_equal_durbin_levinson(self):
        """The integer polynomials graded by
        forecast_pacf_durbin_levinson are the D-L recursion (equiv.
        Cramer on the Toeplitz Yule-Walker system) on r_k = a_k/S."""
        import random

        S = 10000
        rng = random.Random(42)
        for _ in range(100):
            a1, a2, a3 = (rng.randint(-9000, 9000) for _ in range(3))
            r = [Fr(a, S) for a in (a1, a2, a3)]
            # Durbin-Levinson
            phi11 = r[0]
            v = 1 - r[0] ** 2
            phi22 = (r[1] - phi11 * r[0]) / v
            phi21 = phi11 - phi22 * phi11
            v *= 1 - phi22 ** 2
            phi33 = (r[2] - phi21 * r[1] - phi22 * r[0]) / v
            # graded integer polynomials
            n2, d2 = a2 * S - a1 * a1, S * S - a1 * a1
            n3 = (S * S * a3 - 2 * S * a1 * a2 + a1 * a2 * a2
                  + a1 ** 3 - a1 * a1 * a3)
            d3 = S ** 3 - 2 * S * a1 * a1 + 2 * a1 * a1 * a2 - S * a2 * a2
            assert Fr(n2, d2) == phi22
            assert Fr(n3, d3) == phi33

    def test_pacf1_equals_acf1_on_sf0001(self, spark, sf_dir):
        rows = registry.QUERIES["forecast_pacf_durbin_levinson"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["pacf1_bp"] == r["acf1_bp"]
        for c in ("acf1_bp", "acf2_bp", "acf3_bp", "pacf2_bp", "pacf3_bp"):
            assert -10000 <= r[c] <= 10000, (c, r[c])


class TestKCorePeel:
    def test_curve_invariants(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.graph import K_CORE_ITERS

        rows = sorted(
            registry.QUERIES["graph_kcore_peel"](spark, sf_dir).collect(),
            key=lambda r: r["iteration"],
        )
        assert [r["iteration"] for r in rows] == list(range(K_CORE_ITERS + 1))
        alive = [r["n_alive"] for r in rows]
        # monotone non-increasing peel
        assert all(a >= b for a, b in zip(alive, alive[1:]))
        # n_removed is the successive difference; first row removes 0
        assert rows[0]["n_removed"] == 0
        for prev, cur in zip(rows, rows[1:]):
            assert cur["n_removed"] == prev["n_alive"] - cur["n_alive"]
            assert cur["converged"] == (cur["n_alive"] == prev["n_alive"])
        # once converged, stays converged (fixpoint is stable)
        flags = [r["converged"] for r in rows[1:]]
        if True in flags:
            first = flags.index(True)
            assert all(flags[first:])


class TestBpeEncode:
    def test_merge_chain_collapses_known_words(self, spark, sf_dir):
        rows = {
            r["word"]: r
            for r in registry.QUERIES["text_bpe_encode_fixed_merges"](
                spark, sf_dir
            ).collect()
        }
        # multi-level chain: (a,n) -> (c,an) -> (s,can) => one token
        if "scan" in rows:
            assert rows["scan"]["encoded"] == "scan"
            assert rows["scan"]["n_bpe_tokens"] == 1
        if "row" in rows:  # (o,w) -> (r,ow)
            assert rows["row"]["encoded"] == "row"
        if "the" in rows:  # (t,h) -> (th,e)
            assert rows["the"]["encoded"] == "the"
        for r in rows.values():
            # token count never exceeds character count and encoded
            # round-trips to the word when spaces are removed
            assert 1 <= r["n_bpe_tokens"] <= r["n_chars"]
            assert r["encoded"].replace(" ", "") == r["word"]


class TestEncodingDamageAudit:
    def test_planted_damage_is_found_exactly(self, spark, sf_dir):
        rows = registry.QUERIES["text_encoding_damage_audit"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert r["is_damaged"]
            # damage classes follow the planting rule exactly
            moji = r["doc_id"] % 7 == 3
            ctrl = r["doc_id"] % 11 == 4
            assert moji or ctrl
            assert r["n_mojibake"] == (1 if moji else 0)
            assert r["n_replacement"] == (1 if moji else 0)
            assert r["n_control"] == (1 if ctrl else 0)
            assert r["non_ascii_bp"] >= 0


class TestFullReleasePipeline:
    def test_stage_subset_invariants(self, spark, sf_dir):
        """Packed docs ⊆ mixture-selected ⊆ deduped ⊆ curated-keep, and
        the manifest's doc count equals the final selected set size."""
        from leadsight_sales_agent_spark.sources.catalog import load
        from leadsight_sales_agent_spark.operators.text import (
            corpus_curation_full,
        )
        from leadsight_sales_agent_spark.operators.sampling import (
            mixture_budgets_and_selection,
        )
        import pyspark.sql.functions as F

        keep = {
            r["doc_id"]
            for r in corpus_curation_full(spark, sf_dir)
            .filter(F.col("verdict") == "keep")
            .select("doc_id")
            .collect()
        }
        docs = load(spark, sf_dir, "documents").filter(
            F.col("doc_id").isin(*keep) if keep else F.lit(False)
        )
        winners = {
            r["doc_id"]
            for r in docs.groupBy(F.md5(F.trim(F.col("text"))).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .collect()
        }
        assert winners <= keep
        _b, sel = mixture_budgets_and_selection(
            docs.filter(F.col("doc_id").isin(*winners))
        )
        selected = {
            r["doc_id"]
            for r in sel.filter(F.col("cum") <= F.col("token_budget"))
            .select("doc_id")
            .collect()
        }
        assert selected <= winners
        manifest = registry.QUERIES["pipeline_full_release"](spark, sf_dir).collect()
        assert sum(r["n_docs"] for r in manifest) == len(selected)


class TestIncrementalPrefixJoin:
    def test_delta_side_and_threshold(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.dedup import NEW_BATCH_SOURCE
        from leadsight_sales_agent_spark.sources.catalog import load
        import pyspark.sql.functions as F

        docs = load(spark, sf_dir, "documents")
        delta_ids = {
            r["doc_id"]
            for r in docs.filter(F.col("source") == NEW_BATCH_SOURCE)
            .select("doc_id")
            .collect()
        }
        rows = registry.QUERIES["neardup_incremental_prefix_join"](
            spark, sf_dir
        ).collect()
        for r in rows:
            assert r["delta_doc"] in delta_ids
            assert r["corpus_doc"] not in delta_ids
            # division-free threshold <=> J >= 0.8
            assert 9 * r["n_common"] >= 4 * (r["size_delta"] + r["size_corpus"])
            assert r["jaccard_bp"] >= 8000


class TestPoissonBootstrap:
    def test_ci_brackets_point_estimate(self, spark, sf_dir):
        rows = registry.QUERIES["bootstrap_poisson_ci_mean"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert r["n_replicas"] == 100
            assert r["ci_lo_cents"] <= r["ci_hi_cents"]
            # the 95% CI must bracket the full-sample mean (holds at any
            # reasonable n; a violation means the replica hash-counts or
            # the rank picks are wrong)
            assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"]
            # width shrinks like 1/sqrt(n): at n>=100 it is far below
            # the mean itself
            assert (r["ci_hi_cents"] - r["ci_lo_cents"]) < r["mean_cents"]


class TestPcaPowerIteration:
    def test_eigenpair_properties(self, spark, sf_dir):
        """The graded artifact is the FIXED-4-iteration state, not the
        converged eigenvector (the synthetic embedding covariance is
        near-isotropic — top/second eigengap ~7%, so convergence is
        slow by design). The honest invariants: unit l-infinity norm,
        positive eigenvalue estimate, and a Rayleigh quotient that
        already captures most of the true top eigenvalue (power
        iteration improves it monotonically from the all-ones start)."""
        import numpy as np

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = registry.QUERIES["embedding_pca_power_iteration"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 64
        v = np.zeros(64)
        lam = rows[0]["eigenvalue_linf"]
        for r in rows:
            v[r["dim"] - 1] = r["loading"]
            assert r["eigenvalue_linf"] == lam
        assert lam > 0
        assert abs(np.abs(v).max() - 1.0) < 1e-9  # l-inf normalized
        X = np.array(
            load(spark, sf_dir, "embeddings")
            .select("embedding")
            .toPandas()["embedding"]
            .tolist(),
            dtype=float,
        )
        C = np.cov(X, rowvar=False)
        top = np.linalg.eigvalsh(C)[-1]
        rayleigh = (v @ C @ v) / (v @ v)
        assert rayleigh >= 0.75 * top, (rayleigh, top)
        assert lam <= 1.05 * top  # l-inf growth factor bounded by the spectrum


class TestJlProjection:
    def test_norm_concentration(self, spark, sf_dir):
        """JL distortion audit: per-vector projected-norm ratios must
        concentrate around 1 (here: median within [0.5, 1.5] and all
        ratios positive), and every vector gets exactly JL_OUT_DIM
        coordinates."""
        from collections import Counter

        from leadsight_sales_agent_spark.operators.similarity import JL_OUT_DIM

        rows = registry.QUERIES["embedding_random_projection_jl"](
            spark, sf_dir
        ).collect()
        per_vec = Counter(r["vec_id"] for r in rows)
        assert set(per_vec.values()) == {JL_OUT_DIM}
        ratios = sorted({r["vec_id"]: r["norm_ratio_bp"] for r in rows}.values())
        assert all(x > 0 for x in ratios)
        med = ratios[len(ratios) // 2]
        assert 5000 <= med <= 15000, med


class TestAuditDerivatives:
    def test_bpe_compression_identities(self, spark, sf_dir):
        rows = registry.QUERIES["text_bpe_compression_by_lang"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            # tokens never exceed chars, never fewer than words
            assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"]
            assert r["fertility_e4"] >= 10000  # >= 1 token per word
            assert r["chars_per_token_e4"] >= 10000  # >= 1 char per token

    def test_pack_shard_shares_sum_to_whole(self, spark, sf_dir):
        rows = registry.QUERIES["layout_pack_shard_balance"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 16  # one per hex shard
        total_share = sum(r["share_bp"] for r in rows)
        assert abs(total_share - 10000) <= len(rows)  # half-up rounding slack
        for r in rows:
            assert r["vs_even_bp"] > 0


class TestObservedMetrics:
    def test_observation_collects_counters_in_one_pass(self, spark, sf_dir):
        """Dataset.observe — the engine-level twin of the reference's
        per-row progress counters (app.py's processed/total): named
        aggregates piggyback on the ACTION's single pass (no second
        scan), delivered after completion like a StreamingQueryListener
        metric. The counters must agree with directly-computed values."""
        from pyspark.sql import Observation
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        obs = Observation("ingest_stats")
        orders = load(spark, sf_dir, "orders")
        observed = orders.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
            F.max("o_orderdate").alias("max_date"),
        )
        n_out = observed.filter(F.col("o_orderstatus") == "F").count()
        got = obs.get
        assert got["n_rows"] == orders.count()
        assert got["n_large"] == orders.filter(
            F.col("o_totalprice") > 100000
        ).count()
        assert got["max_date"] == orders.agg(F.max("o_orderdate")).first()[0]
        assert 0 < n_out <= got["n_rows"]


class TestAmsF2:
    def test_sketch_invariants(self, spark, sf_dir):
        rows = registry.QUERIES["sketch_ams_f2_moment"](spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_estimators"] == 25
        # F2 >= stream length always (sum f^2 >= sum f)
        assert r["f2_true"] >= r["n_rows"]
        assert r["f2_ams"] >= 0
        # deterministic hash signs: the median-of-means estimate is a
        # fixed value per dataset; AMS guarantees it lands within a
        # constant factor of F2 w.h.p. — pin a 3x envelope (measured
        # 0.71x at sf0.001, 0.90x at sf0.01)
        assert r["f2_ams"] <= 3 * r["f2_true"]
        assert 3 * r["f2_ams"] >= r["f2_true"]


class TestCountSketch:
    def test_unbiased_estimates_near_truth(self, spark, sf_dir):
        """On heavy keys the signed-median estimate must land within the
        collision noise band (||f||_2-ish); exactness of individual
        cells is already hash-graded — this pins the statistical
        contract on the probe set."""
        rows = registry.QUERIES["sketch_count_sketch_estimates"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 20
        for r in rows:
            assert r["abs_err"] == abs(r["cs_estimate"] - r["true_count"])
        # median relative error across probes stays bounded
        rels = sorted(r["abs_err"] / r["true_count"] for r in rows)
        assert rels[len(rels) // 2] < 2.0, rels


class TestGeometricMechanism:
    def test_noise_distribution_and_consistency(self, spark, sf_dir):
        rows = registry.QUERIES["privacy_geometric_mechanism_counts"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert r["noisy_count"] == r["true_count"] + r["noise"]
            assert -8 <= r["noise"] <= 8  # truncation bound
            assert r["epsilon_e4"] == 10000


class TestKmvRolling:
    def test_rolling_estimate_matches_sketch_error_envelope(self, spark, sf_dir):
        rows = registry.QUERIES["sketch_kmv_rolling_distinct_7d"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert r["err_bp"] == abs(r["est_distinct"] - r["n_true"]) * 10000 // r["n_true"]
            # KMV with k=64: ~12.5% expected error; pin a 4-sigma envelope
            assert r["err_bp"] <= 5000, r


class TestAmsJoinSize:
    def test_estimate_within_envelope(self, spark, sf_dir):
        rows = registry.QUERIES["sketch_ams_join_size_estimate"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["join_size"] > 0
        # inner-product sketch with median-of-means: pin a 3x envelope
        assert abs(r["est_join_size"]) <= 3 * r["join_size"]
        assert 3 * abs(r["est_join_size"]) >= r["join_size"]


class TestShapleyAttribution:
    def test_efficiency_axiom(self, spark, sf_dir):
        """Shapley efficiency: the scaled values sum EXACTLY to
        24 * (v(N) - v(empty)) — the axiom that makes the split an
        allocation rather than a score."""
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load
        from leadsight_sales_agent_spark.operators.behavior import (
            SHAPLEY_CHANNELS,
        )

        rows = registry.QUERIES["attribution_shapley_channels"](
            spark, sf_dir
        ).collect()
        assert {r["channel"] for r in rows} == {c for c, _ in SHAPLEY_CHANNELS}
        ev = load(spark, sf_dir, "events")
        fp = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t0"))
        )
        n_conv = fp.count()
        # v(N) = all converted users; v(empty) = users converting with
        # no prior channel events
        pre = ev.filter(F.col("event_type") != "purchase").select("user_id", "ts")
        with_pre = (
            fp.join(pre, "user_id").filter(F.col("ts") < F.col("t0"))
            .select("user_id").distinct().count()
        )
        v_empty = n_conv - with_pre
        assert sum(r["shapley_x24"] for r in rows) == 24 * (n_conv - v_empty)


class TestGreedySourceCover:
    def test_greedy_invariants(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.text import (
            GREEDY_COVER_ROUNDS,
        )

        rows = sorted(
            registry.QUERIES["corpus_greedy_source_cover"](spark, sf_dir).collect(),
            key=lambda r: r["round"],
        )
        assert [r["round"] for r in rows] == list(
            range(1, GREEDY_COVER_ROUNDS + 1)
        )
        # no source picked twice
        assert len({r["source"] for r in rows}) == len(rows)
        # marginal gains are non-increasing (submodularity of coverage)
        gains = [r["gain"] for r in rows]
        assert gains == sorted(gains, reverse=True)
        # cumulative coverage is consistent and bounded by the universe
        cum = 0
        for r in rows:
            cum += r["gain"]
            assert r["covered"] == cum
            assert 0 <= r["coverage_bp"] <= 10000


class TestVideoGopPlan:
    def test_geometry_invariants(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.multimodal import (
            VIDEO_CLIP_LEN,
            VIDEO_CLIP_STRIDE,
            VIDEO_GOP_SECONDS,
        )

        rows = registry.QUERIES["multimodal_video_gop_plan"](spark, sf_dir).collect()
        assert {r["fps"] for r in rows} <= {24, 25, 30}
        for r in rows:
            gop = r["fps"] * VIDEO_GOP_SECONDS
            # every clip contributes exactly CLIP_LEN frames
            assert r["total_clip_frames"] == r["total_clips"] * VIDEO_CLIP_LEN
            # keyframes cover the frames: gop*(keyframes-n) < frames <= gop*keyframes
            assert r["total_keyframes"] * gop >= r["total_frames"]
            assert (r["total_keyframes"] - r["n_assets"]) * gop < r["total_frames"]
            # seek waste per clip is bounded by gop-1
            assert 0 <= r["total_seek_waste_frames"] <= r["total_clips"] * (gop - 1)
            # max clips consistent with the metadata bounds
            assert 1 <= r["max_clips_per_asset"] <= (7439 - VIDEO_CLIP_LEN) // VIDEO_CLIP_STRIDE + 1

    def test_seek_waste_exact_small_case(self):
        """Hand-check the fold: fps=24 → gop=48, stride 64: clip i wastes
        (64*i) % 48 — period 3 pattern 0,16,32."""
        waste = [(64 * i) % 48 for i in range(7)]
        assert waste == [0, 16, 32, 0, 16, 32, 0]


class TestBucketLocalizedQuantile:
    def test_matches_global_sort_median(self, spark, sf_dir):
        """The two-phase localized median == the naive global-sort rank
        pick, per group — the equivalence that lets the cheap plan
        replace the expensive one."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["flag"]: r
            for r in registry.QUERIES["quantile_bucket_localized_exact"](
                spark, sf_dir
            ).collect()
        }
        base = load(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_extendedprice").cast("decimal(25,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        w = Window.partitionBy("flag").orderBy("cents")
        naive = {
            r["flag"]: r
            for r in base.withColumn("rk", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("flag")))
            .filter(F.expr("rk = (n + 1) DIV 2"))
            .collect()
        }
        assert set(rows) == set(naive)
        for flag, r in rows.items():
            assert r["median_cents"] == naive[flag]["cents"]
            assert r["n_rows"] == naive[flag]["n"]
            # the rescanned sliver is a small fraction of the group
            assert 0 < r["bucket_rows"] < r["n_rows"]
            assert 0 < r["scan_bp"] < 2000


class TestIncrementalTopkMaintenance:
    def test_maintained_equals_full_recompute(self, spark, sf_dir):
        """Candidate-set maintenance == full recompute, Spark-vs-Spark —
        the IVM equivalence, independent of the DuckDB oracle."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from leadsight_sales_agent_spark.operators.relational import (
            _TOPK_MICRO,
            TOPK_IVM_K,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = sorted(
            registry.QUERIES["incremental_topk_maintenance"](spark, sf_dir).collect(),
            key=lambda r: r["rank"],
        )
        assert [r["rank"] for r in rows] == list(range(1, TOPK_IVM_K + 1))
        full = (
            load(spark, sf_dir, "lineitem")
            .groupBy("l_partkey")
            .agg(F.sum(F.expr(_TOPK_MICRO)).alias("rev_micro"))
            .orderBy(F.col("rev_micro").desc(), "l_partkey")
            .limit(TOPK_IVM_K)
            .collect()
        )
        assert [r["p_partkey"] for r in rows] == [r["l_partkey"] for r in full]
        for got, want in zip(rows, full):
            assert got["revenue"] == round(float(want["rev_micro"]) / 1e6, 2)
        # revenue is non-increasing down the ranks
        revs = [r["revenue"] for r in rows]
        assert revs == sorted(revs, reverse=True)
        assert all(r["was_in_old_topk"] in (0, 1) for r in rows)


class TestMannWhitneyU:
    def test_brute_force_ranks(self, spark, sf_dir):
        """u2_a/u2_b/tie term match a from-scratch Python average-rank
        computation on the raw rows; U_A + U_B = n_a*n_b exactly."""
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["eval_mann_whitney_u"](spark, sf_dir).collect()[0]
        raw = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer").filter(
                    F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
                ),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .select(
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
                "c_mktsegment",
            )
            .collect()
        )
        vals = sorted((r["cents"], r["c_mktsegment"]) for r in raw)
        n_a = sum(1 for _, s in vals if s == "BUILDING")
        n_b = len(vals) - n_a
        # average ranks in half-units over the sorted sample
        from itertools import groupby

        r2a = 0
        tie_t = 0
        pos = 0
        for _, grp in groupby(vals, key=lambda v: v[0]):
            grp = list(grp)
            t = len(grp)
            rank2 = 2 * pos + t + 1  # 2 * average rank of the tie group
            r2a += rank2 * sum(1 for _, s in grp if s == "BUILDING")
            tie_t += t * t * t - t
            pos += t
        u2_a = r2a - n_a * (n_a + 1)
        assert (row["n_a"], row["n_b"]) == (n_a, n_b)
        assert row["u2_a"] == u2_a
        assert row["u2_b"] == 2 * n_a * n_b - u2_a
        assert row["tie_t"] == tie_t
        # z agrees with the closed form to rounding
        import math

        nt = n_a + n_b
        var = n_a * n_b * (nt + 1 - tie_t / (nt * (nt - 1))) / 12.0
        assert abs(row["z_mw"] - (u2_a - n_a * n_b) / (2.0 * math.sqrt(var))) < 1e-3


class TestMcNemarPaired:
    def test_cells_and_chi2(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["eval_mcnemar_paired"](spark, sf_dir).collect()[0]
        raw = (
            load(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", "value", F.minute("ts").alias("mi"))
            .collect()
        )
        b = c = both = 0
        for r in raw:
            y = 1 if r["event_type"] == "purchase" else 0
            p1 = 1 if r["value"] >= 50.0 else 0
            p2 = 1 if r["mi"] < 30 else 0
            if p1 == y and p2 != y:
                b += 1
            elif p1 != y and p2 == y:
                c += 1
            elif p1 == y and p2 == y:
                both += 1
        assert (row["b"], row["c"], row["both_right"]) == (b, c, both)
        assert row["n_examples"] == len(raw)
        assert row["chi2_num"] == (b - c) ** 2
        assert abs(row["chi2"] - (b - c) ** 2 / (b + c)) < 1e-3
        assert row["chi2_cc"] <= row["chi2"]


class TestKruskalWallis:
    def test_brute_force(self, spark, sf_dir):
        """H from a from-scratch Python average-rank computation matches
        to the 4dp reporting grain; k=5 segments, n = all orders."""
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["eval_kruskal_wallis"](spark, sf_dir).collect()[0]
        raw = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .select(
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
                F.col("c_mktsegment").alias("seg"),
            )
            .collect()
        )
        from collections import defaultdict
        from itertools import groupby

        vals = sorted((r["cents"], r["seg"]) for r in raw)
        n = len(vals)
        r2 = defaultdict(int)
        counts = defaultdict(int)
        tie_t = 0
        pos = 0
        for _, grp in groupby(vals, key=lambda v: v[0]):
            grp = list(grp)
            t = len(grp)
            rank2 = 2 * pos + t + 1
            for _, seg in grp:
                r2[seg] += rank2
                counts[seg] += 1
            tie_t += t**3 - t
            pos += t
        assert row["n_orders"] == n
        assert row["k_groups"] == len(counts) == 5
        assert row["tie_t"] == tie_t
        s = sum((r2[g] / 2) ** 2 / counts[g] for g in counts)
        h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
        hc = h / (1.0 - tie_t / (n**3 - n))
        assert abs(row["h_stat"] - h) < 1e-3
        assert abs(row["h_tie_corrected"] - hc) < 1e-3
        assert row["h_tie_corrected"] >= row["h_stat"] - 1e-9


class TestRepeatEpochsPlan:
    def test_greedy_schedule_invariants(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = registry.QUERIES["mixture_repeat_epochs_plan"](spark, sf_dir).collect()
        docs = load(spark, sf_dir, "documents").select(
            "source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
        )
        total = docs.agg(F.sum("n")).collect()[0][0]
        budget = total * 3 // 2
        # the schedule spends the budget exactly (supply exceeds it)
        assert sum(r["tokens_taken"] for r in rows) == budget
        # at most one partial epoch, and it's the boundary
        partial = [r for r in rows if r["full_epoch"] == 0]
        assert len(partial) <= 1
        for r in partial:
            assert 0 < r["tokens_taken"] < r["tokens_planned"]
        # per source, epochs form a prefix 1..k (greedy can't skip)
        from collections import defaultdict

        per = defaultdict(list)
        for r in rows:
            per[r["source"]].append(r["epoch"])
        for eps in per.values():
            assert sorted(eps) == list(range(1, len(eps) + 1))
        # utility really is tok * 2^(4-e)
        for r in rows:
            assert r["util8"] == r["tokens_planned"] * (1 << (4 - r["epoch"]))


class TestUrlCanonicalization:
    def test_rules_on_handmade_urls(self, spark):
        """Each canonicalization rule verified on explicit raw URLs via
        the same expression pipeline (no synthetic-construction
        knowledge): case, www, fragment, utm, param order, trailing
        slash all collapse; distinct pages stay distinct."""
        import pyspark.sql.functions as F

        raws = [
            "https://example.com/p/9?id=4",
            "HTTPS://WWW.Example.COM/p/9?id=4",
            "https://www.example.com/p/9/?id=4#section",
            "https://example.com/p/9?utm_source=mail&id=4",
            "https://example.com/p/9?id=4&utm_campaign=x",
            "https://example.com/p/9?b=2&a=1",
            "https://example.com/p/10?id=4",
        ]
        df = spark.createDataFrame([(i, u) for i, u in enumerate(raws)], "doc_id long, url string")
        canon_q = (
            "array_join(array_sort(filter(split(q, '&'),"
            " p -> substr(p, 1, 4) != 'utm_')), '&')"
        )
        out = (
            df.select(
                "doc_id",
                F.expr("split(url, '#')[0]").alias("no_frag"),
            )
            .select(
                "doc_id",
                F.expr("split(no_frag, '[?]')[0]").alias("base"),
                F.expr(
                    "CASE WHEN instr(no_frag, '?') > 0"
                    " THEN split(no_frag, '[?]')[1] ELSE '' END"
                ).alias("q"),
            )
            .select(
                "doc_id",
                "q",
                F.expr("lower(substr(base, 1, instr(base, '://') - 1))").alias("scheme"),
                F.expr("substr(base, instr(base, '://') + 3)").alias("rest"),
            )
            .select(
                "doc_id",
                "q",
                "scheme",
                F.expr("lower(substr(rest, 1, instr(rest, '/') - 1))").alias("host0"),
                F.expr("substr(rest, instr(rest, '/'))").alias("path0"),
            )
            .select(
                "doc_id",
                F.expr(
                    "concat(scheme, '://',"
                    " CASE WHEN host0 LIKE 'www.%' THEN substr(host0, 5) ELSE host0 END,"
                    " CASE WHEN length(path0) > 1 AND path0 LIKE '%/'"
                    "      THEN substr(path0, 1, length(path0) - 1) ELSE path0 END,"
                    f" CASE WHEN length({canon_q}) > 0"
                    f"      THEN concat('?', {canon_q}) ELSE '' END)"
                ).alias("c"),
            )
            .collect()
        )
        canon = {r["doc_id"]: r["c"] for r in out}
        # first five collapse to one canonical form
        assert len({canon[i] for i in range(5)}) == 1
        assert canon[0] == "https://example.com/p/9?id=4"
        # param sorting
        assert canon[5] == "https://example.com/p/9?a=1&b=2"
        # different page stays distinct
        assert canon[6] == "https://example.com/p/10?id=4"

    def test_registered_query_groups(self, spark, sf_dir):
        rows = registry.QUERIES["dedup_url_canonicalization"](spark, sf_dir).collect()
        # no canonical url retains a fragment, utm param, or upper-case
        for r in rows:
            u = r["canonical_url"]
            assert "#" not in u and "utm_" not in u and u == u.lower()
            assert r["n_variants"] >= r["n_distinct_raw"] >= 1
            assert 1 <= r["n_distinct_raw"]


class TestTimeDecayAttribution:
    def test_efficiency_identity(self, spark, sf_dir):
        """Channel micro-credits sum to exactly 1e6 per converting user
        with pre-purchase touches — largest-remainder never leaks or
        mints a micro-credit."""
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.behavior import ATTR_MICROS
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = registry.QUERIES["attribution_time_decay_apportioned"](
            spark, sf_dir
        ).collect()
        ev = load(spark, sf_dir, "events")
        fp = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t0"))
        )
        n_users = (
            ev.filter(F.col("event_type") != "purchase")
            .join(fp, "user_id")
            .filter(F.col("ts") < F.col("t0"))
            .select("user_id")
            .distinct()
            .count()
        )
        assert sum(r["micro_credit"] for r in rows) == n_users * ATTR_MICROS
        assert {r["channel"] for r in rows} <= {"click", "view", "signup", "error"}
        assert all(r["micro_credit"] > 0 for r in rows)


class TestPrioritySampling:
    def test_estimator_matches_first_principles(self, spark, sf_dir):
        """Recompute the DLT estimator in Python from the same hashes
        for every source; the engine's per-source estimator mass and
        error must match exactly."""
        import hashlib
        from collections import defaultdict

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.sampling import PRIORITY_K
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["source"]: r
            for r in registry.QUERIES["sample_priority_weighted_topk"](
                spark, sf_dir
            ).collect()
        }
        docs = (
            load(spark, sf_dir, "documents")
            .filter(F.col("n_chars") > 0)
            .select("doc_id", "source", "n_chars")
            .collect()
        )
        per = defaultdict(list)
        for r in docs:
            h = int(
                hashlib.md5(f"pri:{r['doc_id']}".encode()).hexdigest()[:8], 16
            )
            per[r["source"]].append((r["doc_id"], r["n_chars"], h + 1))
        for src, items in per.items():
            pri = sorted(
                ((w / h1, did, w) for did, w, h1 in items),
                key=lambda t: (-t[0], t[1]),
            )
            assert rows[src]["n_docs"] == len(items)
            true_w = sum(w for _, w, _ in items)
            assert rows[src]["true_w"] == true_w
            tau_q = pri[PRIORITY_K][0] * 4294967296.0
            import math

            est_milli = sum(
                math.floor(max(float(w), tau_q) * 1e3 + 0.5)
                for _, _, w in pri[:PRIORITY_K]
            )
            assert rows[src]["est_milli_sum"] == est_milli
            diff = est_milli - true_w * 1000
            want_bp = (2 * 10000 * diff + true_w * 1000) // (2 * true_w * 1000)
            # Python // floors; engines' DIV truncates toward zero —
            # identical for the magnitudes here unless exactly negative
            # non-divisible, so compare within 1 bp
            assert abs(rows[src]["err_bp"] - want_bp) <= 1


class TestCdcChunking:
    def test_coverage_identity(self, spark, sf_dir):
        """Chunks tile each doc exactly: total addressed bytes equal the
        summed lengths of all chunkable docs; dedup never exceeds
        total; savings arithmetic is consistent."""
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.dedup import CDC_WINDOW
        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["dedup_cdc_chunking"](spark, sf_dir).collect()[0]
        total_len = (
            load(spark, sf_dir, "documents")
            .filter(F.length("text") >= CDC_WINDOW)
            .agg(F.sum(F.length("text")))
            .collect()[0][0]
        )
        assert row["total_bytes"] == total_len
        assert 0 < row["distinct_chunks"] <= row["total_chunks"]
        assert row["saved_bytes"] < row["total_bytes"]
        assert 0 <= row["dedup_bp"] < 10000

    def test_shift_resistance(self, spark):
        """The CDC property: prepending bytes to a doc changes only the
        chunks up to the first boundary after the edit — the chunk
        hashes of the untouched tail survive (fixed-size blocking
        would shift every block)."""
        import hashlib

        def chunks(text):
            n = len(text)
            cuts = [
                i
                for i in range(8, n + 1)
                if hashlib.md5(text[i - 8 : i].encode()).hexdigest()[0] == "0"
                or i == n
            ]
            out, start = [], 0
            for c in sorted(set(cuts)):
                if c > start:
                    out.append(text[start:c])
                    start = c
            return out

        base = "the quick brown fox jumps over the lazy dog " * 20
        edited = "PREFIX-INSERTED " + base
        cb, ce = chunks(base), chunks(edited)
        # the untouched tail re-synchronizes: the chunk SEQUENCES share
        # a long common suffix (fixed-size blocking would share none)
        suffix = 0
        while (
            suffix < min(len(cb), len(ce))
            and cb[-1 - suffix] == ce[-1 - suffix]
        ):
            suffix += 1
        assert suffix >= len(cb) - 3


class TestGorillaTsAudit:
    def test_accounting_identities(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = registry.QUERIES["storage_gorilla_ts_encoding_audit"](
            spark, sf_dir
        ).collect()
        ev = load(spark, sf_dir, "events")
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        by = {r["enc_class"]: r for r in rows}
        # every event charged exactly once
        assert sum(r["n_events"] for r in rows) == n_events
        # one full header per user stream
        assert by["header-full"]["n_events"] == n_users
        assert by["header-full"]["bits_total"] == 64 * n_users
        # compression must beat raw 64-bit on this cadence
        ratio = rows[0]["corpus_ratio_bp"]
        assert all(r["corpus_ratio_bp"] == ratio for r in rows)
        assert 0 < ratio < 10000
        # shares sum to ~100% (half-up rounding slack)
        assert abs(sum(r["share_bp"] for r in rows) - 10000) <= len(rows)


class TestDictionaryAdvisor:
    def test_cost_model(self, spark, sf_dir):
        import math

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.layout import _DICT_COLS
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            (r["tbl"], r["col"]): r
            for r in registry.QUERIES["storage_dictionary_encoding_advisor"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(_DICT_COLS)
        t, c = "orders", "o_orderpriority"
        df = load(spark, sf_dir, t)
        vals = [r[0] for r in df.select(c).collect()]
        distinct = set(vals)
        r = rows[(t, c)]
        assert r["n_rows"] == len(vals)
        assert r["ndv"] == len(distinct)
        assert r["plain_bits"] == 8 * sum(len(v) for v in vals)
        width = max(1, (len(distinct) - 1).bit_length())
        assert r["dict_bits"] == len(vals) * width + 8 * sum(
            len(v) for v in distinct
        )
        # a 5-value priority column must dictionary-encode massively
        assert r["use_dict"] == 1 and r["savings_bp"] > 9000


class TestRleSortednessAudit:
    def test_run_bounds(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["layout"]: r
            for r in registry.QUERIES["storage_rle_sortedness_audit"](
                spark, sf_dir
            ).collect()
        }
        o = load(spark, sf_dir, "orders")
        n = o.count()
        ndv = o.select("o_orderpriority").distinct().count()
        assert rows["natural"]["n_rows"] == rows["sorted"]["n_rows"] == n
        # a sorted column has exactly NDV runs
        assert rows["sorted"]["n_runs"] == ndv
        # natural order is far less compressible but bounded by n
        assert ndv <= rows["natural"]["n_runs"] <= n
        assert rows["natural"]["n_runs"] > 10 * rows["sorted"]["n_runs"]


class TestFairnessGroupMetrics:
    def test_identities(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.behavior import (
            FAIR_REF_SEGMENT,
        )

        rows = {
            r["segment"]: r
            for r in registry.QUERIES["eval_fairness_group_metrics"](
                spark, sf_dir
            ).collect()
        }
        assert len(rows) == 5 and FAIR_REF_SEGMENT in rows
        ref = rows[FAIR_REF_SEGMENT]
        # the reference group's gaps vanish by construction
        assert ref["dp_gap_bp"] == 0 and ref["eo_gap_bp"] == 0
        for r in rows.values():
            # confusion-cell accounting
            assert r["tp"] + r["fp"] == r["n_sel"]
            assert 0 <= r["tp"] <= r["n_pos"] <= r["n"]
            for c in ("sel_bp", "tpr_bp", "fpr_bp"):
                assert 0 <= r[c] <= 10000
            assert r["dp_gap_bp"] == r["sel_bp"] - ref["sel_bp"]
            assert r["eo_gap_bp"] == max(
                abs(r["tpr_bp"] - ref["tpr_bp"]),
                abs(r["fpr_bp"] - ref["fpr_bp"]),
            )


class TestConsistentHashRing:
    def test_movement_contract(self, spark, sf_dir):
        """Adding a shard: keys move ONLY to the new shard, the moved
        fraction is near 1/(n+1), and loads are roughly balanced."""
        from leadsight_sales_agent_spark.operators.layout import RING_SHARDS

        rows = {
            r["shard"]: r
            for r in registry.QUERIES["shard_consistent_hash_ring"](
                spark, sf_dir
            ).collect()
        }
        new = RING_SHARDS  # the added shard's id
        assert new in rows
        # the consistent-hashing contract: only the new shard gains
        for sid, r in rows.items():
            if sid != new:
                assert r["gained"] == 0, (sid, r["gained"])
        assert rows[new]["gained"] == rows[new]["n_keys"]
        total = sum(r["n_keys"] for r in rows.values())
        moved = rows[new]["n_keys"]
        # expected ~ total/(n+1); allow generous hash-variance slack
        expect = total / (RING_SHARDS + 1)
        assert 0.3 * expect < moved < 3 * expect
        assert rows[new]["moved_total_bp"] == rows[0]["moved_total_bp"]

    def test_bucket_lut_matches_brute_force_successor(self):
        """r10 plan-time-literal device: for ANY 48-bit key position,
        the bucket-LUT lookup (slice filter -> carry -> wrap) must
        equal the brute-force 'first vnode at pos >= kpos, else wrap'
        over the flat sorted ring — pure-Python pin of the structure
        the SQL literal encodes (hash equality with the union-sweep
        oracle pins the SQL side)."""
        from leadsight_sales_agent_spark.operators.layout import (
            RING_BDIV,
            RING_SHARDS,
            RING_VNODES,
            ring_model,
        )

        for n_shards in (RING_SHARDS, RING_SHARDS + 1, 1):
            vn, buckets, carries, frst = ring_model(n_shards, RING_VNODES)

            def brute(kpos: int) -> int:
                for p, s in vn:
                    if p >= kpos:
                        return s
                return frst

            def lut(kpos: int) -> int:
                b = kpos // RING_BDIV
                for p, s in buckets[b]:
                    if p >= kpos:
                        return s
                c = carries[b]
                return c if c is not None else frst

            # deterministic probe grid: every vnode position +-1 and 0
            # (tie + boundary cases), bucket edges, and a stride sweep
            probes = {0, (1 << 48) - 1}
            for p, _ in vn:
                probes.update((p - 1, p, p + 1))
            for b in range(0, 256, 17):
                probes.add(b * RING_BDIV)
            probes.update(range(104729, 1 << 48, (1 << 48) // 997))
            for kpos in probes:
                kpos = max(0, min(kpos, (1 << 48) - 1))
                assert lut(kpos) == brute(kpos), (n_shards, kpos)


class TestDtwMonthlySegments:
    def test_brute_force_dp(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.behavior import (
            DTW_REF_SEGMENT,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["segment"]: r
            for r in registry.QUERIES["timeseries_dtw_monthly_segments"](
                spark, sf_dir
            ).collect()
        }
        # rebuild the series
        o = load(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        raw = (
            o.join(
                load(spark, sf_dir, "customer"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .groupBy(
                F.col("c_mktsegment").alias("seg"),
                F.month("o_orderdate").alias("m"),
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast(
                        "bigint"
                    )
                ).alias("cents")
            )
            .collect()
        )
        series = {}
        for r in raw:
            series.setdefault(r["seg"], {})[r["m"]] = r["cents"]
        vec = {s: [series[s].get(m, 0) for m in range(1, 13)] for s in series}

        def dtw(a, b):
            INF = float("inf")
            dp = [[INF] * 13 for _ in range(13)]
            dp[0][0] = 0
            for i in range(1, 13):
                for j in range(1, 13):
                    dp[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                        dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
                    )
            return dp[12][12]

        ref = vec[DTW_REF_SEGMENT]
        assert rows[DTW_REF_SEGMENT]["dtw_cents"] == 0  # self-distance
        for seg, v in vec.items():
            assert rows[seg]["dtw_cents"] == dtw(v, ref), seg
            # DTW never exceeds the rigid (diagonal) alignment cost
            assert rows[seg]["dtw_cents"] <= sum(
                abs(x - y) for x, y in zip(v, ref)
            ) * 2  # diagonal path cost bound (costs re-counted on steps)


class TestGoodTuring:
    def test_identities(self, spark, sf_dir):
        from collections import Counter

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["r"]: r
            for r in registry.QUERIES["text_good_turing_unseen_mass"](
                spark, sf_dir
            ).collect()
        }
        texts = [
            r["text"]
            for r in load(spark, sf_dir, "documents")
            .filter(F.trim("text") != "")
            .select("text")
            .collect()
        ]
        freq = Counter(w for t in texts for w in t.strip().split())
        coc = Counter(freq.values())
        any_row = rows[0]  # the always-present totals sentinel
        assert any_row["n_tokens"] == sum(freq.values())
        assert any_row["vocab_seen"] == len(freq)
        assert any_row["n1"] == coc[1] and any_row["n2"] == coc[2]
        for r, row in rows.items():
            if r == 0:
                assert row["n_r"] is None
                continue
            assert row["n_r"] == coc[r]
            if r + 1 in coc:
                want = (2 * 1000 * (r + 1) * coc[r + 1] + coc[r]) // (2 * coc[r])
                assert row["gt_rstar_milli"] == want
        # Chao1 adds a nonnegative unseen-species correction
        assert any_row["chao1_total"] >= any_row["vocab_seen"]
        assert 0 <= any_row["unseen_mass_bp"] < 10000


class TestVocabAccumulation:
    def test_curve_identities(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = sorted(
            registry.QUERIES["text_vocab_accumulation_curve"](
                spark, sf_dir
            ).collect(),
            key=lambda r: r["decile"],
        )
        docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
        texts = [r["text"] for r in docs.select("text").collect()]
        total_types = len({w for t in texts for w in t.strip().split()})
        total_tokens = sum(len(t.strip().split()) for t in texts)
        assert sum(r["new_types"] for r in rows) == total_types
        assert sum(r["n_tokens"] for r in rows) == total_tokens
        assert rows[-1]["cum_types"] == total_types
        # cumulative is the running sum and is monotone
        cum = 0
        for r in rows:
            cum += r["new_types"]
            assert r["cum_types"] == cum
        # decile 1 introduces the most new types (fresh corpus prefix)
        assert rows[0]["new_types"] == max(r["new_types"] for r in rows)


class TestHeapsLawFit:
    def test_fit_matches_curve(self, spark, sf_dir):
        import math

        rows = registry.QUERIES["text_heaps_law_fit"](spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_points"] == 10
        curve = sorted(
            registry.QUERIES["text_vocab_accumulation_curve"](
                spark, sf_dir
            ).collect(),
            key=lambda c: c["decile"],
        )
        xs, ys, cum_tok, cum_typ = [], [], 0, 0
        for c in curve:
            cum_tok += c["n_tokens"]
            cum_typ += c["new_types"]
            xs.append(round(math.log(cum_tok), 12))
            ys.append(round(math.log(cum_typ), 12))
        k = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(round(x * y, 10) for x, y in zip(xs, ys))
        sxx = sum(round(x * x, 10) for x in xs)
        beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert abs(r["beta_e4"] / 1e4 - beta) < 1e-3
        # vocabulary grows sublinearly in tokens (a fully saturated
        # tiny-vocab corpus fits beta ~ 0, e.g. at sf0.001)
        assert 0 <= r["beta_e4"] < 10000


class TestMarkovBacktest:
    def test_no_leakage_and_accounting(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.behavior import (
            MARKOV_BT_CUTOVER,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["prev_type"]: r
            for r in registry.QUERIES["eval_markov_next_event_backtest"](
                spark, sf_dir
            ).collect()
        }
        # recompute: the model must be derivable from PRE-cutover data only
        from collections import Counter, defaultdict

        ev = sorted(
            load(spark, sf_dir, "events")
            .select("user_id", "event_type", "ts", "event_id")
            .collect(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        import datetime

        cut = datetime.datetime.fromisoformat(MARKOV_BT_CUTOVER)
        train = defaultdict(Counter)
        test = defaultdict(list)
        prev_by_user = {}
        for r in ev:
            p = prev_by_user.get(r["user_id"])
            if p is not None:
                if r["ts"] < cut:
                    train[p][r["event_type"]] += 1
                else:
                    test[p].append(r["event_type"])
            prev_by_user[r["user_id"]] = r["event_type"]
        for p, outcomes in test.items():
            want_pred = (
                min(
                    train[p].items(),
                    key=lambda kv: (-kv[1], kv[0]),
                )[0]
                if train[p]
                else None
            )
            r = rows[p]
            assert r["predicted"] == want_pred
            assert r["n_test"] == len(outcomes)
            assert r["n_correct"] == sum(1 for o in outcomes if o == want_pred)
            assert 0 <= r["top1_acc_bp"] <= 10000


class TestKendallTau:
    def test_scipy_free_recompute(self, spark, sf_dir):
        import math
        from itertools import combinations

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["eval_kendall_tau_brands"](spark, sf_dir).collect()[0]
        brands = (
            load(spark, sf_dir, "lineitem")
            .join(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .groupBy("p_brand")
            .agg(
                F.sum(
                    (F.col("l_extendedprice").cast("decimal(25,2)") * 100).cast(
                        "bigint"
                    )
                ).alias("rev"),
                F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
            )
            .collect()
        )
        vals = [(r["rev"], r["qty"]) for r in brands]
        c = d = tx = ty = 0
        for (r1, q1), (r2, q2) in combinations(vals, 2):
            s = (r1 - r2) * (q1 - q2)
            c += s > 0
            d += s < 0
            tx += r1 == r2
            ty += q1 == q2
        n0 = len(vals) * (len(vals) - 1) // 2
        assert (row["concordant"], row["discordant"]) == (c, d)
        assert (row["ties_rev"], row["ties_qty"]) == (tx, ty)
        tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        assert abs(row["tau_b_e4"] / 1e4 - tau) < 1e-3
        assert -10000 <= row["tau_b_e4"] <= 10000


class TestSimpsonsAudit:
    def test_signs_match_recompute(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["segment"]: r
            for r in registry.QUERIES["dq_simpsons_paradox_audit"](
                spark, sf_dir
            ).collect()
        }
        raw = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .select(
                "c_mktsegment",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("x"),
                (F.year("o_orderdate") - 1992).alias("y"),
            )
            .collect()
        )
        from collections import defaultdict

        per = defaultdict(lambda: [0, 0, 0, 0])
        for r in raw:
            st = per[r["c_mktsegment"]]
            st[0] += 1
            st[1] += r["x"]
            st[2] += r["y"]
            st[3] += r["x"] * r["y"]

        def sign(v):
            return (v > 0) - (v < 0)

        tn = sum(s[0] for s in per.values())
        tsx = sum(s[1] for s in per.values())
        tsy = sum(s[2] for s in per.values())
        tsxy = sum(s[3] for s in per.values())
        osign = sign(tn * tsxy - tsx * tsy)
        for seg, st in per.items():
            r = rows[seg]
            assert r["n_orders"] == st[0]
            assert r["group_sign"] == sign(st[0] * st[3] - st[1] * st[2])
            assert r["overall_sign"] == osign
            assert r["reversed"] == int(r["group_sign"] * osign == -1)


class TestDurbinWatson:
    def test_fraction_recompute(self, spark, sf_dir):
        from fractions import Fraction as Fr

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["forecast_durbin_watson_residuals"](
            spark, sf_dir
        ).collect()[0]
        months = (
            load(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            )
            .groupBy(
                (
                    (F.year("o_orderdate") - 1995) * 12
                    + F.month("o_orderdate")
                ).alias("t")
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast(
                        "bigint"
                    )
                ).alias("y")
            )
            .collect()
        )
        pts = sorted((r["t"], r["y"]) for r in months)
        n = len(pts)
        assert row["n_months"] == n
        st = sum(t for t, _ in pts)
        stt = sum(t * t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sty = sum(t * y for t, y in pts)
        b = Fr(n * sty - st * sy, n * stt - st * st)
        a = Fr(sy, n) - b * Fr(st, n)
        e = [Fr(y) - (a + b * t) for t, y in pts]
        num = sum((x - p) ** 2 for p, x in zip(e, e[1:]))
        den = sum(x**2 for x in e)
        dw = num / den
        # exact half-up of 1e4*dw on the reduced fraction
        dw_e4 = (2 * 10000 * dw.numerator + dw.denominator) // (2 * dw.denominator)
        assert row["dw_e4"] == dw_e4
        assert 0 <= row["dw_e4"] <= 40000


class TestLjungBox:
    def test_composes_registered_acf(self, spark, sf_dir):
        import math

        rows = registry.QUERIES["forecast_ljung_box_q"](spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["m_lags"] == 12
        acf = registry.QUERIES["forecast_acf_monthly"](spark, sf_dir).collect()
        n = max(a["n_pairs"] for a in acf if a["lag_months"] == 1) + 1
        assert r["n_months"] == n
        terms = []
        for a in acf:
            r6 = math.floor(a["acf"] * 1e6 + 0.5)
            terms.append(
                round(n * (n + 2.0) * (r6 * r6 / 1e12) / (n - a["lag_months"]), 6)
            )
        q = sum(terms)
        assert r["q_e4"] == math.floor(q * 1e4 + 0.5)
        assert r["reject_white_noise_5pct"] == int(r["q_e4"] > 210261)
        assert r["q_e4"] >= 0


class TestGrangerCausality:
    def test_fraction_exact_f(self, spark, sf_dir):
        import math
        from fractions import Fraction as Fr

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["forecast_granger_urgent_revenue"](
            spark, sf_dir
        ).collect()[0]
        months = (
            load(spark, sf_dir, "orders")
            .groupBy(
                (
                    (F.year("o_orderdate") - 1992) * 12
                    + F.month("o_orderdate")
                ).alias("t")
            )
            .agg(
                F.expr(
                    "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100"
                    " AS BIGINT)) DIV 100000 AS BIGINT)"
                ).alias("y"),
                F.sum(
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
                ).alias("x"),
            )
            .collect()
        )
        pts = sorted((r["t"], r["y"], r["x"]) for r in months)
        rows_ = [
            (y, pts[i - 1][1], pts[i - 1][2]) for i, (_, y, _x) in enumerate(pts) if i > 0
        ]
        m = len(rows_)
        assert row["n_pairs"] == m

        def rss(cols, yv):
            # exact OLS RSS via Gram determinants on Fractions
            import itertools

            k = len(cols)
            G = [[Fr(sum(a * b for a, b in zip(cols[i], cols[j])))
                  for j in range(k)] for i in range(k)]
            gy = [Fr(sum(a * b for a, b in zip(cols[i], yv))) for i in range(k)]
            yy = Fr(sum(v * v for v in yv))
            # det of [[G, gy],[gy^T, yy]] / det(G)
            def det(M):
                n = len(M)
                if n == 1:
                    return M[0][0]
                return sum(
                    (-1) ** j * M[0][j]
                    * det([r[:j] + r[j + 1:] for r in M[1:]])
                    for j in range(n)
                )

            aug = [G[i] + [gy[i]] for i in range(k)] + [gy + [yy]]
            return det(aug) / det(G)

        ones = [1] * m
        yv = [r[0] for r in rows_]
        ylv = [r[1] for r in rows_]
        xlv = [r[2] for r in rows_]
        rss_r = rss([ones, ylv], yv)
        rss_u = rss([ones, ylv, xlv], yv)
        assert rss_u <= rss_r  # adding a regressor never hurts
        f = (rss_r - rss_u) * (m - 3) / rss_u
        # engine computes the same value through double determinant
        # trees; agree to the reporting grain
        assert abs(row["f_e4"] / 1e4 - float(f)) < 2e-3
        assert row["granger_causes_5pct"] == int(row["f_e4"] > 39600)


class TestDickeyFuller:
    def test_tau_matches_ols(self, spark, sf_dir):
        import math

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["forecast_dickey_fuller_unit_root"](
            spark, sf_dir
        ).collect()[0]
        months = (
            load(spark, sf_dir, "orders")
            .groupBy(
                (
                    (F.year("o_orderdate") - 1992) * 12
                    + F.month("o_orderdate")
                ).alias("t")
            )
            .agg(
                F.expr(
                    "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100"
                    " AS BIGINT)) DIV 100000 AS BIGINT)"
                ).alias("y")
            )
            .collect()
        )
        ys = [y for _, y in sorted((r["t"], r["y"]) for r in months)]
        dy = [b - a for a, b in zip(ys, ys[1:])]
        yl = ys[:-1]
        m = len(dy)
        assert row["n_pairs"] == m
        mean_yl = sum(yl) / m
        mean_dy = sum(dy) / m
        sxx = sum((v - mean_yl) ** 2 for v in yl)
        gamma = sum((a - mean_yl) * (b - mean_dy) for a, b in zip(yl, dy)) / sxx
        alpha = mean_dy - gamma * mean_yl
        rss = sum((b - alpha - gamma * a) ** 2 for a, b in zip(yl, dy))
        se = math.sqrt(rss / (m - 2) / sxx)
        tau = gamma / se
        assert abs(row["tau_e4"] / 1e4 - tau) < 2e-3
        assert row["stationary_5pct"] == int(row["tau_e4"] < -28990)


class TestEngleGranger:
    def test_two_step_recompute(self, spark, sf_dir):
        import math

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["forecast_engle_granger_cointegration"](
            spark, sf_dir
        ).collect()[0]
        months = (
            load(spark, sf_dir, "orders")
            .groupBy(
                (
                    (F.year("o_orderdate") - 1992) * 12
                    + F.month("o_orderdate")
                ).alias("t")
            )
            .agg(
                F.expr(
                    "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100"
                    " AS BIGINT)) DIV 100000 AS BIGINT)"
                ).alias("y"),
                F.sum(
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
                ).alias("x"),
            )
            .collect()
        )
        pts = sorted((r["t"], r["y"], r["x"]) for r in months)
        m0 = len(pts)
        sx = sum(x for _, _, x in pts)
        sxx = sum(x * x for _, _, x in pts)
        sy = sum(y for _, y, _ in pts)
        sxy = sum(x * y for _, y, x in pts)
        D = m0 * sxx - sx * sx
        ed = [D * y - (sy * sxx - sx * sxy) - (m0 * sxy - sx * sy) * x
              for _, y, x in pts]
        scale = max(max(abs(v) for v in ed) // 1000000, 1)
        # Spark/DuckDB DIV truncates toward zero; Python // floors —
        # mirror truncation for negatives
        e = [int(v / scale) for v in ed]
        dy = [b - a for a, b in zip(e, e[1:])]
        el = e[:-1]
        m = len(dy)
        assert row["n_pairs"] == m
        mean_el = sum(el) / m
        mean_dy = sum(dy) / m
        sxx2 = sum((v - mean_el) ** 2 for v in el)
        gamma = sum((a - mean_el) * (b - mean_dy) for a, b in zip(el, dy)) / sxx2
        alpha = mean_dy - gamma * mean_el
        rss = sum((b - alpha - gamma * a) ** 2 for a, b in zip(el, dy))
        tau = gamma / math.sqrt(rss / (m - 2) / sxx2)
        assert abs(row["tau_e4"] / 1e4 - tau) < 2e-3
        assert row["cointegrated_5pct"] == int(row["tau_e4"] < -33700)


class TestSprtBoundary:
    def test_walk_recompute(self, spark, sf_dir):
        import hashlib

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.behavior import (
            SPRT_L_CONV,
            SPRT_L_MISS,
            SPRT_LOWER,
            SPRT_UPPER,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["ab_sprt_sequential_boundary"](
            spark, sf_dir
        ).collect()[0]
        ev = (
            load(spark, sf_dir, "events")
            .select("event_id", "ts", "user_id", "event_type")
            .collect()
        )
        arm = [
            r
            for r in ev
            if hashlib.md5(f"sprt:{r['user_id']}".encode()).hexdigest()[:8]
            < "80000000"
        ]
        arm.sort(key=lambda r: (r["ts"], r["event_id"]))
        cum = 0
        decision, n_dec, llr_dec = "continue", len(arm), None
        for i, r in enumerate(arm, 1):
            cum += SPRT_L_CONV if r["event_type"] == "purchase" else SPRT_L_MISS
            if cum >= SPRT_UPPER or cum <= SPRT_LOWER:
                decision = "accept_h1" if cum >= SPRT_UPPER else "accept_h0"
                n_dec, llr_dec = i, cum
                break
        if decision == "continue":
            llr_dec = cum
        assert row["decision"] == decision
        assert row["n_at_decision"] == n_dec
        assert row["llr_e12"] == llr_dec
        assert row["n_available"] == len(arm)
        assert 0 < row["sample_used_bp"] <= 10000


class TestUcb1Allocation:
    def test_scores_and_argmax(self, spark, sf_dir):
        import math

        rows = registry.QUERIES["bandit_ucb1_allocation"](spark, sf_dir).collect()
        assert {r["arm"] for r in rows} <= {"click", "view", "signup", "error"}
        big_n = sum(r["n"] for r in rows)
        for r in rows:
            assert 0 <= r["successes"] <= r["n"]
            want = math.floor(
                (r["successes"] / r["n"] + math.sqrt(2 * math.log(big_n) / r["n"]))
                * 1e4
                + 0.5
            )
            assert abs(r["ucb1_e4"] - want) <= 1  # libm ln ulp tolerance
            # optimism: UCB never below the empirical mean
            assert r["ucb1_e4"] >= r["mean_bp"]
        winners = [r for r in rows if r["play_next"] == 1]
        assert len(winners) == 1
        best = max(rows, key=lambda r: (r["ucb1_e4"], ))
        assert winners[0]["ucb1_e4"] == best["ucb1_e4"]


class TestSsPolicyReplay:
    def test_python_replay(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.aggregates import SS_N_MONTHS
        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            r["brand"]: r
            for r in registry.QUERIES["inventory_ss_policy_replay"](
                spark, sf_dir
            ).collect()
        }
        demand = (
            load(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            )
            .join(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .groupBy(
                "p_brand",
                (
                    (F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate")
                ).alias("m"),
            )
            .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("d"))
            .collect()
        )
        from collections import defaultdict

        per = defaultdict(dict)
        for r in demand:
            per[r["p_brand"]][r["m"]] = r["d"]
        for brand, dm in per.items():
            v = [dm.get(m, 0) for m in range(1, SS_N_MONTHS + 1)]
            cap = 2 * sum(v) // SS_N_MONTHS
            inv, orders, lost, served = cap, 0, 0, 0
            for d in v:
                if inv < cap // 2:
                    inv = cap
                    orders += 1
                take = min(inv, d)
                served += take
                lost += d - take
                inv -= take
            r = rows[brand]
            assert r["cap_s"] == cap
            assert r["end_inventory"] == inv
            assert r["n_orders"] == orders
            assert r["stockout_units"] == lost
            assert r["served"] == served
            assert r["served"] + r["stockout_units"] == sum(v)


class TestNewsvendorFractile:
    def test_fractile_beats_median_in_aggregate(self, spark, sf_dir):
        rows = registry.QUERIES["inventory_newsvendor_fractile"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            # the 75th-percentile stock is at least the median stock
            assert r["q_star"] >= r["q_median"]
            assert r["uplift"] == r["profit_star"] - r["profit_med"]
        # with cu=3 co=1 the fractile rule should win overall on the
        # very months it was fit on (in-sample optimality tendency)
        assert sum(r["uplift"] for r in rows) >= 0


class TestEoq:
    def test_wilson_formula(self, spark, sf_dir):
        import math

        from leadsight_sales_agent_spark.operators.aggregates import (
            EOQ_HOLD_CENTS_PER_UNIT_YEAR,
            EOQ_ORDER_COST_CENTS,
        )

        rows = registry.QUERIES["inventory_eoq_per_brand"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            want = math.floor(
                math.sqrt(
                    2.0 * r["annual_d"] * EOQ_ORDER_COST_CENTS
                    / EOQ_HOLD_CENTS_PER_UNIT_YEAR
                )
                + 0.5
            )
            assert r["eoq_units"] == want
            assert r["orders_per_year"] == -(-r["annual_d"] // r["eoq_units"])
            # EOQ optimality: at Q* annual order cost ~ holding cost —
            # meaningful only when the cadence isn't ceil-dominated
            if r["orders_per_year"] >= 5:
                k_cost = r["orders_per_year"] * EOQ_ORDER_COST_CENTS
                h_cost = r["eoq_units"] * EOQ_HOLD_CENTS_PER_UNIT_YEAR // 2
                assert abs(k_cost - h_cost) < 0.25 * max(k_cost, h_cost)


class TestBurnAlerts:
    def test_alert_semantics(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = registry.QUERIES["ops_multiwindow_burn_alerts"](
            spark, sf_dir
        ).collect()
        # every page alert satisfies both window conditions
        for r in rows:
            assert r["page"] == 1 or r["ticket"] == 1
            if r["page"] == 1:
                assert r["errors_1h"] * 1000 > 144 * r["events_1h"]
                assert r["errors_5m"] * 1000 > 144 * r["events_5m"]
        # alert minutes are a subset of observed minutes
        minutes = {
            r[0]
            for r in load(spark, sf_dir, "events")
            .select(F.expr("CAST(unix_timestamp(ts) DIV 60 AS BIGINT)"))
            .distinct()
            .collect()
        }
        assert {r["minute_idx"] for r in rows} <= minutes


class TestMerkleDiff:
    def test_finds_exactly_the_planted_rows(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.relational import (
            MERKLE_MUT_MOD,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["replication_merkle_diff"](spark, sf_dir).collect()[0]
        o = load(spark, sf_dir, "orders")
        n_total = o.count()
        planted = o.filter(F.col("o_orderkey") % MERKLE_MUT_MOD == 0).count()
        assert row["n_rows_divergent"] == planted
        assert row["n_diverged_buckets"] <= planted  # ≥1 plant per bucket
        assert 0 < row["n_rows_compared"] < n_total
        # the digest exchange saves almost all row comparisons
        assert row["rows_compared_bp"] < 2000


class TestTokenBucketReplay:
    def test_python_replay(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.operators.windows import (
            TB_CAPACITY,
            TB_REFILL_S,
        )
        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["ops_token_bucket_replay"](spark, sf_dir).collect()[0]
        ev = sorted(
            load(spark, sf_dir, "events")
            .select(
                "user_id",
                "event_id",
                "ts",
                F.unix_timestamp("ts").alias("es"),
            )
            .collect(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        from collections import defaultdict

        per = defaultdict(list)
        for r in ev:
            per[r["user_id"]].append(r["es"])
        adm = rej = throttled = 0
        for _, times in per.items():
            tokens, t_last, a, j = TB_CAPACITY, times[0], 0, 0
            for t in times:
                refill = (t - t_last) // TB_REFILL_S
                tokens = min(TB_CAPACITY, tokens + refill)
                t_last += refill * TB_REFILL_S
                if tokens >= 1:
                    tokens -= 1
                    a += 1
                else:
                    j += 1
            adm += a
            rej += j
            throttled += j > 0
        assert row["n_users"] == len(per)
        assert row["total_admitted"] == adm
        assert row["total_rejected"] == rej
        assert row["users_throttled"] == throttled
        assert row["total_admitted"] + row["total_rejected"] == len(ev)


class TestTCloseness:
    def test_emd_recompute(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        rows = {
            (r["segment"], r["nation"]): r
            for r in registry.QUERIES["dq_t_closeness_audit"](
                spark, sf_dir
            ).collect()
        }
        raw = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .join(
                load(spark, sf_dir, "nation"),
                F.col("n_nationkey") == F.col("c_nationkey"),
            )
            .select(
                "c_mktsegment",
                "n_name",
                F.substring("o_orderpriority", 1, 1).cast("int").alias("s"),
            )
            .collect()
        )
        from collections import Counter, defaultdict

        per = defaultdict(Counter)
        tot = Counter()
        for r in raw:
            per[(r["c_mktsegment"], r["n_name"])][r["s"]] += 1
            tot[r["s"]] += 1
        n = sum(tot.values())
        for key, cnt in per.items():
            n_g = sum(cnt.values())
            S = 0
            cg = ca = 0
            for k in range(1, 5):
                cg += cnt[k]
                ca += tot[k]
                S += abs(cg * n - ca * n_g)
            D = n_g * n * 4
            want = (2 * 10000 * S + D) // (2 * D)
            r = rows[key]
            assert r["n_rows"] == n_g
            assert r["emd_bp"] == want
            assert r["breaches_t"] == int(want > 2000)


class TestPrivacyReleaseGate:
    def test_gate_consistency(self, spark, sf_dir):
        rows = registry.QUERIES["privacy_release_gate"](spark, sf_dir).collect()
        assert rows
        tc = {
            (r["segment"], r["nation"]): r["emd_bp"]
            for r in registry.QUERIES["dq_t_closeness_audit"](
                spark, sf_dir
            ).collect()
        }
        for r in rows:
            want = int(
                r["group_size"] >= 5
                and r["n_sensitive_values"] >= 3
                and r["emd_bp"] <= 2000
            )
            assert r["releasable"] == want
            # t leg equals the registered stage's value
            assert r["emd_bp"] == tc[(r["segment"], r["nation"])]
            assert 1 <= r["n_sensitive_values"] <= 5


class TestLogRank:
    def test_lifelines_free_recompute(self, spark, sf_dir):
        import hashlib
        import math

        import pyspark.sql.functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        row = registry.QUERIES["survival_logrank_test"](spark, sf_dir).collect()[0]
        ev = load(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts"
        ).collect()
        from collections import defaultdict

        per = defaultdict(list)
        for r in ev:
            per[r["user_id"]].append((r["ts"], r["event_type"]))
        spells = []
        for uid, evs in per.items():
            sign = [t for t, k in evs if k == "signup"]
            if not sign:
                continue
            t0 = min(sign)
            purch = [t for t, k in evs if k == "purchase" and t > t0]
            last = max(t for t, _ in evs)
            arm = (
                1
                if hashlib.md5(f"lr:{uid}".encode()).hexdigest()[:8] < "80000000"
                else 0
            )
            if purch:
                spells.append((arm, 1, (min(purch).date() - t0.date()).days))
            else:
                spells.append((arm, 0, (last.date() - t0.date()).days))
        times = sorted({d for a, died, d in spells if died})
        o1 = 0
        e1 = 0.0
        v = 0.0
        for t in times:
            n1 = sum(1 for a, _, d in spells if a == 1 and d >= t)
            n0 = sum(1 for a, _, d in spells if a == 0 and d >= t)
            d1 = sum(1 for a, died, d in spells if a == 1 and died and d == t)
            d0 = sum(1 for a, died, d in spells if a == 0 and died and d == t)
            n, d = n1 + n0, d1 + d0
            o1 += d1
            e1 += round(n1 * d / n, 6)
            if n > 1:
                v += round(d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1), 6)
        assert row["observed_arm1"] == o1
        assert row["expected_arm1_e4"] == math.floor(e1 * 1e4 + 0.5)
        chi2 = (o1 - e1) ** 2 / v
        assert abs(row["chi2_e4"] / 1e4 - chi2) < 1e-3
        assert row["curves_differ_5pct"] == int(row["chi2_e4"] > 38415)
