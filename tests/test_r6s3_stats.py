"""Independent-reference pins for the session-3 statistics wave.

The oracle gate proves Spark == DuckDB; these prove both match a THIRD,
dumb-but-obviously-correct Python implementation (Fractions / brute
loops) — the defense against a shared misreading of a statistic
landing in both engines. Pattern follows tests/test_session4_ops.py.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction as Fr

from pyspark.sql import functions as F

from leadsight_sales_agent_spark import registry
from leadsight_sales_agent_spark.sources.catalog import load

registry.load_all()


def _seg_cents(spark, sf_dir, segs=None):
    j = (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            (F.col("o_totalprice").cast("decimal(25,2)") * 100)
            .cast("bigint")
            .alias("cents"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    if segs:
        j = j.filter(F.col("seg").isin(*segs))
    out = defaultdict(list)
    for r in j.collect():
        out[r.seg].append(r.cents)
    return out


class TestAnovaF:
    def test_matches_fraction_exact_textbook(self, spark, sf_dir):
        groups = _seg_cents(spark, sf_dir)
        allv = [v for g in groups.values() for v in g]
        n, k = len(allv), len(groups)
        gm = Fr(sum(allv), n)
        ssb = sum(len(g) * (Fr(sum(g), len(g)) - gm) ** 2 for g in groups.values())
        sst = sum((Fr(v) - gm) ** 2 for v in allv)
        ssw = sst - ssb
        f_exact = float(ssb * (n - k) / (ssw * (k - 1)))
        row = registry.QUERIES["eval_anova_f_oneway"](spark, sf_dir).collect()[0]
        assert row.n_orders == n and row.k_groups == k
        # device rounding on SS terms is <= 1 cents^2 per group — far
        # below the 1e-4 relative grain of f_bp
        assert abs(row.f_bp / 1e4 - f_exact) <= max(2e-4 * f_exact, 3e-4)
        # r14: wide SS terms are reported as exact (hi15, lo15) limb
        # pairs (w = hi*10^15 + lo) so no report column exceeds 2^53
        M = 10**15
        ssb_rep = row.ssb_c2_hi15 * M + row.ssb_c2_lo15
        ssw_rep = row.ssw_c2_hi15 * M + row.ssw_c2_lo15
        assert abs(ssb_rep - float(ssb)) <= k + 1
        assert abs(ssw_rep - float(ssw)) <= k + 2
        for v in (
            row.s1_centered, row.s2_hi15, row.s2_lo15,
            row.ssb_terms_hi15, row.ssb_terms_lo15,
            row.ssb_c2_hi15, row.ssb_c2_lo15,
            row.ssw_c2_hi15, row.ssw_c2_lo15,
            row.eta2_num_hi15, row.eta2_num_lo15,
            row.eta2_den_hi15, row.eta2_den_lo15,
        ):
            assert isinstance(v, int) and abs(v) < 2**53
        # term-consistency: the device operands recombine from the
        # reported SS limbs (eta2 num = 2e4*ssb + sst; den = 2*sst)
        s2_rep = row.s2_hi15 * M + row.s2_lo15
        sst_rep = s2_rep - row.s1_centered**2 // row.n_orders
        assert row.eta2_num_hi15 * M + row.eta2_num_lo15 == (
            20000 * ssb_rep + sst_rep
        )
        assert row.eta2_den_hi15 * M + row.eta2_den_lo15 == 2 * sst_rep
        assert ssb_rep + ssw_rep == sst_rep


class TestBrownForsythe:
    def test_matches_brute_force(self, spark, sf_dir):
        groups = _seg_cents(spark, sf_dir)
        zg = {}
        for s, vals in groups.items():
            sv = sorted(vals)
            med = sv[(len(sv) + 1) // 2 - 1]  # lower median ELEMENT
            zg[s] = [abs(v - med) for v in vals]
        allz = [z for g in zg.values() for z in g]
        n, k = len(allz), len(zg)
        gm = Fr(sum(allz), n)
        ssb = sum(len(g) * (Fr(sum(g), len(g)) - gm) ** 2 for g in zg.values())
        sst = sum((Fr(z) - gm) ** 2 for z in allz)
        f_exact = float(ssb * (n - k) / ((sst - ssb) * (k - 1)))
        row = registry.QUERIES["eval_brown_forsythe_levene"](spark, sf_dir).collect()[0]
        assert row.n_orders == n
        assert abs(row.f_bp / 1e4 - f_exact) <= max(2e-4 * f_exact, 3e-4)
        # r14: SS terms as (hi15, lo15) limb pairs — every report
        # column BIGINT under 2^53, recombining to the brute values
        M = 10**15
        ssb_rep = row.ssb_z2_hi15 * M + row.ssb_z2_lo15
        ssw_rep = row.ssw_z2_hi15 * M + row.ssw_z2_lo15
        assert abs(ssb_rep - float(ssb)) <= k + 1
        assert abs(ssw_rep - float(sst - ssb)) <= k + 2
        for v in (row.s1_centered, row.s2_hi15, row.s2_lo15,
                  row.ssb_terms_hi15, row.ssb_terms_lo15):
            assert isinstance(v, int) and abs(v) < 2**53


class TestWelchT:
    def test_matches_float_textbook(self, spark, sf_dir):
        groups = _seg_cents(spark, sf_dir, segs=("BUILDING", "MACHINERY"))
        a, b = groups["BUILDING"], groups["MACHINERY"]

        def mv(x):
            m = sum(x) / len(x)
            v = sum((xi - m) ** 2 for xi in x) / (len(x) - 1)
            return m, v

        ma, va = mv(a)
        mb, vb = mv(b)
        se2 = va / len(a) + vb / len(b)
        t = (ma - mb) / math.sqrt(se2)
        df = se2 * se2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        row = registry.QUERIES["eval_welch_t_test"](spark, sf_dir).collect()[0]
        assert row.n_a == len(a) and row.n_b == len(b)
        assert abs(row.t_welch_e4 / 1e4 - t) <= 2e-3
        assert abs(row.df_welch_e2 / 1e2 - df) <= max(1e-4 * df, 0.02)
        assert abs(row.mean_diff_cents_e2 / 1e2 - (ma - mb)) <= 0.02


class TestFriedman:
    def test_matches_brute_ranks_exactly(self, spark, sf_dir):
        cells = (
            load(spark, sf_dir, "orders")
            .groupBy(
                F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
                F.col("o_orderpriority").alias("prio"),
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("v")
            )
            .collect()
        )
        blocks = defaultdict(dict)
        for r in cells:
            blocks[r.mon][r.prio] = r.v
        complete = {m: d for m, d in blocks.items() if len(d) == 5}
        r2 = Counter()
        for d in complete.values():
            vals = sorted(d.values())
            for prio, v in d.items():
                lo = sum(1 for x in vals if x < v)
                t = sum(1 for x in vals if x == v)
                r2[prio] += 2 * lo + t + 1  # half-unit average rank
        n, k = len(complete), 5
        sr2 = sum(x * x for x in r2.values())
        num = 3 * sr2 - 3 * n * n * k * (k + 1) * (k + 1)
        den = n * k * (k + 1)
        chi2_bp = (2 * num * 10000 + den) // (2 * den)
        row = registry.QUERIES["eval_friedman_blocked_ranks"](spark, sf_dir).collect()[0]
        assert row.n_blocks == n
        assert row.chi2_bp == chi2_bp  # device is exact -> integer equality


class TestEffectSizes:
    def test_matches_fraction_chi2(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .groupBy("o_orderpriority", "c_mktsegment")
            .count()
            .collect()
        )
        o = {(r.o_orderpriority, r.c_mktsegment): r["count"] for r in rows}
        rr = Counter()
        cc = Counter()
        for (p, s), v in o.items():
            rr[p] += v
            cc[s] += v
        n = sum(o.values())
        chi2 = sum(
            (Fr(v * n - rr[p] * cc[s]) ** 2) / Fr(n * rr[p] * cc[s])
            for (p, s), v in o.items()
        )
        v_stat = math.sqrt(float(chi2) / (n * (min(len(rr), len(cc)) - 1)))
        row = registry.QUERIES["eval_effect_size_contingency"](spark, sf_dir).collect()[0]
        assert row.n_orders == n
        assert abs(row.chi2_micro / 1e6 - float(chi2)) <= 25e-6 + 1e-9 * float(chi2)
        assert abs(row.cramers_v_e4 / 1e4 - v_stat) <= 2e-4


class TestPercentileCont:
    def test_matches_numpy_linear(self, spark, sf_dir):
        import numpy as np

        vals = defaultdict(list)
        for r in (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderpriority",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .collect()
        ):
            vals[r.o_orderpriority].append(r.cents)
        out = {
            r.o_orderpriority: r
            for r in registry.QUERIES["agg_percentile_cont_exact"](
                spark, sf_dir
            ).collect()
        }
        for prio, xs in vals.items():
            row = out[prio]
            for p, col in ((50, "p50_microcents"), (90, "p90_microcents"), (99, "p99_microcents")):
                want = float(np.percentile(np.array(xs, dtype=float), p))
                assert abs(row[col] / 1e6 - want) < 1e-3, (prio, p)


class TestDDSketch:
    def test_relative_error_contract(self, spark, sf_dir):
        row = registry.QUERIES["sketch_ddsketch_quantiles"](spark, sf_dir).collect()[0]
        # geometric-midpoint estimate of a gamma=1.02 bucket is within
        # sqrt(gamma)-1 ~ 1% of any value in the bucket
        for p in (50, 95, 99):
            assert row[f"rel_err_p{p}_bp"] <= 150, p
            est = row[f"est_p{p}_e2"] / 100
            exact = row[f"exact_p{p}_cents"]
            assert exact / 1.021 <= est <= exact * 1.021, p


class TestHits:
    def test_matches_integer_brute_force(self, spark, sf_dir):
        w_rows = (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey")
            .join(
                load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .join(
                load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(
                load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("s_nationkey", "c_nationkey")
            .count()
            .collect()
        )
        nat = {
            r.n_nationkey: r.n_name
            for r in load(spark, sf_dir, "nation").collect()
        }
        w = {(r.s_nationkey, r.c_nationkey): r["count"] for r in w_rows}
        nodes = sorted(nat)
        a = {u: 1_000_000 for u in nodes}

        def norm(x):
            mx = max(x.values())
            return {u: (v * 1_000_000) // mx for u, v in x.items()}

        for _ in range(3):
            h = norm(
                {
                    s: sum(w.get((s, c), 0) * a[c] for c in nodes)
                    for s in nodes
                }
            )
            a = norm(
                {
                    c: sum(w.get((s, c), 0) * h[s] for s in nodes)
                    for c in nodes
                }
            )
        got = {
            r.n_name: (r.hub_ppm, r.auth_ppm)
            for r in registry.QUERIES["graph_hits_hubs_authorities"](
                spark, sf_dir
            ).collect()
        }
        for u in nodes:
            assert got[nat[u]] == (h[u], a[u]), nat[u]


class TestJarqueBera:
    def test_matches_float_textbook(self, spark, sf_dir):
        vals = defaultdict(list)
        for r in (
            load(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select(
                "event_type",
                (F.col("value").cast("decimal(25,2)") * 100).cast("long").alias("c"),
            )
            .collect()
        ):
            vals[r.event_type].append(r.c)
        rows = {
            r.event_type: r
            for r in registry.QUERIES["eval_jarque_bera_normality"](
                spark, sf_dir
            ).collect()
        }
        for et, xs in vals.items():
            n = len(xs)
            m = sum(xs) / n
            m2 = sum((x - m) ** 2 for x in xs) / n
            m3 = sum((x - m) ** 3 for x in xs) / n
            m4 = sum((x - m) ** 4 for x in xs) / n
            skew = m3 / m2**1.5
            kurt = m4 / m2**2 - 3
            jb = n / 6 * (skew**2 + kurt**2 / 4)
            assert abs(rows[et].jb_e2 / 100 - jb) <= max(1e-6 * jb, 0.02), et
            assert rows[et].reject_normal_5pct == (1 if jb > 5.991464547107979 else 0)


class TestPrivacyComposition:
    def test_matches_formula(self, spark, sf_dir):
        rows = registry.QUERIES["privacy_budget_composition"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            k = r.k_releases
            assert r.eps_basic_e6 == k * 100_000
            adv = 0.1 * math.sqrt(2 * k * math.log(1e6)) + k * 0.1 * (
                math.exp(0.1) - 1
            )
            rho = k * 0.005
            zcdp = rho + 2 * math.sqrt(rho * math.log(1e6))
            assert abs(r.eps_advanced_e6 / 1e6 - adv) <= 2e-6
            assert abs(r.eps_zcdp_e6 / 1e6 - zcdp) <= 2e-6
            best = min(
                ("basic", r.eps_basic_e6),
                ("advanced", r.eps_advanced_e6),
                ("zcdp", r.eps_zcdp_e6),
                key=lambda t: t[1],
            )[0]
            # tie-break order in the query: basic, then advanced
            if r.eps_basic_e6 <= r.eps_advanced_e6 and r.eps_basic_e6 <= r.eps_zcdp_e6:
                best = "basic"
            elif r.eps_advanced_e6 <= r.eps_zcdp_e6:
                best = "advanced"
            else:
                best = "zcdp"
            assert r.tightest_bound == best


class TestSemDeDup:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        """Cells, greedy-by-id drops, and per-cell counts recomputed
        from raw embeddings in pure Python — exact integer equality."""
        import hashlib
        from decimal import Decimal

        from leadsight_sales_agent_spark.operators.dedup import (
            SEMD_COS_E4,
            semd_bits,
        )

        rows = (
            load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
        )
        embs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
        dim = len(next(iter(embs.values())))
        # r8: bits now derive from the corpus count (independent Python
        # twin of the shared SQL integer expression)
        SEMD_BITS = semd_bits(len(embs))

        def sign(k, i):
            h = hashlib.md5(f"sd:{k}:{i}".encode()).hexdigest()
            return 1 if h[0] < "8" else -1

        cells = {}
        for vid, e in embs.items():
            cell = 0
            for k in range(1, SEMD_BITS + 1):
                c = sum(
                    sign(k, i + 1) * Decimal(repr(x)).quantize(Decimal("1e-9"))
                    for i, x in enumerate(e)
                )
                if c > 0:
                    cell |= 1 << (k - 1)
            cells[vid] = cell

        def fold_dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += x * y
            return acc

        import math

        nrm = {v: math.sqrt(fold_dot(e, e)) for v, e in embs.items()}
        by_cell = {}
        for v, c in cells.items():
            by_cell.setdefault(c, []).append(v)
        summary = {}
        for c, vids in by_cell.items():
            vids = sorted(vids)
            drops, pairs = set(), 0
            for i, a in enumerate(vids):
                for b in vids[i + 1:]:
                    cos = fold_dot(embs[a], embs[b]) / (nrm[a] * nrm[b])
                    if math.floor(cos * 1e4 + 0.5) >= SEMD_COS_E4:
                        pairs += 1
                        drops.add(b)
            n = len(vids)
            keep_bp = (2 * (n - len(drops)) * 10000 + n) // (2 * n)
            summary[c] = (n, len(drops), pairs, keep_bp)
        got = {
            r.cell_id: (r.n_vectors, r.n_dropped, r.n_dup_pairs, r.keep_rate_bp)
            for r in registry.QUERIES["dedup_semantic_semdedup"](
                spark, sf_dir
            ).collect()
        }
        assert got == summary
        assert dim == 64

    def test_cell_count_scales_with_corpus(self):
        """r8 (r7 verdict's weak item): the bit count must grow with the
        corpus so expected per-cell population stays bounded — a fixed
        bit count makes the in-cell pair join quadratic at scale."""
        from leadsight_sales_agent_spark.operators.dedup import (
            SEMD_MAX_BITS,
            SEMD_MIN_BITS,
            SEMD_TARGET_CELL,
            semd_bits,
        )

        # the floor holds the historical 16-cell layout on small corpora
        assert semd_bits(1) == SEMD_MIN_BITS
        assert semd_bits(2000) == SEMD_MIN_BITS  # sf0.1 embeddings
        assert semd_bits(SEMD_TARGET_CELL * 2**SEMD_MIN_BITS) == SEMD_MIN_BITS
        # exact powers land exactly; one more vector adds a bit
        for e in range(SEMD_MIN_BITS + 1, SEMD_MAX_BITS + 1):
            n = SEMD_TARGET_CELL * 2**e
            assert semd_bits(n) == e
            assert n / 2**semd_bits(n) == SEMD_TARGET_CELL
            assert semd_bits(n + 1) == min(e + 1, SEMD_MAX_BITS)
        # expected cell population is bounded by the target everywhere
        # below the clamp (and within 2x above the halfway point)
        for n in (10_000, 123_456, 10**6, 10**8, 10**9, 10**11):
            b = semd_bits(n)
            if b < SEMD_MAX_BITS:
                assert n / 2**b <= SEMD_TARGET_CELL
                assert n / 2**b > SEMD_TARGET_CELL / 2
        # the clamp engages only past ~10^12 vectors
        assert semd_bits(SEMD_TARGET_CELL * 2**40) == SEMD_MAX_BITS

    def test_python_sql_bit_rules_agree(self, spark):
        """The Spark SQL, DuckDB SQL, and Python forms of the bit rule
        are three spellings of one integer function — pin them equal on
        a ladder spanning the floor, the growth regime, and the clamp."""
        import duckdb

        from leadsight_sales_agent_spark.operators.dedup import (
            _SEMD_BITS_DUCK,
            _SEMD_BITS_SPARK,
            semd_bits,
        )

        duck_expr = _SEMD_BITS_DUCK.replace("count(*)", "n_corpus")
        for n in (1, 500, 2000, 16_384, 16_385, 10**6, 10**9,
                  1024 * 2**30, 1024 * 2**31):
            spark_bits = spark.sql(
                f"SELECT {_SEMD_BITS_SPARK} AS b"
                f" FROM (SELECT CAST({n} AS BIGINT) AS n_corpus)"
            ).collect()[0].b
            duck_bits = duckdb.sql(
                f"SELECT {duck_expr} AS b"
                f" FROM (SELECT CAST({n} AS BIGINT) AS n_corpus)"
            ).fetchone()[0]
            assert spark_bits == duck_bits == semd_bits(n), n

    def test_max_cell_population_bounded_at_sf01(self, spark):
        """Pin the actual sf0.1 cell-population distribution: with the
        4-bit floor the 2000 sf0.1 vectors spread over 16 cells, and no
        cell may exceed the scale target that the data-driven rule
        guarantees in expectation past the floor."""
        from leadsight_sales_agent_spark.operators.dedup import (
            SEMD_TARGET_CELL,
            semd_bits,
        )

        got = registry.QUERIES["dedup_semantic_semdedup"](
            spark, "/root/testdata/sf0.1"
        ).collect()
        assert len(got) <= 2 ** semd_bits(2000)
        assert sum(r.n_vectors for r in got) == 2000
        assert max(r.n_vectors for r in got) <= SEMD_TARGET_CELL


class TestCochranQ:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull() & F.col("props").isNotNull())
            .select("event_type", "value", F.minute("ts").alias("mi"),
                    F.length("props").alias("pl"))
            .collect()
        )
        recs = []
        for r in rows:
            y = 1 if r.event_type == "purchase" else 0
            p1 = 1 if float(r.value) >= 50.0 else 0
            p2 = 1 if r.mi < 30 else 0
            p3 = 1 if r.pl % 2 == 0 else 0
            recs.append((int(p1 == y), int(p2 == y), int(p3 == y)))
        s1 = sum(g[0] for g in recs)
        s2 = sum(g[1] for g in recs)
        s3 = sum(g[2] for g in recs)
        sl = sum(sum(g) for g in recs)
        sl2 = sum(sum(g) ** 2 for g in recs)
        num = 2 * (3 * (s1 * s1 + s2 * s2 + s3 * s3) - (s1 + s2 + s3) ** 2)
        den = 3 * sl - sl2
        q_bp = (2 * num * 10000 + den) // (2 * den)
        row = registry.QUERIES["eval_cochran_q"](spark, sf_dir).collect()[0]
        assert (row.n_items, row.correct_m1, row.correct_m2, row.correct_m3) == (
            len(recs), s1, s2, s3,
        )
        assert row.q_bp == q_bp
        assert row.models_differ_5pct == (1 if num / den > 5.991464547107979 else 0)


class TestPowerMde:
    def test_matches_float_textbook(self, spark, sf_dir):
        groups = _seg_cents(spark, sf_dir)
        rows = {
            r.segment: r
            for r in registry.QUERIES["ab_power_mde_planner"](spark, sf_dir).collect()
        }
        for seg, xs in groups.items():
            n = len(xs)
            m = sum(xs) / n
            var = sum((x - m) ** 2 for x in xs) / (n - 1)
            mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
                2 * var / (n / 2)
            )
            r = rows[seg]
            assert r.n_orders == n
            assert abs(r.mde_cents - mde) <= 1.0, seg
            assert abs(r.mde_rel_bp / 1e4 - mde / m) <= 2e-4, seg


class TestCacheReplay:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        """Replay both policies in pure Python from the raw event
        stream — exact hit-count equality, plus the Belady-dominance
        invariant per user."""
        rows = (
            load(spark, sf_dir, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        by_user = defaultdict(list)
        for r in rows:
            by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
        SENT = 1_000_000_000
        tot = {"lh": 0, "lm": 0, "bh": 0, "bm": 0}
        for seq in by_user.values():
            seq.sort()
            items = [t[2] for t in seq]
            nxt = []
            last = {}
            for i, it in enumerate(items):
                nxt.append(SENT)
                if it in last:
                    nxt[last[it]] = i + 1
                last[it] = i
            # LRU, capacity 2
            s1 = s2 = None
            lh = lm = 0
            for it in items:
                if it == s1 or it == s2:
                    lh += 1
                    s1, s2 = it, (s2 if it == s1 else s1)
                else:
                    lm += 1
                    s1, s2 = it, s1
            # Belady, capacity 2 (evict larger next-use; tie -> slot 1)
            b1 = b2 = None
            n1 = n2 = 2_000_000_000
            bh = bm = 0
            for i, it in enumerate(items):
                nx = nxt[i]
                if it == b1:
                    bh += 1
                    b1, n1 = it, nx
                elif it == b2:
                    bh += 1
                    b1, n1, b2, n2 = it, nx, b1, n1
                else:
                    bm += 1
                    if n1 >= n2:
                        b1, n1, b2, n2 = it, nx, b2, n2
                    else:
                        b1, n1, b2, n2 = it, nx, b1, n1
            assert bh >= lh  # clairvoyant MIN dominates
            tot["lh"] += lh
            tot["lm"] += lm
            tot["bh"] += bh
            tot["bm"] += bm
        row = registry.QUERIES["ops_cache_belady_vs_lru"](spark, sf_dir).collect()[0]
        assert row.n_users == len(by_user)
        assert (row.lru_hits, row.belady_hits) == (tot["lh"], tot["bh"])
        assert row.n_accesses == tot["lh"] + tot["lm"]
        assert row.gap_bp >= 0


class TestPageTrend:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        cells = (
            load(spark, sf_dir, "orders")
            .groupBy(
                F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
                F.col("o_orderpriority").alias("prio"),
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("v")
            )
            .collect()
        )
        blocks = defaultdict(dict)
        for r in cells:
            blocks[r.mon][r.prio] = r.v
        complete = [d for d in blocks.values() if len(d) == 5]
        prios = sorted({p for d in complete for p in d})
        r2 = Counter()
        for d in complete:
            vals = sorted(d.values())
            for prio, v in d.items():
                lo = sum(1 for x in vals if x < v)
                t = sum(1 for x in vals if x == v)
                r2[prio] += 2 * lo + t + 1
        n, k = len(complete), 5
        l2 = sum((i + 1) * r2[p] for i, p in enumerate(prios))
        e2 = n * k * (k + 1) ** 2 / 2
        v2 = n * k * k * (k + 1) ** 2 * (k - 1) / 36
        z = (l2 - e2) / math.sqrt(v2)
        row = registry.QUERIES["eval_page_trend_test"](spark, sf_dir).collect()[0]
        assert (row.n_blocks, row.page_l2) == (n, l2)
        assert abs(row.z_e4 / 1e4 - z) <= 2e-4
        assert row.trend_5pct == (1 if abs(z) > 1.959963984540054 else 0)


class TestHurstRS:
    def test_matches_brute_force(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "orders")
            .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mon"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("v")
            )
            .orderBy("mon")
            .collect()
        )
        series = [r.v for r in rows]
        got = registry.QUERIES["timeseries_hurst_rs"](spark, sf_dir).collect()[0]
        assert got.n_months == len(series)
        legs = {}
        for m in (8, 16, 32):
            rs_micro, nb = 0, 0
            for b in range(len(series) // m):
                xs = series[b * m:(b + 1) * m]
                sm = sum(xs)
                cum, zs = 0, []
                for t, x in enumerate(xs, start=1):
                    cum += x
                    zs.append(m * cum - t * sm)
                r_scaled = max(zs) - min(zs)
                s2 = m * sum(x * x for x in xs) - sm * sm
                rs_micro += math.floor(r_scaled / math.sqrt(s2) * 1e6 + 0.5)
                nb += 1
            legs[m] = (nb, rs_micro)
        assert (got.nb8, got.rs8) == legs[8]
        assert (got.nb16, got.rs16) == legs[16]
        assert (got.nb32, got.rs32) == legs[32]
        h = math.log((got.rs32 * got.nb8) / (got.rs8 * got.nb32)) / (2 * math.log(2))
        assert abs(got.hurst_e4 / 1e4 - h) <= 2e-4


class TestMedianCI:
    def test_matches_brute_force(self, spark, sf_dir):
        vals = defaultdict(list)
        for r in (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderpriority",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .collect()
        ):
            vals[r.o_orderpriority].append(r.cents)
        rows = {
            r.o_orderpriority: r
            for r in registry.QUERIES["agg_median_ci_order_statistic"](
                spark, sf_dir
            ).collect()
        }
        z = 1.959963984540054
        for prio, xs in vals.items():
            xs.sort()
            n = len(xs)
            lo = math.floor((n - z * math.sqrt(n)) / 2)
            hi = math.ceil(1 + (n + z * math.sqrt(n)) / 2)
            r = rows[prio]
            assert r.n_orders == n
            assert (r.lo_rank, r.hi_rank) == (lo, hi)
            assert r.median_cents == xs[(n + 1) // 2 - 1]
            assert r.ci_lo_cents == xs[lo - 1]
            assert r.ci_hi_cents == xs[hi - 1]
            assert r.ci_lo_cents <= r.median_cents <= r.ci_hi_cents


class TestQueueingMm1:
    def test_matches_formula(self, spark, sf_dir):
        rows = registry.QUERIES["ops_queueing_mm1_metrics"](spark, sf_dir).collect()
        assert rows
        raw = {
            r.event_type: r
            for r in load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.unix_timestamp(F.max("ts")).alias("hi"),
                F.unix_timestamp(F.min("ts")).alias("lo"),
            )
            .collect()
        }
        mu = 2000 / 3600.0
        for r in rows:
            g = raw[r.event_type]
            span = g.hi - g.lo
            lam = (g.n - 1) / span
            rho = lam / mu
            assert r.span_seconds == span and r.n_arrivals == g.n
            assert abs(r.rho_bp / 1e4 - rho) <= 1e-4
            if rho < 1:
                assert abs(r.lq_e4 / 1e4 - rho * rho / (1 - rho)) <= 1e-3
                assert abs(r.wq_s_e2 / 1e2 - rho / (mu * (1 - rho))) <= 0.02
            else:
                assert r.lq_e4 == -1 and r.wq_s_e2 == -1


class TestNpvCashflows:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        from decimal import Decimal

        rows = (
            load(spark, sf_dir, "lineitem")
            .join(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .join(
                load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                "p_brand",
                F.year("o_orderdate").alias("y"),
                F.month("o_orderdate").alias("m"),
                F.expr(
                    "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))"
                ).alias("v"),
            )
            .collect()
        )
        cells = defaultdict(Decimal)
        for r in rows:
            cells[(r.p_brand, r.y * 12 + r.m)] += r.v
        t0 = min(k[1] for k in cells)
        per_brand = defaultdict(lambda: [0, 0, 0])
        for (b, ym), v in cells.items():
            micro = int(v * 1_000_000)
            t = ym - t0
            term = math.floor(micro * (1.0 / 1.01**t) + 0.5)
            s = per_brand[b]
            s[0] += 1
            s[1] += micro
            s[2] += term
        got = {
            r.p_brand: r
            for r in registry.QUERIES["finance_npv_monthly_cashflows"](
                spark, sf_dir
            ).collect()
        }
        for b, (nm, tot, npv) in per_brand.items():
            r = got[b]
            assert (r.n_months, r.total_micro, r.npv_micro) == (nm, tot, npv), b
            assert r.npv_micro <= r.total_micro  # discounting shrinks
            assert r.npv_cents == (2 * npv + 1_000_000) // 2_000_000


class TestRakeKeyphrases:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.text import STOPWORDS

        docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
        stop = set(STOPWORDS)
        phrase_rows = []
        for d in docs:
            run = []
            for w in d.text.strip().split():
                if w in stop:
                    if run:
                        phrase_rows.append(tuple(run))
                        run = []
                else:
                    run.append(w)
            if run:
                phrase_rows.append(tuple(run))
        freq, deg = Counter(), Counter()
        for ph in phrase_rows:
            for w in ph:
                freq[w] += 1
                deg[w] += len(ph)
        def wscore(w):
            return (2 * deg[w] * 1_000_000 + freq[w]) // (2 * freq[w])
        agg = {}
        for ph in phrase_rows:
            s = sum(wscore(w) for w in ph)
            key = " ".join(ph)
            n, _, cnt = agg.get(key, (len(ph), s, 0))
            agg[key] = (len(ph), s, cnt + 1)
        top = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:15]
        got = registry.QUERIES["text_rake_keyphrases"](spark, sf_dir).collect()
        assert len(got) == 15
        for r, (phrase, (nw, sc, cnt)) in zip(got, top):
            assert (r.phrase, r.n_words, r.rake_score_micro, r.n_occurrences) == (
                phrase, nw, sc, cnt,
            )


class TestNelsonAalen:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        km = {
            r.duration_days: r
            for r in registry.QUERIES["survival_kaplan_meier"](spark, sf_dir).collect()
        }
        rows = registry.QUERIES["survival_nelson_aalen"](spark, sf_dir).collect()
        assert rows
        # same spell grain as KM (risk sets and event counts identical)
        h = v = 0
        last_s = 1e9
        for r in sorted(rows, key=lambda x: x.duration_days):
            k = km[r.duration_days]
            assert (r.n_at_risk, r.d_events, r.c_censored) == (
                k.n_at_risk, k.d_events, k.c_censored,
            )
            n = r.n_at_risk
            h += (2 * r.d_events * 1_000_000 + n) // (2 * n)
            v += (2 * r.d_events * 10**12 + n * n) // (2 * n * n)
            assert (r.cum_hazard_micro, r.hazard_var_e12) == (h, v)
            s = math.floor(math.exp(-(h / 1e6)) * 1e6 + 0.5)
            assert r.fh_survival_e6 == s
            assert r.fh_survival_e6 <= last_s  # survival is monotone
            last_s = r.fh_survival_e6
            # FH survival >= KM survival pointwise (standard inequality)
            assert r.fh_survival_e6 / 1e6 >= k.survival - 1e-6


class TestTheilU2:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "orders")
            .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mon"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("v")
            )
            .orderBy("mon")
            .collect()
        )
        v = [r.v for r in rows]
        sse_n = sse_s = sse_m = 0
        n = 0
        for i in range(12, len(v)):
            n += 1
            sse_n += (v[i] - v[i - 1]) ** 2
            sse_s += (v[i] - v[i - 12]) ** 2
            sse_m += (3 * v[i] - (v[i - 1] + v[i - 2] + v[i - 3])) ** 2
        got = registry.QUERIES["forecast_theil_u2_accuracy"](spark, sf_dir).collect()[0]
        assert got.n_months_scored == n
        # r14: SSEs reported as exact (hi15, lo15) limb pairs — every
        # report column BIGINT under 2^53
        M = 10**15
        assert got.sse_naive_c2_hi15 * M + got.sse_naive_c2_lo15 == sse_n
        assert got.sse_seasonal_c2_hi15 * M + got.sse_seasonal_c2_lo15 == sse_s
        assert got.sse_ma3_9c2_hi15 * M + got.sse_ma3_9c2_lo15 == sse_m
        for v in (got.sse_naive_c2_hi15, got.sse_naive_c2_lo15,
                  got.sse_seasonal_c2_hi15, got.sse_seasonal_c2_lo15,
                  got.sse_ma3_9c2_hi15, got.sse_ma3_9c2_lo15):
            assert isinstance(v, int) and abs(v) < 2**53
        # r13: the report is the SQUARED ratio at e8 as an exact
        # integer half-up quotient (no doubles — the r12 driver
        # falsified the sqrt-of-wide-decimal tree), so the brute force
        # here is pure int arithmetic too.
        assert got.u2sq_seasonal_e8 == (2 * 10**8 * sse_s + sse_n) // (2 * sse_n)
        assert got.u2sq_ma3_e8 == (
            (2 * 10**8 * sse_m + 9 * sse_n) // (2 * 9 * sse_n)
        )
        assert got.seasonal_beats_naive == (1 if sse_s < sse_n else 0)
        assert got.ma3_beats_naive == (1 if sse_m < 9 * sse_n else 0)


class TestDelongCI:
    def test_matches_brute_force(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select(
                (F.col("value").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("score"),
                F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            )
            .collect()
        )
        pos = sorted(r.score for r in rows if r.y == 1)
        neg = sorted(r.score for r in rows if r.y == 0)
        m, n = len(pos), len(neg)
        import bisect

        v10 = [
            (bisect.bisect_left(neg, s) + bisect.bisect_right(neg, s)) / (2 * n)
            for s in pos
        ]
        v01 = [
            ((m - bisect.bisect_right(pos, s)) + (m - bisect.bisect_left(pos, s)))
            / (2 * m)
            for s in neg
        ]
        auc10 = sum(v10) / m
        auc01 = sum(v01) / n
        assert abs(auc10 - auc01) < 1e-12  # structural identity
        s10 = sum((v - auc10) ** 2 for v in v10) / (m - 1)
        s01 = sum((v - auc01) ** 2 for v in v01) / (n - 1)
        se = math.sqrt(s10 / m + s01 / n)
        got = registry.QUERIES["eval_auc_delong_ci"](spark, sf_dir).collect()[0]
        assert (got.n_pos, got.n_neg) == (m, n)
        assert abs(got.auc_e6 / 1e6 - auc10) <= 2e-6
        assert abs(got.se_e6 / 1e6 - se) <= 2e-6
        assert abs(got.ci_lo_e6 / 1e6 - (auc10 - 1.959963984540054 * se)) <= 4e-6
        assert abs(got.ci_hi_e6 / 1e6 - (auc10 + 1.959963984540054 * se)) <= 4e-6
        assert got.ci_lo_e6 <= got.auc_e6 <= got.ci_hi_e6


class TestBollinger:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "orders")
            .groupBy(F.trunc(F.col("o_orderdate"), "month").alias("mon"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("v")
            )
            .orderBy("mon")
            .collect()
        )
        v = [r.v for r in rows]
        got = registry.QUERIES["window_bollinger_bands"](spark, sf_dir).collect()
        assert len(got) == len(v) - 11
        for i, r in enumerate(sorted(got, key=lambda x: x.month_start)):
            xs = v[i:i + 12]
            m = sum(xs) / 12
            sd = math.sqrt(sum((x - m) ** 2 for x in xs) / 11)
            assert r.revenue_cents == xs[-1]
            assert r.mid_cents == math.floor(m + 0.5)
            assert r.lower_cents == math.floor(m - 2 * sd + 0.5)
            assert r.upper_cents == math.floor(m + 2 * sd + 0.5)
            want = 1 if xs[-1] > m + 2 * sd else (-1 if xs[-1] < m - 2 * sd else 0)
            assert r.band_breach == want


class TestTrimmedMean:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        vals = defaultdict(list)
        for r in (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderpriority",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .collect()
        ):
            vals[r.o_orderpriority].append(r.cents)
        got = {
            r.o_orderpriority: r
            for r in registry.QUERIES["agg_trimmed_mean_exact"](spark, sf_dir).collect()
        }
        for prio, xs in vals.items():
            xs.sort()
            n = len(xs)
            lo = n * 500 // 10000
            kept = xs[lo:n - lo]
            s, k = sum(kept), len(kept)
            r = got[prio]
            assert (r.n_orders, r.n_kept) == (n, k)
            assert r.trimmed_mean_cents == (2 * s + k) // (2 * k)


class TestCmhStratified:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .select("c_mktsegment", "o_orderpriority", "o_orderstatus")
            .collect()
        )
        cells = defaultdict(lambda: [0, 0, 0, 0])
        for r in rows:
            e = 1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
            o = 1 if r.o_orderstatus == "F" else 0
            cells[r.c_mktsegment][(1 - e) * 2 + (1 - o)] += 1
        sum_a = e_mu = v_mu = ad = bc = 0
        for a, b, c, d in cells.values():
            n = a + b + c + d
            sum_a += a
            e_mu += (2 * (a + b) * (a + c) * 10**6 + n) // (2 * n)
            v_mu += (
                2 * (a + b) * (c + d) * (a + c) * (b + d) * 10**6
                + n * n * (n - 1)
            ) // (2 * n * n * (n - 1))
            ad += (2 * a * d * 10**6 + n) // (2 * n)
            bc += (2 * b * c * 10**6 + n) // (2 * n)
        got = registry.QUERIES["eval_cmh_stratified"](spark, sf_dir).collect()[0]
        assert (got.k_strata, got.sum_a) == (len(cells), sum_a)
        assert (got.e_micro, got.v_micro) == (e_mu, v_mu)
        chi2 = (abs(sum_a - e_mu / 1e6) - 0.5) ** 2 / (v_mu / 1e6)
        orr = ad / bc
        assert abs(got.cmh_chi2_e4 / 1e4 - chi2) <= 2e-4 * max(1, chi2)
        assert abs(got.or_mh_e4 / 1e4 - orr) <= 2e-4
        assert got.assoc_5pct == (1 if chi2 > 3.841458820694124 else 0)


class TestTostEquivalence:
    def test_matches_float_textbook(self, spark, sf_dir):
        groups = _seg_cents(spark, sf_dir, segs=("AUTOMOBILE", "HOUSEHOLD"))
        a, b = groups["AUTOMOBILE"], groups["HOUSEHOLD"]

        def mv(x):
            m = sum(x) / len(x)
            return m, sum((xi - m) ** 2 for xi in x) / (len(x) - 1)

        ma, va = mv(a)
        mb, vb = mv(b)
        md = ma - mb
        se = math.sqrt(va / len(a) + vb / len(b))
        t_lo = (md + 500.0) / se
        t_hi = (500.0 - md) / se
        z = 1.6448536269514722
        row = registry.QUERIES["ab_tost_equivalence"](spark, sf_dir).collect()[0]
        assert (row.n_a, row.n_b) == (len(a), len(b))
        assert abs(row.t_lower_e4 / 1e4 - t_lo) <= 2e-3
        assert abs(row.t_upper_e4 / 1e4 - t_hi) <= 2e-3
        assert row.equivalent_90pct == (1 if (t_lo > z and t_hi > z) else 0)


class TestBloomSizing:
    def test_matches_formula(self, spark, sf_dir):
        rows = {
            r.column_name: r
            for r in registry.QUERIES["storage_bloom_sizing_advisor"](
                spark, sf_dir
            ).collect()
        }
        assert len(rows) == 5
        for name, r in rows.items():
            m = math.ceil(r.ndv * math.log(100) / (math.log(2) ** 2))
            k = math.floor(math.log(100) / math.log(2) + 0.5)
            assert (r.m_bits, r.k_hashes) == (m, k), name
            assert r.filter_bytes == (m + 7) // 8
            fpp = (1 - math.exp(-k * r.ndv / m)) ** k
            assert abs(r.actual_fpp_e6 / 1e6 - fpp) <= 2e-6
            assert fpp <= 0.0125  # sized for ~1%


class TestBurrowsDelta:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("source", "text").collect()
        tok = defaultdict(Counter)
        corpus = Counter()
        for d in docs:
            ws = d.text.strip().split()
            tok[d.source].update(ws)
            corpus.update(ws)
        top = [w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:20]]
        sources = sorted(tok)
        k = len(sources)
        totals = {s: sum(tok[s].values()) for s in sources}
        f12 = {
            (s, w): (2 * tok[s][w] * 10**12 + totals[s]) // (2 * totals[s])
            for s in sources
            for w in top
        }
        got = {
            (r.source_a, r.source_b): r
            for r in registry.QUERIES["text_burrows_delta"](spark, sf_dir).collect()
        }
        assert len(got) == k * (k - 1) // 2
        import itertools

        for sa, sb in itertools.combinations(sources, 2):
            tot = 0
            for w in top:
                sw = sum(f12[(s, w)] for s in sources)
                bw = k * sum(f12[(s, w)] ** 2 for s in sources) - sw * sw
                tot += math.floor(
                    abs((k * f12[(sa, w)] - sw) - (k * f12[(sb, w)] - sw))
                    / math.sqrt(bw)
                    * 1e6
                    + 0.5
                )
            r = got[(sa, sb)]
            assert r.delta_micro_sum == tot, (sa, sb)
            assert r.delta_e4 == (2 * tot + 20 * 100) // (2 * 20 * 100)


class TestGiniMeanDifference:
    def test_matches_pairwise_brute_force(self, spark, sf_dir):
        vals = defaultdict(list)
        for r in (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderpriority",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .collect()
        ):
            vals[r.o_orderpriority].append(r.cents)
        got = {
            r.o_orderpriority: r
            for r in registry.QUERIES["agg_gini_mean_difference"](
                spark, sf_dir
            ).collect()
        }
        for prio, xs in vals.items():
            xs.sort()
            n = len(xs)
            # rank identity: sum |xi-xj| over ordered pairs
            t2 = 2 * sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
            # cross-check the identity on a small prefix by brute force
            sub = xs[:60]
            brute = sum(
                abs(a - b) for i, a in enumerate(sub) for b in sub[i + 1:]
            )
            ident = sum(
                (2 * (i + 1) - len(sub) - 1) * x for i, x in enumerate(sub)
            )
            assert brute == ident
            r = got[prio]
            assert r.n_orders == n
            assert r.gmd_cents == (2 * t2 + n * (n - 1)) // (2 * n * (n - 1))
            s = sum(xs)
            assert r.rel_gini_bp == (10000 * t2 + (n - 1) * s) // (
                2 * (n - 1) * s
            )


class TestParkinson:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        rows = (
            load(spark, sf_dir, "orders")
            .groupBy(F.trunc(F.col("o_orderdate"), "month").alias("mon"))
            .agg(
                F.max(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("h"),
                F.min(
                    (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("bigint")
                ).alias("l"),
            )
            .collect()
        )
        s = 0
        for r in rows:
            d12 = math.floor(math.log(r.h) * 1e12 + 0.5) - math.floor(
                math.log(r.l) * 1e12 + 0.5
            )
            s += d12 * d12
        n = len(rows)
        sig = math.sqrt(s / 1e24 / (n * 4 * math.log(2)))
        got = registry.QUERIES["window_parkinson_volatility"](spark, sf_dir).collect()[0]
        assert got.n_months == n
        assert got.sigma_parkinson_e6 == math.floor(sig * 1e6 + 0.5)
        assert got.sigma_annualized_e6 == math.floor(sig * math.sqrt(12) * 1e6 + 0.5)


class TestBradleyTerry:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        from decimal import Decimal

        rows = (
            load(spark, sf_dir, "lineitem")
            .join(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .join(
                load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(
                F.col("p_brand").alias("brand"),
                F.trunc(F.col("o_orderdate"), "month").alias("mon"),
            )
            .agg(
                F.expr(
                    "CAST(sum(CAST(l_extendedprice * (1 - l_discount)"
                    " AS DECIMAL(25,6))) * 1000000 AS BIGINT)"
                ).alias("v")
            )
            .collect()
        )
        by_mon = defaultdict(dict)
        for r in rows:
            by_mon[r.mon][r.brand] = r.v
        n = Counter()
        for d in by_mon.values():
            bs = list(d)
            for i in bs:
                for j in bs:
                    if i != j and d[i] > d[j]:
                        n[(i, j)] += 1
        brands = sorted({b for d in by_mon.values() for b in d})
        wins = {i: sum(n[(i, j)] for j in brands) for i in brands}
        w = {i: 1_000_000 for i in brands}
        for _ in range(3):
            raw = {}
            for i in brands:
                den = sum(
                    Decimal(
                        repr(
                            round(
                                (n[(i, j)] + n[(j, i)]) / (w[i] + w[j]), 12
                            )
                        )
                    )
                    for j in brands
                    if i != j and (n[(i, j)] + n[(j, i)]) > 0
                )
                raw[i] = wins[i] / float(den)
            mx = max(raw.values())
            w = {i: math.floor(r / mx * 1_000_000 + 0.5) for i, r in raw.items()}
        got = {
            r.p_brand: r
            for r in registry.QUERIES["eval_bradley_terry_strengths"](
                spark, sf_dir
            ).collect()
        }
        for i in brands:
            assert (got[i].n_wins, got[i].strength_ppm) == (wins[i], w[i]), i
        # rank order: strength desc, brand asc
        ranked = sorted(brands, key=lambda b: (-w[b], b))
        for pos, b in enumerate(ranked, start=1):
            assert got[b].rank == pos


class TestBleuSimilarity:
    def test_matches_brute_force_exactly(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("source", "text").collect()
        by_src = defaultdict(list)
        for d in docs:
            by_src[d.source].append(d.text.strip().split())
        ref = min(by_src)
        def grams(src, n):
            c = Counter()
            for ws in by_src[src]:
                for i in range(len(ws) - n + 1):
                    c[" ".join(ws[i:i + n])] += 1
            return c
        refg = {n: grams(ref, n) for n in range(1, 5)}
        r_len = sum(len(ws) for ws in by_src[ref])
        got = {
            r.source: r
            for r in registry.QUERIES["text_bleu_source_similarity"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(by_src) - {ref}
        for src in got:
            c_len = sum(len(ws) for ws in by_src[src])
            ln12 = 0
            min_clip = None
            for n in range(1, 5):
                cg = grams(src, n)
                total = sum(cg.values())
                clip = sum(min(c, refg[n].get(g, 0)) for g, c in cg.items())
                min_clip = clip if min_clip is None else min(min_clip, clip)
                if clip > 0:
                    ln12 += math.floor(math.log(clip / total) * 1e12 + 0.5)
            r = got[src]
            assert (r.c_len, r.r_len) == (c_len, r_len)
            if min_clip == 0:
                assert r.bleu_e6 == 0
            else:
                bp = 1.0 if c_len >= r_len else math.exp(1 - r_len / c_len)
                bleu = bp * math.exp(ln12 / 1e12 / 4)
                assert r.bleu_e6 == math.floor(bleu * 1e6 + 0.5)
                assert 0 <= r.bleu_e6 <= 1_000_000

    def test_one_token_docs_survive(self, spark, tmp_path):
        """r10 regression pin: docs shorter than an n-gram order used
        to CRASH the order-n leg (Spark sequence(1, 0) is [1, 0], and
        slice(ws, 0, n) throws under ANSI — greatest(...,0) was never
        a guard). Short docs now simply emit no grams at that order,
        like the oracle's empty generate_series."""
        rows = [(1, "solo", "en", "srcA", 0), (2, "", "en", "srcA", 0)] + [
            (i, "common words shared here every time", "en", "srcB", 0)
            for i in range(3, 9)
        ]
        spark.createDataFrame(
            rows,
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = registry.QUERIES["text_bleu_source_similarity"](
            spark, str(tmp_path)
        ).collect()
        # ref = srcA (min source); srcB reports, no crash
        assert len(out) == 1 and out[0].source == "srcB"


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbertLocality:
    def test_curve_is_unit_step_and_bijective(self):
        """The implemented transform is a true Hilbert curve on the
        16x16 grid: d is a bijection and consecutive d are unit grid
        steps (the property Z-order lacks)."""
        pts = {}
        for x in range(16):
            for y in range(16):
                pts[_xy2d(16, x, y)] = (x, y)
        assert sorted(pts) == list(range(256))
        for d in range(255):
            (x1, y1), (x2, y2) = pts[d], pts[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, d

    def test_matches_brute_force_exactly(self, spark, sf_dir):
        import datetime as dt

        rows = (
            load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderdate")
            .collect()
        )
        anchor = dt.date(1995, 1, 1)
        agg = {}
        for r in rows:
            od = r.o_orderdate
            if isinstance(od, dt.datetime):
                od = od.date()
            dy = (od - anchor).days
            d = _xy2d(256, r.o_custkey & 255, dy & 255)
            b = d >> 8
            cur = agg.get(b)
            if cur is None:
                agg[b] = [1, r.o_custkey, r.o_custkey, dy, dy]
            else:
                cur[0] += 1
                cur[1] = min(cur[1], r.o_custkey)
                cur[2] = max(cur[2], r.o_custkey)
                cur[3] = min(cur[3], dy)
                cur[4] = max(cur[4], dy)
        got = {
            r.hbucket: (r.n_rows, r.min_custkey, r.max_custkey, r.min_day, r.max_day)
            for r in registry.QUERIES["layout_hilbert_locality_buckets"](
                spark, sf_dir
            ).collect()
        }
        assert got == {b: tuple(v) for b, v in agg.items()}


class TestPpsSystematic:
    def test_matches_brute_force_and_sums_to_k(self, spark, sf_dir):
        import hashlib

        rows = (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .collect()
        )
        ordered = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"pps:{r.o_orderkey}".encode()).hexdigest(),
                r.o_orderkey,
            ),
        )
        t = sum(r.cents for r in ordered)
        k = 100
        f = lambda x: (2 * k * x + t) // (2 * t)
        cum = 0
        want = {}
        tot_hits = 0
        for r in ordered:
            prev = cum
            cum += r.cents
            h = f(cum) - f(prev)
            tot_hits += h
            if h >= 1:
                want[r.o_orderkey] = (r.cents, h)
        assert tot_hits == k  # telescoping identity
        got = {
            r.o_orderkey: (r.cents, r.n_hits)
            for r in registry.QUERIES["sample_pps_systematic"](spark, sf_dir).collect()
        }
        assert got == want
