"""Independent-reference pins for the session-4 wave (readability,
C4-style quality gate, TPC-DS q34/q59 adaptations).

The oracle gate proves Spark == DuckDB; these prove both match a THIRD,
dumb-but-obviously-correct Python implementation — the defense against
a shared misreading landing in both engines. Pattern follows
tests/test_r6s3_stats.py.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from leadsight_sales_agent_spark import registry
from leadsight_sales_agent_spark.sources.catalog import load

registry.load_all()


def _tdiv(n: int, d: int) -> int:
    """Truncate-toward-zero division — the cross-engine DIV semantics."""
    q = abs(n) // abs(d)
    return q if (n >= 0) == (d > 0) else -q


def _half_up(num: int, den: int) -> int:
    """The playbook device (2n+d) DIV (2d), truncation semantics."""
    return _tdiv(2 * num + den, 2 * den)


def _syllables(w: str) -> int:
    runs = len(re.findall(r"[aeiouy]+", w))
    if w.endswith("e") and runs > 1:
        runs -= 1
    return max(1, runs)


def _docs(spark, sf_dir):
    return [
        (r.lang, r.text)
        for r in load(spark, sf_dir, "documents").select("lang", "text").collect()
    ]


class TestReadabilityFlesch:
    def test_matches_python_reference(self, spark, sf_dir):
        per_lang = defaultdict(list)
        for lang, text in _docs(spark, sf_dir):
            words = [w for w in re.split(r"\s+", text.strip()) if w]
            w = len(words)
            if w == 0:
                continue
            y = sum(_syllables(wd) for wd in words)
            s = max(1, len(re.findall(r"[.!?]+", text)))
            flesch = _half_up(206835 * s * w - 1015 * w * w - 84600 * y * s, s * w)
            fk = _half_up(39 * w * w + 1180 * y * s - 1559 * s * w, s * w)
            per_lang[lang].append((flesch, fk))
        rows = {
            r.lang: r
            for r in registry.QUERIES["text_readability_flesch"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(per_lang)
        for lang, scores in per_lang.items():
            fl = [a for a, _ in scores]
            fk = [b for _, b in scores]
            r = rows[lang]
            assert r.n_docs == len(scores)
            assert r.avg_flesch_milli == _half_up(sum(fl), len(fl))
            assert r.avg_fk_centi == _half_up(sum(fk), len(fk))
            assert r.min_flesch_milli == min(fl)
            assert r.max_flesch_milli == max(fl)
            assert r.pct_easy_bp == _tdiv(
                sum(1 for v in fl if v >= 60000) * 10000, len(fl)
            )

    def test_syllable_heuristic_cases(self):
        # silent-e subtraction, y-as-vowel, floor at 1
        assert _syllables("table") == 1  # a,e runs=2, trailing e -> 1
        assert _syllables("value") == 1
        assert _syllables("query") == 2
        assert _syllables("sky") == 1
        assert _syllables("strength") == 1
        assert _syllables("e") == 1  # runs=1, no subtraction


class TestC4QualityGate:
    def test_matches_python_reference(self, spark, sf_dir):
        agg = defaultdict(lambda: Counter())
        for lang, text in _docs(spark, sf_dir):
            words = [w for w in re.split(r"\s+", text.strip()) if w]
            w = len(words)
            chars = sum(len(wd) for wd in words)
            f = {
                "fail_min_words": int(w < 20),
                "fail_terminal_punct": int(
                    not re.search(r'[.!?"]$', text.rstrip())
                ),
                "fail_curly_brace": int("{" in text),
                "fail_lorem_ipsum": int("lorem ipsum" in text.lower()),
                "fail_mean_word_len": int(chars < 3 * w or chars > 10 * w),
            }
            agg[lang]["n_docs"] += 1
            for k, v in f.items():
                agg[lang][k] += v
            agg[lang]["n_pass"] += int(sum(f.values()) == 0)
        rows = {
            r.lang: r
            for r in registry.QUERIES["text_c4_quality_gate"](spark, sf_dir).collect()
        }
        assert set(rows) == set(agg)
        for lang, c in agg.items():
            r = rows[lang]
            for k in (
                "n_docs",
                "fail_min_words",
                "fail_terminal_punct",
                "fail_curly_brace",
                "fail_lorem_ipsum",
                "fail_mean_word_len",
                "n_pass",
            ):
                assert getattr(r, k) == c[k], (lang, k)


class TestTpcdsQ34:
    def test_matches_python_reference(self, spark, sf_dir):
        orders = {
            r.o_orderkey: r.o_custkey
            for r in load(spark, sf_dir, "orders")
            .filter(F.month("o_orderdate").isin(1, 2, 3))
            .select("o_orderkey", "o_custkey")
            .collect()
        }
        li = Counter(
            r.l_orderkey
            for r in load(spark, sf_dir, "lineitem").select("l_orderkey").collect()
            if r.l_orderkey in orders
        )
        names = {
            r.c_custkey: r.c_name
            for r in load(spark, sf_dir, "customer")
            .select("c_custkey", "c_name")
            .collect()
        }
        expect = {
            (orders[ok], names[orders[ok]], ok, n)
            for ok, n in li.items()
            if 5 <= n <= 7
        }
        got = {
            (r.c_custkey, r.c_name, r.o_orderkey, r.n_items)
            for r in registry.QUERIES["tpcds_q34_frequent_ticket_bands"](
                spark, sf_dir
            ).collect()
        }
        assert got == expect
        assert all(5 <= t[3] <= 7 for t in got)


class TestTpcdsQ59:
    def test_matches_python_reference(self, spark, sf_dir):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in load(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .collect()
        }
        nations = {
            r.n_nationkey: r.n_name
            for r in load(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name")
            .collect()
        }
        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").isin(1996, 1997))
            .select(
                "o_custkey",
                F.year("o_orderdate").alias("y"),
                F.dayofyear("o_orderdate").alias("doy"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[(cust[r.o_custkey], r.y, (r.doy - 1) // 7)] += r.cents
        expect = set()
        for (nk, y, wk), v in rev.items():
            if y != 1996:
                continue
            b = rev.get((nk, 1997, wk))
            if b is not None:
                expect.add((nations[nk], wk, v, b, _tdiv(b * 10000, v)))
        got = {
            (r.n_name, r.wk, r.rev96_cents, r.rev97_cents, r.yoy_bp)
            for r in registry.QUERIES["tpcds_q59_week_over_week_sales"](
                spark, sf_dir
            ).collect()
        }
        assert got == expect
        assert len(got) > 0


def _md5_pos(salt: str, key: int, m: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:12], 16) % m


class TestBloomRuntimeFilterAudit:
    def test_matches_python_reference_and_no_false_negatives(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.relational import BLOOM_JOIN_M

        build = {
            r.o_orderkey
            for r in load(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
            .collect()
        }
        bits = {_md5_pos("b1|", k, BLOOM_JOIN_M) for k in build} | {
            _md5_pos("b2|", k, BLOOM_JOIN_M) for k in build
        }
        probe = Counter(
            r.l_orderkey
            for r in load(spark, sf_dir, "lineitem").select("l_orderkey").collect()
        )
        pass_keys = {
            k
            for k in probe
            if _md5_pos("b1|", k, BLOOM_JOIN_M) in bits
            and _md5_pos("b2|", k, BLOOM_JOIN_M) in bits
        }
        true_keys = set(probe) & build
        r = registry.QUERIES["join_bloom_runtime_filter_audit"](
            spark, sf_dir
        ).collect()[0]
        assert r.n_build_keys == len(build)
        assert r.n_probe_keys == len(probe)
        assert r.n_probe_rows == sum(probe.values())
        assert r.pass_keys == len(pass_keys)
        assert r.pass_rows == sum(probe[k] for k in pass_keys)
        assert r.true_keys == len(true_keys)
        assert r.true_rows == sum(probe[k] for k in true_keys)
        assert r.false_pass_keys == len(pass_keys - true_keys)
        # the bloom one-sided guarantee: every true key passes
        assert true_keys <= pass_keys
        assert r.false_negative_keys == 0


class TestTheilDecomposition:
    def test_matches_float_reference_and_additive_identity(self, spark, sf_dir):
        import math

        cents_by_seg = defaultdict(list)
        orders = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .select(
                "o_custkey",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            orders[r.o_custkey] += r.cents
        seg_of = {
            r.c_custkey: r.c_mktsegment
            for r in load(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .collect()
        }
        for ck, x in orders.items():
            cents_by_seg[seg_of[ck]].append(x)
        allx = [x for g in cents_by_seg.values() for x in g]
        n, X = len(allx), sum(allx)

        def theil(xs):
            m = sum(xs) / len(xs)
            return sum((x / sum(xs)) * math.log(x / m) for x in xs)

        rows = {
            r.component: r
            for r in registry.QUERIES["agg_theil_inequality_decomposition"](
                spark, sf_dir
            ).collect()
        }
        t_total = theil(allx)
        assert abs(rows["total"].theil_e6 - t_total * 1e6) <= 2
        t_between = sum(
            (sum(g) / X) * math.log((sum(g) / len(g)) / (X / n))
            for g in cents_by_seg.values()
        )
        assert abs(rows["between"].theil_e6 - t_between * 1e6) <= 2
        contrib = 0
        for seg, g in cents_by_seg.items():
            r = rows[f"within:{seg}"]
            assert r.n_members == len(g)
            assert abs(r.theil_e6 - theil(g) * 1e6) <= 2
            assert abs(r.contribution_e6 - (sum(g) / X) * theil(g) * 1e6) <= 2
            contrib += r.contribution_e6
        # additive identity T = T_between + sum_g s_g T_g (exact in real
        # math; e12/e6 quantization moves it by a few e6 ulps)
        assert abs(rows["total"].theil_e6 - rows["between"].theil_e6 - contrib) <= len(
            cents_by_seg
        ) + 2
        share_sum = sum(
            rows[f"within:{s}"].income_share_bp for s in cents_by_seg
        )
        assert abs(share_sum - 10000) <= len(cents_by_seg)


class TestHarrellCIndex:
    def test_matches_python_pair_enumeration(self, spark, sf_dir):
        """Brute-force O(n^2) pair enumeration of the documented
        contract — the third implementation the grid windows must
        match exactly."""
        ev = load(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type", "value", "event_id"
        )
        sig = defaultdict(list)
        for r in ev.filter(F.col("event_type") == "signup").collect():
            sig[r.user_id].append((r.ts, r.event_id, r.value))
        anchors = {u: min(v) for u, v in sig.items()}
        per_user = defaultdict(list)
        for r in ev.collect():
            if r.user_id in anchors:
                per_user[r.user_id].append(r)
        units = []
        for u, rows in per_user.items():
            t0, _, val = anchors[u]
            purch = [
                r.ts for r in rows if r.event_type == "purchase" and r.ts > t0
            ]
            tlast = max(r.ts for r in rows)
            died = 1 if purch else 0
            end = min(purch) if purch else tlast
            dur = (end.date() - t0.date()).days
            score = int(round(val * 1e6))
            units.append((u, died, dur, score))
        units.sort(key=lambda t: (t[3], t[0]))
        n = len(units)
        buckets = {}
        base, extra = divmod(n, 10)
        pos = 0
        for b in range(1, 11):
            size = base + (1 if b <= extra else 0)
            for u, died, dur, score in units[pos : pos + size]:
                buckets[u] = b
            pos += size
        comp = conc = tied = 0
        for u_i, died_i, dur_i, _ in units:
            if not died_i:
                continue
            for u_j, _, dur_j, _ in units:
                if dur_j > dur_i:
                    comp += 1
                    if buckets[u_j] < buckets[u_i]:
                        conc += 1
                    elif buckets[u_j] == buckets[u_i]:
                        tied += 1
        r = registry.QUERIES["eval_harrell_c_index"](spark, sf_dir).collect()[0]
        assert r.n_units == n
        assert r.n_events == sum(d for _, d, _, _ in units)
        assert r.comparable_pairs == comp
        assert r.concordant_pairs == conc
        assert r.tied_score_pairs == tied
        assert r.c_index_bp == _half_up((2 * conc + tied) * 10000, 2 * comp)


class TestCuped:
    def test_matches_python_reference(self, spark, sf_dir):
        import hashlib
        import math

        xy = defaultdict(lambda: [0, 0])
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").isin(1996, 1997))
            .select(
                "o_custkey",
                F.year("o_orderdate").alias("yy"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            xy[r.o_custkey][0 if r.yy == 1996 else 1] += r.cents
        custs = [
            r.c_custkey
            for r in load(spark, sf_dir, "customer").select("c_custkey").collect()
        ]
        units = []
        for ck in custs:
            arm = (
                "A"
                if hashlib.md5(f"ab:{ck}".encode()).hexdigest()[:8] < "80000000"
                else "B"
            )
            x, y = xy.get(ck, (0, 0))
            units.append((arm, x, y))
        n = len(units)
        sx = sum(x for _, x, _ in units)
        sy = sum(y for _, _, y in units)
        sxx = sum(x * x for _, x, _ in units)
        syy = sum(y * y for _, _, y in units)
        sxy = sum(x * y for _, x, y in units)
        a = [(x, y) for arm, x, y in units if arm == "A"]
        b = [(x, y) for arm, x, y in units if arm == "B"]
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        mya, myb = sum(y for _, y in a) / len(a), sum(y for _, y in b) / len(b)
        mxa, mxb = sum(x for x, _ in a) / len(a), sum(x for x, _ in b) / len(b)
        r = registry.QUERIES["ab_cuped_variance_reduction"](spark, sf_dir).collect()[0]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.raw_diff_micro == _half_up(
            (sum(y for _, y in a) * len(b) - sum(y for _, y in b) * len(a))
            * 10**6,
            len(a) * len(b),
        )
        assert abs(r.theta_e6 - theta * 1e6) <= 2
        assert abs(r.var_reduction_bp - rho2 * 1e4) <= 2
        adj = (mya - myb) - theta * (mxa - mxb)
        assert abs(r.adj_diff_micro - adj * 1e6) <= 2
        assert 0 <= r.var_reduction_bp <= 10000
        assert not math.isnan(theta)


class TestEntropyCompressionBound:
    def test_matches_python_reference(self, spark, sf_dir):
        import math

        from leadsight_sales_agent_spark.operators.layout import _DICT_COLS

        rows = {
            (r.tbl, r.col): r
            for r in registry.QUERIES["storage_entropy_compression_bound"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(_DICT_COLS)
        for t, c in _DICT_COLS:
            counts = Counter(
                x[0] for x in load(spark, sf_dir, t).select(c).collect()
            )
            n = sum(counts.values())
            h_bits = -sum(
                (v / n) * math.log2(v / n) for v in counts.values()
            )
            r = rows[(t, c)]
            assert r.n_rows == n
            assert r.ndv == len(counts)
            assert r.plain_bits == 8 * sum(
                len(v) * cnt for v, cnt in counts.items()
            )
            assert abs(r.h0_milli_bits - h_bits * 1000) <= 2
            assert r.entropy_bound_bits == n * r.h0_milli_bits // 1000
            # entropy floor never exceeds the fixed-width plain cost
            assert r.entropy_bound_bits <= r.plain_bits
            assert 0 <= r.savings_bp <= 10000


class TestModularityRegions:
    def test_matches_fraction_exact_reference(self, spark, sf_dir):
        pairs = {
            (r.o_custkey, r.l_suppkey)
            for r in load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey")
            .join(
                load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("o_custkey", "l_suppkey")
            .collect()
        }
        cnat = {
            r.c_custkey: r.c_nationkey
            for r in load(spark, sf_dir, "customer").collect()
        }
        snat = {
            r.s_suppkey: r.s_nationkey
            for r in load(spark, sf_dir, "supplier").collect()
        }
        nreg = {
            r.n_nationkey: r.n_regionkey
            for r in load(spark, sf_dir, "nation").collect()
        }
        rname = {
            r.r_regionkey: r.r_name
            for r in load(spark, sf_dir, "region").collect()
        }
        m = len(pairs)
        e_c, d_c = Counter(), Counter()
        for ck, sk in pairs:
            rc, rs = nreg[cnat[ck]], nreg[snat[sk]]
            d_c[rc] += 1
            d_c[rs] += 1
            if rc == rs:
                e_c[rc] += 1
        rows = {
            r.community: r
            for r in registry.QUERIES["graph_modularity_regions"](
                spark, sf_dir
            ).collect()
        }
        total_q = 0
        for rk in d_c:
            r = rows[rname[rk]]
            assert r.intra_edges == e_c[rk]
            assert r.degree_endpoints == d_c[rk]
            exact = _half_up(
                (4 * e_c[rk] * m - d_c[rk] ** 2) * 10**6, 4 * m * m
            )
            assert r.q_contrib_e6 == exact
            total_q += 4 * e_c[rk] * m - d_c[rk] ** 2
        t = rows["TOTAL"]
        assert t.intra_edges == sum(e_c.values())
        assert t.degree_endpoints == 2 * m
        assert t.q_contrib_e6 == _half_up(total_q * 10**6, 4 * m * m)


class TestRankBiasedOverlap:
    def test_matches_python_reference(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.behavior import RBO_K

        rev = defaultdict(lambda: defaultdict(int))
        orders_y = {
            r.o_orderkey: r.y
            for r in load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").isin(1996, 1997))
            .select("o_orderkey", F.year("o_orderdate").alias("y"))
            .collect()
        }
        for r in (
            load(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey",
                "l_partkey",
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(25,2)) * 100"
                    " AS BIGINT) * (100 - CAST(CAST(l_discount AS"
                    " DECIMAL(5,2)) * 100 AS BIGINT))"
                ).alias("r4"),
            )
            .collect()
        ):
            y = orders_y.get(r.l_orderkey)
            if y:
                rev[y][r.l_partkey] += r.r4

        def topk(y):
            items = sorted(rev[y].items(), key=lambda t: (-t[1], t[0]))[:RBO_K]
            return {pk: i + 1 for i, (pk, _) in enumerate(items)}

        ra, rb = topk(1996), topk(1997)
        entry = [max(ra[pk], rb[pk]) for pk in set(ra) & set(rb)]
        rows = {
            r.d: r
            for r in registry.QUERIES["eval_rank_biased_overlap"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(range(1, RBO_K + 1))
        cum = 0
        for d in range(1, RBO_K + 1):
            o_d = sum(1 for e in entry if e <= d)
            r = rows[d]
            assert r.o_d == o_d
            assert r.agreement_bp == _half_up(o_d * 10000, d)
            cum += _half_up(o_d * 10**12, d * (1 << (d - 1)))
            assert r.rbo_cum_e12 == _half_up(cum, 2)
        # RBO is a similarity in [0, 1]
        assert 0 <= rows[RBO_K].rbo_cum_e12 <= 10**12


class TestCcnetBuckets:
    def test_tercile_contract_and_stage_consistency(self, spark, sf_dir):
        """The bucket edges and shares must follow the integer tercile
        contract applied to the registered LM stage's own output."""
        scored = {
            r.doc_id: r.avg_logp_micro
            for r in registry.QUERIES["text_trigram_lm_score"](
                spark, sf_dir
            ).collect()
        }
        lang_of = {
            r.doc_id: r.lang
            for r in load(spark, sf_dir, "documents")
            .select("doc_id", "lang")
            .collect()
        }
        per_lang = defaultdict(list)
        for did, sc in scored.items():
            per_lang[lang_of[did]].append((sc, did))
        expect = defaultdict(lambda: Counter())
        ranges = {}
        for lang, items in per_lang.items():
            items.sort(key=lambda t: (-t[0], t[1]))
            n = len(items)
            for rk, (sc, did) in enumerate(items, start=1):
                b = (
                    "head"
                    if 3 * rk <= n
                    else ("middle" if 3 * rk <= 2 * n else "tail")
                )
                expect[(lang, b)]["n"] += 1
                lo, hi = ranges.get((lang, b), (sc, sc))
                ranges[(lang, b)] = (min(lo, sc), max(hi, sc))
        rows = {
            (r.lang, r.bucket): r
            for r in registry.QUERIES["text_perplexity_ccnet_buckets"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(expect)
        for (lang, b), c in expect.items():
            r = rows[(lang, b)]
            n_lang = len(per_lang[lang])
            assert r.n_docs == c["n"]
            assert r.share_bp == _half_up(c["n"] * 10000, n_lang)
            assert (r.min_score_micro, r.max_score_micro) == ranges[(lang, b)]
            assert r.kept == (1 if b in ("head", "middle") else 0)
        # within a language, head scores dominate middle dominate tail
        for lang in per_lang:
            if all((lang, b) in rows for b in ("head", "middle", "tail")):
                assert (
                    rows[(lang, "head")].min_score_micro
                    >= rows[(lang, "middle")].max_score_micro
                )
                assert (
                    rows[(lang, "middle")].min_score_micro
                    >= rows[(lang, "tail")].max_score_micro
                )


class TestZonemapSkippingAudit:
    def test_matches_python_reference_and_sorted_dominates(self, spark, sf_dir):
        import datetime

        from leadsight_sales_agent_spark.operators.layout import ZM_PAGE_ROWS

        lo = datetime.datetime(1997, 3, 1)
        hi = datetime.datetime(1997, 4, 1)
        rows_ = [
            (r.l_orderkey, r.l_linenumber, r.l_shipdate)
            for r in load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_shipdate")
            .collect()
        ]

        def audit(key):
            ordered = sorted(rows_, key=key)
            pages = defaultdict(list)
            for i, (_, _, d) in enumerate(ordered):
                pages[i // ZM_PAGE_ROWS].append(d)
            n_pages = len(pages)
            kept = {p for p, ds in pages.items() if min(ds) < hi and max(ds) >= lo}
            rows_kept = sum(len(pages[p]) for p in kept)
            matched = sum(
                1 for ds in pages.values() for d in ds if lo <= d < hi
            )
            return n_pages, len(kept), rows_kept, matched

        expect = {
            "natural": audit(lambda t: (t[0], t[1])),
            "shipdate_sorted": audit(lambda t: (t[2], t[0], t[1])),
        }
        got = {
            r.layout: r
            for r in registry.QUERIES["storage_zonemap_skipping_audit"](
                spark, sf_dir
            ).collect()
        }
        for layout, (np_, pk, rk, nm) in expect.items():
            r = got[layout]
            assert (r.n_pages, r.pages_kept, r.rows_in_kept_pages, r.rows_matched) == (
                np_, pk, rk, nm
            )
            assert r.skip_bp == _half_up((np_ - pk) * 10000, np_)
            assert r.scan_waste_bp == _half_up((rk - nm) * 10000, rk)
        # identical match counts; the sorted layout never skips less
        assert got["natural"].rows_matched == got["shipdate_sorted"].rows_matched
        assert got["shipdate_sorted"].skip_bp >= got["natural"].skip_bp
        assert (
            got["shipdate_sorted"].scan_waste_bp
            <= got["natural"].scan_waste_bp
        )


class TestRougeL:
    def test_matches_python_lcs(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.text import ROUGE_K

        docs = sorted(
            (r.source, r.doc_id, r.text)
            for r in load(spark, sf_dir, "documents")
            .select("source", "doc_id", "text")
            .collect()
        )
        streams = defaultdict(list)
        for src, did, text in sorted(docs, key=lambda t: (t[0], t[1])):
            streams[src].extend(
                w for w in re.split(r"\s+", text.strip()) if w
            )
        streams = {s: toks[:ROUGE_K] for s, toks in streams.items()}
        ref_src = min(streams)
        ref = streams[ref_src]

        def lcs(a, b):
            dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    dp[i][j] = (
                        dp[i - 1][j - 1] + 1
                        if a[i - 1] == b[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1])
                    )
            return dp[len(a)][len(b)]

        rows = {
            r.source: r
            for r in registry.QUERIES["text_rouge_l_source_similarity"](
                spark, sf_dir
            ).collect()
        }
        assert ref_src not in rows
        assert set(rows) == set(streams) - {ref_src}
        for src, r in rows.items():
            cand = streams[src]
            l = lcs(cand, ref)
            assert r.cand_len == len(cand)
            assert r.ref_len == len(ref)
            assert r.lcs_len == l
            assert r.rouge_p_bp == _half_up(l * 10000, len(cand))
            assert r.rouge_r_bp == _half_up(l * 10000, len(ref))
            assert r.rouge_f1_bp == _half_up(
                2 * l * 10000, len(cand) + len(ref)
            )
            # LCS sanity: bounded by both lengths
            assert 0 <= l <= min(len(cand), len(ref))


class TestKrippendorffAlpha:
    def test_matches_textbook_coincidence_formulation(self, spark, sf_dir):
        """Independent path: the FULL coincidence-matrix definition
        (Krippendorff 2004) with Fractions — not the collapsed
        pairwise-equality form the engines use."""
        from fractions import Fraction as Fr

        pred = {
            r.doc_id: r.predicted_lang
            for r in registry.QUERIES["text_langid_heuristic"](
                spark, sf_dir
            ).collect()
        }
        docs = [
            (r.doc_id, r.lang, r.source)
            for r in load(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source")
            .collect()
        ]
        srcs = defaultdict(Counter)
        for _, lang, src in docs:
            srcs[src][lang] += 1
        maj = {
            s: min(c.items(), key=lambda t: (-t[1], t[0]))[0]
            for s, c in srcs.items()
        }
        units = [(lang, pred[did], maj[src]) for did, lang, src in docs]
        m = 3
        # coincidence matrix o_ck = sum_u n_uc * n_uk / (m_u - 1)
        o = defaultdict(Fr)
        n_c = Counter()
        for labels in units:
            cnt = Counter(labels)
            for ci in cnt:
                n_c[ci] += cnt[ci]
                for k in cnt:
                    if ci != k:
                        o[(ci, k)] += Fr(cnt[ci] * cnt[k], m - 1)
        n = sum(n_c.values())
        d_o = sum(o.values()) / n
        d_e = Fr(
            sum(n_c[a] * n_c[b] for a in n_c for b in n_c if a != b),
            n * (n - 1),
        )
        alpha = 1 - d_o / d_e
        r = registry.QUERIES["eval_krippendorff_alpha_langid"](
            spark, sf_dir
        ).collect()[0]
        assert r.n_units == len(units)
        assert r.n_values == n
        assert r.alpha_bp == _half_up(
            alpha.numerator * 10000, alpha.denominator
        )
        assert r.obs_disagreement_e6 == _half_up(
            d_o.numerator * 10**6, d_o.denominator
        )
        assert r.exp_disagreement_e6 == _half_up(
            d_e.numerator * 10**6, d_e.denominator
        )
        full = sum(1 for a, b, c in units if a == b == c)
        assert r.pct_full_agreement_bp == _half_up(
            full * 10000, len(units)
        )


class TestKCenterCoreset:
    def test_matches_python_greedy_exactly(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.similarity import KCENTER_K

        import math

        vecs = {
            r.vec_id: [
                int(math.floor(float(x) * 1e6 + 0.5)) for x in r.embedding
            ]
            for r in load(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        }

        def dist2(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        seed = min(vecs)
        d = {i: dist2(v, vecs[seed]) for i, v in vecs.items()}
        trace = [(1, seed, max(d.values()))]
        for r in range(2, KCENTER_K + 1):
            nxt = min(vecs, key=lambda i: (-d[i], i))
            for i, v in vecs.items():
                d[i] = min(d[i], dist2(v, vecs[nxt]))
            trace.append((r, nxt, max(d.values())))
        got = sorted(
            (r.round, r.center_id, r.radius_sq)
            for r in registry.QUERIES["sample_coreset_kcenter_greedy"](
                spark, sf_dir
            ).collect()
        )
        assert got == trace
        # the covering radius is non-increasing and centers are distinct
        radii = [t[2] for t in got]
        assert radii == sorted(radii, reverse=True) or all(
            radii[i] >= radii[i + 1] for i in range(len(radii) - 1)
        )
        assert len({t[1] for t in got}) == KCENTER_K


def _wm_green_py(prev: str, cur: str) -> int:
    import hashlib

    return 1 if hashlib.md5(f"wm|{prev}|{cur}".encode()).hexdigest()[0] in "02468ace" else 0


class TestWatermarkGreenlist:
    def test_matches_python_reference_null_calibration(self, spark, sf_dir):
        import math

        stats = defaultdict(lambda: [0, 0, 0, None, None, 0])  # docs,g,n,maxz,minz,flagged
        for lang, text in _docs(spark, sf_dir):
            ws = [w for w in re.split(r"\s+", text.strip()) if w]
            if len(ws) < 2:
                continue
            g = sum(_wm_green_py(a, b) for a, b in zip(ws, ws[1:]))
            n = len(ws) - 1
            z = int(math.floor((2.0 * g - n) / math.sqrt(n) * 100 + 0.5))
            s = stats[lang]
            s[0] += 1
            s[1] += g
            s[2] += n
            s[3] = z if s[3] is None else max(s[3], z)
            s[4] = z if s[4] is None else min(s[4], z)
            s[5] += int(z >= 400)
        rows = {
            r.lang: r
            for r in registry.QUERIES["text_watermark_greenlist_detect"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(stats)
        for lang, (d, g, n, mx, mn, fl) in stats.items():
            r = rows[lang]
            assert r.n_docs == d
            assert r.max_z_centi == mx
            assert r.min_z_centi == mn
            assert r.green_rate_bp == _half_up(g * 10000, n)
            assert r.flagged_docs == fl
            # unwatermarked corpus: the null calibration
            assert abs(r.green_rate_bp - 5000) < 1500

    def test_detects_planted_watermark(self):
        """Detection power: a constructed green-greedy stream must
        cross the z >= 4 flag under the exact same formula."""
        import math

        vocab = [f"tok{i}" for i in range(50)]
        stream = ["tok0"]
        for _ in range(120):
            prev = stream[-1]
            nxt = next(
                (c for c in vocab if _wm_green_py(prev, c)), vocab[0]
            )
            stream.append(nxt)
        g = sum(_wm_green_py(a, b) for a, b in zip(stream, stream[1:]))
        n = len(stream) - 1
        z = (2.0 * g - n) / math.sqrt(n)
        assert z >= 4.0


class TestSeasonalHybridEsd:
    def test_matches_python_replay_exactly(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.behavior import SHESD_ROUNDS

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").between(1996, 1998))
            .select(
                F.year("o_orderdate").alias("y"),
                F.month("o_orderdate").alias("m"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[(r.y - 1996) * 12 + r.m - 1] += r.cents
        series = {mi: rev.get(mi, 0) for mi in range(36)}
        seasonal = {}
        for moy in range(12):
            vals = sorted(
                (series[mi], mi) for mi in range(moy, 36, 12)
            )
            seasonal[moy] = vals[1][0]  # middle of 3, tie-broken by mi
        rem = {mi: series[mi] - seasonal[mi % 12] for mi in range(36)}

        def pick_element(pairs):
            # pairs sorted by (value, mi); element at rank (n+1)//2
            s = sorted(pairs)
            return s[(len(s) + 1) // 2 - 1][0]

        trace = []
        for rnd in range(1, SHESD_ROUNDS + 1):
            med = pick_element([(v, mi) for mi, v in rem.items()])
            mad = pick_element([(abs(v - med), mi) for mi, v in rem.items()])
            mi_star = min(rem, key=lambda mi: (-abs(rem[mi] - med), mi))
            dev = abs(rem[mi_star] - med)
            trace.append(
                (rnd, mi_star, dev, med, mad, int(2 * dev >= 7 * mad))
            )
            del rem[mi_star]
        got = sorted(
            (r.round, r.month_removed, r.dev_cents, r.median_cents,
             r.mad_cents, r.exceeds)
            for r in registry.QUERIES["anomaly_seasonal_hybrid_esd"](
                spark, sf_dir
            ).collect()
        )
        assert got == trace
        # deviations are non-increasing only within re-estimation
        # regimes, but removed months are distinct by construction
        assert len({t[1] for t in got}) == SHESD_ROUNDS


class TestPiecewiseTrend:
    def test_matches_fraction_gaussian_elimination(self, spark, sf_dir):
        """Independent path: solve the normal equations with Fraction
        Gaussian elimination — not the adjugate literals the engines
        use."""
        from fractions import Fraction as Fr

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").between(1996, 1998))
            .select(
                ((F.year("o_orderdate") - 1996) * 12 + F.month("o_orderdate"))
                .alias("t"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[r.t] += r.cents
        ys = [rev.get(t, 0) // 100 for t in range(1, 37)]
        X = [[1, t, max(0, t - 12), max(0, t - 24)] for t in range(1, 37)]
        G = [
            [Fr(sum(X[r][i] * X[r][j] for r in range(36))) for j in range(4)]
            for i in range(4)
        ]
        b = [Fr(sum(X[r][i] * ys[r] for r in range(36))) for i in range(4)]
        # gaussian elimination
        M = [G[i] + [b[i]] for i in range(4)]
        for c in range(4):
            p = next(r for r in range(c, 4) if M[r][c] != 0)
            M[c], M[p] = M[p], M[c]
            M[c] = [v / M[c][c] for v in M[c]]
            for r in range(4):
                if r != c and M[r][c] != 0:
                    M[r] = [vr - M[r][c] * vc for vr, vc in zip(M[r], M[c])]
        beta = [M[i][4] for i in range(4)]
        yy = sum(v * v for v in ys)
        rss = Fr(yy) - sum(b[i] * beta[i] for i in range(4))
        tss = Fr(yy) - Fr(sum(ys)) ** 2 / 36
        r2 = 1 - rss / tss
        row = registry.QUERIES["forecast_piecewise_trend_changepoints"](
            spark, sf_dir
        ).collect()[0]

        def pin(got, frac):
            v = frac * 100
            assert got == _half_up(v.numerator, v.denominator), (got, float(v))

        pin(row.beta0_centi, beta[0])
        pin(row.slope_y1_centi, beta[1])
        pin(row.slope_y2_centi, beta[1] + beta[2])
        pin(row.slope_y3_centi, beta[1] + beta[2] + beta[3])
        v = r2 * 10000
        assert row.r2_bp == _half_up(v.numerator, v.denominator)
        assert 0 <= row.r2_bp <= 10000


class TestCausalImpactCounterfactual:
    def test_matches_fraction_reference(self, spark, sf_dir):
        from fractions import Fraction as Fr

        from leadsight_sales_agent_spark.operators.behavior import (
            CI_DET,
            CI_PRE_N,
        )

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").between(1996, 1998))
            .select(
                ((F.year("o_orderdate") - 1996) * 12 + F.month("o_orderdate"))
                .alias("t"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[r.t] += r.cents
        ys = {t: rev.get(t, 0) // 100 for t in range(1, 37)}
        pre_t = list(range(1, CI_PRE_N + 1))
        # independent path: least-squares via Fraction means/covs
        n = len(pre_t)
        mt = Fr(sum(pre_t), n)
        my = Fr(sum(ys[t] for t in pre_t), n)
        b = sum((Fr(t) - mt) * (ys[t] - my) for t in pre_t) / sum(
            (Fr(t) - mt) ** 2 for t in pre_t
        )
        a = my - b * mt
        rows = {
            r.month_idx: r
            for r in registry.QUERIES["forecast_causal_impact_counterfactual"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(range(CI_PRE_N + 1, 37))
        cum = Fr(0)
        for t in range(CI_PRE_N + 1, 37):
            cf = a + b * t
            gap = ys[t] - cf
            cum += gap
            r = rows[t]
            assert r.actual_dollars == ys[t]

            def pin(got, frac, scale):
                v = frac * scale
                assert got == _half_up(v.numerator, v.denominator), (
                    t, got, float(v),
                )

            pin(r.counterfactual_centi, cf, 100)
            pin(r.gap_centi, gap, 100)
            pin(r.cum_gap_centi, cum, 100)
            pin(r.rel_gap_bp, gap / cf, 10000)
        assert CI_DET == 24 * sum(t * t for t in pre_t) - sum(pre_t) ** 2


class TestPinballLoss:
    def test_matches_python_reference(self, spark, sf_dir):
        monthly = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .select(
                F.date_trunc("month", "o_orderdate").alias("mon"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            monthly[r.mon] += r.cents
        vs = [monthly[m] for m in sorted(monthly)]
        sums = Counter()
        n = 0
        for i in range(12, len(vs)):
            v = vs[i]
            n += 1
            for name, e in (
                ("naive", v - vs[i - 1]),
                ("seas", v - vs[i - 12]),
            ):
                sums[name + "50"] += abs(e)
                sums[name + "75"] += max(3 * e, -e)
            e3 = 3 * v - (vs[i - 1] + vs[i - 2] + vs[i - 3])
            sums["ma50"] += abs(e3)
            sums["ma75"] += max(3 * e3, -e3)
        rows = {
            r.forecaster: r
            for r in registry.QUERIES["forecast_pinball_loss_quantile"](
                spark, sf_dir
            ).collect()
        }
        for name, key, d50, d75 in (
            ("naive_last", "naive", 2, 4),
            ("seasonal_naive", "seas", 2, 4),
            ("moving_avg_3", "ma", 6, 12),
        ):
            r = rows[name]
            assert r.n == n
            assert r.pinball_q50_centi == _half_up(
                100 * sums[key + "50"], d50
            )
            assert r.pinball_q75_centi == _half_up(
                100 * sums[key + "75"], d75
            )


class TestAsofNearest:
    def test_matches_python_reference(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.relational import (
            ASOF_NEAREST_TOL_MIN,
        )

        tol = ASOF_NEAREST_TOL_MIN * 60 * 1_000_000
        clicks = defaultdict(list)
        purchases = []
        for r in (
            load(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("purchase", "click"))
            .select("event_id", "user_id", "event_type",
                    F.unix_micros("ts").alias("us"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"))
            .collect()
        ):
            if r.event_type == "click":
                clicks[r.user_id].append((r.us, r.s))
            else:
                purchases.append(r)
        got = {
            r.purchase_id: (r.nearest_click_ts, r.direction, r.delta_us)
            for r in registry.QUERIES["join_asof_nearest_tolerance"](
                spark, sf_dir
            ).collect()
        }
        assert len(got) == len(purchases)
        for p in purchases:
            back = max(
                ((us, s) for us, s in clicks.get(p.user_id, [])
                 if us <= p.us and p.us - us <= tol),
                default=None,
            )
            fwd = min(
                ((us, s) for us, s in clicks.get(p.user_id, [])
                 if us > p.us and us - p.us <= tol),
                default=None,
            )
            if back is not None and (
                fwd is None or p.us - back[0] <= fwd[0] - p.us
            ):
                expect = (back[1], "backward", p.us - back[0])
            elif fwd is not None:
                expect = (fwd[1], "forward", fwd[0] - p.us)
            else:
                expect = (None, None, None)
            assert got[p.event_id] == expect, p.event_id


class TestVitPatchPlan:
    def test_matches_python_geometry(self, spark, sf_dir):
        import math

        from leadsight_sales_agent_spark.operators.multimodal import (
            VIT_MAX_SIDE,
            VIT_PATCH,
        )

        doc_ids = [
            r.doc_id
            for r in load(spark, sf_dir, "documents").select("doc_id").collect()
            if r.doc_id % 3 == 0
        ]
        rows = {
            r.doc_id: r
            for r in registry.QUERIES["multimodal_vit_patch_plan"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(doc_ids)
        for did in doc_ids:
            w, h = did % 640 + 16, did % 480 + 16
            scale = min(VIT_MAX_SIDE / w, VIT_MAX_SIDE / h, 1.0)
            tw = max(int(math.floor(w * scale)), 1)
            th = max(int(math.floor(h * scale)), 1)
            px = (tw + VIT_PATCH - 1) // VIT_PATCH
            py = (th + VIT_PATCH - 1) // VIT_PATCH
            r = rows[did]
            assert (r.width, r.height, r.resized_w, r.resized_h) == (w, h, tw, th)
            assert (r.patches_x, r.patches_y) == (px, py)
            assert r.n_patches == px * py and r.seq_len == px * py + 1
            assert r.aspect_bucket == 4 * w // h
            area = px * py * VIT_PATCH * VIT_PATCH
            assert r.pad_waste_bp == _half_up((area - tw * th) * 10000, area)
            # geometry invariants
            assert max(tw, th) <= VIT_MAX_SIDE
            assert px * VIT_PATCH >= tw and py * VIT_PATCH >= th


class TestBrierMurphyDecomposition:
    def test_matches_fraction_reference_and_exact_identity(self, spark, sf_dir):
        from fractions import Fraction as Fr

        from leadsight_sales_agent_spark.operators.behavior import (
            CALIB_BIN_CENTS,
        )

        pts = [
            (r.sc, r.y)
            for r in load(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select(
                (F.col("value").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("sc"),
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(0)
                .alias("y"),
            )
            .collect()
        ]
        N = len(pts)
        SY = sum(y for _, y in pts)
        MX = max(s for s, _ in pts)
        bins = defaultdict(list)
        for s, y in pts:
            bins[s // CALIB_BIN_CENTS].append((s, y))
        brier = sum((Fr(s, MX) - y) ** 2 for s, y in pts) / N
        unc = Fr(SY, N) * (1 - Fr(SY, N))
        rel = res = wbv = wbc = Fr(0)
        for items in bins.values():
            n = len(items)
            fbar = Fr(sum(s for s, _ in items), n * MX)
            obar = Fr(sum(y for _, y in items), n)
            rel += n * (fbar - obar) ** 2
            res += n * (obar - Fr(SY, N)) ** 2
            wbv += sum((Fr(s, MX) - fbar) ** 2 for s, _ in items)
            wbc += sum((Fr(s, MX) - fbar) * (y - obar) for s, y in items)
        rel, res, wbv, wbc = rel / N, res / N, wbv / N, wbc / N
        # the exact generalized identity
        assert brier == unc + rel - res + wbv - 2 * wbc
        r = registry.QUERIES["eval_brier_murphy_decomposition"](
            spark, sf_dir
        ).collect()[0]
        assert r.n_events == N and r.n_bins == len(bins)

        def exact_bp(frac):
            v = frac * 10000
            return _half_up(v.numerator, v.denominator)

        assert r.brier_bp == exact_bp(brier)
        assert r.unc_bp == exact_bp(unc)
        # e8 per-bin rounding contract: within a couple of bp ulps
        assert abs(r.rel_bp - exact_bp(rel)) <= 1
        assert abs(r.res_bp - exact_bp(res)) <= 1
        assert abs(r.wbv_bp - exact_bp(wbv)) <= 1
        assert abs(r.wbc2_bp - exact_bp(2 * wbc)) <= 2
        # graded identity holds at the bp grain
        assert abs(
            r.brier_bp - (r.unc_bp + r.rel_bp - r.res_bp + r.wbv_bp - r.wbc2_bp)
        ) <= 3


class TestPackVisionBatches:
    def test_matches_python_packing(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.multimodal import (
            VIT_BATCH_TOKENS,
        )

        plan = sorted(
            (r.aspect_bucket, r.doc_id, r.seq_len)
            for r in registry.QUERIES["multimodal_vit_patch_plan"](
                spark, sf_dir
            ).collect()
        )
        batches = defaultdict(lambda: [0, 0])  # (bucket, batch) -> [n, tokens]
        cum = Counter()
        for bucket, _, seq in plan:
            bid = cum[bucket] // VIT_BATCH_TOKENS
            cum[bucket] += seq
            b = batches[(bucket, bid)]
            b[0] += 1
            b[1] += seq
        got = {
            (r.aspect_bucket, r.batch_id): (r.n_images, r.tokens, r.fill_bp)
            for r in registry.QUERIES["multimodal_pack_vision_batches"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(batches)
        for k, (n, toks) in batches.items():
            assert got[k] == (n, toks, _half_up(toks * 10000, VIT_BATCH_TOKENS))
        # every image is in exactly one batch
        assert sum(v[0] for v in batches.values()) == len(plan)


class TestMccLangid:
    def test_matches_python_reference(self, spark, sf_dir):
        import math

        pred = registry.QUERIES["text_langid_heuristic"](spark, sf_dir).collect()
        tp = sum(1 for r in pred if r.actual_lang == "en" and r.predicted_lang == "en")
        fp = sum(1 for r in pred if r.actual_lang != "en" and r.predicted_lang == "en")
        fn = sum(1 for r in pred if r.actual_lang == "en" and r.predicted_lang != "en")
        tn = sum(1 for r in pred if r.actual_lang != "en" and r.predicted_lang != "en")
        r = registry.QUERIES["eval_mcc_langid_binary"](spark, sf_dir).collect()[0]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        n = tp + fp + fn + tn
        assert r.accuracy_bp == _half_up((tp + tn) * 10000, n)
        assert r.balanced_accuracy_bp == _half_up(
            (tp * (tn + fp) + tn * (tp + fn)) * 10000, 2 * (tp + fn) * (tn + fp)
        )
        mcc = (tp * tn - fp * fn) / (
            math.sqrt((tp + fp) * (tp + fn)) * math.sqrt((tn + fp) * (tn + fn))
        )
        assert r.mcc_e4 == int(math.floor(mcc * 1e4 + 0.5))
        assert -10000 <= r.mcc_e4 <= 10000


class TestLttbDownsample:
    def test_matches_python_replay_exactly(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.windows import (
            _LTTB_BUCKETS,
            LTTB_N,
            LTTB_T,
        )

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").between(1996, 1998))
            .select(
                ((F.year("o_orderdate") - 1996) * 12 + F.month("o_orderdate"))
                .alias("t"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[r.t] += r.cents
        ys = {t: rev.get(t, 0) for t in range(1, LTTB_N + 1)}
        expect = [(0, 1, ys[1], 0)]
        xa, ya = 1, ys[1]
        for k, (lo, hi) in enumerate(_LTTB_BUCKETS, start=1):
            if k < len(_LTTB_BUCKETS):
                nlo, nhi = _LTTB_BUCKETS[k]
                pts = list(range(nlo, nhi + 1))
                n, sx, sy = len(pts), sum(pts), sum(ys[t] for t in pts)
            else:
                n, sx, sy = 1, LTTB_N, ys[LTTB_N]
            best = None
            for t in range(lo, hi + 1):
                a2 = abs(
                    (n * xa - sx) * (n * ys[t] - sy)
                    - (n * t - sx) * (n * ya - sy)
                )
                if best is None or a2 > best[0]:
                    best = (a2, t)
            a2, t = best
            expect.append((k, t, ys[t], a2))
            xa, ya = t, ys[t]
        expect.append((LTTB_T - 1, LTTB_N, ys[LTTB_N], 0))
        got = sorted(
            (r.bucket, r.month_idx, r.y_cents, r.area2n2)
            for r in registry.QUERIES["window_downsample_lttb"](
                spark, sf_dir
            ).collect()
        )
        assert got == expect
        # kept months strictly increase and cover both endpoints
        ms = [t for _, t, _, _ in got]
        assert ms == sorted(ms) and ms[0] == 1 and ms[-1] == LTTB_N
        assert len(got) == LTTB_T


class TestRecsysCoverageNovelty:
    def test_matches_python_reference(self, spark, sf_dir):
        import math

        recs = registry.QUERIES["recsys_item_item_cosine"](spark, sf_dir).collect()
        lines = {
            (r.l_orderkey, r.l_partkey)
            for r in load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .collect()
        }
        item_n = Counter(p for _, p in lines)
        nb = len({ok for ok, _ in lines})
        catalog = load(spark, sf_dir, "part").count()
        ln_e12 = lambda x: int(math.floor(math.log(x) * 1e12 + 0.5))  # noqa: E731
        slots = [
            (r.item, r.neighbor, ln_e12(nb) - ln_e12(item_n[r.neighbor]))
            for r in recs
        ]
        freq = Counter(nbr for _, nbr, _ in slots)
        top10 = sum(
            c for _, c in sorted(freq.items(), key=lambda t: (-t[1], t[0]))[:10]
        )
        r = registry.QUERIES["recsys_coverage_novelty_audit"](
            spark, sf_dir
        ).collect()[0]
        assert r.n_items_with_recs == len({i for i, _, _ in slots})
        assert r.n_slots == len(slots)
        assert r.catalog_size == catalog
        assert r.covered_neighbors == len(freq)
        assert r.coverage_bp == _half_up(len(freq) * 10000, catalog)
        assert r.mean_novelty_e6 == _half_up(
            sum(v for _, _, v in slots), len(slots) * 10**6
        )
        assert r.top10_share_bp == _half_up(top10 * 10000, len(slots))
        # novelty is positive (recommended items are never universal)
        assert r.mean_novelty_e6 > 0


class TestPermutationTestHashed:
    def test_matches_python_replay_exactly(self, spark, sf_dir):
        import hashlib

        from leadsight_sales_agent_spark.operators.behavior import PERM_REPS

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate") == 1997)
            .select(
                "o_custkey",
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[r.o_custkey] += r.cents
        units = []
        for r in load(spark, sf_dir, "customer").select("c_custkey").collect():
            ck = r.c_custkey
            arm_a = (
                1
                if hashlib.md5(f"ab:{ck}".encode()).hexdigest()[:8] < "80000000"
                else 0
            )
            units.append((ck, arm_a, rev.get(ck, 0)))
        na = sum(a for _, a, _ in units)
        nb = len(units) - na
        sya = sum(y for _, a, y in units if a)
        syb = sum(y for _, a, y in units if not a)
        obs = abs(sya * nb - syb * na)
        extreme = 0
        for rep in range(1, PERM_REPS + 1):
            order = sorted(
                units,
                key=lambda u: (
                    hashlib.md5(f"perm:{rep}:{u[0]}".encode()).hexdigest(),
                    u[0],
                ),
            )
            pya = sum(y for _, _, y in order[:na])
            pyb = sum(y for _, _, y in order[na:])
            extreme += int(abs(pya * nb - pyb * na) >= obs)
        r = registry.QUERIES["ab_permutation_test_hashed"](
            spark, sf_dir
        ).collect()[0]
        assert (r.n_a, r.n_b, r.n_reps) == (na, nb, PERM_REPS)
        assert r.n_extreme == extreme
        assert r.p_value_bp == _half_up(
            (extreme + 1) * 10000, PERM_REPS + 1
        )
        assert 0 < r.p_value_bp <= 10000


class TestSeasonalTrendStrength:
    def test_matches_fraction_reference(self, spark, sf_dir):
        from fractions import Fraction as Fr

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").between(1996, 1998))
            .select(
                ((F.year("o_orderdate") - 1996) * 12 + F.month("o_orderdate"))
                .alias("t"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[r.t] += r.cents
        ys = {t: rev.get(t, 0) for t in range(1, 37)}
        # centered 2x12 MA carried x24
        d24, y24, moys = {}, {}, {}
        for t in range(7, 31):
            t24 = ys[t - 6] + ys[t + 6] + 2 * sum(
                ys[u] for u in range(t - 5, t + 6)
            )
            d24[t] = 24 * ys[t] - t24
            y24[t] = 24 * ys[t]
            moys[t] = (t - 1) % 12
        s24 = {}
        for moy in set(moys.values()):
            vals = [d24[t] for t in d24 if moys[t] == moy]
            num, den = sum(vals), len(vals)
            s24[moy] = _half_up(num, den)
        r24 = {t: d24[t] - s24[moys[t]] for t in d24}
        ds24 = {t: y24[t] - s24[moys[t]] for t in d24}

        def var(d):
            xs = list(d.values())
            return len(xs) * sum(x * x for x in xs) - sum(xs) ** 2

        vr, vsr, vtr = var(r24), var(d24), var(ds24)
        r = registry.QUERIES["forecast_seasonal_trend_strength"](
            spark, sf_dir
        ).collect()[0]
        assert r.n_interior == 24
        assert r.trend_strength_bp == max(0, _half_up((vtr - vr) * 10000, vtr))
        assert r.seasonal_strength_bp == max(
            0, _half_up((vsr - vr) * 10000, vsr)
        )
        # sanity: both are shares in [0, 10000]
        assert 0 <= r.trend_strength_bp <= 10000
        assert 0 <= r.seasonal_strength_bp <= 10000
        # this corpus is strongly seasonal relative to trend
        assert Fr(r.seasonal_strength_bp) >= 0


class TestThetaMethod:
    def test_matches_fraction_reference(self, spark, sf_dir):
        from fractions import Fraction as Fr

        rev = defaultdict(int)
        for r in (
            load(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate").between(1996, 1998))
            .select(
                ((F.year("o_orderdate") - 1996) * 12 + F.month("o_orderdate"))
                .alias("t"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        ):
            rev[r.t] += r.cents
        N = 36
        ys = {t: rev.get(t, 0) for t in range(1, N + 1)}
        n = N
        st, stt = sum(range(1, N + 1)), sum(t * t for t in range(1, N + 1))
        b0, b1 = sum(ys.values()), sum(t * y for t, y in ys.items())
        det = n * stt - st * st
        a = Fr(stt * b0 - st * b1, det)
        b = Fr(n * b1 - st * b0, det)
        theta2 = {t: 2 * ys[t] - (a + b * t) for t in range(1, N + 1)}
        lvl = theta2[1]
        for t in range(2, N + 1):
            lvl = (theta2[t] + lvl) / 2
        trend_next = a + b * (N + 1)
        forecast = (trend_next + lvl) / 2
        r = registry.QUERIES["forecast_theta_method"](spark, sf_dir).collect()[0]

        def pin(got, frac):
            v = frac * 100
            assert got == _half_up(v.numerator, v.denominator), (got, float(v))

        pin(r.intercept_centi, a)
        pin(r.slope_centi, b)
        pin(r.theta2_ses_centi, lvl)
        pin(r.trend_next_centi, trend_next)
        pin(r.forecast_next_centi, forecast)


class TestMattr:
    def test_matches_python_reference(self, spark, sf_dir):
        from leadsight_sales_agent_spark.operators.text import MATTR_W

        agg = defaultdict(lambda: [0, 0, 0])  # docs, windows, types_sum
        for lang, text in _docs(spark, sf_dir):
            ws = [w for w in re.split(r"\s+", text.strip()) if w]
            if len(ws) < MATTR_W:
                continue
            nw = len(ws) - MATTR_W + 1
            ts = sum(
                len(set(ws[i : i + MATTR_W])) for i in range(nw)
            )
            a = agg[lang]
            a[0] += 1
            a[1] += nw
            a[2] += ts
        rows = {
            r.lang: r
            for r in registry.QUERIES["text_mattr_lexical_diversity"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(agg)
        for lang, (d, nw, ts) in agg.items():
            r = rows[lang]
            assert r.n_docs == d
            assert r.n_windows == nw
            assert r.mattr_bp == _half_up(ts * 10000, nw * MATTR_W)
            assert 0 < r.mattr_bp <= 10000


class TestSortKeyAdvisor:
    def test_matches_python_reference(self, spark, sf_dir):
        rows_ = [
            (r.o_orderkey, r.o_orderdate, r.o_orderstatus, r.o_orderpriority,
             r.o_custkey, r.o_orderdate.strftime("%Y-%m"))
            for r in load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderdate", "o_orderstatus",
                    "o_orderpriority", "o_custkey")
            .collect()
        ]

        def runs(ordered, pick):
            total, prev = 0, object()
            for row in ordered:
                v = pick(row)
                if v != prev:
                    total += 1
                prev = v
            return total

        layouts = {
            "natural": sorted(rows_, key=lambda r: r[0]),
            "by_date": sorted(rows_, key=lambda r: (r[1], r[0])),
            "by_priority": sorted(rows_, key=lambda r: (r[3], r[1], r[0])),
        }
        expect = {}
        for name, ordered in layouts.items():
            rs = runs(ordered, lambda r: r[2])
            rp = runs(ordered, lambda r: r[3])
            rm = runs(ordered, lambda r: r[5])
            rc = runs(ordered, lambda r: str(r[4]))
            expect[name] = (rs, rp, rm, rc, rs + rp + rm + rc)
        best = min(expect, key=lambda n: (expect[n][4], n))
        got = {
            r.layout: (r.runs_status, r.runs_priority, r.runs_month,
                       r.runs_custkey, r.total_runs, r.best)
            for r in registry.QUERIES["storage_sort_key_advisor"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(expect)
        for name, vals in expect.items():
            assert got[name][:5] == vals, name
            assert got[name][5] == (1 if name == best else 0)
        assert sum(v[5] for v in got.values()) == 1


class TestHoltDampedTrend:
    def test_table_matches_sequential_recursion(self, spark, sf_dir):
        """The coefficient tables must equal the exact sequential
        damped-Holt recursion replayed with Fractions per window."""
        from fractions import Fraction as Fr

        monthly = defaultdict(dict)
        for r in (
            load(spark, sf_dir, "orders")
            .groupBy(
                F.col("o_orderpriority").alias("p"),
                F.date_format(
                    F.date_trunc("month", "o_orderdate"), "yyyy-MM"
                ).alias("m"),
            )
            .agg(
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(25,6)")) * 100, 0
                )
                .cast("long")
                .alias("cents")
            )
            .collect()
        ):
            monthly[r.p][r.m] = r.cents
        rows = {
            (r.priority, r.month): r
            for r in registry.QUERIES["holt_damped_trend_smoothing"](
                spark, sf_dir
            ).collect()
        }

        def hup(frac):
            # the engines' MIRRORED half-up (rounds away from zero)
            n, d = frac.numerator, frac.denominator
            if n >= 0:
                return (2 * n + d) // (2 * d)
            return -((2 * -n + d) // (2 * d))

        checked = 0
        for p, by_m in monthly.items():
            ms = sorted(by_m)
            for i in range(15, len(ms)):
                window = [by_m[m] for m in ms[i - 15 : i + 1]]
                l, b = Fr(window[0]), Fr(0)
                for v in window[1:]:
                    nl = Fr(v, 2) + l / 2 + b / 4
                    b = Fr(v, 4) - l / 4 + 3 * b / 8
                    l = nl
                r = rows[(p, ms[i])]
                assert r.level_cents == hup(l), (p, ms[i])
                assert r.trend_cents == hup(b)
                assert r.forecast3_cents == hup(l + Fr(7, 8) * b)
                checked += 1
        assert checked == len(rows) and checked > 0


class TestMarkovRemovalAttribution:
    def test_matches_fraction_gaussian_solve(self, spark, sf_dir):
        """Independent path: build the chains in Python and solve the
        absorption systems with Fraction Gaussian elimination — not
        the generated Cramer expansions the engines use."""
        from fractions import Fraction as Fr

        from leadsight_sales_agent_spark.operators.behavior import (
            MARKOV_CHANNELS,
        )

        evs = defaultdict(list)
        for r in (
            load(spark, sf_dir, "events")
            .select("user_id", "event_type", "ts", "event_id")
            .collect()
        ):
            evs[r.user_id].append((r.ts, r.event_id, r.event_type))
        chains = []
        for u, rows_ in evs.items():
            seq = [t for _, _, t in sorted(rows_)]
            if "purchase" in seq:
                seq = seq[: seq.index("purchase") + 1]
            chains.append(seq)
        states = ["start"] + MARKOV_CHANNELS
        trans = Counter()
        conv = Counter()
        visits = Counter()
        visits["start"] = len(chains)
        for seq in chains:
            prev = "start"
            for t in seq:
                if t == "purchase":
                    conv[prev] += 1
                else:
                    trans[(prev, t)] += 1
                    visits[t] += 1
                    prev = t

        def solve(active):
            n = len(active)
            A = [
                [
                    Fr(
                        (visits[a] if a == bcol else 0)
                        - (trans.get((a, bcol), 0) if bcol != "start" else 0)
                    )
                    for bcol in active
                ]
                for a in active
            ]
            bb = [Fr(conv[a]) for a in active]
            M = [A[i] + [bb[i]] for i in range(n)]
            for c in range(n):
                p = next(r for r in range(c, n) if M[r][c] != 0)
                M[c], M[p] = M[p], M[c]
                M[c] = [v / M[c][c] for v in M[c]]
                for r in range(n):
                    if r != c and M[r][c] != 0:
                        M[r] = [
                            vr - M[r][c] * vc for vr, vc in zip(M[r], M[c])
                        ]
            return M[0][n]  # x_start

        def e6(frac):
            v = frac * 10**6
            return _half_up(v.numerator, v.denominator)

        row = registry.QUERIES["attribution_markov_removal"](
            spark, sf_dir
        ).collect()[0]
        full = solve(states)
        assert row.p_conv_e6 == e6(full)
        for ch in MARKOV_CHANNELS:
            sub = [s for s in states if s != ch]
            p = solve(sub)
            got = getattr(row, f"p_wo_{ch}_e6")
            assert got == e6(p), ch
            # removing a channel can only remove conversion paths
            assert p <= full
        assert 0 <= row.p_conv_e6 <= 10**6
