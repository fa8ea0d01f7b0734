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
