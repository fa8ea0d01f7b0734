"""Degenerate-input totality audit (r10): run EVERY registered query —
Spark side AND DuckDB oracle — against ZERO-ROW and SINGLE-ROW tables
with the production schemas, and require the two engines to agree
exactly.

Why this gate exists: "a filter that matched nothing" and "a slice
with one member" are routine production states (a date slice with no
orders, a language with one document, an A/B arm with no traffic, a
single-sample fold), and they are exactly where four latent bug
classes live that the value gates on populated data can never see:

1. degenerate-denominator crashes — Spark ANSI raises DIVIDE_BY_ZERO
   where DuckDB yields NULL, on n-1 variances, zero ranges, absent
   classes, zero determinants (fixed repo-wide with the
   nullif(den, 0) device: identical syntax and semantics in both
   engines, a no-op on every non-degenerate input);
2. empty-collect anchors — k-centroid / codebook literals built from
   .collect() produce VOID-typed arrays that fail analysis (fixed
   with explicit array casts on the literals, constant-folded when
   non-empty);
3. NULL-vs-0 / NULL-vs-'' seams (max/sum over nothing vs count-like
   0; Spark concat_ws skips nulls where string_agg yields NULL);
4. quantifier rewrites that are only valid on non-empty sets
   (x > ALL (∅) is vacuously true; > max(∅) = NULL is not — the
   rewrite now carries the explicit empty-set branch).

Known, documented engine divergence (asserted, not a failure): Spark
emits NO rows for GROUP BY ROLLUP/CUBE/GROUPING SETS over empty input
— including the () grouping set — while DuckDB (and the SQL standard)
emit the grand-total row. The six rollup-family oracles carry
`HAVING count(*) > 0`, a no-op on any non-empty input, so the graded
contract adopts Spark's semantics.

Known, documented LOUD seam (single-row fixture only):
embedding_pq_quantize refuses a corpus smaller than its codebook
(PQ_K vectors per subspace) with a ValueError — a misconfiguration
should fail loudly, not train a degenerate codebook. The audit
accepts exactly that error on fixtures with 1 <= rows < PQ_K.

Third fixture (r10, --nulls / default): PLANTED NULLS in the nullable
value columns (documents.text 1-in-7, documents.lang 1-in-11,
events.value 1-in-5, events.ts 1-in-13 since r11, customer.c_acctbal
1-in-7) over the full sf0.001 rows. This surfaced the null-SEMANTICS seam classes: engine-divergent
NULL placement under ntile's ORDER BY (Spark NULLS FIRST, DuckDB
NULLS LAST — resolved by filtering null ranking keys on both sides,
documented per query), DuckDB concat() silently swallowing NULL args
(use || or concat_ws), count(*)-vs-count(col) as an avg denominator,
md5-of-coalesced-empty collapsing every null doc into one dedup
bucket, and NaN.astype(int64) crashes in pandas stateful folds.

Fourth fixture (r10 session 2, --adv): PLANTED ADVERSARIAL VALUES —
non-null values the generator never emits but any real corpus
contains. Null and single-row fixtures cannot reach this class: a
NULL text short-circuits every expression to NULL, while an EMPTY or
ONE-TOKEN text must flow through the whole tokenize/shingle/window
pipeline without tripping Spark's descending `sequence(1, 0)` or
ANSI INVALID_ARRAY_INDEX (the bug class the r9 advisory found in
DSIR's bigram leg — planted here so the gate owns it forever).
Plants: documents.text in {"", "a", "a b", "ab", whitespace-only,
all-same-token, leading/trailing-space, four multibyte/unicode
texts (accents, CJK, emoji/astral-plane, case-folding exotica)}
(n_chars kept consistent); embeddings.embedding in {all-zero (zero
norm -> cosine 0/0), exact-duplicate and negated copies of another
row (similarity ties at +1/-1), NULL (never-computed vectors —
DuckDB list_dot_product refuses a NULL list where Spark folds to
NULL)}; events.value exact five-way tie block plus a negative and
a zero; customer c_acctbal zero and exact cross-row ties.

Run:  python tools/empty_audit.py            # all four fixtures
      python tools/empty_audit.py --rows 0   # zero-row only
      python tools/empty_audit.py --rows 1   # single-row only
      python tools/empty_audit.py --nulls    # planted-nulls only
      python tools/empty_audit.py --adv      # adversarial values only
Builds .tmp/sf_empty / .tmp/sf_one / .tmp/sf_nulls / .tmp/sf_adv
(single-file parquets, schemas and rows copied from sf0.001) and
execs tools/check_oracle.py against them. Exit 0 = every query total
and engine-agreed on the fixture(s).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# (query, fixture-rows, error-substring): loud-by-design refusals
EXPECTED_SEAMS = {
    ("embedding_pq_quantize", 1): "PQ needs at least",
}


# planted nulls: column -> every-k-th row NULLed (nullable value
# columns only; keys/dates stay non-null)
NULL_PLAN = {
    "documents": {"text": 7, "lang": 11},
    # ts (r11, verdict task): NULL event time reaches seams the value
    # plants cannot — sessionization islands, window ORDER BY (Spark
    # NULLS FIRST vs DuckDB NULLS LAST), as-of joins, interval
    # arithmetic, watermark batch twins.
    "events": {"value": 5, "ts": 13},
    "customer": {"c_acctbal": 7},
    # o_orderdate (r12, second null-time wave): a NULL ORDER date is
    # the warehouse sibling of a NULL event time (bad ETL, unparsed
    # source dates) and reaches every month-grid / ORDER BY
    # o_orderdate window the events plants cannot.
    "orders": {"o_orderdate": 17},
}

# ALL-null event-time plants layered on top of the modular ts plant
# (r12): (user_id, event_type) -> every ts of that user+type becomes
# NULL; event_type None nulls the user's whole timeline. Exercises the
# min(ts)-anchor seam the modular plant cannot reach (a user whose
# ENTIRE anchor stage has no timestamps).
NULL_TS_USER_PLANTS = (
    (13, "signup"),  # all-null anchor stage (the funnel n_signup seam)
    (11, "view"),  # all-null middle stage
    (12, "purchase"),  # all-null terminal stage
    (0, None),  # user with no usable timeline at all
    # TYPE-wide plant (r12 second wave): EVERY 'error' event loses its
    # timestamp, across all users — reaches whole-type anchors
    # (min(ts) per event_type / per (type, day) grids) that the
    # per-user plants cannot make all-NULL.
    (None, "error"),
)

# adversarial non-null values (--adv): row index -> replacement text.
# Short/empty/degenerate documents — the descending-sequence /
# INVALID_ARRAY_INDEX class; n_chars is recomputed to stay consistent.
ADV_TEXTS = {
    3: "",
    9: "a",
    15: "a b",
    21: "   ",
    27: "x x x x x",
    33: "ab",
    39: " lead trail ",
    # multibyte/unicode (length(), regex classes, case folding must
    # agree cross-engine on non-ASCII):
    45: "héllo wörld straße café naïve",
    51: "中文 文本 多字节 编码 测试 中文 文本",
    57: "emoji 🙂 test 🚀 rows 🙂 again",
    63: "ACCENTS ÉÀÇ über ÖSTERREICH σίγμα ΣΊΓΜΑ",
}


def _plant_adversarial(t: str, tb):
    import pyarrow as pa

    rows = tb.to_pylist()
    if t == "documents":
        for i, txt in ADV_TEXTS.items():
            rows[i]["text"] = txt
            rows[i]["n_chars"] = len(txt)
    elif t == "embeddings":
        dim = len(rows[0]["embedding"])
        rows[5]["embedding"] = [0.0] * dim  # zero norm
        rows[11]["embedding"] = list(rows[0]["embedding"])  # exact dup
        rows[17]["embedding"] = [-x for x in rows[0]["embedding"]]  # antipode
        for i in (7, 20, 33):  # never-computed vectors
            rows[i]["embedding"] = None
        rows[9]["embedding"][0] = float("nan")  # corrupted component
        rows[13]["embedding"][0] = float("inf")
        # NULL element inside an otherwise-valid vector (r11, advisor
        # finding): Spark's forall yields NULL -> row dropped, DuckDB's
        # list_filter treated the NULL lambda result as false -> row
        # kept; pins the `x IS NULL OR NOT isfinite(x)` SQL twins.
        rows[25]["embedding"][2] = None
        # second NULL-element plant BELOW N_QUERIES=10 (r12, advisor
        # finding): knn query vectors are capped at vec_id < 10, so a
        # plant at 25 can only ever pin the NEIGHBOR side — vector 4
        # pins the query_id side of the drop contract too.
        rows[4]["embedding"][1] = None
    elif t == "events":
        for i in range(10, 15):  # exact five-way value tie
            rows[i]["value"] = 100.0
        rows[3]["value"] = -50.0  # refund-style negative
        rows[7]["value"] = 0.0
        rows[23]["value"] = float("nan")  # garbage measurements
        rows[29]["value"] = float("inf")
        import datetime as _dt

        rows[41]["ts"] = _dt.datetime(1970, 1, 1, 0, 0, 1)  # epoch edge
        rows[43]["ts"] = _dt.datetime(2199, 12, 31, 23, 59, 59)  # far future
        rows[47]["props"] = "not json at all"  # malformed JSON payloads
        rows[53]["props"] = '{"k": '
        rows[59]["props"] = ""
        rows[61]["props"] = '{"k": null, "extra": [1,2,{"deep": true}]}'
    elif t == "customer":
        rows[2]["c_acctbal"] = 0.0
        rows[8]["c_acctbal"] = rows[4]["c_acctbal"]  # exact tie
    else:
        return tb
    return pa.Table.from_pylist(rows, schema=tb.schema)


def build_fixture(src_dir: str, out_dir: str, rows: int) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        tb = pq.read_table(f"{src_dir}/{t}.parquet")
        if rows >= 0:
            tb = tb.slice(0, rows)
        elif rows == -2:  # adversarial-values mode: full rows, planted values
            tb = _plant_adversarial(t, tb)
        else:  # nulls mode: full rows, planted nulls
            for col, k in NULL_PLAN.get(t, {}).items():
                n = tb.num_rows
                mask = pa.array([i % k == 0 for i in range(n)])
                c = tb.column(col).combine_chunks()
                nulled = pc.if_else(mask, pa.nulls(n, c.type), c)
                tb = tb.set_column(tb.schema.get_field_index(col), col, nulled)
            if t == "events":
                # ALL-null-per-user plants (r12, advisor finding): the
                # 1-in-13 modular plant never nulls EVERY signup of one
                # user, so min(ts)-anchored funnels could diverge
                # (oracle count(*) counts a min=NULL group, Spark's
                # count(f.t1) skips it) while the gate stayed green by
                # data luck. Users 0-14 each have all four funnel
                # stages in the sf0.001 slice; null one full stage for
                # three of them and the entire timeline for a fourth.
                for uid, etype in NULL_TS_USER_PLANTS:
                    if uid is None:  # type-wide plant, all users
                        m = pc.equal(tb.column("event_type"), etype)
                    else:
                        m = pc.equal(tb.column("user_id"), uid)
                        if etype is not None:
                            m = pc.and_(m, pc.equal(tb.column("event_type"), etype))
                    c = tb.column("ts").combine_chunks()
                    nulled = pc.if_else(m, pa.nulls(tb.num_rows, c.type), c)
                    tb = tb.set_column(tb.schema.get_field_index("ts"), "ts", nulled)
        pq.write_table(tb, f"{out_dir}/{t}.parquet")


def run_one(here: str, src: str, rows: int, only: list[str] | None = None) -> int:
    name = {0: "sf_empty", 1: "sf_one", -1: "sf_nulls", -2: "sf_adv"}[rows]
    out = os.path.join(here, ".tmp", name)
    build_fixture(src, out, rows)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(here, "tools", "check_oracle.py"),
            out,
            *(only or []),
        ],
        capture_output=True,
        text=True,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode == 0:
        return 0
    # tolerate ONLY the documented loud seams for this fixture size
    unexplained = []
    for line in proc.stdout.splitlines():
        if not line.startswith("FAIL"):
            continue
        name = line.split()[1].rstrip(":")
        seam = EXPECTED_SEAMS.get((name, rows))
        if not (seam and seam in line):
            unexplained.append(line)
    if not unexplained and "CHECK_ORACLE_SUMMARY" not in proc.stdout:
        # nonzero exit without the machine-readable summary sentinel =
        # the harness itself crashed (import error, OOM) before the
        # verdict stage — never report that as OK. (r11: keyed off the
        # stable sentinel, not the prose summary wording.)
        print(f"[empty_audit] rows={rows}: check_oracle crashed before verdicts")
        return 1
    if unexplained:
        print(f"[empty_audit] rows={rows}: {len(unexplained)} unexplained failures")
        return 1
    print(f"[empty_audit] rows={rows}: only documented seams failed — OK")
    return 0


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    src = "/root/testdata/sf0.001"
    if "--rows" in args:
        rows_list = [int(args[args.index("--rows") + 1])]
    elif "--nulls" in args:
        rows_list = [-1]
    elif "--adv" in args:
        rows_list = [-2]
    else:
        rows_list = [0, 1, -1, -2]  # -1 = planted nulls, -2 = adversarial values
    # Positional args (r13): query names forwarded to check_oracle so a
    # targeted fixture re-check of a few touched queries doesn't cost a
    # full ~10-min sweep per fixture. (The --rows VALUE is consumed
    # above, so skip the token right after that flag.)
    only: list[str] = []
    skip_next = False
    for i, a in enumerate(args):
        if skip_next:
            skip_next = False
            continue
        if a == "--rows":
            skip_next = True
        elif not a.startswith("--"):
            only.append(a)
    rc = 0
    for rows in rows_list:
        rc |= run_one(here, src, rows, only)
    return rc


if __name__ == "__main__":
    sys.exit(main())
