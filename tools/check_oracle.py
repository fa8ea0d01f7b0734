"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the
same parquet, then compares row count, column names, and an
order-insensitive value multiset (stringified, sorted). Run:

    python tools/check_oracle.py [sf_dir] [query ...]

Exit code 0 iff everything matches.
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

# pandas is a HARD STARTUP dependency of this tool (baked into the
# container): an import failure crashes the gate at launch rather than
# surfacing per-query — the per-query CANONICALIZER ERROR handling
# below covers canonicalization CRASHES, not a missing pandas (r8
# ADVICE: comment aligned with the top-level import).
import pandas as _pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # Full repr, no rounding, NO integral collapse: the r2 driver
        # failed ansi_try_safety_suite while this gate (then collapsing
        # 499596.0 -> "499596") passed it, proving the collapse laxer
        # than the driver's hash. Type mismatches (BIGINT count in one
        # engine, DOUBLE in the other) are now fixed in the oracles by
        # casting identically on both sides, not forgiven here.
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


# Coarse cross-engine type classes. The driver's value-hash may be
# type-sensitive (an Arrow-backed hash sees DuckDB HUGEINT as
# decimal128 but Spark BIGINT as int64 even when every value is equal),
# so the gate demands the same class on both sides and the oracles cast
# explicitly where the engines' inference rules differ (e.g. DuckDB
# sum(INTEGER) -> HUGEINT must be CAST AS BIGINT).
_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bytes",
}
_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "hugeint", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "BLOB": "bytes",
}


def type_class(spark_dtype: str, duck_type: str):
    """Return (spark_class, duck_class); mismatch => oracle needs a cast."""
    s = spark_dtype.lower()
    d = str(duck_type).upper()
    if s.startswith("decimal"):
        sc = "decimal"
    elif s.startswith("array"):
        sc = "array"
    elif s.startswith(("struct", "map")):
        sc = "struct"
    else:
        sc = _SPARK_CLASS.get(s, s)
    if d.startswith("DECIMAL"):
        dc = "decimal"
    elif d.endswith("[]") or d.startswith("LIST"):
        dc = "array"
    elif d.startswith("STRUCT") or d.startswith("MAP"):
        dc = "struct"
    else:
        dc = _DUCK_CLASS.get(d, d.lower())
    return sc, dc


def main() -> int:
    args = sys.argv[1:]
    # --driver-replay (r13, verdict task 4): replay the DRIVER's
    # protocol shape instead of the gate's default — queries in
    # REGISTRY order (the order the driver grades them) rather than
    # sorted, and DuckDB forced onto its external/spilling paths from
    # the first query via a low memory limit (the method that
    # reproduced the r12 hurst connection-memory-state flake). Local
    # green under this mode plus default mode brackets both engine
    # states the driver can be in.
    driver_replay = "--driver-replay" in args
    args = [a for a in args if a != "--driver-replay"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from leadsight_sales_agent_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    # r12 flake class: DuckDB's window ORDER BY placed a NULL order
    # date differently on its external (spilling) path than in-memory,
    # so timeseries_hurst_rs flipped green/red with CONNECTION MEMORY
    # STATE, not code (reproduced by bisect: the value changed only
    # after enough prior oracles had run). The class fix is the data
    # contract (no NULLs in order columns — the null-ts and null-date
    # waves); this knob exists to PROVE it holds: set e.g.
    # SPARK_GRAFT_DUCKDB_MEMORY_LIMIT=64MiB to force the external
    # paths from the first query, so any remaining
    # NULL-in-an-ORDER-BY seam fails deterministically instead of
    # flaking rounds later.
    mem_limit = os.environ.get("SPARK_GRAFT_DUCKDB_MEMORY_LIMIT")
    if not mem_limit and driver_replay:
        mem_limit = "256MiB"
    if mem_limit:
        # r13 (advisor): validate before interpolating into SET — a
        # malformed value must fail with a clear message, not a
        # confusing SQL error from a stray quote.
        import re as _re

        if not _re.fullmatch(r"\d+(\.\d+)?\s*[KMGT]i?B", mem_limit.strip()):
            print(
                "check_oracle: invalid SPARK_GRAFT_DUCKDB_MEMORY_LIMIT "
                f"{mem_limit!r} (expected e.g. 256MiB / 2GB)"
            )
            return 2
        con.execute(f"SET memory_limit='{mem_limit.strip()}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures, checked, rows_only = [], 0, 0
    order = list(qs.items()) if driver_replay else sorted(qs.items())
    for name, fn in order:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # Driver-strictness guard (round-5 finding): the driver's
            # pandas canonicalizer crashes on array/map/struct-typed
            # cells (`unhashable type: 'list'` in sort_values), while
            # this gate's norm_cell used to stringify them — local
            # green did not predict driver red. Complex-typed output
            # columns are therefore banned outright for EVERY
            # registered query (rows-only ones rotate into the panel
            # too): serialize (concat_ws / to_json) or explode.
            complex_cols = [
                (c, t)
                for c, t in sdf.dtypes
                if t.startswith(("array", "map", "struct"))
            ]
            if complex_cols:
                failures.append(
                    (name, f"complex-typed output (driver-unsafe): {complex_cols}")
                )
                print(f"FAIL  {name}: complex-typed output columns {complex_cols}")
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        # Emulate the driver's pandas canonicalization (sort_values
        # over every column) so ANY cell class that crashes it — not
        # just the banned complex types — fails HERE first. Kept in
        # its OWN try block so a canonicalizer crash is reported as a
        # canonicalizer-compat failure, never mislabeled SPARK ERROR.
        try:
            _pd.DataFrame(srows, columns=scols).sort_values(list(scols))
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"CANONICALIZER ERROR (driver-unsafe cells): {ex}"))
            print(f"FAIL  {name}: canonicalizer error (driver-unsafe cells): {ex}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            # r14 (VERDICT r13 task 7): per-query memory FLOOR for the
            # replay mode. The global 256 MiB cap exists to force
            # DuckDB's external/spilling paths (the r12 flake class),
            # but pipeline_full_release's 4-stage MATERIALIZED-CTE
            # oracle legitimately needs more than the cap to run AT
            # ALL — a resource artifact, not a divergence. On an
            # OutOfMemory in replay mode, retry that ONE query at a
            # 2 GiB floor and restore the cap, so the replay gate
            # covers all 486 oracles while every query that CAN run
            # under the cap still exercises the spilling paths.
            retried = False
            if (
                driver_replay
                and mem_limit
                and "memory" in str(ex).lower()
            ):
                try:
                    con.execute("SET memory_limit='2GiB'")
                    rel = con.sql(oracles[name])
                    ocols = list(rel.columns)
                    otypes = [str(t) for t in rel.types]
                    orows = rel.fetchall()
                    retried = True
                    print(
                        f"note  {name}: oracle OOM under {mem_limit}; "
                        "re-ran at the 2GiB per-query floor"
                    )
                except Exception as ex2:  # noqa: BLE001
                    ex = ex2
                finally:
                    con.execute(f"SET memory_limit='{mem_limit.strip()}'")
            if not retried:
                failures.append((name, f"DUCKDB ERROR: {ex}"))
                print(f"FAIL  {name}: duckdb error: {ex}")
                continue
        checked += 1
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            sdtypes = dict(sdf.dtypes)
            for c, dt in zip(ocols, otypes):
                sc, dc = type_class(sdtypes[c], dt)
                if sc != dc:
                    problems.append(
                        f"type-class {c}: spark {sdtypes[c]}({sc}) vs duckdb {dt}({dc})"
                    )
        if not problems:
            sn, on = normalize(srows, scols), normalize(orows, ocols)
            if sn != on:
                diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        # r11: queries that persist() shared frames must not tax the
        # rest of the 484-query session (same hygiene as bench.py)
        spark.catalog.clearCache()

    print(
        f"\n{checked} oracle-checked, {rows_only} rows-only, {len(failures)} failures"
    )
    # Machine-readable sentinel: the summary ALWAYS ends with this line
    # when the run reached the verdict stage. tools/empty_audit.py keys
    # its crashed-vs-seams-only decision off it (a nonzero exit WITHOUT
    # the sentinel = harness crash), so it must never be reworded —
    # that contract is what lets a wording change in the prose summary
    # stay harmless.
    import json as _json

    import pyspark as _pyspark

    print("CHECK_ORACLE_SUMMARY " + _json.dumps(
        {"checked": checked, "rows_only": rows_only,
         "failures": len(failures),
         # r13 (verdict task 4): the r12 driver divergence was a
         # DuckDB build difference the gate could not see — name the
         # engine versions so CHECK vs driver runs are attributable.
         "duckdb": duckdb.__version__, "pyspark": _pyspark.__version__,
         "driver_replay": driver_replay,
         "memory_limit": mem_limit or None}))
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
