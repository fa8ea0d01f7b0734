"""Time individual registered queries through the noop sink (guide §1.4).

Usage: python tools/time_queries.py [--sf DIR] [--reps N] query [query ...]

Same methodology as bench.py (warm-up pass at sf0.001, then REPS timed
runs each followed by clearCache), but for an arbitrary subset — the
isolate-one-query loop of an optimization round without paying for the
whole headline suite.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from leadsight_sales_agent_spark import registry  # noqa: E402
from leadsight_sales_agent_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (codegen + Python worker spawn) at the tiny SF
    for name in args.queries:
        registry.QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.reps):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, xs in samples.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"{name}: median {med:.3f}s  samples {[round(x, 3) for x in xs]}")
    spark.stop()


if __name__ == "__main__":
    main()
