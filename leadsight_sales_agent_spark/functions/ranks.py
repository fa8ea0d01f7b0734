"""Prefix-sharded global ordering devices.

An unpartitioned ``Window.orderBy`` moves the whole input through ONE
task (Spark's WindowExec warns about exactly this) — the classic
100 TB bottleneck that plan-lint rule R6 flags. But whenever the
FIRST component of the total order can serve as a partition key (a
hash string's leading hex char, a numeric key's block, a date, the
value itself), the global rank/cumulative decomposes exactly:

    global(row) = offset(shard) + within_shard(row)

where offset is a cumulative over the tiny per-shard totals grid
(bounded: 16 hex chars, a calendar, a value domain — and itself an
aggregate, so its own single-partition window passes R6's
bounded-grain check). Each shard's window then runs in parallel.

This module is the reusable form of the device proven in
``pack_sequences_token_budget`` and ``sample_pps_systematic``
(operators/sampling.py): per-shard windows + broadcast shard offsets,
bit-identical to the single global window.

``ntile_from_rank`` closes the loop for ntile consumers: SQL ntile(b)
is a pure closed form of (rank, n) — first n%b buckets hold
ceil(n/b) rows, the rest floor(n/b) — so a sharded rank replaces a
global ntile exactly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sharded_prefix(
    df: DataFrame,
    shard_col: str,
    order_cols: list,
    rank_out: Optional[str] = None,
    sums: Optional[dict[str, str]] = None,
    total_out: Optional[str] = None,
) -> DataFrame:
    """Attach global row_number (``rank_out``) and/or global running
    sums (``sums``: out_name -> value column) over the total order
    (shard_col, *order_cols), computed shard-parallel.

    REQUIREMENT: shard_col must be a PREFIX of the intended total
    order — every row of a lexically/numerically smaller shard sorts
    before every row of a larger one (hash first-char, key block,
    date, the leading sort column itself). Within a shard, rows are
    ordered by ``order_cols``.

    ``total_out`` additionally attaches the grand row count (the ``n``
    that ntile_from_rank needs). The shard-totals frame is one
    map-side-combinable aggregate; its cumulative runs over the
    bounded shard grid and broadcasts back.

    Grid-size contract: hex-char / calendar / value-domain shards are
    constant-bounded. KEY-BLOCK shards (key DIV 2^16) shrink the
    problem by 65536x per level, so if the totals grid itself ever
    outgrows broadcast size (~10^12 input rows), apply the device
    RECURSIVELY — shard the grid by a coarser prefix; two levels cover
    2^32 blocks. The consumers in this repo are all one level deep.

    NULL shards: rows whose shard key is NULL are kept (the join back
    to the offsets frame is null-safe) and sort FIRST — matching the
    Spark global window's ASC NULLS FIRST default, so the device stays
    bit-identical to the single window even when a consumer derives
    shards from a nullable data column.
    """
    sums = sums or {}
    aggs = [F.count(F.lit(1)).alias("_sh_cnt")]
    for out, col in sums.items():
        aggs.append(F.sum(col).alias(f"_sh_sum_{out}"))
    offs = df.groupBy(shard_col).agg(*aggs)
    woff = Window.orderBy(shard_col).rowsBetween(Window.unboundedPreceding, -1)
    sel = [
        F.col(shard_col),
        F.coalesce(F.sum("_sh_cnt").over(woff), F.lit(0)).alias("_off_cnt"),
    ]
    for out in sums:
        sel.append(
            F.coalesce(F.sum(f"_sh_sum_{out}").over(woff), F.lit(0)).alias(
                f"_off_{out}"
            )
        )
    if total_out:
        wall = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        sel.append(F.sum("_sh_cnt").over(wall).alias(total_out))
    offs = offs.select(*sel)
    # Null-safe equi-join: a NULL shard key must match its own offsets
    # row, not silently drop (plain `join(..., shard_col)` is an inner
    # equi-join that discards NULL keys). The offsets window above
    # already orders NULL first (Spark ASC NULLS FIRST), so NULL-shard
    # rows get offset 0 — exactly the global window's placement.
    offs = offs.withColumnRenamed(shard_col, "_sh_key")
    res = df.join(
        F.broadcast(offs), F.col(shard_col).eqNullSafe(F.col("_sh_key"))
    ).drop("_sh_key")
    wsh = Window.partitionBy(shard_col).orderBy(*order_cols)
    if rank_out:
        res = res.withColumn(
            rank_out, F.col("_off_cnt") + F.row_number().over(wsh)
        )
    for out, col in sums.items():
        res = res.withColumn(
            out,
            F.col(f"_off_{out}")
            + F.sum(col).over(wsh.rowsBetween(Window.unboundedPreceding, 0)),
        )
    drop = ["_off_cnt"] + [f"_off_{out}" for out in sums]
    return res.drop(*drop)


def ntile_from_rank(rank_col: str, n_col: str, buckets: int) -> Column:
    """The bucket ntile(buckets) OVER (<total order>) would assign to
    the row with 1-based global rank ``rank_col`` among ``n_col``
    rows: the first n%b buckets take n DIV b + 1 rows, the remainder
    n DIV b (SQL-standard, what Spark and DuckDB both implement).
    Pure integer arithmetic — the CASE guards the q=0 (n < buckets)
    edge where the ELSE branch would divide by zero.
    """
    q = f"({n_col} DIV {buckets})"
    r = f"({n_col} % {buckets})"
    rk = f"({rank_col})"
    return F.expr(
        f"CAST(CASE WHEN {rk} <= ({q} + 1) * {r}"
        f" THEN ({rk} - 1) DIV ({q} + 1) + 1"
        f" ELSE {r} + 1 + ({rk} - ({q} + 1) * {r} - 1) DIV {q} END AS INT)"
    )
