"""Z-order (Morton) interleave key for multi-dimensional write clustering.

Why it exists: file-level min/max skipping (lake/table.py ``read(where=
...)``/``sort_cols``) is only selective when files hold TIGHT ranges of
the filtered column — and a linear sort can make ranges tight in ONE
dimension only. Sorting by the bit-interleaved key of two dimensions
(Delta ``OPTIMIZE ZORDER BY``, Iceberg's z-ordered rewrites) makes each
file a small RECTANGLE in (a, b) space instead of a thin slab, so range
predicates on EITHER column prune files (tests/test_zorder.py measures
exactly this on parquet footer stats).

The key is a pure map-side expression — 2·bits literal-shift terms over
disjoint bit positions summed together (``shiftleft`` accepts only
literal shift amounts, hence the unrolled form), no UDF, no shuffle —
and exact integer algebra, so the DuckDB twin (:func:`zorder_sql`)
recomputes it bit-identically (oracled ``sort_zorder_key``).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two dimensions: interleaves the low ``bits`` bits
    of each (``a``'s bits land at odd positions, ``b``'s at even), so
    points close in BOTH dimensions get close keys. Inputs are masked
    to ``bits`` (callers normalize values into [0, 2^bits) — e.g. rank
    or quantize first; Morton locality is only meaningful on bounded
    non-negative coordinates). Result fits a long for bits <= 31."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftrightunsigned(am, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftrightunsigned(bm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    # disjoint bit positions: sum == bitwise OR, and + keeps the whole
    # expression inside whole-stage codegen as one arithmetic chain
    return reduce(lambda x, y: x + y, terms)


def zorder_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`zorder_key` (multiplication by power-of-
    two literals instead of shifts; same exact integer algebra)."""
    mask = (1 << bits) - 1
    parts = []
    for i in range(bits):
        parts.append(f"(((({a_expr}) & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
        parts.append(f"(((({b_expr}) & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
    return "(" + " + ".join(parts) + ")"


def zorder_py(a: int, b: int, bits: int = 16) -> int:
    """Python twin for tests."""
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


def quantize_rank(
    df,
    col: str,
    bits: int = 8,
    out_col: str | None = None,
    tiebreak: list | None = None,
    group_cols: tuple = (),
):
    """Rank-normalize a column into ``[0, 2^bits)`` — the practical
    front-end for :func:`zorder_key`, whose Morton locality needs
    bounded uniform coordinates while real columns are skewed and
    unbounded. ``q = floor(percent_rank * (2^bits - 1) + 0.5)``: equal
    mass per bucket regardless of the value distribution (a min/max
    scale would collapse under outliers).

    One window (= one shuffle, on ``group_cols`` if given — pass the
    write-partition column so the sort is per-partition and the window
    never sees the whole table in one task). ``tiebreak`` columns make
    the rank — and therefore the quantile — deterministic under equal
    values; percent_rank is exact double arithmetic on integer ranks,
    so the result is engine-portable (DuckDB spells the identical
    formula).

    Bare ``group_cols=()`` is an UNPARTITIONED window — the entire
    input flows through ONE task, a scale-killer on anything beyond
    driver-sized data. It stays available for small frames (exact
    global quantiles are occasionally what you want) but warns so it
    can't ship silently; every table-scale caller must pass the
    write-partition / bucket column (``LakeTable.rewrite_zorder``
    passes ``("_bucket",)``; an independent hash bucket, e.g.
    ``pmod(key, 16)``, approximates the global quantile while keeping
    the sort per-partition).
    """
    import warnings as _warnings

    from pyspark.sql import Window

    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    if not group_cols:
        _warnings.warn(
            "quantize_rank(group_cols=()) ranks over an UNPARTITIONED "
            "window: the whole input sorts in one task. Pass the "
            "write-partition/bucket column for table-scale data.",
            stacklevel=2,
        )
    out_col = out_col or f"{col}_q{bits}"
    order = [F.col(col).asc(), *[F.col(c).asc() for c in (tiebreak or [])]]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    q = F.floor(
        F.percent_rank().over(w) * F.lit(float((1 << bits) - 1)) + F.lit(0.5)
    ).cast("long")
    return df.withColumn(out_col, q)
