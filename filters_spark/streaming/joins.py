"""Stream-stream interval join — event-time correlation with bounded
state.

One operator, two execution modes (the same design point as
streaming/windows.py): ``interval_join`` declares a key-equality join
plus an event-time RANGE condition (``right.ts`` within
``[left.ts + lower, left.ts + upper]``). Run over static frames it is
an ordinary equi-join with a range filter — ONE shuffle per side on
the key, Catalyst's planning. Run over two streams it is Spark's
watermarked stream-stream inner join: the range condition is what lets
the engine derive, from each side's watermark, when a buffered row can
never match a future row from the other side and EVICT it — without
the interval bound, stream-stream join state grows forever. That state
bound is the whole 100-TB/day story: both sides buffer only
``watermark + interval`` worth of rows per key, independent of stream
length.

Reference parity tier: the reference library is a scalar validation
pipeline with no join surface (SURVEY.md §2.6); this is engine-layer
north-rule surface (correlating a change stream against a second
event stream — audit events to commits, clicks to purchases).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 1800.0,
    watermark: str | None = None,
    prefixes: tuple[str, str] = ("l_", "r_"),
    how: str = "inner",
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``key_cols`` equality AND
    ``right_ts`` in ``[left_ts + lower_s, left_ts + upper_s]`` seconds
    (bounds inclusive; ``lower_s`` may be negative for
    right-before-left windows).

    Output columns: ``key_cols`` once, then every other column of each
    side under its prefix (both ``ts`` columns survive, prefixed —
    downstream dedupe/windowing usually needs them).

    ``watermark`` (e.g. ``"10 minutes"``) is applied to BOTH sides'
    event-time columns; required for streaming (Spark refuses an
    unbounded stream-stream inner join), ignored by the batch planner —
    pass it unconditionally and the operator is mode-agnostic. In
    streaming, rows later than the watermark are dropped by contract
    and matches are emitted in append mode as soon as both rows have
    arrived (inner join never needs to wait for finalization).

    ``how``: ``inner`` (default), ``left_outer``, ``right_outer`` or
    ``full_outer``. Outer matches stream differently from inner ones:
    an unmatched row emits (other side NULL) only once the WATERMARK
    closes its join window — the engine must prove no future partner
    can arrive before it declares "no match" (so outer results trail
    the watermark by ``interval + lateness``; batch mode emits them
    immediately, same result set).

    NOTE on keys under outer modes: the un-prefixed key columns are
    taken from the LEFT side, so under ``right_outer``/``full_outer``
    an unmatched RIGHT row has NULL keys in those columns — read its
    key from the prefixed right columns, which are preserved for
    exactly this case (for ``inner``/``left_outer`` they are dropped
    as redundant).
    """
    lp, rp = prefixes
    if lp == rp:
        raise ValueError("prefixes must differ")
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported how: {how!r}")
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    for c in left.columns:
        if c not in key_cols:
            left = left.withColumnRenamed(c, lp + c)
    for c in right.columns:
        # right keys keep a prefixed name too: the join condition needs
        # both sides addressable, and the select below drops them
        right = right.withColumnRenamed(c, rp + c)
    lts, rts = lp + left_ts, rp + right_ts
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(rp + k))
    # INTERVAL literal spelling (not make_dt_interval + cast): Spark's
    # stream-stream state-eviction analyzer must derive watermark
    # bounds from this condition, and outer joins REQUIRE it to — the
    # cast the interval-constructor form introduces defeats the
    # pattern match and fails the query at analysis
    # fixed-point, not repr(): float repr of magnitudes < 1e-4 or
    # >= 1e16 is scientific notation, which the INTERVAL parser rejects
    lo = f"INTERVAL '{float(lower_s):.6f}' SECOND"
    hi = f"INTERVAL '{float(upper_s):.6f}' SECOND"
    cond = (
        cond
        & F.expr(f"`{rts}` >= `{lts}` + {lo}")
        & F.expr(f"`{rts}` <= `{lts}` + {hi}")
    )
    joined = left.join(right, cond, how)
    keep = list(key_cols)
    keep += [c for c in joined.columns if c.startswith(lp)]
    keep += [
        c for c in joined.columns
        if c.startswith(rp)
        and (c[len(rp):] not in key_cols or how in ("right_outer", "full_outer"))
    ]
    return joined.select(*keep)
