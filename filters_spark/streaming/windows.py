"""Event-time windowed aggregation with watermark-bounded state.

One operator, two execution modes — the Structured Streaming design
point: the SAME ``groupBy(window(...))`` logical plan runs as a batch
aggregate over a static frame (watermark is a no-op) or as an
incremental stateful aggregate over a stream, where the watermark both
admits bounded lateness and lets Spark DROP window state once no
more-late data can arrive. That state bound is what makes the operator
runnable forever at 100-TB/day rates: without a watermark, windowed
state grows without limit.

In streaming append mode a window's row is emitted exactly once, when
the watermark passes the window end (finalized result, safe to commit
downstream); rows arriving later than the watermark allows are dropped
by contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs from ``window``)
    event-time aggregate: row count and exact value sum per
    (window, group). Value is summed as DECIMAL so the result is
    independent of partition/merge order (a double sum is not).

    ``watermark`` (e.g. ``"10 minutes"``) is required for streaming
    append mode and ignored by the batch planner — pass it
    unconditionally and the operator is mode-agnostic.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        events.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def session_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "8 hours",
    watermark: str | None = None,
    group_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session windows (``F.session_window``): consecutive
    events of a group belong to one session while each arrives within
    ``gap`` of the previous one (inclusive: an event exactly ``gap``
    later still extends the session — Spark coalesces TOUCHING
    windows); the window spans
    ``[first_ts, last_ts + gap)``. Same mode duality as
    :func:`windowed_event_stats` — identical plan in batch and in
    Structured Streaming, where sessions are MERGED incrementally as
    events arrive and a session's row is emitted once, when the
    watermark passes its end (no more event can extend it). Session
    state is watermark-bounded: without the watermark an always-on
    stream would keep every open session forever.

    Equivalent batch formulation (the DuckDB oracle of
    ``stream_session_stats`` spells it): a new session starts when
    ``ts - lag(ts) > gap`` (strict), sessions are running sums of that flag,
    stats aggregate per (group, session). Value summed as DECIMAL for
    partition-order independence.

    Output: session_start, session_end, group_cols, n, sum_value.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(win.alias("sess"), *[F.col(c) for c in group_cols])
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *group_cols,
            "n",
            "sum_value",
        )
    )
