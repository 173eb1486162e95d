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
