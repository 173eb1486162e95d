"""Temporal event operators the reference's users run downstream of
ingestion: as-of joins and gap sessionization.

Spark has no built-in ASOF JOIN (DuckDB/Pandas/kdb all do); the naive
emulation is a range join (``l.ts >= r.ts``) which Catalyst executes as
a broadcast-nested-loop or cartesian — quadratic and unusable at scale.
:func:`asof_join` instead uses the union + ordered-window formulation:
tag both sides, union them, and carry the right side's payload forward
with ``last(ignorenulls)`` over a window partitioned by the join key
and ordered by time. ONE shuffle on the key (the window sort), zero
joins, linear in |left| + |right| — the plan survives a 100x scale-up
where the range-join emulation dies.

:func:`sessionize` is the standard gap-based session assignment
(lag -> boundary flag -> running sum), again one window = one shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window



def _us(col) -> "Column":
    """Exact integer microseconds since epoch. Casts TIMESTAMP_NTZ
    through TIMESTAMP first (identity under the engine's pinned UTC
    session zone; unix_micros rejects NTZ directly), so operators work
    on both parquet timestamp flavors."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tolerance_secs: int | None = None,
    suffix: str = "_r",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``right_ts <= left_ts`` for the same ``on`` key
    (inclusive, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).
    Left rows with no prior right row keep NULL payload columns.

    ``right_cols`` (default: all non-key, non-ts columns) are emitted
    with ``suffix`` appended. ``tolerance_secs`` nulls the payload when
    the match is older than the window. ``tiebreak`` orders right rows
    that share (key, ts) — the LAST one in that order wins; pass a
    unique column for determinism when (key, ts) can repeat.

    Plan: union(left', right') -> one window on the key -> filter.
    The right payload rides in a single struct column so the window
    carries one expression regardless of payload width.
    """
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    payload = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c).alias(c) for c in right_cols]
    )
    # the tiebreak keeps its NATIVE type (a cast to long would NULL out
    # string/uuid ids and silently destroy the documented determinism);
    # only the left side's placeholder is cast, to the same type
    tie_type = right.schema[tiebreak].dataType if tiebreak else "long"
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("long")).alias("_tie"),
        payload.alias("_p"),
        F.lit(None).cast(left.select(F.struct("*")).schema[0].dataType).alias("_row"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.struct("*").alias("_row"),
    )
    # right(0) before left(1) at equal ts => the join is ts-inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy("_ats", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_p", ignorenulls=True).over(w)
    if tolerance_secs is not None:
        age = _us(F.col("_ats")) - _us(matched["_mts"])
        matched = F.when(age <= tolerance_secs * 1_000_000, matched)
    out = (
        r.unionByName(l)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
    )
    return out.select(
        "_row.*",
        *[F.col("_m")[c].alias(c + suffix) for c in right_cols],
        F.col("_m")["_mts"].alias(left_ts + suffix),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo,
    left_hi,
    right_ts: str = "ts",
    bin_secs: int = 86400,
) -> DataFrame:
    """Join each left interval ``(left_lo, left_hi]`` (Column
    expressions over left) to the right rows whose ``right_ts`` falls
    inside it, with NO equality key — the case Spark plans as a
    broadcast-nested-loop / cartesian (quadratic).

    Bin-bucketing makes it a hash join: every left interval explodes to
    the time bins it covers (``ceil(len/bin_secs)+1`` rows), right rows
    map to exactly ONE bin, and the equi-join on the bin carries the
    exact containment predicate. Because the right side lands in a
    single bin, each qualifying (left, right) pair joins exactly once —
    no post-dedupe. Pick ``bin_secs`` near the typical interval length:
    cost scales with intervals x (interval_len / bin_secs), not
    |left| x |right|.

    Returns matched PAIRS (left columns + right row as a ``_right``
    struct), inner semantics; callers needing zero-match left rows
    aggregate the pairs and left-join the counts back (see the
    events_interval_count query).
    """
    lo_us = _us(left_lo)
    hi_us = _us(left_hi)
    bin_us = F.lit(bin_secs * 1_000_000).cast("long")
    l = left.select(
        F.struct("*").alias("_row"),
        lo_us.alias("_lo"),
        hi_us.alias("_hi"),
        F.explode(
            F.sequence(F.floor(lo_us / bin_us), F.floor(hi_us / bin_us))
        ).alias("_bin"),
    )
    r_us = _us(F.col(right_ts))
    r = right.select(
        F.struct("*").alias("_rrow"), r_us.alias("_rts"),
        F.floor(r_us / bin_us).alias("_bin"),
    )
    cond = (
        (l["_bin"] == r["_bin"])
        & (r["_rts"] > l["_lo"])
        & (r["_rts"] <= l["_hi"])
    )
    joined = l.join(r, cond, "inner")
    return joined.select("_row.*", F.col("_rrow").alias("_right"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_secs: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the user's previous event exceeds ``gap_secs``. Adds
    ``session_id`` ('<user>-<n>', n starting at 0 per user) to every
    row. One window on the user key = one shuffle; gaps compared in
    exact integer microseconds (``unix_micros``) so the boundary test
    is reproducible across engines."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    us = _us(F.col(ts_col))
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > gap_secs * 1_000_000), 1
    ).otherwise(0)
    sess_n = (
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    )
    return df.withColumn(
        "session_id", F.concat_ws("-", F.col(user_col).cast("string"), sess_n)
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_secs: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize`: bounds, event
    count, exact duration in seconds (microsecond-floored). The window
    and the groupBy share the user-key exchange (AQE keeps the
    partitioning), so the whole thing is one shuffle + map-side
    partial aggregation."""
    s = sessionize(df, user_col, ts_col, gap_secs, order_tiebreak)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (
            (_us(F.max(ts_col)) - _us(F.min(ts_col)))
            / F.lit(1_000_000)
        ).cast("long").alias("duration_secs"),
    )


def rolling_features(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
    span_secs: int = 7 * 86400,
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count
    and exact value sum of the group's events in the time RANGE
    ``[ts - span_secs, ts]`` (feature-engineering staple: "user's
    7-day activity as of this event"). The frame edge is evaluated at
    the timestamp's native microsecond precision.

    A range frame, not a row frame: the window closes over event TIME,
    so bursty and sparse users get the same semantics, and rows that
    share a timestamp are frame peers (all included — deterministic
    under ties, no ordering tiebreak needed). One shuffle on
    ``group_cols`` (the window sort); the frame is evaluated by a
    sliding two-pointer pass per partition, never a per-row rescan.
    Sum is DECIMAL-accumulated (partition-order independent), cast to
    double on output.

    Output: id_cols + group_cols + ts_col + ``n_span`` + ``sum_span``.
    """
    # exact integer MICROSECONDS for the range frame: whole-second
    # truncation (cast to long) would put a pair whose true gap is in
    # (span, span+1) seconds inside the frame while any sub-second
    # oracle excludes it — the frame edge must be computed at the
    # timestamp's native precision (DuckDB twin: epoch_us(ts))
    epoch = _us(F.col(ts_col))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(epoch)
        .rangeBetween(-int(span_secs) * 1_000_000, 0)
    )
    return df.select(
        *id_cols,
        *group_cols,
        ts_col,
        F.count(F.lit(1)).over(w).alias("n_span"),
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_span"),
    )


def funnel(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered N-stage funnel: per user, the earliest time each stage
    was reached STRICTLY AFTER the previous stage (the standard
    product-analytics funnel — a purchase before the first view does
    not count as conversion).

    One exchange on ``user_col``: every stage is a conditional
    ``min(...) over (partition by user)`` window over the SAME
    partitioning, so Catalyst stacks the N window operators on one
    shuffle; no joins, no N scans. Output: one row per user that
    reached stage 1, columns ``stage<i>_ts`` (NULL once the funnel
    broke) and ``funnel_stage`` (deepest stage reached, 1-based).

    Reference parity tier: engine-layer analytics over the event
    stream; no reference analog (the reference is a validation
    library)."""
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(user_col)
    out = df.select(user_col, type_col, ts_col)
    names: list[str] = []
    prev: str | None = None
    for i, s in enumerate(stages):
        name = f"stage{i + 1}_ts"
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        names.append(name)
        prev = name
    res = (
        out.select(user_col, *names)
        .distinct()
        .filter(F.col(names[0]).isNotNull())
    )
    stage = F.when(F.col(names[-1]).isNotNull(), len(names))
    for i in range(len(names) - 2, -1, -1):
        stage = stage.when(F.col(names[i]).isNotNull(), i + 1)
    return res.withColumn("funnel_stage", stage.cast("int"))


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; each (cohort, period_offset) cell counts the
    distinct users of that cohort active that many periods later —
    the classic retention triangle.

    Two aggregations: one per-user min (shuffled on the user key) and
    the final distinct-count (shuffled on the cell key); the cohort
    frame is user-cardinality and joins back broadcast-or-shuffle as
    AQE decides. ``granularity``: any ``date_trunc`` unit ('day',
    'week', 'month')."""
    first = df.groupBy(user_col).agg(
        # DATE-typed cohort: date_trunc returns a timestamp in Spark but
        # a date in several SQL engines — a date is the portable label
        F.date_trunc(granularity, F.min(ts_col)).cast("date").alias("cohort")
    )
    offset = F.datediff(
        F.date_trunc(granularity, F.col(ts_col)), F.col("cohort")
    )
    if granularity == "week":
        offset = (offset / 7).cast("long")
    elif granularity == "month":
        offset = (
            (F.year(ts_col) - F.year("cohort")) * 12
            + (F.month(ts_col) - F.month("cohort"))
        ).cast("long")
    else:
        offset = offset.cast("long")
    return (
        df.join(first, user_col)
        .groupBy(F.col("cohort"), offset.alias("period_offset"))
        .agg(F.countDistinct(user_col).alias("active_users"))
    )


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-user event-sequence transition matrix: for each ordered pair
    of consecutive events (by ``order_cols``, default ``[ts,
    event_id]`` — the tiebreaker makes simultaneous events
    deterministic), count (from_type -> to_type) transitions across all
    users, with the per-from-state total alongside so P(to|from) is a
    single division away.

    One exchange on the user key (the lead window), then a
    constant-width groupBy on the (from, to) pair with map-side
    partials — the session-path/Markov-chain building block."""
    order_cols = order_cols or ["ts", "event_id"]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        df.select(user_col, type_col, *order_cols)
        .withColumn("_to", F.lead(type_col).over(w))
        .filter(F.col("_to").isNotNull())
    )
    counts = pairs.groupBy(
        F.col(type_col).alias("from_type"), F.col("_to").alias("to_type")
    ).agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_type")
    return counts.withColumn("from_total", F.sum("n").over(wf))


def scd2_history(
    events: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Change stream → slowly-changing-dimension TYPE 2 history: one
    row per key VERSION with its validity interval — the standard
    warehouse shape for "what did this row say at commit C" queries
    without replaying the log.

    Semantics, per key in ``order_cols`` order (must be a strict total
    order per key, e.g. ``(commit, event_seq)`` — ties make the closing
    boundary nondeterministic):

    - every non-delete event OPENS a version valid from its own order
      position (``valid_from_<c>`` columns);
    - any next event of the same key (update, re-insert or delete)
      CLOSES it (``valid_to_<c>``; NULL = still open);
    - delete events emit no row of their own — they only close their
      predecessor, so a delete-then-reinsert key shows a gap;
    - ``is_current`` marks the open version (a key whose last event is
      a delete has none).

    ONE shuffle (the key-partitioned window); each boundary is a
    ``lead`` over the same window, so Catalyst plans a single
    Exchange + Sort regardless of how many order columns close the
    interval. Engine-portable: the DuckDB oracle spells the identical
    LEAD/filter (see ``cdc_scd2_history``)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    out = events
    for c in order_cols:
        out = out.withColumn(f"valid_to_{c}", F.lead(c).over(w))
    first = order_cols[0]
    return out.filter(F.col(op_col) != delete_op).select(
        *key_cols,
        *[F.col(c).alias(f"valid_from_{c}") for c in order_cols],
        *[f"valid_to_{c}" for c in order_cols],
        F.col(f"valid_to_{first}").isNull().alias("is_current"),
        *payload_cols,
    )


def scd2_asof_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    how: str = "left",
    prefix: str = "dim_",
) -> DataFrame:
    """Temporal (point-in-time) join of a fact stream against a
    :func:`scd2_history` dimension: each fact row picks up the
    dimension VERSION valid at the fact's own order position — the
    warehouse "join to the dimension as it was then", FOR SYSTEM_TIME
    AS OF as a join.

    ``facts`` must carry the ``order_cols`` themselves (e.g. a change
    event's ``(commit, event_seq)``, or ``(ts, event_id)``); the
    containment test is LEXICOGRAPHIC over the full tuple via struct
    comparison — ``valid_from <= fact_pos < valid_to`` (open versions
    have NULL ``valid_to`` and match everything after their open) —
    identical to DuckDB's row-value comparison, so the operator is
    oracle-mirrorable.

    ``how="left"`` (default) keeps unmatched facts with NULL dimension
    columns — facts before the key's first version or inside a
    delete→reinsert gap; ``"inner"`` drops them.

    Plan: ONE equi-shuffle per side on the key; the validity range is
    a join residual evaluated inside the sort-merge/hash join, never a
    cartesian. Per-key cost is versions x facts of that key — the
    temporal join's inherent lower bound. Dimension attribute columns
    come back under ``prefix`` (validity/is_current columns are
    dropped; re-derive from the history when needed)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    vf = [f"valid_from_{c}" for c in order_cols]
    vt = [f"valid_to_{c}" for c in order_cols]
    dim_cols = [
        c for c in history.columns
        if c not in key_cols and c not in vf and c not in vt and c != "is_current"
    ]
    # name-collision guards (mirrors interval_join's prefix guard): a
    # fact column equal to a prefixed dim column would yield ambiguous
    # duplicate output columns, and fact columns spelled like the
    # join's internals would be silently dropped by the final drop()
    internals = {f"__k_{k}" for k in key_cols} | {"__from", "__to", "__open"}
    clash = sorted(set(facts.columns) & ({prefix + c for c in dim_cols} | internals))
    if clash:
        raise ValueError(
            f"facts columns {clash} collide with prefixed dimension "
            f"columns or join internals; pick a different prefix or "
            "rename the fact columns"
        )
    h = history.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in vf]).alias("__from"),
        F.struct(*[F.col(c) for c in vt]).alias("__to"),
        F.col(vt[0]).isNull().alias("__open"),
        *[F.col(c).alias(prefix + c) for c in dim_cols],
    )
    pos = F.struct(*[F.col(c) for c in order_cols])
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"__k_{k}"))
    cond = cond & (F.col("__from") <= pos) & (F.col("__open") | (pos < F.col("__to")))
    out = facts.join(h, cond, how)
    return out.drop(*[f"__k_{k}" for k in key_cols], "__from", "__to", "__open")
