"""Custom stateful streaming operator: per-key first-wins dedupe via
``applyInPandasWithState``.

The engine's exactly-once story filters replays against the TABLE's
committed per-bucket watermarks — correct, but every duplicate still
rides the full validate → merge pipeline before being dropped. For
high-fan-in sources that redeliver aggressively (binlog tails, at-least
-once queues), this operator drops duplicates *in the stream*, before
the engine, using Spark's keyed state store: per (repo, path) the state
holds the highest ``(commit, event_seq)`` watermark seen, persisted in
the streaming checkpoint, so dedupe works across micro-batches AND
across restarts.

Scale shape: state is O(live keys) and partitioned by the grouping key
across executors (the state store shuffles each micro-batch once on the
key — the same exchange any keyed streaming op pays). The per-group
pandas hook sees one key's rows at a time; state reads/writes are
local. A state TTL bounds the store for unbounded key spaces: a key
idle longer than ``ttl_minutes`` is evicted, after which a very-late
duplicate would pass — exactly the window the engine's table watermark
still catches (defense in depth, not a correctness hole).

Reference: the reference library has no streaming surface (SURVEY.md
§2.6 maps its batch-validation loop); this is north-rule engine-layer
surface, Spark Structured Streaming idiom.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from filters_spark.lake.table import watermark_str

_STATE_SCHEMA = StructType([StructField("max_wm", StringType())])


def stream_dedupe(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Cross-micro-batch streaming dedupe on the WAL watermark
    ``(commit, event_seq)``, keyed by ``key_cols`` (default the CDC key
    ``[repo, path]``). Input must be a STREAMING DataFrame with the
    event contract columns; output schema = input schema.

    Duplicates at or below a key's high-water mark are dropped at the
    state store, before validation; state survives restarts via the
    stream's checkpoint.

    ``ttl_minutes`` bounds state for unbounded key spaces: an idle key
    is evicted after the TTL (its late duplicates then fall through to
    the engine's table-watermark filter, which is total). TTL uses a
    processing-time timeout, which makes Spark schedule extra
    state-cleanup micro-batches — under ``Trigger.AvailableNow`` the
    query then keeps triggering instead of draining and stopping, so
    TTL is for always-on streams; leave it ``None`` (NoTimeout) for
    drain-and-stop/batch-backfill runs."""
    keys = key_cols or ["repo", "path"]
    ttl_ms = None if ttl_minutes is None else int(ttl_minutes) * 60 * 1000

    def dedupe_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        # ttl_ms rides in the closure (cloudpickle ships it with the
        # function — a module global would reset to its import-time
        # value on executors)
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        # A key's micro-batch arrives as SEVERAL Arrow chunks (bounded
        # by arrow.maxRecordsPerBatch, interleaved by the shuffle), in
        # no particular watermark order. Filter every chunk against the
        # FIXED state watermark — advancing it chunk-by-chunk would
        # silently drop a genuinely-new lower-watermark event that
        # lands in a later chunk — and dedupe across chunks with a
        # seen-set (O(kept watermarks) strings, not buffered rows, so
        # the generator stays streaming).
        state_wm = state.get[0] if state.exists else ""
        max_wm = state_wm
        seen: set[str] = set()
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            keep = pdf[pdf["_wm"] > state_wm]
            # within-chunk: keep the first row per watermark value
            keep = keep[~keep["_wm"].duplicated()]
            if seen:
                keep = keep[~keep["_wm"].isin(seen)]
            if len(keep):
                seen.update(keep["_wm"])
                m = str(keep["_wm"].max())
                if m > max_wm:
                    max_wm = m
                yield keep
        state.update((max_wm,))
        if ttl_ms is not None:
            # idle-key eviction clock, renewed every batch the key appears
            state.setTimeoutDuration(ttl_ms)

    with_wm = events.withColumn(
        "_wm", watermark_str(F.col("commit"), F.col("event_seq"))
    )
    out_schema = with_wm.schema
    deduped = with_wm.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        dedupe_fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return deduped.drop("_wm")
