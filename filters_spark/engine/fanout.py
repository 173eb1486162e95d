"""Multi-table CDC fan-out: ONE binlog/WAL envelope stream → MANY lake
tables.

A production Debezium tail is per-SERVER, not per-table: one connector
emits every captured table's change events interleaved in commit order
(MySQL binlog / Postgres WAL are server-global logs). The single-table
surface (``sources/debezium.py`` → ``CDCEngine.apply_batch``) forces
the caller to re-read the raw stream once per table; this module routes
a mixed envelope frame to per-table engines in ONE parse pass.

Scale shape: the raw JSON is decoded ONCE (``parse_debezium`` with
``include_source=True`` — map-only native ``from_json``, union of all
routes' payload fields) and the decoded frame is materialized once;
each route's slice is then a cheap filter on ``_src_table`` over the
materialized columns, never a re-parse of the JSON. Per-table applies
are independent engines over independent tables — their watermarks,
dead letters and commit chains never interact, so exactly-once holds
per table exactly as in the single-table path (pinned in
tests/test_fanout.py, including crash-replay of the whole mixed batch).

Unrouted tables are a silent-data-loss hazard (a typo'd route name
drops a whole table's changes), but "capture everything, ingest some"
is also the normal production setup — so the default COUNTS unrouted
events per source table into the report and leaves policy to the
caller; ``unrouted="raise"`` hard-fails, ``"ignore"`` skips the count
job on streams known to be pre-filtered (Debezium's
``table.include.list``).

The reference library has no table or stream layer; this is north-rule
engine surface (binlog tail → lake ingest).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from filters_spark.engine.cdc import CDCEngine

__all__ = ["TableRoute", "fan_out_debezium", "start_fanout_stream"]


@dataclass(frozen=True)
class TableRoute:
    """One source table's ingest route.

    ``table``: the envelope's ``source.table`` name to match.
    ``engine``: the per-table :class:`CDCEngine` (its own lake table +
    spec registry). ``fields``: payload columns to extract from the row
    image — must include the key fields (``repo``, ``path``).
    ``db``: optional ``source.db`` qualifier — two databases can carry
    the same table name; leave None to match any.
    ``schema_version``: the registry version the route's events
    validate under (a feed-level fact — the wire envelope carries no
    registry version)."""

    table: str
    engine: CDCEngine
    fields: tuple[str, ...] = ("repo", "path", "lang", "content")
    db: str | None = None
    schema_version: int = 1

    def __post_init__(self):
        missing = {"repo", "path"} - set(self.fields)
        if missing:
            raise ValueError(
                f"route {self.table!r}: fields must include the key "
                f"columns, missing {sorted(missing)}"
            )


def _route_match(r: TableRoute):
    m = F.col("_src_table") == r.table
    if r.db is not None:
        m = m & (F.col("_src_db") == r.db)
    return m


def fan_out_debezium(
    raw: DataFrame,
    routes: list[TableRoute],
    value_col: str = "value",
    commit_expr: Callable | None = None,
    seq_expr: Callable | None = None,
    unrouted: str = "count",
) -> dict:
    """Apply one mixed Debezium envelope batch to every route's table.

    ``raw``: a frame of JSON envelope strings (``value_col``) — the
    direct shape of a Kafka poll or a JSON-lines WAL segment read.
    ``commit_expr`` / ``seq_expr``: ordering derivation overrides,
    shared by all routes (one server log = one ordering domain; see
    ``parse_debezium``).

    Returns ``{"tables": {route.table: apply_batch metrics},
    "unrouted": {"db.table": event count}}``. Routes are applied in
    list order, each an independent exactly-once engine apply —
    re-running the same mixed batch (crash between table commits)
    re-applies only the tables whose watermarks haven't seen it.
    """
    if unrouted not in ("count", "raise", "ignore"):
        raise ValueError(
            f"unrouted must be 'count', 'raise' or 'ignore', got {unrouted!r}"
        )
    seen: set[tuple] = set()
    for r in routes:
        key = (r.db, r.table)
        if key in seen:
            raise ValueError(
                f"duplicate route for table {r.table!r} (db={r.db!r}): "
                "one route per source table — merging two engines into "
                "one table needs one engine, not two routes"
            )
        seen.add(key)
    from filters_spark.operators.materialize import materialize
    from filters_spark.sources.debezium import parse_debezium

    union_fields = sorted({f for r in routes for f in r.fields})
    parsed = materialize(
        parse_debezium(
            raw,
            union_fields,
            value_col=value_col,
            commit_expr=commit_expr,
            seq_expr=seq_expr,
            include_source=True,
        )
    )

    report: dict = {"tables": {}, "unrouted": {}}
    if unrouted != "ignore":
        any_route = None
        for r in routes:
            m = _route_match(r)
            any_route = m if any_route is None else any_route | m
        misses = (
            parsed.filter(~F.coalesce(any_route, F.lit(False)))
            .groupBy("_src_db", "_src_table")
            .count()
            .collect()
        )
        report["unrouted"] = {
            f"{row['_src_db'] or ''}.{row['_src_table'] or ''}": row["count"]
            for row in misses
        }
        if report["unrouted"] and unrouted == "raise":
            raise ValueError(
                f"unrouted source tables in the batch: {report['unrouted']} "
                "— add routes, or pass unrouted='count'/'ignore' if the "
                "drop is intended"
            )

    for r in routes:
        events = parsed.filter(_route_match(r)).select(
            "commit",
            "event_seq",
            "op",
            *r.fields,
            F.lit(r.schema_version).alias("schema_version"),
        )
        report["tables"][r.table] = r.engine.apply_batch(events)
    return report


def start_fanout_stream(
    routes: list[TableRoute],
    raw: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = False,
    processing_time: str = "10 seconds",
    unrouted: str = "count",
    commit_expr: Callable | None = None,
    seq_expr: Callable | None = None,
):
    """Structured-Streaming front-end: tail a RAW envelope stream (e.g.
    ``spark.readStream.text(dir)`` of JSON-lines WAL segments, or a
    Kafka value stream cast to string) and fan every micro-batch out
    through :func:`fan_out_debezium`.

    Exactly-once composes the same way as ``start_cdc_stream``: Spark's
    offset checkpoint bounds which envelopes re-deliver after a crash,
    and each table's watermarks drop the replayed prefix — per table,
    independently, so a crash BETWEEN two tables' commits inside one
    micro-batch re-applies only the table that hadn't committed
    (pinned in tests/test_fanout.py)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        fan_out_debezium(
            batch_df,
            routes,
            unrouted=unrouted,
            commit_expr=commit_expr,
            seq_expr=seq_expr,
        )

    writer = raw.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
