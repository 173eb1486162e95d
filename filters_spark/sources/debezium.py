"""Debezium change-event envelope → engine event frame.

The production spelling of the binlog/WAL tail the north rule names is,
in practice, Debezium-over-Kafka: each Kafka record's value is a JSON
envelope

    {"schema": {...},                      # only when schemas enabled
     "payload": {
       "before": {...} | null,             # row image before the change
       "after":  {...} | null,             # row image after the change
       "source": {"connector": "mysql", "db": ..., "table": ...,
                  "file": "mysql-bin.000003", "pos": 154, "row": 0,
                  "ts_ms": 1465581029523, "lsn": ..., "txId": ...},
       "op": "c" | "u" | "d" | "r",        # create/update/delete/read
       "ts_ms": 1465581029523}}

:func:`parse_debezium` maps that envelope to the engine's canonical
change-event frame ``(commit, event_seq, op, <payload cols>,
schema_version)`` — the exact input contract of
``CDCEngine.apply_batch`` / ``replay`` (engine/cdc.py) and the
streaming source adapters (streaming/stream.py ``open_source``; a Kafka
source's ``value`` column is exactly this function's input).

Everything is native ``from_json`` + column algebra — no Python UDF,
one map-only stage, so at 10^10 events the parse adds zero shuffles and
stays inside whole-stage codegen. Row images are decoded as
``map<string,string>``: the engine's canonical payload is all-string
(BASELINE.json input_hint) and a map survives arbitrary/evolving
source columns — schema evolution is the registry's job downstream,
not the parser's.

Ordering contract (what makes the watermark exactly-once): the default
``(commit, event_seq)`` derivation is the MySQL binlog total order —
``commit`` = the binlog file's numeric suffix as a 12-hex string
(lexicographic == numeric), ``event_seq`` = ``pos * 2^16 + row`` (a
binlog position is < 2^32 per file — the server's max_binlog_size cap
— and ``row`` counts rows within one event, far below 2^16, so the
packed long is collision-free and ordered). Postgres/Oracle feeds pass
``commit_expr`` / ``seq_expr`` built on ``source.lsn`` / ``source.scn``
instead.
"""

from __future__ import annotations

from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Explicit envelope schema (never inferred: inference would sample-scan
# the stream and produce run-dependent shapes). `before`/`after` are
# maps (see module docstring); `source` keeps only the fields the
# default ordering derivation and lineage need — from_json NULL-fills
# absent fields and ignores extras, so connector-specific additions
# (gtid, sequence, xmin...) are harmless.
_SOURCE_DDL = (
    "struct<connector: string, name: string, db: string, `table`: string, "
    "file: string, pos: bigint, row: int, ts_ms: bigint, "
    "lsn: bigint, txId: bigint>"
)
_PAYLOAD_DDL = (
    f"struct<before: map<string,string>, after: map<string,string>, "
    f"source: {_SOURCE_DDL}, op: string, ts_ms: bigint>"
)
# top level carries BOTH spellings: schemas-enabled ({"payload": {...}})
# and schemas-disabled (the value IS the payload object)
ENVELOPE_DDL = (
    f"struct<payload: {_PAYLOAD_DDL}, "
    f"before: map<string,string>, after: map<string,string>, "
    f"source: {_SOURCE_DDL}, op: string, ts_ms: bigint>"
)

# Debezium op -> engine op. "r" (snapshot read) is an upsert exactly
# like "c": replaying a snapshot over existing state must be idempotent
# under LWW, which upsert semantics give for free.
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def default_commit_expr(source: Column) -> Column:
    """Binlog file suffix → zero-padded 12-hex commit string (the
    engine's commit spelling; lexicographic == numeric order).
    ``mysql-bin.000003`` → ``000000000003``."""
    file_seq = F.regexp_extract(source["file"], r"(\d+)$", 1).cast("bigint")
    return F.format_string("%012x", file_seq)


def default_seq_expr(source: Column) -> Column:
    """(pos, row) packed into one ordered long: ``pos * 2^16 + row``."""
    return (
        source["pos"] * F.lit(65536) + F.coalesce(source["row"], F.lit(0))
    ).cast("long")


def parse_debezium(
    df: DataFrame,
    fields: list[str],
    value_col: str = "value",
    schema_version: int = 1,
    commit_expr=None,
    seq_expr=None,
    include_source: bool = False,
    _defer_op_filter: bool = False,
) -> DataFrame:
    """Decode a frame of Debezium JSON envelopes into engine events.

    ``fields``: the payload columns to extract from the row image (for
    the canonical repo table: ``["repo", "path", "lang", "content"]``
    — but any registry schema works; absent keys arrive NULL and the
    validation chain's presence filters decide their fate).

    ``commit_expr`` / ``seq_expr``: callables ``source_struct_col →
    Column`` overriding the MySQL-binlog default ordering derivation
    (see module docstring) for LSN/SCN-ordered feeds.

    Row-image choice: ``after`` for c/u/r; deletes carry only
    ``before`` (Debezium emits ``after: null`` on delete), whose key
    fields are what the engine's tombstone needs — payload cells of a
    delete are never read by the LWW merge.

    Dropped rows, by design: Kafka compaction tombstones (NULL value),
    values that don't parse as a Debezium envelope (no ``op`` anywhere
    — from_json yields NULL fields, never raises), and non-row ops
    (``t`` truncate, ``m`` message) which carry no row image. Routing
    *malformed-but-present* payloads to dead letters is the validation
    chain's job downstream; the parser only drops what has no row to
    validate.

    ``include_source=True`` appends lineage columns ``(_src_db,
    _src_table, _src_ts_ms)`` for multi-table fan-in routing.

    ``_defer_op_filter`` (internal): return the frame WITHOUT the
    row-op filter. Callers that materialize the parse (engine/fanout.py
    scratch barrier) filter ``op IS NOT NULL`` on the read-back instead
    — the filter commutes with materialization (dropped rows' cells
    are never read), and keeping it out of the write job's plan keeps
    that plan to a single ``from_json`` evaluation: a filter above
    these projections is pushed below them by alias substitution and
    re-lexes every envelope a second time just to test ``op``.
    """
    # The envelope parse is projected ONCE as a named column. Inlined
    # (the previous spelling), it is referenced from the payload-wrapper
    # CASE's predicate, both branches and the pushed-down op filters;
    # OptimizeJsonExprs then splits per-branch schema-pruned copies and
    # codegen subexpression elimination reaches across neither CASE
    # branches nor operators, so every envelope was Jackson-lexed 3-4x.
    # The alias is non-cheap and multiply-referenced, so CollapseProject
    # keeps the projection apart and the parse runs once (plus, for
    # non-deferred callers, the pushed op filter's pruned copy).
    parsed = df.select(F.from_json(F.col(value_col), ENVELOPE_DDL).alias("_env"))
    env = F.col("_env")
    # schemas-enabled vs schemas-disabled: prefer the payload wrapper,
    # fall back to the bare top-level fields
    p = F.when(env["payload"].isNotNull(), env["payload"]).otherwise(
        F.struct(
            env["before"].alias("before"),
            env["after"].alias("after"),
            env["source"].alias("source"),
            env["op"].alias("op"),
            env["ts_ms"].alias("ts_ms"),
        )
    )
    op = p["op"]
    engine_op = None
    for dbz, eng in _OP_MAP.items():
        cond = op == dbz
        engine_op = (
            F.when(cond, F.lit(eng))
            if engine_op is None
            else engine_op.when(cond, F.lit(eng))
        )
    image = F.when(op == "d", p["before"]).otherwise(
        F.coalesce(p["after"], p["before"])
    )
    src = p["source"]
    commit = (commit_expr or default_commit_expr)(src)
    seq = (seq_expr or default_seq_expr)(src)
    cols = [
        commit.alias("commit"),
        seq.alias("event_seq"),
        engine_op.alias("op"),
        *[F.element_at(image, f).alias(f) for f in fields],
        F.lit(schema_version).alias("schema_version"),
    ]
    if include_source:
        cols += [
            src["db"].alias("_src_db"),
            src["table"].alias("_src_table"),
            src["ts_ms"].alias("_src_ts_ms"),
        ]
    out = parsed.select(*cols)
    if _defer_op_filter:
        return out
    # one filter on the OUTPUT op column: a NULL engine op covers both
    # drop classes — no ``op`` anywhere in the envelope (not a Debezium
    # row event) and non-row ops (t/m), exactly the rows the previous
    # two-filter spelling removed
    return out.filter(F.col("op").isNotNull())


def to_debezium(
    df: DataFrame,
    fields: list[str],
    op_col: str = "op",
    commit_col: str = "commit",
    seq_col: str = "event_seq",
    connector: str = "filters-spark",
    db: str | None = None,
    table: str | None = None,
    before_cols: Mapping[str, str] | None = None,
) -> DataFrame:
    """The EGRESS twin of :func:`parse_debezium`: serialize an engine-
    shaped change frame (``changes()`` output, or any frame with op +
    ordering + payload columns) into Debezium JSON envelopes (column
    ``value``, schemas-disabled spelling) — the lake as a change
    SOURCE feeding any downstream Debezium consumer over the standard
    wire format.

    Mapping (inverse of the parser's): I→c, U→u, D→d; c/u rows carry
    the ``after`` image, d rows the ``before`` image (whatever payload
    cells the tombstone still carries; consumers key on the row's key
    fields).

    ``db``/``table`` stamp ``source.db``/``source.table`` — set them
    whenever the feed targets a table-keyed consumer (Debezium
    dispatchers, this repo's :func:`~filters_spark.engine.fanout.
    fan_out_debezium`): an envelope without a source table lands
    unrouted. Omitted from the JSON when None.

    ``before_cols`` (envelope field → source column) turns on TRUE
    before-images — the full Debezium u-event shape where ``before``
    and ``after`` both appear. Feed it
    :meth:`~filters_spark.lake.table.LakeTable.changes_with_images`
    output with ``{"repo": "repo", "path": "path", "lang": "pre_lang",
    "content": "pre_content"}`` (key fields map to themselves — the
    key is its own pre-image) and, for faithful c/u classification,
    ``op_col="op_effective"``. Requires a ``pre_op`` column (the
    images feed carries it). ``before`` is emitted when the row HAD a
    previous version (``pre_op`` non-NULL and not a delete), matching
    Debezium's omit-absent spelling; d events ALWAYS carry one —
    the true pre-image when known, else the tombstone's own fields
    (consumers read the delete key from ``before``).

    The engine ordering round-trips losslessly through
    ``source``: ``file = "<connector>.<decimal commit>"`` and
    ``pos = event_seq`` — ``parse_debezium(..., seq_expr=lambda s:
    s["pos"])`` reconstructs (commit, event_seq) exactly, which the
    round-trip test pins end to end (egress → wire → ingest produces a
    byte-identical mirror).

    Native ``to_json`` over a struct — map-only, no shuffle, no
    Python; NULL images (the unused side) are omitted from the JSON
    exactly as Debezium omits them."""
    # any op outside the canonical I/U/D fails the job loudly: an
    # op:null envelope would be silently DROPPED by parse_debezium's
    # non-row-op filter downstream — replica rows lost with no error
    dbz_op = (
        F.when(F.col(op_col) == "I", F.lit("c"))
        .when(F.col(op_col) == "U", F.lit("u"))
        .when(F.col(op_col) == "D", F.lit("d"))
        # "R": snapshot-read rows (snapshot_export) -> Debezium's r,
        # which parse_debezium ingests as an upsert — the round trip
        # that makes export->bootstrap replication chains closed
        .when(F.col(op_col) == "R", F.lit("r"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("to_debezium: op outside {I,U,D,R}: "),
                    F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                )
            )
        )
    )
    image = F.create_map(
        *[x for f in fields for x in (F.lit(f), F.col(f).cast("string"))]
    )
    # db/table make the feed ROUTABLE: any table-keyed consumer —
    # including this repo's own fan_out_debezium — dispatches on
    # source.table, and an envelope without one lands unrouted. NULLs
    # are omitted by to_json (Debezium's omit-absent spelling), so
    # feeds that never fan out pay nothing.
    src = F.struct(
        F.lit(connector).alias("connector"),
        F.lit(db).cast("string").alias("db"),
        F.lit(table).cast("string").alias("table"),
        F.concat(
            F.lit(connector + "."), F.conv(F.col(commit_col), 16, 10)
        ).alias("file"),
        F.col(seq_col).cast("bigint").alias("pos"),
        F.lit(0).alias("row"),
    )
    if before_cols is not None:
        if "pre_op" not in df.columns:
            raise ValueError(
                "before_cols requires a pre_op column (use "
                "changes_with_images(), which carries it)"
            )
        before_img = F.create_map(
            *[
                x for k, c in before_cols.items()
                for x in (F.lit(k), F.col(c).cast("string"))
            ]
        )
        # d events MUST carry a before image — consumers read the key
        # from it (parse_debezium included). A delete with no known
        # pre-image (idempotent/double delete: pre_op NULL or 'D')
        # falls back to the row's own fields, exactly the tombstone
        # image the non-before_cols path emits.
        before = (
            F.when(
                F.col("pre_op").isNotNull() & (F.col("pre_op") != "D"),
                before_img,
            )
            .when(F.col(op_col) == "D", image)
        )
    else:
        before = F.when(F.col(op_col) == "D", image)
    return df.select(
        F.to_json(
            F.struct(
                before.alias("before"),
                F.when(F.col(op_col) != "D", image).alias("after"),
                src.alias("source"),
                dbz_op.alias("op"),
            )
        ).alias("value")
    )


def snapshot_export(
    table,
    snapshot_id: int | None = None,
    connector: str = "filters-spark",
    db: str | None = None,
    table_name: str | None = None,
) -> DataFrame | None:
    """Serialize a table's FULL state at a snapshot into Debezium
    ``r`` (snapshot read) envelopes — the egress twin of
    ``CDCEngine.bootstrap``'s ingest side, and what a Debezium
    connector emits during its initial-snapshot phase.

    Each exported row carries its LAST-WRITER position ``(commit,
    event_seq)`` through ``source.file``/``source.pos`` — exactly the
    per-row provenance :meth:`~filters_spark.engine.cdc.CDCEngine.
    bootstrap` requires of snapshot rows (the LWW reconciliation of
    the overlap window hinges on it). So the full replication chain is
    closed over the standard wire format with no side channel:

        snapshot_export(A) → parse_debezium → B.bootstrap(rows,
        replay_from=max(A.watermarks)) → tail A's changes()
        via to_debezium → parse → B.apply_batch  ⇒  B ≡ A

    (pinned byte-identical in tests/test_debezium.py). Map-only over
    one table read — no shuffle beyond the read's own MoR fold, no
    Python. Returns None for an empty table."""
    state = table.read(snapshot_id)
    if state is None:
        return None
    snap = table.snapshot(snapshot_id)
    fields = ["repo", "path", *table.payload_cols(snap)]
    return to_debezium(
        state.withColumn("op", F.lit("R")),
        fields=fields,
        connector=connector,
        db=db,
        table=table_name,
    )
