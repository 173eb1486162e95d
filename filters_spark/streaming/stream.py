"""Structured Streaming tail -> CDC merge-apply.

The engine's batch path (engine/cdc.py) is the transaction unit; the
streaming front-end is a thin ``foreachBatch`` adapter: Spark's source
tracking (file source here; Kafka/binlog connectors in production)
provides *at-least-once* delivery per micro-batch, and the engine's
watermark + idempotent LWW merge upgrades that to *exactly-once* table
state — re-delivered events are dropped by the per-bucket watermark,
and a micro-batch that crashes mid-commit either left no snapshot (all
its events replay) or a committed one (all its events are filtered).

Late/out-of-order events: anything at or below a bucket's committed
watermark is by definition a replay/duplicate in a WAL-ordered stream
and is dropped (SURVEY.md §2.6); genuinely new keys always carry
higher (commit, event_seq).
"""

from __future__ import annotations

from typing import Callable, Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from filters_spark.engine.cdc import CDCEngine

EVENT_DDL = (
    "commit string, event_seq long, op string, repo string, path string, "
    "lang string, content string, schema_version int"
)

# --- source adapter contract -------------------------------------------------
#
# A source adapter is ``(spark, options) -> streaming DataFrame`` whose
# output satisfies the EVENT CONTRACT:
#
# 1. **Schema**: ``EVENT_DDL`` columns (extra columns are allowed; the
#    engine validates/renames per its registry). Values arrive as the
#    WAL's serialized strings (the engine's payload contract).
# 2. **Offset semantics**: the source must be REPLAYABLE from Spark's
#    checkpointed offsets — after a crash, the next run re-delivers the
#    uncommitted micro-batch's events (at-least-once). The engine's
#    per-bucket watermarks + idempotent LWW merge upgrade that to
#    exactly-once table state, so an adapter must NOT try to dedupe or
#    skip; deliver everything, in source order, and let the sink filter.
# 3. **Ordering**: per key (repo, path), ``(commit, event_seq)`` must be
#    non-decreasing in delivery order within a partition of the source
#    (a WAL/binlog tail gives this naturally). Cross-key interleaving
#    is free.
#
# ``file_source`` is the reference implementation (and the only one
# runnable in this sandbox — no network). ``kafka_source`` documents the
# production mapping onto the same contract; it needs the
# spark-sql-kafka connector jar on the classpath.

SourceAdapter = Callable[[SparkSession, Mapping], DataFrame]


def file_source(spark: SparkSession, options: Mapping) -> DataFrame:
    """Reference adapter: parquet WAL segments appearing under
    ``options["path"]``. Offsets = the file-source's checkpointed list
    of consumed files. Options: ``path`` (required), ``schema``,
    ``max_files_per_trigger``, ``max_file_age``."""
    return tail_directory(
        spark,
        options["path"],
        schema=options.get("schema", EVENT_DDL),
        max_files_per_trigger=options.get("max_files_per_trigger"),
        max_file_age=options.get("max_file_age"),
    )


def _kafka_reader(spark: SparkSession, options: Mapping) -> DataFrame:
    """Shared Kafka reader construction (kafka_source and
    debezium_kafka_source must never diverge on option handling).
    Offsets = Kafka (topic, partition, offset) triples, checkpointed by
    Spark; ``startingOffsets`` only applies to the first run. Per-key
    ordering holds when the producer partitions by key — the usual
    binlog/CDC topic layout."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", options["bootstrap_servers"])
        .option("subscribe", options["subscribe"])
        .option("startingOffsets", options.get("starting_offsets", "earliest"))
    )
    if options.get("max_offsets_per_trigger") is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", int(options["max_offsets_per_trigger"])
        )
    return reader.load()


def kafka_source(spark: SparkSession, options: Mapping) -> DataFrame:
    """Kafka/binlog adapter onto the same contract (requires the
    spark-sql-kafka connector jar; NOT runnable in this sandbox — no
    network, no jar — but the mapping is the standard production shape).
    Events are JSON-encoded in the record value with the flat EVENT_DDL
    shape; Debezium-enveloped topics use ``debezium-kafka`` instead.
    Options: ``bootstrap_servers``, ``subscribe`` (required);
    ``starting_offsets`` (default "earliest"),
    ``max_offsets_per_trigger`` (back-pressure), ``schema``."""
    raw = _kafka_reader(spark, options)
    schema = options.get("schema", EVENT_DDL)
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("_e")
    ).select("_e.*")


def debezium_file_source(spark: SparkSession, options: Mapping) -> DataFrame:
    """Debezium envelope tail from files: every LINE of a text file
    appearing under ``options["path"]`` is one JSON envelope (the shape
    a connect-sink archive or a binlog-to-file shipper produces). The
    decode is ``sources/debezium.parse_debezium`` — map-only native
    from_json, so the stream plan stays one codegen stage per
    micro-batch. Options: ``path`` (required); ``fields`` (payload
    columns, default the canonical repo schema); ``schema_version``;
    ``commit_expr``/``seq_expr`` (callables, see parse_debezium) for
    non-MySQL ordering; ``max_files_per_trigger`` back-pressure."""
    from filters_spark.sources.debezium import parse_debezium

    reader = spark.readStream
    if options.get("max_files_per_trigger") is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(options["max_files_per_trigger"])
        )
    raw = reader.text(options["path"])
    return parse_debezium(
        raw,
        options.get("fields", ["repo", "path", "lang", "content"]),
        schema_version=options.get("schema_version", 1),
        commit_expr=options.get("commit_expr"),
        seq_expr=options.get("seq_expr"),
    )


def debezium_kafka_source(spark: SparkSession, options: Mapping) -> DataFrame:
    """Debezium-over-Kafka: the production binlog tail — raw connector
    records in, engine events out (same options as ``kafka_source``
    plus ``fields``/``schema_version``/``commit_expr``/``seq_expr``).
    Needs the spark-sql-kafka jar; the decode path is identical to
    ``debezium_file_source`` and is what the sandbox tests pin."""
    from filters_spark.sources.debezium import parse_debezium

    raw = _kafka_reader(spark, options).select(
        F.col("value").cast("string").alias("value")
    )
    return parse_debezium(
        raw,
        options.get("fields", ["repo", "path", "lang", "content"]),
        schema_version=options.get("schema_version", 1),
        commit_expr=options.get("commit_expr"),
        seq_expr=options.get("seq_expr"),
    )


SOURCES: dict[str, SourceAdapter] = {
    "files": file_source,
    "kafka": kafka_source,
    "debezium-files": debezium_file_source,
    "debezium-kafka": debezium_kafka_source,
}


def open_source(spark: SparkSession, kind: str, options: Mapping) -> DataFrame:
    """Open a streaming source by adapter name (``SOURCES`` registry —
    extensions register custom adapters there)."""
    try:
        adapter = SOURCES[kind]
    except KeyError:
        raise ValueError(
            f"unknown source kind {kind!r}; registered: {sorted(SOURCES)}"
        ) from None
    return adapter(spark, options)


def tail_directory(
    spark: SparkSession,
    events_dir: str,
    schema: str = EVENT_DDL,
    max_files_per_trigger: int | None = None,
    max_file_age: str | None = None,
) -> DataFrame:
    """File-source stand-in for a binlog tail: new parquet files appearing
    under ``events_dir`` are consumed in arrival order.

    ``max_files_per_trigger`` is the back-pressure knob: it caps each
    micro-batch's input so one burst of WAL segments cannot produce an
    unbounded batch (the engine's merge cost is O(batch ∪ touched
    buckets) — bounded batches keep latency and executor memory flat).
    ``max_file_age`` (e.g. ``"7d"``) bounds the source's file-tracking
    state on long-lived tails."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if max_file_age is not None:
        reader = reader.option("maxFileAge", max_file_age)
    return reader.parquet(events_dir)


def start_cdc_stream(
    engine: CDCEngine,
    events: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = False,
    processing_time: str = "10 seconds",
    query_name: str | None = None,
) -> StreamingQuery:
    """Run the CDC engine under Structured Streaming.

    ``checkpoint_dir`` is Spark's source-offset checkpoint (which files
    were read); the engine's lake-table watermarks are the sink-side
    checkpoint — the two together give exactly-once end to end:
    a re-run micro-batch (restart after a crash between the engine
    commit and the offset commit) replays events at-or-below the
    committed per-bucket watermarks and is dropped by the merge.

    Trigger surface: ``trigger_once=True`` -> ``availableNow`` (drain
    the backlog in rate-limited micro-batches, then stop — the batch
    catch-up mode); otherwise a ``processingTime`` cadence
    (micro-batch latency floor; pair with ``tail_directory``'s
    ``max_files_per_trigger`` for back-pressure)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        engine.apply_batch(batch_df)

    writer = events.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
