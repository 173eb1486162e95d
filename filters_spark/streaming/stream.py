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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from filters_spark.engine.cdc import CDCEngine

EVENT_DDL = (
    "commit string, event_seq long, op string, repo string, path string, "
    "lang string, content string, schema_version int"
)


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
