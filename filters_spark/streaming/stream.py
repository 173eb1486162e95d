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


def tail_directory(spark: SparkSession, events_dir: str, schema: str = EVENT_DDL) -> DataFrame:
    """File-source stand-in for a binlog tail: new parquet files appearing
    under ``events_dir`` are consumed in arrival order."""
    return spark.readStream.schema(schema).parquet(events_dir)


def start_cdc_stream(
    engine: CDCEngine,
    events: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = False,
    processing_time: str = "10 seconds",
) -> StreamingQuery:
    """Run the CDC engine under Structured Streaming.

    ``checkpoint_dir`` is Spark's source-offset checkpoint (which files
    were read); the engine's lake-table watermarks are the sink-side
    checkpoint — the two together give exactly-once end to end.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        engine.apply_batch(batch_df)

    writer = events.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
