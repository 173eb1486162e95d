"""filters_spark — a PySpark-native CDC / incremental-ingest engine.

Two layers:

1. **Filter layer** (``filters_spark.functions``): the chainable
   validation/normalization semantics of the ``filters`` library
   (reference: /root/reference, v1.3.2) re-expressed as *vectorized*
   pandas/Arrow column kernels plus native Spark ``Column`` fast paths.
   No per-row Python UDFs anywhere.

2. **Engine layer** (``filters_spark.engine`` / ``filters_spark.lake``):
   binlog/WAL-style change-event ingestion with key-partitioned MERGE
   upserts into an Iceberg-semantics copy-on-write lake table, exactly-once
   via monotonic (commit, event_seq) watermarks + idempotent
   last-writer-wins merge, mid-stream schema evolution through declarative
   filter specs, dead-letter routing, per-bucket checkpoints and lineage.

Everything here is plain Python over the public PySpark DataFrame API —
deployable with ``spark-submit --py-files``.
"""

__version__ = "0.1.0"

from filters_spark.session import get_spark  # noqa: F401
