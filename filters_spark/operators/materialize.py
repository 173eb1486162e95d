"""Materialization barrier for expression-heavy frames.

Iterative operators (label propagation) and LSH self-joins must compute
their expensive frames ONCE: without a hard barrier Catalyst inlines the
interpreted signature expression into every downstream derivation (both
join sides + bucket guards), and a bare ``.repartition()`` is not enough
— column pruning gives differently-pruned consumers different exchanges,
ReuseExchange misses, and the input is re-scanned and re-hashed per
branch (measured: 10 min vs 14 s at 2k docs).

Two barriers, same semantics, different fault domains:

- ``localCheckpoint`` (default): partitions stored in executor-local
  block storage (non-replicated). Fast — no DFS round-trip — but lost
  with the executor: on a real cluster, one executor failure aborts the
  whole query because the truncated lineage cannot be replayed.
- reliable ``checkpoint`` (``checkpoint_dir=...``): partitions written
  to the given fault-tolerant directory (HDFS/S3); recomputation after
  executor loss re-reads them. The right choice for long-running
  corpus-scale jobs; costs one DFS write+read of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# last dir passed to setCheckpointDir by us — getCheckpointDir returns a
# scheme-qualified respelling, so remembering our own input is the only
# reliable way to avoid re-setting it per call
_last_dir: str | None = None


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Compute ``df`` eagerly and cut its lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint()`` (executor-local,
    fast, not fault-tolerant). Otherwise a reliable ``checkpoint()``
    into ``checkpoint_dir`` (sets the context checkpoint dir if unset
    or different)."""
    global _last_dir
    if checkpoint_dir is None:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if _last_dir != checkpoint_dir or sc.getCheckpointDir() is None:
        sc.setCheckpointDir(checkpoint_dir)
        _last_dir = checkpoint_dir
    return df.checkpoint(eager=True)
