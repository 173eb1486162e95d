"""Extra benchmarks for optimization work (bench.py is frozen for
measurement; see OPTIMIZATION_r06.md). Decomposes the flagship replay
into phases so changes can be attributed:

  gen      — gen_events + repartition(64).write.parquet (inside
             bench_total_sec but outside the per-query seconds)
  stage    — CDCEngine._stage (validate + scratch parquet write)
  stats    — the grouped survival-stats collect
  fold     — the grouped merge job + driver finalize
  count    — post-replay table.read().count()

Usage: python bench_extra.py [--events N] [--cpus K] [--mode cow|mor]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PHASES: dict[str, float] = {}


def _timed(cls, name, bucket):
    orig = getattr(cls, name)

    def wrap(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            PHASES[bucket] = PHASES.get(bucket, 0.0) + (time.time() - t0)

    setattr(cls, name, wrap)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=600_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    from bench import make_spark
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events

    _timed(CDCEngine, "_stage", "stage")
    _timed(CDCEngine, "_apply_staged_group_cow", "fold")
    _timed(CDCEngine, "_apply_staged_group_mor", "fold")
    _timed(CDCEngine, "_with_survives", "survives_build")

    spark = make_spark(f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="filters_spark_bx_")
    try:
        table = LakeTable.create(
            spark, os.path.join(root, "lake"), key_cols=["repo", "path"],
            num_buckets=32,
        )
        engine = CDCEngine(spark, table, default_registry(), write_mode=args.mode)
        events_path = os.path.join(root, "events.parquet")
        t0 = time.time()
        spark.sparkContext.setJobDescription("gen: WAL materialize")
        gen_events(
            spark, n_events=args.events, n_repos=500, n_paths=5000,
            hot_frac=0.15, dirty_frac=0.05, seed=42,
        ).repartition(64).write.parquet(events_path)
        PHASES["gen"] = time.time() - t0
        events = spark.read.parquet(events_path)

        t0 = time.time()
        spark.sparkContext.setJobDescription("replay")
        engine.replay(events, num_batches=args.batches)
        replay_s = time.time() - t0

        t0 = time.time()
        spark.sparkContext.setJobDescription("post-replay count")
        n = table.read().count()
        PHASES["count"] = time.time() - t0
        out = {
            "mode": args.mode,
            "events": args.events,
            "cpus": args.cpus,
            "replay_sec": round(replay_s, 2),
            "phases": {k: round(v, 2) for k, v in sorted(PHASES.items())},
            "other_replay_sec": round(
                replay_s - sum(v for k, v in PHASES.items() if k not in ("gen", "count")), 2
            ),
            "final_rows": n,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
