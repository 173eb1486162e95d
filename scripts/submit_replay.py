"""spark-submit entry point for the CDC replay engine.

The north-rule deployment shape: plain Python shipped to a cluster as

    spark-submit --master <cluster> --py-files filters_spark.zip \
        scripts/submit_replay.py --lake-root hdfs://.../lake \
        --n-events 10000000 --batches 16 --write-mode mor

``filters_spark`` resolves from the ``--py-files`` archive on the
driver AND the executors (the Arrow kernel UDFs deserialize there), so
this script must import it only after SparkSession exists. No cluster
here, but tests/test_submit.py runs this exact command against
local[k] and pins final-state equality with an in-process replay.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lake-root", required=True)
    ap.add_argument("--events-path", default=None,
                    help="parquet WAL to replay; default: synthesize --n-events")
    ap.add_argument("--n-events", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--num-buckets", type=int, default=8)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--write-mode", default="cow", choices=["cow", "mor"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("filters-spark-cdc-replay")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events

    table = LakeTable.create(
        spark, args.lake_root, key_cols=["repo", "path"], num_buckets=args.num_buckets
    )
    engine = CDCEngine(spark, table, default_registry(), write_mode=args.write_mode)
    if args.events_path:
        events = spark.read.parquet(args.events_path)
    else:
        events = gen_events(
            spark, n_events=args.n_events, n_repos=20, n_paths=200,
            hot_frac=0.2, dirty_frac=0.1, seed=args.seed,
        )
    metrics = engine.replay(events, num_batches=args.batches)
    out = table.read()
    print(json.dumps({
        "applied": sum(m["applied"] for m in metrics),
        "dead_lettered": sum(m["dead_lettered"] for m in metrics),
        "final_rows": 0 if out is None else out.count(),
        "snapshot_id": table.current_snapshot_id(),
        "write_mode": args.write_mode,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
