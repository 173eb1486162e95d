"""The CDC merge-apply loop: binlog tail -> validated, exactly-once,
key-partitioned upserts into the lake table.

Pipeline per batch (SURVEY.md §4.3):

1. **Schema-normalize** each schema_version slice (engine/evolution.py).
2. **Watermark filter**: events at or below their bucket's committed
   watermark are replays — dropped (idempotency / exactly-once resume).
3. **Validate** via per-field chains (native Column or Arrow kernel);
   split clean / dead-letter. The validated frame is persisted once per
   batch so the two branches don't recompute kernels.
4. **Dedupe** last-writer-wins within the batch on (repo, path) by
   (commit, event_seq) — replayed/overwritten events collapse to the
   final write.
5. **Shuffle once**: repartition by ``_bucket`` (hash(repo, salt(path)))
   so the merge is partition-local and the write is shuffle-free.
   Hot-repo skew is broken by the path-salt inside the bucket function
   (lake/table.py:bucket_expr) + AQE skew handling.
6. **Merge**: bucket-pruned read of current state for touched buckets
   only, union with events, window last-writer-wins, drop deletes —
   copy-on-write of exactly the touched buckets.
7. **Commit**: atomic snapshot manifest swap; per-bucket watermarks
   advance to max applied (commit, event_seq).
8. **Lineage/metrics**: per-bucket rows appended to a parquet lineage
   table; metrics dict returned.

Determinism: the merge winner per key is a pure function of
(commit, event_seq) — ties impossible within a stream — so the final
table state is byte-identical across batch boundaries, replay counts,
partition counts and cluster sizes. That invariant is what the
replay-equality and local[8]-vs-local[32] tests pin.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from filters_spark.engine.evolution import SpecRegistry
from filters_spark.lake.table import LakeTable, WATERMARK_ZERO, bucket_expr, watermark_str
from filters_spark.operators.validate import validate

PASSTHROUGH = ["commit", "event_seq", "op", "schema_version"]


class CDCEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        registry: SpecRegistry,
        dead_letter_dir: str | None = None,
        lineage_dir: str | None = None,
    ):
        self.spark = spark
        self.table = table
        self.registry = registry
        root = table.root
        self.dead_letter_dir = dead_letter_dir or os.path.join(root, "dead_letter")
        self.lineage_dir = lineage_dir or os.path.join(root, "lineage")

    # ------------------------------------------------------------------

    def _validated(self, events: DataFrame) -> DataFrame:
        """Union of per-registered-version validated slices, plus a
        dead-letter slice for unknown schema versions.

        No driver round-trip: every registered version contributes a
        filter branch; a batch's absent versions cost only parquet
        footer reads (min=max row-group stats on schema_version prune
        every row group). Events with an UNregistered version are
        routed to the dead-letter channel with code
        ``unknown_schema_version`` — a bad producer must not stall a
        10^10-event stream."""
        known = sorted(self.registry.versions)
        validated = None
        for v in known:
            spec = self.registry.get(v)
            sliced = events.filter(F.col("schema_version") == v)
            normalized = self.registry.normalize(sliced, v, PASSTHROUGH)
            vdf = validate(normalized, spec.field_specs, keep_raw="on_error")
            validated = vdf if validated is None else validated.unionByName(vdf)

        unknown = events.filter(
            ~F.col("schema_version").isin(known) | F.col("schema_version").isNull()
        )
        err = F.array(
            F.struct(
                F.lit("schema_version").alias("key"),
                F.lit("unknown_schema_version").alias("code"),
                F.concat(
                    F.lit("No spec registered for schema_version="),
                    F.coalesce(F.col("schema_version").cast("string"), F.lit("null")),
                ).alias("message"),
            )
        )
        cols = [F.col(c) for c in PASSTHROUGH]
        for c in self.registry.canonical_columns:
            cols.append(F.lit(None).cast("string").alias(c))
            raw = F.col(c) if c in events.columns else F.lit(None).cast("string")
            cols.append(raw.alias(f"_raw_{c}"))
        cols.append(err.alias("_errors"))
        unknown_validated = unknown.select(*cols)
        return validated.unionByName(unknown_validated) if validated is not None else unknown_validated

    # ------------------------------------------------------------------

    def apply_batch(self, events: DataFrame) -> dict:
        """Apply one event batch; returns metrics. Idempotent: replaying
        any subset of already-applied events is a no-op."""
        t0 = time.time()
        snap = self.table.current()
        num_buckets = snap["num_buckets"]
        path_salt = snap["path_salt"]

        # 1-2. schema-normalize + validate (one composite plan, no
        # driver round-trips) then drop already-applied events
        validated = self._validated(events)

        validated = validated.withColumn(
            "_bucket", bucket_expr(F.col("repo"), F.col("path"), num_buckets, path_salt)
        ).withColumn("_wm", watermark_str(F.col("commit"), F.col("event_seq")))

        wm_map = snap["watermarks"]
        if wm_map:
            wm_df = self.spark.createDataFrame(
                [(int(b), w) for b, w in wm_map.items()], "_bucket int, _bucket_wm string"
            )
            validated = (
                validated.join(F.broadcast(wm_df), "_bucket", "left")
                .filter(F.col("_bucket_wm").isNull() | (F.col("_wm") > F.col("_bucket_wm")))
                .drop("_bucket_wm")
            )

        # Stage the validated batch to scratch parquet: ONE pass runs the
        # validation (incl. the Arrow kernel) exactly once; the three
        # consumers (stats, dead-letter write, merge) read the staged
        # columnar file with per-consumer column pruning. This beat both
        # alternatives measured in this environment: recompute-per-
        # consumer (3x kernel + scan) and .persist() (Spark's row cache
        # spilled through JavaSerializer and dominated wall-clock).
        # On a cluster the scratch dir is the job's staging location on
        # the DFS — bounded by batch size, cleaned after commit.
        scratch = os.path.join(self.table.root, "_staging", f"batch-{uuid.uuid4().hex}")
        try:
            (
                validated.withColumn("_dead", F.size(F.col("_errors")) > 0)
                .write.partitionBy("_dead")
                .parquet(scratch)
            )
            has_rows = any(
                f.endswith(".parquet")
                for _, _, files in os.walk(scratch)
                for f in files
            )
            if not has_rows:  # everything was a watermark-filtered replay
                events_in = events.count()
                return {
                    "events_in": events_in, "applied": 0, "dead_lettered": 0,
                    "skipped_replays": events_in,
                    "snapshot_id": snap["snapshot_id"], "seconds": time.time() - t0,
                }
            validated = (
                self.spark.read.option("basePath", scratch).parquet(scratch)
                # partition-column inference yields STRING for booleans
                .withColumn("_dead", F.col("_dead").cast("boolean"))
            )

            # ONE metadata-scale stats pass: dead count, touched buckets
            # and per-bucket watermarks together ( _dead is a partition
            # column, so the grouping is pruning-friendly).
            stats_rows = (
                validated.groupBy("_dead", F.col("_bucket"))
                .agg(F.max("_wm").alias("wm"), F.count("*").alias("n"))
                .collect()
            )
            n_dead = int(sum(r["n"] for r in stats_rows if r["_dead"]))
            bucket_stats = [r for r in stats_rows if not r["_dead"]]
            clean = validated.filter(~F.col("_dead")).drop("_dead")

            # a NULL key can't be merged; key-less clean rows are dead-lettered upstream
            # by the 'required' chain on path, so clean rows always have keys.

            touched = [int(r["_bucket"]) for r in bucket_stats]
            new_wms = {int(r["_bucket"]): r["wm"] for r in bucket_stats}
            applied_events = int(sum(r["n"] for r in bucket_stats))

            if not touched:
                events_in = events.count()
                self._adopt_dead_letters(scratch, n_dead)
                return {
                    "events_in": events_in, "applied": 0, "dead_lettered": n_dead,
                    "skipped_replays": events_in - n_dead,
                    "snapshot_id": snap["snapshot_id"], "seconds": time.time() - t0,
                }

            # 6. merge: current state of touched buckets + batch events.
            # ONE shuffle, keyed on _bucket (== the table's physical
            # partitioning), so the merge is partition-local and the
            # write needs no further exchange. Within each bucket, rows
            # are sorted by (key, _wm desc); the first row of each key
            # group is the last writer — in-batch dedupe and
            # merge-against-current collapse into the same window pass.
            current = self.table.read(buckets=touched)
            ev_cols = ["repo", "path", "commit", "event_seq", "lang", "content", "op", "_bucket", "_wm"]
            incoming = clean.select(*ev_cols).filter(
                F.col("repo").isNotNull() & F.col("path").isNotNull()
            )
            if current is not None:
                cur = current.select(
                    "repo", "path", "commit", "event_seq", "lang", "content",
                    F.lit("K").alias("op"),
                    F.col("_bucket").cast("int").alias("_bucket"),
                    watermark_str(F.col("commit"), F.col("event_seq")).alias("_wm"),
                )
                merged_src = cur.unionByName(incoming)
            else:
                merged_src = incoming

            mw = Window.partitionBy("_bucket").orderBy(
                "repo", "path", F.col("_wm").desc()
            )
            is_group_head = (
                F.lag("repo").over(mw).isNull()
                | (F.lag("repo").over(mw) != F.col("repo"))
                | (F.lag("path").over(mw) != F.col("path"))
            )
            merged = (
                merged_src
                .withColumn("_head", F.coalesce(is_group_head, F.lit(True)))
                .filter(F.col("_head") & (F.col("op") != "D"))
                .select(
                    "repo", "path", "commit", "event_seq", "lang", "content",
                    F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
                    "_bucket",
                )
            )

            # 7. atomic commit (copy-on-write of touched buckets only)
            stats = {
                "rows_applied": applied_events,
                "batch_dead_lettered": n_dead,
            }
            new_snap = self.table.commit_buckets(
                merged, touched, new_wms, stats=stats,
                schema_version=self.registry.latest,
                columns=self.registry.canonical_columns,
            )

            # 3b (deferred until after the merge executed, so the clean
            # scan never races the move): adopt the staged _dead=true
            # files AS the dead-letter table — a metadata move, not
            # another Spark job over the batch.
            self._adopt_dead_letters(scratch, n_dead)

            # 8. lineage
            lineage_rows = [
                (
                    new_snap["snapshot_id"], int(r["_bucket"]), r["wm"], int(r["n"]),
                    n_dead, int(time.time() * 1000),
                )
                for r in bucket_stats
            ]
            self.spark.createDataFrame(
                lineage_rows,
                "snapshot_id long, bucket int, watermark string, rows_applied long, "
                "batch_dead_lettered long, ts_ms long",
            ).coalesce(1).write.mode("append").parquet(self.lineage_dir)

            return {
                "events_in": None,  # not counted to avoid an extra pass; see applied
                "applied": applied_events,
                "dead_lettered": n_dead,
                "touched_buckets": len(touched),
                "snapshot_id": new_snap["snapshot_id"],
                "seconds": time.time() - t0,
            }
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def _adopt_dead_letters(self, scratch: str, n_dead: int) -> None:
        dead_src = os.path.join(scratch, "_dead=true")
        if n_dead and os.path.isdir(dead_src):
            batch_dir = os.path.join(self.dead_letter_dir, os.path.basename(scratch))
            os.makedirs(self.dead_letter_dir, exist_ok=True)
            shutil.move(dead_src, batch_dir)

    # ------------------------------------------------------------------

    def replay(self, events: DataFrame, num_batches: int = 1) -> list[dict]:
        """Replay an event stream in commit-ordered batches (a WAL tail
        consumes ranges in order; batching by commit prefix keeps each
        batch a contiguous WAL range)."""
        if num_batches <= 1:
            return [self.apply_batch(events)]
        bounds = events.select(
            F.min("commit").alias("lo"), F.max("commit").alias("hi")
        ).first()
        lo, hi = int(bounds.lo, 16), int(bounds.hi, 16)
        metrics = []
        span = (hi - lo + num_batches) // num_batches
        for i in range(num_batches):
            b_lo, b_hi = lo + i * span, lo + (i + 1) * span
            batch = events.filter(
                (F.col("commit") >= F.format_string("%012x", F.lit(b_lo)))
                & (F.col("commit") < F.format_string("%012x", F.lit(b_hi)))
            )
            metrics.append(self.apply_batch(batch))
        return metrics

    def dead_letters(self, distinct: bool = True) -> DataFrame | None:
        """The dead-letter table: raw payloads + full error channel.

        Rows are the adopted staging files (one dir per batch); raw
        field values are restored under their original names and the
        error channel is exposed both structured and as JSON. Replayed
        batches re-append their dead letters (watermarks only advance on
        *clean* events in a bucket), so reads dedupe on event identity
        by default."""
        if not os.path.isdir(self.dead_letter_dir):
            return None
        df = self.spark.read.option("recursiveFileLookup", "true").parquet(self.dead_letter_dir)
        raw_cols = [c for c in df.columns if c.startswith("_raw_")]
        for rc in raw_cols:
            orig = rc[len("_raw_"):]
            df = df.drop(orig).withColumnRenamed(rc, orig)
        df = df.select(
            "commit", "event_seq", "op", "schema_version", "repo", "path", "lang", "content",
            F.col("_errors").alias("errors"),
            F.to_json(F.col("_errors")).alias("errors_json"),
            F.element_at(F.col("_errors"), 1)["code"].alias("first_code"),
            F.element_at(F.col("_errors"), 1)["key"].alias("first_key"),
        )
        if distinct:
            df = df.dropDuplicates(["commit", "event_seq", "repo", "path"])
        return df

    def lineage(self) -> DataFrame | None:
        if not os.path.isdir(self.lineage_dir):
            return None
        return self.spark.read.parquet(self.lineage_dir)
