"""The CDC merge-apply loop: binlog tail -> validated, exactly-once,
key-partitioned upserts into the lake table.

Pipeline per batch (SURVEY.md §4.3):

1. **Schema-normalize + validate in one scan**: versions dispatch via
   CASE on schema_version; distinct chains run once over masked inputs
   (``_validated``).
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

import json
import os
import threading
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from filters_spark.engine.evolution import SpecRegistry
from filters_spark.lake.table import LakeTable, WATERMARK_ZERO, bucket_expr, lww_merge, watermark_str

PASSTHROUGH = ["commit", "event_seq", "op", "schema_version"]


@dataclass(frozen=True)
class RefCheck:
    """Referential-integrity gate for one canonical payload column —
    the cross-TABLE complement of the per-field filter chains: a
    change event whose ``field`` value is not in the reference set is
    dead-lettered (code ``ref_violation:<name>``) instead of applied,
    exactly like a per-field FilterError. SQL-FK semantics by default:
    NULL passes (``allow_null=False`` rejects it), and DELETE events
    are exempt — a tombstone removes the row, its carried payload
    never lands.

    ``ref``: a one-column-usable DataFrame (the dimension) or a
    callable ``(spark) -> DataFrame`` resolved at staging time (live
    dimensions re-read per replay). The gate is ONE broadcast hash
    join per check over the distinct reference values — dimension
    class, never fact class: the distinct set must broadcast."""

    field: str
    ref: object          # DataFrame | (spark) -> DataFrame
    ref_col: str
    name: str = "fk"
    allow_null: bool = True

    def resolve(self, spark: SparkSession) -> DataFrame:
        df = self.ref(spark) if callable(self.ref) else self.ref
        return df.select(F.col(self.ref_col).cast("string").alias("__ref")).distinct()


@dataclass(frozen=True)
class CheckConstraint:
    """Table-level CHECK constraint (Delta ``ADD CONSTRAINT`` / DLT
    expectation) over the VALIDATED canonical row: a SQL boolean
    expression evaluated per change event after the field chains run;
    events where it is FALSE dead-letter under
    ``check_violation:<name>``. SQL CHECK semantics: NULL (unknown)
    PASSES — spell ``x IS NOT NULL AND ...`` to reject missing values.
    DELETE tombstones are exempt (nothing lands). Pure map-side column
    algebra — no join, no shuffle, no Python; cross-FIELD invariants
    (``commit`` width vs ``event_seq`` range, lang/content coherence)
    that single-field chains cannot express."""

    name: str
    predicate: str

    def expr(self) -> F.Column:
        return F.expr(self.predicate)


@dataclass
class StagedBatch:
    """A batch applied up to — but not including — the publish: the
    merge's data files and a staged (write-audit-publish) header are on
    disk, the table head has NOT moved, and the validated scratch dir
    (carrying the batch's dead letters) is retained. The decision is
    deferred to the caller: :meth:`publish` fast-forwards the head and
    completes the side effects (dead-letter adoption, lineage, scratch
    cleanup); :meth:`abandon` drops everything, leaving the table as if
    the batch never arrived.

    This is the per-table half of a multi-table atomic fan-out
    (engine/txn.py): stage every table, persist one commit decision,
    then publish all — a crash between publishes rolls forward from
    the decision record instead of tearing the batch across tables.

    Every field except ``engine`` is JSON-serializable (``to_entry``/
    ``from_entry``) so a coordinator can persist the handle and a
    recovery process in a fresh session can finish the publish.

    ``wap_id`` is None when the batch touched no bucket (empty slice,
    all dead-lettered, or all replays) — publish then only adopts dead
    letters and cleans up; the head never moves.
    """

    engine: "CDCEngine"
    wap_id: str | None
    parent_sid: int
    staged_sid: int | None
    scratch: str | None
    dead_src: str | None
    adopt_name: str | None
    n_dead: int
    events_in: int
    applied: int
    skipped: int
    # per-bucket (bucket, max_watermark, rows) for lineage
    bucket_stats: list = field(default_factory=list)
    t0: float = 0.0

    _ENTRY_FIELDS = (
        "wap_id", "parent_sid", "staged_sid", "scratch", "dead_src",
        "adopt_name", "n_dead", "events_in", "applied", "skipped",
        "bucket_stats",
    )

    def to_entry(self) -> dict:
        return {k: getattr(self, k) for k in self._ENTRY_FIELDS}

    @classmethod
    def from_entry(cls, engine: "CDCEngine", entry: dict) -> "StagedBatch":
        e = {k: entry[k] for k in cls._ENTRY_FIELDS}
        e["bucket_stats"] = [tuple(r) for r in e["bucket_stats"]]
        return cls(engine=engine, t0=time.time(), **e)

    def publish(self) -> dict:
        """Fast-forward the table to the staged state and complete the
        deferred side effects. Raises if the head moved since staging
        (a concurrent writer) — the stage is left intact for the caller
        to abandon or re-stage."""
        eng = self.engine
        if self.wap_id is not None:
            new_snap = eng.table.publish_wap(self.wap_id)
            sid = new_snap["snapshot_id"]
            if eng.write_mode == "mor":
                ripe = eng.table.buckets_needing_compaction(eng.compact_after)
                if ripe:
                    eng.table.compact(ripe)
        else:
            sid = self.parent_sid
        self.finalize(sid)
        return self._metrics(sid, status="published")

    def finalize(self, sid: int, dedupe_lineage: bool = False) -> None:
        """The post-publish side effects, each idempotent so crash
        recovery can re-run them: dead-letter adoption (a rename —
        skipped when the source dir is already gone), lineage rows
        (``dedupe_lineage`` skips the write when rows for ``sid``
        already exist — recovery can't know whether the first attempt
        got this far), scratch cleanup."""
        eng = self.engine
        if self.dead_src is not None:
            eng._adopt_dead_letters(self.dead_src, self.adopt_name, self.n_dead)
        rows = [
            (sid, int(b), w, int(n), self.n_dead, int(time.time() * 1000))
            for b, w, n in self.bucket_stats
        ]
        if rows and dedupe_lineage and self._lineage_has(sid):
            rows = []
        eng._write_lineage(rows)
        if self.scratch is not None:
            eng.io.rmtree(self.scratch)

    def _lineage_has(self, sid: int) -> bool:
        eng = self.engine
        if not eng.io.isdir(eng.lineage_dir):
            return False
        return bool(
            eng.spark.read.parquet(eng.lineage_dir)
            .filter(F.col("snapshot_id") == sid)
            .head(1)
        )

    def abandon(self) -> dict:
        """Drop the stage: table head, watermarks and dead-letter table
        all untouched — re-applying the batch later is NOT a replay."""
        eng = self.engine
        if self.wap_id is not None and eng.io.exists(eng.table._wap_path(self.wap_id)):
            eng.table.abandon_wap(self.wap_id)
        if self.scratch is not None:
            eng.io.rmtree(self.scratch)
        return self._metrics(self.parent_sid, status="abandoned", rejected=True)

    def _metrics(self, sid: int, status: str, rejected: bool = False) -> dict:
        return {
            "events_in": self.events_in,
            "applied": 0 if rejected else self.applied,
            "dead_lettered": 0 if rejected else self.n_dead,
            "skipped_replays": self.skipped,
            "touched_buckets": 0 if rejected else len(self.bucket_stats),
            "txn": status,
            "snapshot_id": sid,
            "seconds": time.time() - self.t0,
        }


class CDCEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        registry: SpecRegistry,
        dead_letter_dir: str | None = None,
        lineage_dir: str | None = None,
        write_mode: str = "cow",
        compact_after: int = 8,
        group_applies: bool = True,
        ref_checks: list[RefCheck] | None = None,
        check_constraints: list[CheckConstraint] | None = None,
    ):
        """``write_mode``:

        - ``"cow"`` (default): each batch rewrites the touched buckets
          with the merged state — reads stay bare scans, but ingest IO
          is O(touched table) per batch.
        - ``"mor"``: each batch appends O(batch) delta files
          (merge-on-read); reads fold base ∪ deltas lazily, and buckets
          auto-compact once they accumulate ``compact_after`` delta
          files. The ingest path for 10^10-event replays, where CoW's
          per-batch rewrite is quadratic in total IO.
        """
        self.spark = spark
        self.table = table
        self.io = table.io  # same FS as the table (DFS-safe, lake/fileio.py)
        if not registry.versions:
            raise ValueError("registry has no registered schema versions")
        self.registry = registry
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        self.write_mode = write_mode
        self.compact_after = compact_after
        # fold each replay group's batch applies into one Spark job
        # (_apply_staged_group_cow / _apply_staged_group_mor); False
        # forces the sequential per-batch path (same results, pinned
        # by tests)
        self.group_applies = group_applies
        for chk in ref_checks or []:
            if chk.field not in registry.canonical_columns:
                raise ValueError(
                    f"ref_check field {chk.field!r} is not a canonical column"
                )
        self.ref_checks = list(ref_checks or [])
        self.check_constraints = list(check_constraints or [])
        root = table.root
        self.dead_letter_dir = dead_letter_dir or os.path.join(root, "dead_letter")
        self.lineage_dir = lineage_dir or os.path.join(root, "lineage")

    # ------------------------------------------------------------------

    # Merge-window partition sizing: the LWW fold sorts content-heavy
    # rows per (version/batch, bucket) partition, and letting the
    # session's shuffle.partitions (sized to core count by callers) or
    # AQE's compressed-byte coalescing decide leaves multi-GB sorts per
    # task at replay scale (measured: the 6M-event grouped CoW fold ran
    # 3x slower at 8 post-shuffle partitions than at 64). The engine
    # knows the row volume entering every fold from the batch stats, so
    # it sizes the exchange explicitly: rows/ROWS_PER_PARTITION, floored
    # at the session's shuffle.partitions (small folds keep exactly the
    # plan they had) and capped defensively. Row-count based because
    # parquet/shuffle compressed bytes under-estimate in-memory sort
    # width ~40x on code content; override per deployment via
    # FILTERS_SPARK_FOLD_ROWS_PER_PARTITION for much wider/narrower rows.
    FOLD_ROWS_PER_PARTITION = int(
        os.environ.get("FILTERS_SPARK_FOLD_ROWS_PER_PARTITION", "200000")
    )

    def _fold_partitions(self, rows_est: int) -> int:
        floor = int(self.spark.conf.get("spark.sql.shuffle.partitions", "200"))
        return max(floor, min(rows_est // self.FOLD_ROWS_PER_PARTITION + 1, 4096))

    def _current_rows_est(self, buckets: list[int]) -> int:
        """Metadata-only row estimate of the current state of the given
        buckets (0 when manifests lack counts — partition sizing only,
        never semantics)."""
        try:
            return self.table.metadata_row_count(buckets=buckets) or 0
        except Exception:
            return 0

    def _payload_cols(self) -> list[str]:
        """Non-key canonical payload columns, derived from the registry
        at CALL time — registering a VersionSpec that adds a column
        widens the set mid-stream (the next commit records the union;
        older files read the new columns as NULL)."""
        return [c for c in self.registry.canonical_columns if c not in ("repo", "path")]

    def _validated(self, events: DataFrame) -> DataFrame:
        """Single-scan, version-dispatched validation.

        Per canonical field, registered versions are grouped by
        (chain spec, source column after rename); each DISTINCT chain
        compiles once and runs once over a version-masked input column,
        with a CASE on ``schema_version`` stitching group outputs back
        together. Versus the previous union-of-slices design this reads
        the WAL once instead of once per version (+1 for the unknown
        slice) and crosses the Python/Arrow boundary once per distinct
        kernel chain instead of once per version — the dominant costs
        of the staging pass. Events with an UNregistered version get
        NULL fields and an ``unknown_schema_version`` dead-letter error
        — a bad producer must not stall a 10^10-event stream."""
        from filters_spark.operators.validate import ERRORS_COL, FieldSpec, compile_field
        from filters_spark.functions.native import ERRORS_DDL

        known = sorted(self.registry.versions)
        sv = F.col("schema_version")
        known_cond = sv.isin(known)

        def src_name(field: str, v: int) -> str | None:
            incoming = field
            for old, new in self.registry.get(v).renames.items():
                if new == field:
                    incoming = old
            return incoming if incoming in events.columns else None

        empty_errs = F.array().cast(ERRORS_DDL)
        field_values: dict[str, F.Column] = {}
        field_raws: dict[str, F.Column] = {}
        field_errs: list[F.Column] = []
        # Native chains are compiled to PARTS (final transform +
        # nullable first-error struct) projected as named intermediate
        # columns in a first select; the second select stitches the
        # err-gated value and the error channel from those attributes.
        # Inlining both into one projection evaluates the whole chain
        # tree TWICE per field (codegen subexpression elimination does
        # not reach across the value/error CASE trees — measured ~2x
        # the native cost); the err alias is non-cheap and referenced
        # twice, so CollapseProject keeps the two projections apart and
        # the chain runs once.
        part_cols: list[F.Column] = []
        for field in self.registry.canonical_columns:
            groups: dict[str, list[int]] = {}
            for v in known:
                chain = self.registry.get(v).field_specs.get(field)
                key = json.dumps([chain, src_name(field, v)], sort_keys=True, default=repr)
                groups.setdefault(key, []).append(v)

            value_expr, err_expr, raw_expr = None, None, None
            for gi, vs in enumerate(groups.values()):
                chain_spec = self.registry.get(vs[0]).field_specs.get(field)
                src = src_name(field, vs[0])
                # WAL payload contract: field chains consume STRING
                # payloads (binlog/WAL values arrive serialized). A
                # non-string source column is therefore cast to string
                # at the source — the native chain then sees a genuine
                # string input, so its string semantics (required's
                # emptiness test, etc.) are correct BY CONSTRUCTION,
                # closing the round-2 advice gap without diverting the
                # column to an additional Arrow kernel stage in the hot
                # loop (each kernel stage is an extra Arrow
                # serialization round trip per staged batch). Parser
                # kernels (Int etc.) re-cast the cleaned value to its
                # target dtype, so outputs are unchanged (pinned
                # byte-exact vs the pandas oracle).
                if src is not None and src in events.columns and (
                    events.schema[src].dataType.simpleString() != "string"
                ):
                    in_col = F.col(src).cast("string")
                elif src is not None:
                    in_col = F.col(src)
                else:
                    in_col = F.lit(None).cast("string")
                cond = sv.isin(vs)
                if chain_spec is None:  # field not validated in these versions
                    val, errs = in_col, empty_errs
                else:
                    spec = FieldSpec.of(chain_spec)
                    native_parts = None
                    if spec.mode in ("auto", "native"):
                        from filters_spark.functions.native import compile_native_chain

                        native_parts = compile_native_chain(
                            field, spec.chain_spec, input_type="string", parts=True
                        )
                    if native_parts is not None:
                        t_name = f"__nat_t_{field}_{gi}"
                        e_name = f"__nat_e_{field}_{gi}"
                        raw_val, err = native_parts(in_col)
                        part_cols.append(raw_val.alias(t_name))
                        part_cols.append(err.alias(e_name))
                        e, t = F.col(e_name), F.col(t_name)
                        val = F.when(e.isNull(), t).otherwise(F.lit(None))
                        errs = F.when(
                            e.isNotNull(), F.array(e)
                        ).otherwise(empty_errs)
                    else:
                        _, fn = compile_field(field, spec, input_type="string")
                        # mask the input to NULL outside this version
                        # group for kernel chains: it keeps other
                        # groups' payload bytes off the Python path
                        val, errs = fn(F.when(cond, in_col))
                value_expr = F.when(cond, val) if value_expr is None else value_expr.when(cond, val)
                err_expr = F.when(cond, errs) if err_expr is None else err_expr.when(cond, errs)
                raw_expr = F.when(cond, in_col) if raw_expr is None else raw_expr.when(cond, in_col)

            # unknown versions: NULL value, raw preserved when present
            fallback_raw = F.col(field) if field in events.columns else F.lit(None).cast("string")
            field_values[field] = value_expr.otherwise(F.lit(None))
            field_raws[field] = raw_expr.otherwise(fallback_raw)
            field_errs.append(err_expr.otherwise(empty_errs))

        unknown_err = F.array(
            F.struct(
                F.lit("schema_version").alias("key"),
                F.lit("unknown_schema_version").alias("code"),
                F.concat(
                    F.lit("No spec registered for schema_version="),
                    F.coalesce(sv.cast("string"), F.lit("null")),
                ).alias("message"),
            )
        )
        # concat of the per-field arrays (not array-of-arrays + flatten:
        # one less allocation pass per row, same element order)
        all_errs = F.when(known_cond, F.concat(*field_errs)).otherwise(unknown_err)

        projection = [F.col(c) for c in PASSTHROUGH]
        for field in self.registry.canonical_columns:
            projection.append(field_values[field].alias(field))
            projection.append(field_raws[field].alias(f"_raw_{field}"))
        projection.append(all_errs.alias(ERRORS_COL))
        base = events.select("*", *part_cols) if part_cols else events
        return base.select(*projection)

    @staticmethod
    def _null_clean_raws(out: DataFrame) -> DataFrame:
        """keep_raw="on_error": NULL the ``_raw_*`` columns of rows with
        an empty error channel, as a separate projection so the error
        expression is evaluated once (CollapseProject leaves
        multiply-referenced non-cheap expressions alone). Runs AFTER
        the ref/check gates — a row dead-lettered only by a gate must
        keep its raws, or dead_letters()/retry_dead_letters would see a
        payload-less event."""
        from filters_spark.operators.validate import ERRORS_COL

        has_errors = F.size(F.col(ERRORS_COL)) > 0
        return out.select(
            *[
                F.when(has_errors, F.col(c)).alias(c) if c.startswith("_raw_") else F.col(c)
                for c in out.columns
            ]
        )

    def _ref_checked(self, df: DataFrame) -> DataFrame:
        """Apply the engine's :class:`RefCheck` and
        :class:`CheckConstraint` gates to a validated frame: one
        BROADCAST hash join per ref check against the distinct
        reference values, one map-side boolean expression per
        constraint (the event stream never shuffles for either),
        appending ``ref_violation:<name>`` / ``check_violation:<name>``
        error structs. Runs BEFORE the ``_dead`` split, so violations
        ride the normal dead-letter machinery (adoption,
        retry_dead_letters after fixing the dimension/producer,
        metrics) with zero new code paths."""
        from filters_spark.operators.validate import ERRORS_COL

        for chk in self.ref_checks:
            ref = F.broadcast(chk.resolve(self.spark).withColumn("__hit", F.lit(True)))
            df = df.join(ref, df[chk.field] == ref["__ref"], "left").drop("__ref")
            bad = F.col("__hit").isNull() & (F.col("op") != F.lit("D"))
            if chk.allow_null:
                bad = bad & F.col(chk.field).isNotNull()
            err = F.struct(
                F.lit(chk.field).alias("key"),
                F.lit(f"ref_violation:{chk.name}").alias("code"),
                F.concat(
                    F.lit(f"value not in reference set {chk.name!r}: "),
                    F.coalesce(F.col(chk.field), F.lit("null")),
                ).alias("message"),
            )
            df = df.withColumn(
                ERRORS_COL,
                F.when(bad, F.concat(F.col(ERRORS_COL), F.array(err)))
                .otherwise(F.col(ERRORS_COL)),
            ).drop("__hit")
        for chk in self.check_constraints:
            # SQL CHECK semantics: only a definitively-FALSE predicate
            # violates (NULL = unknown passes); deletes are exempt
            bad = (chk.expr() == F.lit(False)) & (F.col("op") != F.lit("D"))
            err = F.struct(
                F.lit(chk.name).alias("key"),
                F.lit(f"check_violation:{chk.name}").alias("code"),
                F.lit(f"CHECK ({chk.predicate}) failed").alias("message"),
            )
            df = df.withColumn(
                ERRORS_COL,
                F.when(bad, F.concat(F.col(ERRORS_COL), F.array(err)))
                .otherwise(F.col(ERRORS_COL)),
            )
        return df

    # ------------------------------------------------------------------

    # split-sizing mutates SESSION conf; concurrent stagers (the
    # fan-out thread pool) must not interleave set/restore. Non-blocking:
    # whoever holds the lock tunes its scan, everyone else runs with the
    # session defaults (correct either way — split size is performance,
    # never semantics).
    _SCAN_SPLITS_LOCK = threading.Lock()

    @contextmanager
    def _scan_splits(self, events: DataFrame):
        """Scope parquet split sizing to the staging job.

        The WAL compresses hard (measured ~40x on code content), so a
        fixed byte-based split size packs its files into far fewer scan
        tasks than the cluster has cores (measured: 64 segments -> 13
        tasks at 32 MB splits = 1.6 task waves on an 8-core leg, 60%
        idle on 32) — and the staging scan is narrow (no shuffle), so
        its task count IS the parallelism of the whole validate phase.
        Size splits from the actual input bytes to ~3 tasks per core,
        for THIS job only: a session-wide small split was measured
        slower (it also shatters the staged-parquet re-reads and every
        query scan into per-task python-worker setup overhead)."""
        try:
            files = events.inputFiles()
        except Exception:
            files = []
        if not files:
            yield
            return
        sc = self.spark.sparkContext
        try:
            jvm = sc._jvm
            hconf = sc._jsc.hadoopConfiguration()
            total = 0
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:
            yield
            return
        # ~3 tasks/core, but never below 4MB/task: Arrow batch + codegen
        # setup per task needs a few MB of work to amortize (measured:
        # a 1MB floor at local[32] tripled replay wall — ~100 tiny
        # tasks AND ~8x the staged file count for every downstream
        # per-batch read to re-pack).
        par = max(sc.defaultParallelism, 1)
        target = min(max(total // (3 * par), 4 << 20), 128 << 20)
        open_cost = min(max(target // 4, 64 << 10), 4 << 20)
        if not self._SCAN_SPLITS_LOCK.acquire(blocking=False):
            yield  # a concurrent stager is tuning; run with defaults
            return
        try:
            conf = self.spark.conf
            wanted = {
                "spark.sql.files.maxPartitionBytes": str(target),
                "spark.sql.files.openCostInBytes": str(open_cost),
            }
            old = {k: conf.get(k, None) for k in wanted}
            for k, v in wanted.items():
                conf.set(k, v)
            try:
                yield
            finally:
                for k, v in old.items():
                    if v is None:
                        conf.unset(k)
                    else:
                        conf.set(k, v)
        finally:
            self._SCAN_SPLITS_LOCK.release()

    def _stage(
        self,
        events: DataFrame,
        snap: dict,
        batch_col: F.Column | None = None,
        prefix: str = "batch",
        scratch_dir: str | None = None,
    ) -> str:
        """Validate + bucket the stream and stage it to scratch parquet,
        partitioned by (_batch?, _dead).

        This is THE fixed-cost sink: the multi-version validate plan
        (the largest Catalyst tree in the engine) is analyzed, codegen'd
        and executed exactly ONCE per stage call — replay() stages the
        whole stream in one pass, so N batches pay the plan cost once
        instead of N times (round-1 measured ~60s/batch of driver-side
        fixed cost at any batch size; that was the scaling killer).
        Downstream consumers (stats, dead-letter adoption, merge) read
        the staged columnar files back with partition pruning on
        (_batch, _dead) and per-consumer column pruning.

        Staging to parquet beat both alternatives measured here:
        recompute-per-consumer (3x kernel + scan) and .persist()
        (JavaSerializer spill dominated). On a cluster the scratch dir
        is the job's DFS staging location — bounded by the staged input
        size, cleaned after the last commit."""
        validated = self._validated(events)
        if self.ref_checks or self.check_constraints:
            validated = self._ref_checked(validated)
        validated = self._null_clean_raws(validated)
        validated = validated.withColumn(
            "_bucket",
            bucket_expr(F.col("repo"), F.col("path"), snap["num_buckets"], snap["path_salt"]),
        ).withColumn("_wm", watermark_str(F.col("commit"), F.col("event_seq")))
        staged = validated.withColumn("_dead", F.size(F.col("_errors")) > 0)
        parts = ["_dead"]
        if batch_col is not None:
            staged = staged.withColumn("_batch", batch_col)
            parts = ["_batch", "_dead"]
        scratch = scratch_dir or os.path.join(
            self.table.root, "_staging", f"{prefix}-{uuid.uuid4().hex}"
        )
        with self._scan_splits(events):
            staged.write.partitionBy(*parts).parquet(scratch)
        return scratch

    def apply_batch(self, events: DataFrame, audit_fn=None) -> dict:
        """Apply one event batch; returns metrics. Idempotent: replaying
        any subset of already-applied events is a no-op.

        ``audit_fn(table, wap_id) -> bool``: write-audit-publish gate.
        When given, the batch's merge is STAGED (lake/table.py
        stage_buckets/stage_deltas) instead of committed; the callback
        audits the staged state — ``table.read(wap_id=wap_id)``, row
        counts, invariant checks — and returns True to publish. False
        (or an exception) abandons the stage: the table head, the
        watermarks and the dead-letter table are all untouched, so
        re-applying the batch after fixing the producer is NOT treated
        as a replay. Metrics gain ``"audit": "published"|"rejected"``."""
        t0 = time.time()
        snap = self.table.current()
        scratch = self._stage(events, snap)
        try:
            if not self.io.tree_has_suffix(scratch, ".parquet"):  # empty input
                return {
                    "events_in": 0, "applied": 0, "dead_lettered": 0,
                    "skipped_replays": 0,
                    "snapshot_id": snap["snapshot_id"], "seconds": time.time() - t0,
                }
            staged = (
                self.spark.read.option("basePath", scratch).parquet(scratch)
                # partition-column inference yields STRING for booleans
                .withColumn("_dead", F.col("_dead").cast("boolean"))
            )
            return self._apply_staged(
                staged, os.path.join(scratch, "_dead=true"), os.path.basename(scratch), t0,
                audit_fn=audit_fn,
            )
        finally:
            self.io.rmtree(scratch)

    def bootstrap(
        self,
        snapshot_rows: DataFrame,
        replay_from: "tuple[str, int] | str",
        schema_version: int | None = None,
        num_chunks: int = 1,
    ) -> dict:
        """Seed an EMPTY table from an initial source snapshot, then
        hand off to the binlog tail at ``replay_from`` — the classic
        CDC bootstrap (Debezium "initial snapshot then stream"; DBLog's
        watermark interleave solves the same race chunk-wise).

        The snapshot is FUZZY: it need not be a transactionally
        consistent cut. The contract is only that ``replay_from`` is a
        LOW watermark — a stream position such that every change at or
        below it is already reflected in the snapshot — and that each
        snapshot row carries the (commit, event_seq) of the change that
        last wrote it (source rows in a CDC deployment do: it is the
        row's last-modified position). Changes AFTER ``replay_from``
        may or may not be in the snapshot; the tail re-delivers them
        and the per-row LWW merge reconciles the overlap window:

        - tail event older than the snapshot row for its key → loses
          the ``_wm`` comparison in :func:`lww_merge`, no-op;
        - tail event newer → wins, upsert/delete applies;
        - same position (the event that produced the snapshot row) →
          identical content either way.

        Mechanically: the snapshot rows run the NORMAL staged apply —
        same validation chains, dead-letter routing, bucket shuffle and
        merge as any event batch (rows missing ``op``/``event_seq``
        default to ``'I'``/``0``; ``schema_version`` may be supplied as
        a literal) — then one metadata-only commit replaces every
        bucket's watermark with ``replay_from`` (LakeTable.
        set_watermarks). The seeding commit's own per-bucket maxima
        would be WRONG watermarks: a bucket's max snapshot position
        gates out overlap events targeting its OTHER rows. After
        bootstrap, ``replay()`` the tail from ``replay_from`` exactly
        as usual; re-replays of the tail start dedupe via the normal
        watermark gate, so the handoff is idempotent end-to-end
        (pinned in tests/test_bootstrap.py against a from-zero full
        replay: byte-identical final state).

        ``replay_from``: ``(commit_hex, event_seq)`` or a pre-formatted
        ``"commit:seq"`` watermark string. The commit must be the same
        fixed width as the stream's commit strings (watermark order is
        lexicographic) and ``event_seq`` must be ≥ 0.

        ``num_chunks``: with 1 (default) the snapshot seeds in ONE
        staged apply — fine up to mid-size tables, but a 10^10-row
        initial load should neither be one commit nor restart from zero
        on a crash. With G>1 the snapshot is staged ONCE (same
        single-pass validate as replay) partitioned into G whole-bucket
        chunks (chunk = bucket mod G — a bucket never spans chunks, so
        a committed chunk's watermarks can't gate a later chunk), each
        chunk commits independently, and a ``bootstrap-state.json``
        checkpoint under the table root records completed chunks: a
        crashed bootstrap RESUMES by calling bootstrap again with the
        same arguments — completed chunks are skipped, a
        committed-but-unrecorded chunk re-applies as all-replays
        (idempotent, the normal watermark gate), and only then does the
        final watermark handoff + cleanup run. DBLog loads initial
        snapshots in exactly this chunked, stream-interleaved way.

        Every num_chunks (1 included) runs through the same
        checkpointed path, so any crash window is resumable.

        Returns the apply metrics summed across ALL invocations of a
        (possibly resumed) bootstrap — the state file carries running
        totals — plus ``replay_from`` (the formatted low watermark) and
        ``bootstrap=True``. A chunk that committed in the crash window
        before its checkpoint record counts its events once, under
        ``skipped_replays`` (the re-apply) rather than ``applied``.
        """
        import re as _re

        if isinstance(replay_from, str):
            low = replay_from
            commit_part, _, seq_part = low.partition(":")
            if not commit_part or not seq_part:
                raise ValueError(f"malformed watermark string {low!r}")
            # the seq half needs the same width discipline as the
            # commit half: an unpadded 'abcdef...:5' sorts ABOVE padded
            # positions like ':00000000000000000042', silently dropping
            # part of the tail as replays. Accept any integer string
            # but normalize to the engine-wide %020d before use.
            if not _re.fullmatch(r"\d{1,20}", seq_part):
                raise ValueError(
                    f"replay_from event_seq {seq_part!r} must be a "
                    "decimal integer (≤20 digits; watermark order is "
                    "lexicographic over %020d-padded seqs)"
                )
            low = f"{commit_part}:{int(seq_part):020d}"
        else:
            commit_part, seq = replay_from
            if seq < 0:
                raise ValueError("replay_from event_seq must be >= 0")
            low = f"{commit_part}:{seq:020d}"
        # watermark order is LEXICOGRAPHIC: a commit of the wrong width
        # mis-sorts against every real position — e.g. an unpadded
        # '7530' exceeds all '0'-led 12-hex commits, silently dropping
        # the ENTIRE tail as replays. 12-hex zero-padded is the
        # engine-wide convention (WATERMARK_ZERO, datagen, the Debezium
        # ordering derivation all use %012x).
        if not _re.fullmatch(r"[0-9a-f]{12}", commit_part):
            raise ValueError(
                f"replay_from commit {commit_part!r} must be 12-char "
                "zero-padded lowercase hex (the stream's fixed commit "
                "width; lexicographic watermark order breaks otherwise)"
            )

        if num_chunks < 1:
            raise ValueError("num_chunks must be >= 1")

        rows = snapshot_rows
        if "op" not in rows.columns:
            rows = rows.withColumn("op", F.lit("I"))
        if "event_seq" not in rows.columns:
            rows = rows.withColumn("event_seq", F.lit(0).cast("long"))
        if "schema_version" not in rows.columns:
            if schema_version is None:
                raise ValueError(
                    "snapshot_rows has no schema_version column and no "
                    "schema_version literal was supplied"
                )
            rows = rows.withColumn("schema_version", F.lit(schema_version))

        snap = self.table.current()
        state_path = os.path.join(self.table.root, "bootstrap-state.json")
        resuming = self.io.exists(state_path)
        if not resuming and (
            snap["buckets"] or snap.get("deltas") or snap.get("watermarks")
        ):
            raise ValueError(
                "bootstrap requires an empty table (no data files, no "
                f"watermarks); head snapshot {snap['snapshot_id']} has "
                f"{len(snap['buckets'])} base bucket(s), "
                f"{len(snap.get('deltas') or {})} delta bucket(s), "
                f"{len(snap.get('watermarks') or {})} watermark(s)"
            )
        # num_chunks == 1 runs the SAME checkpointed path: a crash
        # between the seeding commit and the watermark handoff is
        # resumable instead of stranding high watermarks on a
        # non-empty table (which would silently gate out the overlap
        # window if the operator proceeded to replay anyway)
        return self._bootstrap_chunked(rows, low, num_chunks, snap, state_path)

    def _bootstrap_chunked(
        self, rows: DataFrame, low: str, num_chunks: int, snap: dict, state_path: str
    ) -> dict:
        """Chunked, crash-resumable seeding (see :meth:`bootstrap`).

        Crash-window sketch (all re-entrant via calling bootstrap again
        with the same args): during staging → no state file, restaged
        from scratch; after a chunk's commit but before its checkpoint
        record → re-applies as all-replays; after the final
        set_watermarks but before cleanup → set_watermarks re-runs
        (idempotent replacement) and cleanup completes."""
        scratch = os.path.join(self.table.root, "_staging", "bootstrap")
        success_marker = os.path.join(scratch, "_SUCCESS")
        t0 = time.time()
        counter_keys = ("events_in", "applied", "dead_lettered", "skipped_replays")
        if self.io.exists(state_path):
            state = json.loads(self.io.read_text(state_path))
            if state["replay_from"] != low or state["num_chunks"] != num_chunks:
                raise ValueError(
                    f"bootstrap-state.json records replay_from="
                    f"{state['replay_from']!r} num_chunks={state['num_chunks']} "
                    f"but this call passed {low!r}/{num_chunks}; resume with "
                    "the original arguments or remove the state file and "
                    "start over on an empty table"
                )
            # foreign-commit guard: resume is only sound when every
            # commit since the checkpoint came from THIS bootstrap —
            # the recorded head, or head+1 for a chunk that committed
            # in the crash window before its checkpoint record. A head
            # further along means someone ingested into the table
            # (e.g. an abandoned bootstrap followed by real replay);
            # re-seeding and REGRESSING watermarks under live ingest
            # would re-admit the whole tail range.
            head_now = self.table.current_snapshot_id()
            if head_now not in (state["head"], state["head"] + 1):
                raise ValueError(
                    f"cannot resume bootstrap: table head {head_now} moved "
                    f"past the checkpointed head {state['head']} by more "
                    "than the one-commit crash window — foreign commits "
                    "landed since; remove bootstrap-state.json and start "
                    "over on a fresh table"
                )
            # restage only when chunks remain AND the staged snapshot is
            # not COMPLETE — isdir alone is not completion (Spark
            # creates the dir at write-job start; a crashed restage
            # leaves a partial tree), the job-commit _SUCCESS marker is.
            # A crash in the final cleanup window (all chunks done,
            # scratch already removed) must NOT re-stage.
            if len(set(state["chunks_done"])) < num_chunks and not self.io.exists(
                success_marker
            ):
                if self.io.isdir(scratch):
                    self.io.rmtree(scratch)
                self._stage_bootstrap(rows, num_chunks, snap, scratch)
        else:
            if self.io.isdir(scratch):  # stale partial stage, no state
                self.io.rmtree(scratch)
            self._stage_bootstrap(rows, num_chunks, snap, scratch)
            state = {
                "replay_from": low, "num_chunks": num_chunks, "chunks_done": [],
                "head": self.table.current_snapshot_id(),
                "totals": {k: 0 for k in counter_keys},
            }
            self.io.write_text_atomic(state_path, json.dumps(state))

        # totals persist in the state file so a RESUMED bootstrap
        # returns the sum across invocations, not just its own chunks.
        # A chunk that committed in the crash window before its record
        # re-applies as all-replays: its events count once, under
        # skipped_replays rather than applied.
        totals = dict(state["totals"])
        done = set(state["chunks_done"])
        if done != set(range(num_chunks)) and self.io.tree_has_suffix(scratch, ".parquet"):
            staged_all = (
                self.spark.read.option("basePath", scratch).parquet(scratch)
                .withColumn("_dead", F.col("_dead").cast("boolean"))
            )
            for i in range(num_chunks):
                if i in done:
                    continue
                m = self._apply_staged(
                    staged_all.filter(F.col("_batch") == i).drop("_batch"),
                    os.path.join(scratch, f"_batch={i}", "_dead=true"),
                    f"bootstrap-c{i}",
                    time.time(),
                )
                for k in counter_keys:
                    totals[k] += m[k]
                done.add(i)
                state.update(
                    chunks_done=sorted(done), totals=totals,
                    head=self.table.current_snapshot_id(),
                )
                self.io.write_text_atomic(state_path, json.dumps(state))

        self.table.set_watermarks(
            {str(b): low for b in range(snap["num_buckets"])},
            operation="bootstrap",
        )
        self.io.rmtree(scratch)
        self.io.remove(state_path)
        return {
            **totals,
            "snapshot_id": self.table.current_snapshot_id(),
            "seconds": time.time() - t0,
            "chunks": num_chunks,
            "replay_from": low,
            "bootstrap": True,
        }

    def _stage_bootstrap(
        self, rows: DataFrame, num_chunks: int, snap: dict, scratch: str
    ) -> None:
        chunk = F.pmod(
            bucket_expr(F.col("repo"), F.col("path"), snap["num_buckets"], snap["path_salt"]),
            F.lit(num_chunks),
        ).cast("int")
        self._stage(rows, snap, batch_col=chunk, scratch_dir=scratch)

    def stage_batch(self, events: DataFrame, wap_id: str) -> StagedBatch:
        """:meth:`apply_batch` halted at the commit point: validate,
        watermark-filter and merge the batch, write the merged data
        files and a staged (WAP) header under ``wap_id``, but do NOT
        move the table head — return a :class:`StagedBatch` whose
        ``publish()``/``abandon()`` decides later. The scratch dir
        (dead letters included) is retained until that decision; on any
        failure here it is cleaned up and nothing was staged.

        This is the participant half of the multi-table atomic fan-out
        (engine/txn.py). Single-table callers wanting an audit gate
        should prefer ``apply_batch(audit_fn=...)``, which bounds the
        stage's lifetime to the call.

        The scratch dir carries the ``txn-`` prefix (vs ``batch-`` for
        the in-call applies) so recover_fanout's orphan sweep can
        target fan-out stages without touching a concurrent plain
        stager's in-flight scratch."""
        t0 = time.time()
        snap = self.table.current()
        scratch = self._stage(events, snap, prefix="txn")
        try:
            if not self.io.tree_has_suffix(scratch, ".parquet"):  # empty input
                self.io.rmtree(scratch)
                return StagedBatch(
                    engine=self, wap_id=None,
                    parent_sid=snap["snapshot_id"], staged_sid=None,
                    scratch=None, dead_src=None, adopt_name=None,
                    n_dead=0, events_in=0, applied=0, skipped=0,
                    bucket_stats=[], t0=t0,
                )
            staged = (
                self.spark.read.option("basePath", scratch).parquet(scratch)
                .withColumn("_dead", F.col("_dead").cast("boolean"))
            )
            handle = self._apply_staged(
                staged, os.path.join(scratch, "_dead=true"),
                os.path.basename(scratch), t0, stage_only_wap=wap_id,
            )
            handle.scratch = scratch
            return handle
        except BaseException:
            self.io.rmtree(scratch)
            raise

    def _staged_handle(self, wap_id, snap, staged_header, dead_src, adopt_name,
                       n_dead, events_in, applied, skipped, bucket_stats, t0):
        return StagedBatch(
            engine=self, wap_id=wap_id,
            parent_sid=snap["snapshot_id"],
            staged_sid=staged_header["snapshot_id"],
            scratch=None,  # filled by stage_batch (it owns the dir)
            dead_src=dead_src, adopt_name=adopt_name, n_dead=n_dead,
            events_in=events_in, applied=applied, skipped=skipped,
            bucket_stats=[
                (int(r["_bucket"]), r["wm"], int(r["n"])) for r in bucket_stats
            ],
            t0=t0,
        )

    def _with_survives(self, staged: DataFrame, wm_map: Mapping) -> DataFrame:
        """Flag replays: events at or below their bucket's committed
        watermark don't survive (idempotency / exactly-once resume).
        Flagging instead of filtering lets ONE stats pass yield
        applied/dead/skipped counts and per-bucket watermarks."""
        if wm_map:
            wm_df = self.spark.createDataFrame(
                [(int(b), w) for b, w in wm_map.items()], "_bucket int, _bucket_wm string"
            )
            return staged.join(F.broadcast(wm_df), "_bucket", "left").withColumn(
                "_survives", F.col("_bucket_wm").isNull() | (F.col("_wm") > F.col("_bucket_wm"))
            ).drop("_bucket_wm")
        return staged.withColumn("_survives", F.lit(True))

    def _apply_staged(self, staged: DataFrame, dead_src: str, adopt_name: str, t0: float,
                      lineage_sink: list | None = None,
                      wm_map: Mapping | None = None,
                      stats_rows: list | None = None,
                      audit_fn=None,
                      stage_only_wap: str | None = None) -> dict | StagedBatch:
        """Watermark-filter, merge and commit one staged (already
        validated + bucketed) batch. All plans here are small — a
        staged-parquet scan, a broadcast anti-join, one window — so the
        per-batch driver cost is a few hundred ms, not a re-analysis of
        the validate tree.

        ``wm_map``/``stats_rows``: replay() precomputes the survival
        watermarks and the per-batch stats in ONE job for all batches
        (valid because replay batches are ascending disjoint commit
        ranges: intra-replay watermark advances from batch i can never
        reach batch j>i's commits, so survival vs the pre-replay
        snapshot equals survival vs the batch-time snapshot)."""
        snap = self.table.current()
        if wm_map is None:
            wm_map = snap["watermarks"]
        staged = self._with_survives(staged, wm_map)

        if stats_rows is None:
            stats_rows = (
                staged.groupBy("_dead", "_survives", F.col("_bucket"))
                .agg(F.max("_wm").alias("wm"), F.count("*").alias("n"))
                .collect()
            )
        events_in = int(sum(r["n"] for r in stats_rows))
        n_dead = int(sum(r["n"] for r in stats_rows if r["_dead"] and r["_survives"]))
        skipped = int(sum(r["n"] for r in stats_rows if not r["_survives"]))
        bucket_stats = [r for r in stats_rows if not r["_dead"] and r["_survives"]]
        clean = staged.filter(~F.col("_dead") & F.col("_survives")).drop("_dead", "_survives")

        # a NULL key can't be merged; key-less clean rows are dead-lettered upstream
        # by the 'required' chain on path, so clean rows always have keys.

        touched = sorted({int(r["_bucket"]) for r in bucket_stats})
        new_wms = {int(r["_bucket"]): r["wm"] for r in bucket_stats}
        applied_events = int(sum(r["n"] for r in bucket_stats))

        if not touched:
            if stage_only_wap is not None:
                # nothing to merge — the "stage" is just the retained
                # scratch; publish adopts dead letters, abandon drops them
                return StagedBatch(
                    engine=self, wap_id=None,
                    parent_sid=snap["snapshot_id"], staged_sid=None,
                    scratch=None, dead_src=dead_src, adopt_name=adopt_name,
                    n_dead=n_dead, events_in=events_in, applied=0,
                    skipped=skipped, bucket_stats=[], t0=t0,
                )
            self._adopt_dead_letters(dead_src, adopt_name, n_dead)
            return {
                "events_in": events_in, "applied": 0, "dead_lettered": n_dead,
                "skipped_replays": skipped,
                "snapshot_id": snap["snapshot_id"], "seconds": time.time() - t0,
            }

        # 6. merge. ev_cols carry everything the LWW fold needs; clean
        # rows always have keys (the 'required' chain on path dead-
        # letters key-less rows upstream). The payload set derives from
        # the registry — a VersionSpec that ADDS a canonical column
        # widens it mid-stream.
        payload = self._payload_cols()
        ev_cols = ["repo", "path", "commit", "event_seq", *payload, "op", "_bucket", "_wm"]
        incoming = clean.select(*ev_cols).filter(
            F.col("repo").isNotNull() & F.col("path").isNotNull()
        )
        stats = {
            "rows_applied": applied_events,
            "batch_dead_lettered": n_dead,
        }
        # write-audit-publish: stage under a deterministic id (head+1 is
        # unique per parent; adopt_name disambiguates callers)
        if stage_only_wap is not None:
            wap_id = stage_only_wap
        else:
            wap_id = None if audit_fn is None else f"audit-{snap['snapshot_id'] + 1}-{adopt_name}"
        commit_kw = dict(
            stats=stats,
            schema_version=self.registry.latest,
            columns=self.registry.canonical_columns,
        )

        if self.write_mode == "mor":
            # merge-on-read: in-batch LWW dedupe only (KEEPING delete
            # tombstones — newest op wins at read time), then append
            # O(batch) delta files. No current-state read, no rewrite.
            incoming = incoming.repartition(
                self._fold_partitions(applied_events), "_bucket"
            )
            mw = Window.partitionBy("_bucket").orderBy(
                "repo", "path", F.col("_wm").desc()
            )
            is_head = (
                F.lag("repo").over(mw).isNull()
                | (F.lag("repo").over(mw) != F.col("repo"))
                | (F.lag("path").over(mw) != F.col("path"))
            )
            deduped = (
                incoming.withColumn("_head", F.coalesce(is_head, F.lit(True)))
                .filter(F.col("_head"))
                .drop("_head", "_wm")  # _wm re-derives from (commit, event_seq) at read
            )
            if wap_id is None:
                new_snap = self.table.commit_deltas(deduped, touched, new_wms, **commit_kw)
            else:
                staged_header = self.table.stage_deltas(
                    deduped, touched, new_wms, wap_id, **commit_kw
                )
                if stage_only_wap is not None:
                    return self._staged_handle(
                        wap_id, snap, staged_header, dead_src, adopt_name,
                        n_dead, events_in, applied_events, skipped,
                        bucket_stats, t0,
                    )
                new_snap = self._audit_publish(audit_fn, wap_id)
                if new_snap is None:
                    return self._rejected_metrics(events_in, skipped, snap, t0)
            ripe = self.table.buckets_needing_compaction(self.compact_after)
            if ripe:
                self.table.compact(ripe)
        else:
            # copy-on-write: current state of touched buckets + batch
            # events through ONE shuffle keyed on _bucket (== the
            # table's physical partitioning) — in-batch dedupe and
            # merge-against-current collapse into the same window pass
            # (lake/table.py:lww_merge); the write is exchange-free.
            current = self.table.read(buckets=touched)
            if current is not None:
                # schema evolution: the current table may predate a
                # column ADD — fill the missing payload columns with
                # NULL so the union aligns on the registry's set
                cur = current.select(
                    "repo", "path", "commit", "event_seq",
                    *[
                        (F.col(c) if c in current.columns else F.lit(None).cast("string")).alias(c)
                        for c in payload
                    ],
                    F.lit("K").alias("op"),
                    F.col("_bucket").cast("int").alias("_bucket"),
                    watermark_str(F.col("commit"), F.col("event_seq")).alias("_wm"),
                )
                merged_src = cur.unionByName(incoming)
            else:
                merged_src = incoming
            merged_src = merged_src.repartition(
                self._fold_partitions(
                    applied_events + self._current_rows_est(touched)
                ),
                "_bucket",
            )
            merged = lww_merge(merged_src, payload)

            # 7. atomic commit (copy-on-write of touched buckets only)
            if wap_id is None:
                new_snap = self.table.commit_buckets(merged, touched, new_wms, **commit_kw)
            else:
                staged_header = self.table.stage_buckets(
                    merged, touched, new_wms, wap_id, **commit_kw
                )
                if stage_only_wap is not None:
                    return self._staged_handle(
                        wap_id, snap, staged_header, dead_src, adopt_name,
                        n_dead, events_in, applied_events, skipped,
                        bucket_stats, t0,
                    )
                new_snap = self._audit_publish(audit_fn, wap_id)
                if new_snap is None:
                    return self._rejected_metrics(events_in, skipped, snap, t0)

        # 3b (deferred until after the merge executed, so the clean
        # scan never races the move): adopt the staged _dead=true
        # files AS the dead-letter table — a metadata move, not
        # another Spark job over the batch.
        self._adopt_dead_letters(dead_src, adopt_name, n_dead)

        # 8. lineage — metadata-scale rows; inside replay() they buffer
        # into one write per replay (a per-batch single-task write job
        # was a measurable slice of the serial fraction)
        lineage_rows = [
            (
                new_snap["snapshot_id"], int(r["_bucket"]), r["wm"], int(r["n"]),
                n_dead, int(time.time() * 1000),
            )
            for r in bucket_stats
        ]
        if lineage_sink is not None:
            lineage_sink.extend(lineage_rows)
        else:
            self._write_lineage(lineage_rows)

        out = {
            "events_in": events_in,
            "applied": applied_events,
            "dead_lettered": n_dead,
            "skipped_replays": skipped,
            "touched_buckets": len(touched),
            "snapshot_id": new_snap["snapshot_id"],
            "seconds": time.time() - t0,
        }
        if wap_id is not None:
            out["audit"] = "published"
        return out

    def _audit_publish(self, audit_fn, wap_id: str):
        """Run the write-audit-publish gate over a staged commit: True
        publishes and returns the new snapshot; False abandons and
        returns None; an exception — from the audit OR from the publish
        itself (a concurrent commit moved the head mid-audit, so the
        stage can never fast-forward) — abandons and propagates. The
        stage must never outlive its audit: an orphaned pending stage
        pins manifests and data against GC forever."""
        try:
            ok = bool(audit_fn(self.table, wap_id))
            if ok:
                return self.table.publish_wap(wap_id)
        except Exception:
            self.table.abandon_wap(wap_id)
            raise
        self.table.abandon_wap(wap_id)
        return None

    @staticmethod
    def _rejected_metrics(events_in: int, skipped: int, snap: dict, t0: float) -> dict:
        """Metrics for an audit-rejected batch: nothing applied, nothing
        dead-lettered (the staged dead letters are discarded with the
        scratch dir — the batch is rejected as a unit and will be
        re-submitted), watermarks and head unchanged. Carries every key
        the published-path metrics dict has, so callers can read a
        uniform schema."""
        return {
            "events_in": events_in, "applied": 0, "dead_lettered": 0,
            "skipped_replays": skipped, "touched_buckets": 0,
            "audit": "rejected",
            "snapshot_id": snap["snapshot_id"], "seconds": time.time() - t0,
        }

    @staticmethod
    def _batch_stats(rows: list) -> dict:
        """Fold one staged batch's per-(bucket, dead, survives) stat
        rows into the counters the grouped finalize loops consume —
        shared by the CoW and MoR group paths so the `_survives` /
        dead-letter accounting can never diverge between modes."""
        bucket_stats = [r for r in rows if not r["_dead"] and r["_survives"]]
        return {
            "events_in": int(sum(r["n"] for r in rows)),
            "n_dead": int(sum(r["n"] for r in rows if r["_dead"] and r["_survives"])),
            "skipped": int(sum(r["n"] for r in rows if not r["_survives"])),
            "bucket_stats": bucket_stats,
            "touched": sorted({int(r["_bucket"]) for r in bucket_stats}),
            "new_wms": {int(r["_bucket"]): r["wm"] for r in bucket_stats},
            "applied": int(sum(r["n"] for r in bucket_stats)),
        }

    def _apply_staged_group_cow(
        self,
        staged_all: DataFrame,
        scratch: str,
        batch_ids: range,
        stats_by_batch: dict[int, list],
        wm0: Mapping,
        lineage_rows: list,
    ) -> list[dict]:
        """Copy-on-write applies for a whole staged batch GROUP in ONE
        Spark job (the sequential path pays a constant per-batch driver
        term — job scheduling, plan analysis, AQE re-planning — that
        bounds scaling efficiency at bench batch counts; folding the
        merges amortizes it to once per group).

        Validity: replay batches are ascending disjoint commit ranges,
        so for a bucket b touched at batches V_b, the committed state at
        batch i is exactly ``lww(state_0[b] ∪ clean_{j<=i}[b])`` — the
        per-batch merge chain collapses into one winner-per-(batch,key)
        window. The job expands each row to every version it
        participates in (a broadcast join against the tiny
        (bucket, version) map — base rows count toward every version of
        their bucket, batch-j events toward versions >= j), windows on
        (version, _bucket) and writes every version's post-state
        partitioned by (version, _bucket) — the same total shuffle/write
        volume the sequential rewrites carry, in one exchange. The
        strictly-ordered commits then finalize driver-side: move each
        version's directory into data/ and write manifests
        (:meth:`LakeTable.commit_bucket_files`) — zero further executor
        work. Per-batch snapshots, watermarks, dead-letter adoption and
        metrics are identical to the sequential path (pinned by the
        replay-equality tests)."""
        t_group0 = time.time()
        per = {i: self._batch_stats(stats_by_batch.get(i, [])) for i in batch_ids}
        committing = [i for i in batch_ids if per[i]["touched"]]
        sid0 = self.table.current()["snapshot_id"]
        sid_of = {i: sid0 + 1 + k for k, i in enumerate(committing)}

        group_out = os.path.join(
            self.table.root, "_staging", f"cow-group-{uuid.uuid4().hex}"
        )
        if committing:
            payload = self._payload_cols()
            ev_cols = ["repo", "path", "commit", "event_seq", *payload, "op", "_bucket", "_wm"]
            clean = self._with_survives(staged_all, wm0).filter(
                ~F.col("_dead") & F.col("_survives")
            )
            incoming = clean.select(
                *ev_cols, F.col("_batch").cast("int").alias("_b")
            ).filter(F.col("repo").isNotNull() & F.col("path").isNotNull())
            all_touched = sorted({b for i in committing for b in per[i]["touched"]})
            current = self.table.read(buckets=all_touched)
            if current is not None:
                cur = current.select(
                    "repo", "path", "commit", "event_seq",
                    *[
                        (F.col(c) if c in current.columns else F.lit(None).cast("string")).alias(c)
                        for c in payload
                    ],
                    F.lit("K").alias("op"),
                    F.col("_bucket").cast("int").alias("_bucket"),
                    watermark_str(F.col("commit"), F.col("event_seq")).alias("_wm"),
                    F.lit(-1).alias("_b"),
                )
                src = cur.unionByName(incoming)
            else:
                src = incoming
            vmap = self.spark.createDataFrame(
                [(b, i, sid_of[i]) for i in committing for b in per[i]["touched"]],
                "_bucket int, _v int, _snap int",
            )
            expanded = src.join(F.broadcast(vmap), "_bucket").filter(
                F.col("_v") >= F.col("_b")
            )
            # expansion volume: each batch's events appear in every
            # committing version >= their batch; current-state rows in
            # every committing version of their bucket
            n_expand = sum(
                per[i]["applied"] * sum(1 for j in committing if j >= i)
                for i in batch_ids
            )
            rows_est = n_expand + self._current_rows_est(all_touched) * len(committing)
            expanded = expanded.repartition(
                self._fold_partitions(rows_est), "_snap", "_bucket"
            )
            merged = lww_merge(expanded, payload, extra_keys=["_snap"])
            merged.write.partitionBy("_snap", "_bucket").parquet(group_out)
        merge_share = (
            (time.time() - t_group0) / len(committing) if committing else 0.0
        )

        # rolling compute basis: the group's post-states were computed
        # against the head at sid0 plus our OWN earlier batches. Overlay
        # each finalized commit's bucket refs onto raw(sid0) and pass
        # the synthetic header as basis_raw, so a FOREIGN commit landing
        # anywhere in the (minutes-long) merge-and-finalize window trips
        # commit_bucket_files' disjointness check instead of being
        # silently overwritten — while our own strictly-ordered commits
        # validate clean.
        basis_src = self.table._raw_snapshot(sid0)
        basis = {
            **basis_src,
            "buckets": dict(basis_src["buckets"]),
            "deltas": dict(basis_src.get("deltas", {})),
        }
        group_tag = uuid.uuid4().hex[:8]

        metrics: list[dict] = []
        try:
            for i in batch_ids:
                t0 = time.time()
                p = per[i]
                dead_src = os.path.join(scratch, f"_batch={i}", "_dead=true")
                adopt_name = f"{os.path.basename(scratch)}-b{i}"
                if not p["touched"]:
                    self._adopt_dead_letters(dead_src, adopt_name, p["n_dead"])
                    metrics.append({
                        "events_in": p["events_in"], "applied": 0,
                        "dead_lettered": p["n_dead"],
                        "skipped_replays": p["skipped"],
                        "snapshot_id": self.table.current()["snapshot_id"],
                        "seconds": time.time() - t0,
                    })
                    continue
                sid = sid_of[i]
                src_dir = os.path.join(group_out, f"_snap={sid}")
                # group-unique dst name: a crashed prior run (or a
                # disjoint foreign commit that claimed our precomputed
                # sid) can leave data/snap-<sid> in place, and
                # shutil/HDFS move would NEST src inside it — the
                # subsequent listing would then commit the stale
                # attempt's files. Dir names are labels; reads resolve
                # files only through manifests.
                dst_dir = os.path.join(
                    self.table.data_dir, f"snap-{sid:08d}-{group_tag}"
                )
                if self.io.isdir(src_dir):
                    self.io.move(src_dir, dst_dir)
                new_files: dict[str, list[str]] = {}
                for b in p["touched"]:
                    bdir = os.path.join(dst_dir, f"_bucket={b}")
                    new_files[str(b)] = sorted(
                        os.path.join(bdir, f)
                        for f in (self.io.listdir(bdir) if self.io.isdir(bdir) else [])
                        if f.endswith(".parquet")
                    )
                new_snap = self.table.commit_bucket_files(
                    new_files, p["new_wms"],
                    stats={
                        "rows_applied": p["applied"],
                        "batch_dead_lettered": p["n_dead"],
                    },
                    schema_version=self.registry.latest,
                    columns=self.registry.canonical_columns,
                    basis_raw=basis,
                )
                sid = new_snap["snapshot_id"]  # actual (foreign disjoint
                # racers may have consumed the precomputed id)
                new_raw = self.table._raw_snapshot(sid)
                basis["snapshot_id"] = sid
                for b in p["touched"]:
                    bs = str(b)
                    if bs in new_raw["buckets"]:
                        basis["buckets"][bs] = new_raw["buckets"][bs]
                    else:
                        basis["buckets"].pop(bs, None)
                    if bs in new_raw.get("deltas", {}):
                        basis["deltas"][bs] = new_raw["deltas"][bs]
                    else:
                        basis["deltas"].pop(bs, None)
                self._adopt_dead_letters(dead_src, adopt_name, p["n_dead"])
                lineage_rows.extend(
                    (
                        sid, int(r["_bucket"]), r["wm"], int(r["n"]),
                        p["n_dead"], int(time.time() * 1000),
                    )
                    for r in p["bucket_stats"]
                )
                metrics.append({
                    "events_in": p["events_in"],
                    "applied": p["applied"],
                    "dead_lettered": p["n_dead"],
                    "skipped_replays": p["skipped"],
                    "touched_buckets": len(p["touched"]),
                    "snapshot_id": sid,
                    # the shared merge job's wall, apportioned equally
                    "seconds": (time.time() - t0) + merge_share,
                })
        finally:
            self.io.rmtree(group_out)
        return metrics

    def _apply_staged_group_mor(
        self,
        staged_all: DataFrame,
        scratch: str,
        batch_ids: range,
        stats_by_batch: dict[int, list],
        wm0: Mapping,
        lineage_rows: list,
    ) -> list[dict]:
        """Merge-on-read applies for a whole staged batch group in ONE
        Spark job. Even simpler than the CoW fold: a MoR batch's delta
        is the in-batch LWW dedupe of ITS OWN events only (no
        current-state read), so the batches are fully independent — one
        window on (_batch, _bucket) dedupes them all, one write emits
        them partitioned by (_batch, _bucket), and each batch's commit
        is a driver-side directory move + :meth:`commit_delta_files`.
        Snapshot ids are assigned at FINALIZE time (not precomputed):
        threshold compaction between batches inserts its own snapshots.
        Read-state equality with the sequential path is pinned by
        tests."""
        per = {i: self._batch_stats(stats_by_batch.get(i, [])) for i in batch_ids}
        committing = [i for i in batch_ids if per[i]["touched"]]

        t_group0 = time.time()
        group_out = os.path.join(
            self.table.root, "_staging", f"mor-group-{uuid.uuid4().hex}"
        )
        if committing:
            payload = self._payload_cols()
            ev_cols = ["repo", "path", "commit", "event_seq", *payload, "op", "_bucket", "_wm"]
            clean = self._with_survives(staged_all, wm0).filter(
                ~F.col("_dead") & F.col("_survives")
            )
            incoming = clean.select(
                *ev_cols, F.col("_batch").cast("int").alias("_batch")
            ).filter(F.col("repo").isNotNull() & F.col("path").isNotNull())
            incoming = incoming.repartition(
                self._fold_partitions(sum(per[i]["applied"] for i in batch_ids)),
                "_batch", "_bucket",
            )
            # in-batch LWW dedupe, all batches at once; tombstones KEPT
            # (newest op wins at read time) — same fold commit_deltas'
            # caller does per batch
            mw = Window.partitionBy("_batch", "_bucket").orderBy(
                "repo", "path", F.col("_wm").desc()
            )
            is_head = (
                F.lag("repo").over(mw).isNull()
                | (F.lag("repo").over(mw) != F.col("repo"))
                | (F.lag("path").over(mw) != F.col("path"))
            )
            deduped = (
                incoming.withColumn("_head", F.coalesce(is_head, F.lit(True)))
                .filter(F.col("_head"))
                .drop("_head", "_wm")  # _wm re-derives from (commit, event_seq) at read
            )
            deduped.write.partitionBy("_batch", "_bucket").parquet(group_out)
        merge_share = (
            (time.time() - t_group0) / len(committing) if committing else 0.0
        )

        metrics: list[dict] = []
        try:
            for i in batch_ids:
                t0 = time.time()
                p = per[i]
                dead_src = os.path.join(scratch, f"_batch={i}", "_dead=true")
                adopt_name = f"{os.path.basename(scratch)}-b{i}"
                if not p["touched"]:
                    self._adopt_dead_letters(dead_src, adopt_name, p["n_dead"])
                    metrics.append({
                        "events_in": p["events_in"], "applied": 0,
                        "dead_lettered": p["n_dead"],
                        "skipped_replays": p["skipped"],
                        "snapshot_id": self.table.current()["snapshot_id"],
                        "seconds": time.time() - t0,
                    })
                    continue
                sid = self.table.current()["snapshot_id"] + 1
                src_dir = os.path.join(group_out, f"_batch={i}")
                # unique suffix: see the CoW finalize — a pre-existing
                # dst (crashed run, racer claiming the sid) would make
                # move() NEST src inside it and commit stale files
                dst_dir = os.path.join(
                    self.table.data_dir,
                    f"delta-{sid:08d}-{uuid.uuid4().hex[:8]}",
                )
                if self.io.isdir(src_dir):
                    self.io.move(src_dir, dst_dir)
                new_files: dict[str, list[str]] = {}
                for b in p["touched"]:
                    bdir = os.path.join(dst_dir, f"_bucket={b}")
                    new_files[str(b)] = sorted(
                        os.path.join(bdir, f)
                        for f in (self.io.listdir(bdir) if self.io.isdir(bdir) else [])
                        if f.endswith(".parquet")
                    )
                new_snap = self.table.commit_delta_files(
                    new_files, p["new_wms"],
                    stats={
                        "rows_applied": p["applied"],
                        "batch_dead_lettered": p["n_dead"],
                    },
                    schema_version=self.registry.latest,
                    columns=self.registry.canonical_columns,
                )
                ripe = self.table.buckets_needing_compaction(self.compact_after)
                if ripe:
                    self.table.compact(ripe)
                self._adopt_dead_letters(dead_src, adopt_name, p["n_dead"])
                lineage_rows.extend(
                    (
                        new_snap["snapshot_id"], int(r["_bucket"]), r["wm"], int(r["n"]),
                        p["n_dead"], int(time.time() * 1000),
                    )
                    for r in p["bucket_stats"]
                )
                metrics.append({
                    "events_in": p["events_in"],
                    "applied": p["applied"],
                    "dead_lettered": p["n_dead"],
                    "skipped_replays": p["skipped"],
                    "touched_buckets": len(p["touched"]),
                    "snapshot_id": new_snap["snapshot_id"],
                    "seconds": (time.time() - t0) + merge_share,
                })
        finally:
            self.io.rmtree(group_out)
        return metrics

    LINEAGE_DDL = (
        "snapshot_id long, bucket int, watermark string, rows_applied long, "
        "batch_dead_lettered long, ts_ms long"
    )

    def _write_lineage(self, rows: list) -> None:
        if not rows:
            return
        if self._write_lineage_driver_side(rows):
            return
        self.spark.createDataFrame(rows, self.LINEAGE_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(self.lineage_dir)

    def _write_lineage_driver_side(self, rows: list) -> bool:
        """Append the lineage rows as one parquet file written directly
        from the driver (pyarrow), skipping the ~1s createDataFrame +
        single-task write Spark job — a fixed serial term paid once per
        replay/apply for a handful of metadata-scale rows. Local
        FileIO only (pyarrow cannot target the Hadoop gateway);
        schema matches LINEAGE_DDL's parquet layout exactly, so
        Spark-written and driver-written files coexist in one read.
        Write-to-temp + atomic rename keeps concurrent lineage()
        readers from seeing a partial file."""
        from filters_spark.lake.fileio import LocalFileIO

        if not isinstance(self.io, LocalFileIO):
            return False
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
        except ImportError:
            return False
        schema = pa.schema([
            ("snapshot_id", pa.int64()),
            ("bucket", pa.int32()),
            ("watermark", pa.string()),
            ("rows_applied", pa.int64()),
            ("batch_dead_lettered", pa.int64()),
            ("ts_ms", pa.int64()),
        ])
        cols = list(zip(*rows))
        tbl = pa.table(
            {f.name: list(c) for f, c in zip(schema, cols)}, schema=schema
        )
        os.makedirs(self.lineage_dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}-driver.parquet"
        tmp = os.path.join(self.lineage_dir, f".{name}.tmp")
        pq.write_table(tbl, tmp, compression="snappy")
        os.replace(tmp, os.path.join(self.lineage_dir, name))
        return True

    def _adopt_dead_letters(self, dead_src: str, adopt_name: str, n_dead: int) -> None:
        if n_dead and self.io.isdir(dead_src):
            batch_dir = os.path.join(self.dead_letter_dir, adopt_name)
            self.io.move(dead_src, batch_dir)

    # ------------------------------------------------------------------

    def _commit_bounds(self, events: DataFrame) -> tuple[int, int]:
        """(min, max) commit of the stream, for batch-range splitting.

        Fast path: parquet FOOTER statistics of the input files — a
        driver-side metadata read instead of a full-stream scan job
        (the scan was a measurable per-replay serial term). Safe even
        when the frame carries filters: a widened [lo, hi] still covers
        every event and ``least(floor(...), n-1)`` clamps the batch id,
        so batching stays correct (ranges just skew slightly). Falls
        back to the scan for non-parquet / non-local / stats-less
        inputs."""
        bounds = self._footer_commit_bounds(events)
        if bounds is None:
            r = events.select(
                F.min("commit").alias("lo"), F.max("commit").alias("hi")
            ).first()
            if r.lo is None:  # empty stream: one empty batch, not a
                # TypeError — replay then reports zero-metrics like
                # apply_batch does
                return (0, 0)
            bounds = (int(r.lo, 16), int(r.hi, 16))
        return bounds

    def _footer_commit_bounds(self, events: DataFrame) -> tuple[int, int] | None:
        try:
            files = events.inputFiles()
        except Exception:
            return None
        if not files:
            return None
        try:
            import pyarrow.parquet as pq
        except ImportError:
            return None
        lo = hi = None
        for uri in files:
            if uri.startswith("file:"):
                path = uri[len("file:"):]
                # file:///x and file:/x both mean /x
                while path.startswith("//"):
                    path = path[1:]
            elif "://" not in uri:
                path = uri
            else:
                return None  # non-local FS: use the scan
            try:
                md = pq.ParquetFile(path).metadata
            except Exception:
                return None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema != "commit":
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        return None
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        mn, mx = mn.decode(), mx.decode()
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
        if lo is None:
            return None
        return int(lo, 16), int(hi, 16)

    def replay(self, events: DataFrame, num_batches: int = 1,
               stage_batches: int | None = None) -> list[dict]:
        """Replay an event stream in commit-ordered batches (a WAL tail
        consumes ranges in order; batching by commit prefix keeps each
        batch a contiguous WAL range).

        The stream is validated + staged ONCE (partitioned by batch id),
        then each batch merges from its staged partition — N batches pay
        the validate plan's analysis/codegen and its full-stream scan a
        single time. ``stage_batches`` bounds scratch usage at very
        large replays: the stream is staged in groups of that many
        batches (default: all at once)."""
        if num_batches <= 1:
            return [self.apply_batch(events)]
        lo, hi = self._commit_bounds(events)
        span = (hi - lo + num_batches) // num_batches
        group = stage_batches or num_batches

        snap0 = self.table.current()
        commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
        batch_id = F.least(
            F.floor((commit_long - F.lit(lo)) / F.lit(span)), F.lit(num_batches - 1)
        ).cast("int")

        metrics: list[dict] = []
        for g_lo in range(0, num_batches, group):
            g_hi = min(g_lo + group, num_batches)
            part = events
            if group < num_batches:  # stage only this group's commit range
                # compare the NUMERIC commit (same F.conv long as
                # batch_id), not zero-padded hex strings: a hex upper
                # bound of hi+1 at/near 0xffffffffffff widens to 13
                # chars and the lexicographic compare silently drops
                # most of the last group's events
                upper = (
                    commit_long < F.lit(lo + g_hi * span)
                    if g_hi < num_batches
                    else commit_long <= F.lit(hi)
                )
                part = events.filter(
                    (commit_long >= F.lit(lo + g_lo * span)) & upper
                )
            scratch = self._stage(part, snap0, batch_col=batch_id)
            lineage_rows: list = []
            try:
                if not self.io.tree_has_suffix(scratch, ".parquet"):
                    metrics.extend(
                        {"events_in": 0, "applied": 0, "dead_lettered": 0,
                         "skipped_replays": 0,
                         "snapshot_id": self.table.current()["snapshot_id"],
                         "seconds": 0.0}
                        for _ in range(g_lo, g_hi)
                    )
                    continue
                staged_all = (
                    self.spark.read.option("basePath", scratch).parquet(scratch)
                    .withColumn("_dead", F.col("_dead").cast("boolean"))
                )
                # ONE stats job for the whole group, survival evaluated
                # against the pre-replay watermarks (valid for every
                # batch: ranges ascend, see _apply_staged docstring) —
                # instead of one staged-slice scan per batch.
                wm0 = snap0["watermarks"]
                stats_all = (
                    self._with_survives(staged_all, wm0)
                    .groupBy("_batch", "_dead", "_survives", F.col("_bucket"))
                    .agg(F.max("_wm").alias("wm"), F.count("*").alias("n"))
                    .collect()
                )
                stats_by_batch: dict[int, list] = {}
                for r in stats_all:
                    stats_by_batch.setdefault(int(r["_batch"]), []).append(r)
                if self.group_applies and g_hi - g_lo > 1:
                    # fold the group's merges/dedupes into ONE job +
                    # driver-side ordered commit finalization — the
                    # per-batch constant driver term is paid once per
                    # group (CoW: _apply_staged_group_cow; MoR:
                    # _apply_staged_group_mor)
                    fold = (
                        self._apply_staged_group_cow
                        if self.write_mode == "cow"
                        else self._apply_staged_group_mor
                    )
                    metrics.extend(fold(
                        staged_all, scratch, range(g_lo, g_hi),
                        stats_by_batch, wm0, lineage_rows,
                    ))
                    continue
                for i in range(g_lo, g_hi):
                    t0 = time.time()
                    if i not in stats_by_batch:  # no events staged in range
                        metrics.append(
                            {"events_in": 0, "applied": 0, "dead_lettered": 0,
                             "skipped_replays": 0,
                             "snapshot_id": self.table.current()["snapshot_id"],
                             "seconds": time.time() - t0}
                        )
                        continue
                    bdir = os.path.join(scratch, f"_batch={i}")
                    staged_i = staged_all.filter(F.col("_batch") == i).drop("_batch")
                    metrics.append(
                        self._apply_staged(
                            staged_i,
                            os.path.join(bdir, "_dead=true"),
                            f"{os.path.basename(scratch)}-b{i}",
                            t0,
                            lineage_sink=lineage_rows,
                            wm_map=wm0,
                            stats_rows=stats_by_batch[i],
                        )
                    )
            finally:
                self._write_lineage(lineage_rows)
                self.io.rmtree(scratch)
        return metrics

    def dead_letters(self, distinct: bool = True) -> DataFrame | None:
        """The dead-letter table: raw payloads + full error channel.

        Rows are the adopted staging files (one dir per batch); raw
        field values are restored under their original names and the
        error channel is exposed both structured and as JSON. Replayed
        batches re-append their dead letters (watermarks only advance on
        *clean* events in a bucket), so reads dedupe on event identity
        by default."""
        if not self.io.isdir(self.dead_letter_dir) or not self.io.tree_has_suffix(
            self.dead_letter_dir, ".parquet"
        ):  # absent OR fully drained by retry_dead_letters
            return None
        df = (
            self.spark.read.option("recursiveFileLookup", "true")
            # batches dead-lettered before a schema-evolution column ADD
            # lack the new raw columns; without mergeSchema Spark samples
            # ONE footer for the unified schema and newer batches' extra
            # columns can silently vanish from the read
            .option("mergeSchema", "true")
            .parquet(self.dead_letter_dir)
        )
        raw_cols = [c for c in df.columns if c.startswith("_raw_")]
        for rc in raw_cols:
            orig = rc[len("_raw_"):]
            df = df.drop(orig).withColumnRenamed(rc, orig)
        df = df.select(
            "commit", "event_seq", "op", "schema_version",
            *[
                # dead-letter batches staged before a column ADD lack
                # the new canonical columns
                (F.col(c) if c in df.columns else F.lit(None).cast("string")).alias(c)
                for c in self.registry.canonical_columns
            ],
            F.col("_errors").alias("errors"),
            F.to_json(F.col("_errors")).alias("errors_json"),
            F.element_at(F.col("_errors"), 1)["code"].alias("first_code"),
            F.element_at(F.col("_errors"), 1)["key"].alias("first_key"),
        )
        if distinct:
            df = df.dropDuplicates(["commit", "event_seq", "repo", "path"])
        return df

    def retry_dead_letters(self) -> dict:
        """Re-validate every dead-lettered event against the CURRENT
        registry and merge the now-clean ones — the operational loop
        after a spec fix or schema evolution: fix the chain, call this,
        the backlog drains. Returns the same metrics dict as
        ``apply_batch``.

        Semantics:

        - The per-bucket watermark gate is BYPASSED (``wm_map={}``):
          dead letters were never applied, so they are not replays.
          Per-key last-writer-wins in the merge still guarantees a
          repaired old event can never overwrite a newer applied row —
          the safety argument is per-key ordering, not the bucket
          watermark.
        - Events that still fail re-adopt as the new dead-letter set and
          the superseded batch dirs are removed after the commit. A
          crash between commit and cleanup leaves duplicate dead
          letters (deduped on read) and a re-run is idempotent:
          re-applying an already-applied event changes nothing under
          LWW.
        - Events re-enter at the LATEST schema version: dead-letter raw
          columns are stored under canonical names (post
          version-rename, pre-chain), which is the latest version's
          shape.
        """
        t0 = time.time()
        dl = self.dead_letters(distinct=True)
        zeros = {
            "events_in": 0, "applied": 0, "dead_lettered": 0, "skipped_replays": 0,
            "snapshot_id": self.table.current()["snapshot_id"], "seconds": 0.0,
        }
        if dl is None:
            return zeros
        old_batches = [
            os.path.join(self.dead_letter_dir, d)
            for d in self.io.listdir(self.dead_letter_dir)
        ]
        ver_type = dl.schema["schema_version"].dataType.simpleString()
        events = dl.select(
            "commit", "event_seq", "op",
            F.lit(self.registry.latest).cast(ver_type).alias("schema_version"),
            *[F.col(c) for c in self.registry.canonical_columns],
        )
        # the frame is canonical-shaped; the latest version may expect
        # renamed INCOMING columns (e.g. v2 ingests 'language' -> 'lang'),
        # so reverse-apply its rename map or those fields arrive NULL
        for incoming, canonical in self.registry.get(self.registry.latest).renames.items():
            if canonical in events.columns:
                events = events.withColumnRenamed(canonical, incoming)
        snap = self.table.current()
        scratch = self._stage(events, snap)
        try:
            if not self.io.tree_has_suffix(scratch, ".parquet"):
                return zeros
            staged = (
                self.spark.read.option("basePath", scratch).parquet(scratch)
                .withColumn("_dead", F.col("_dead").cast("boolean"))
            )
            metrics = self._apply_staged(
                staged, os.path.join(scratch, "_dead=true"),
                f"retry-{os.path.basename(scratch)}", t0, wm_map={},
            )
        finally:
            self.io.rmtree(scratch)
        for d in old_batches:  # superseded: applied or re-adopted above
            self.io.rmtree(d)
        return metrics

    def lineage(self) -> DataFrame | None:
        if not self.io.isdir(self.lineage_dir):
            return None
        return self.spark.read.parquet(self.lineage_dir)
