"""Copy-on-write, hash-bucketed lake table with snapshot isolation.

The sandbox has no Iceberg runtime jar and no network (BASELINE.md), so
this module implements the Iceberg *semantics* the north rule names —
bucketed data files, JSON snapshot manifests, atomic commit, snapshot
time travel, schema metadata + per-bucket watermarks (checkpoint
offsets) — behind a small interface that a real Iceberg catalog
(``MERGE INTO`` via DataFrameWriterV2) can replace when the jar exists.

Layout::

    root/
      metadata/
        version-hint.text          # latest committed snapshot id
        snap-00000042.json         # immutable snapshot manifest
      data/
        snap-00000042/_bucket=K/part-*.parquet

A snapshot manifest records, per bucket, the parquet files that hold
that bucket's rows and the bucket's watermark ``commit:event_seq``.
Buckets untouched by a commit keep their previous snapshot's files —
copy-on-write at bucket granularity, so a merge that touches B' of B
buckets rewrites only B'/B of the table (partition pruning on the read
side comes free: we only open the touched buckets' files).

Commit protocol (Iceberg-style optimistic):
1. write new data files under ``data/snap-N/`` (never overwriting),
2. write ``snap-N.json.tmp`` then atomically ``rename`` to
   ``snap-N.json`` — the rename fails if a concurrent writer won,
3. atomically replace ``version-hint.text``.

Scale notes: buckets = physical partitioning unit; pick
``num_buckets`` ≈ cluster cores × small multiple at deploy scale. All
data paths stay distributed (Spark read/write); only manifest JSON
(KBs) touches the driver.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from filters_spark.lake.fileio import FileIO, fileio_for

WATERMARK_ZERO = "000000000000:-1"


def bucket_expr(repo_col, path_col, num_buckets: int, path_salt: int = 16):
    """Deterministic bucket id for a (repo, path) key.

    Hot-repo skew handling: the bucket is ``hash(repo, salt(path))``
    where ``salt(path) = hash(path) % path_salt`` — all events for one
    key land in one bucket (merge stays partition-local) while a hot
    repo's keys spread over up to ``path_salt`` buckets instead of one.
    """
    salt = F.pmod(F.xxhash64(path_col), F.lit(path_salt))
    return F.pmod(F.xxhash64(repo_col, salt), F.lit(num_buckets)).cast("int")


def watermark_str(commit_col, seq_col):
    """Sortable watermark string 'commit:seq' (commit is zero-padded hex,
    seq zero-padded decimal) — lexicographic order == event order."""
    return F.concat_ws(":", commit_col, F.lpad(seq_col.cast("string"), 10, "0"))


class LakeTable:
    """Handle to a copy-on-write bucketed table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str, io: FileIO | None = None):
        self.spark = spark
        self.root = root
        # all direct file ops (manifest JSON, listings, staged moves) go
        # through FileIO so the same code runs on local FS and DFS/object
        # stores (lake/fileio.py); bulk data IO stays on spark.read/write
        self.io = io or fileio_for(spark, root)
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        num_buckets: int = 32,
        path_salt: int = 16,
        schema_version: int = 1,
        columns: list[str] | None = None,
    ) -> "LakeTable":
        t = cls(spark, root)
        if t.io.exists(os.path.join(t.meta_dir, "version-hint.text")):
            raise FileExistsError(f"lake table already exists at {root}")
        t.io.makedirs(t.meta_dir)
        t.io.makedirs(t.data_dir)
        snapshot = {
            "snapshot_id": 0,
            "parent_id": None,
            "timestamp_ms": int(time.time() * 1000),
            "key_cols": key_cols,
            "num_buckets": num_buckets,
            "path_salt": path_salt,
            "schema_version": schema_version,
            "columns": columns,
            "buckets": {},      # bucket_id(str) -> [file paths]
            "watermarks": {},   # bucket_id(str) -> "commit:seq"
            "stats": {"rows_applied": 0, "rows_deleted": 0},
        }
        t._write_snapshot(snapshot)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        t.current()  # raises if absent
        return t

    # -- metadata -----------------------------------------------------------

    def _snap_path(self, snapshot_id: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{snapshot_id:08d}.json")

    def current_snapshot_id(self) -> int:
        return int(self.io.read_text(os.path.join(self.meta_dir, "version-hint.text")).strip())

    def snapshot(self, snapshot_id: int | None = None) -> dict:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        return json.loads(self.io.read_text(self._snap_path(snapshot_id)))

    def current(self) -> dict:
        return self.snapshot()

    def snapshots(self) -> list[int]:
        out = []
        for name in self.io.listdir(self.meta_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                out.append(int(name[5:-5]))
        return sorted(out)

    def _write_snapshot(self, snapshot: dict) -> None:
        sid = snapshot["snapshot_id"]
        # optimistic concurrency: the snapshot file is create-exclusive —
        # a concurrent writer that committed sid first wins the rename
        self.io.write_text_atomic(
            self._snap_path(sid),
            json.dumps(snapshot, indent=1, sort_keys=True),
            fail_if_exists=True,
        )
        self.io.write_text_atomic(
            os.path.join(self.meta_dir, "version-hint.text"), str(sid)
        )

    # -- read ---------------------------------------------------------------

    def read(
        self,
        snapshot_id: int | None = None,
        buckets: Iterable[int] | None = None,
    ) -> DataFrame | None:
        """Read the table at a snapshot (time travel); optionally only
        the given buckets (bucket pruning — the physical analog of
        Iceberg partition pruning). Returns None when empty."""
        snap = self.snapshot(snapshot_id)
        wanted = None if buckets is None else {str(b) for b in buckets}
        files: list[str] = []
        for b, fl in snap["buckets"].items():
            if wanted is None or b in wanted:
                files.extend(fl)
        if not files:
            return None
        return self.spark.read.option("basePath", self.data_dir).parquet(*files)

    # -- write --------------------------------------------------------------

    def commit_buckets(
        self,
        df: DataFrame,
        touched_buckets: list[int],
        new_watermarks: dict[int, str],
        stats: dict | None = None,
        schema_version: int | None = None,
        columns: list[str] | None = None,
    ) -> dict:
        """Write ``df`` (which must contain ``_bucket`` and exactly the
        rows for ``touched_buckets``) as the new content of those
        buckets; untouched buckets carry over. Returns the new snapshot.

        ``df`` should already be partitioned by ``_bucket`` (the engine
        repartitions before merge) so the write is shuffle-free.
        """
        prev = self.current()
        sid = prev["snapshot_id"] + 1
        out_dir = os.path.join(self.data_dir, f"snap-{sid:08d}")
        (
            df.write.mode("error")
            .partitionBy("_bucket")
            .parquet(out_dir)
        )
        # collect written files per bucket (driver-side listing of
        # metadata-scale directory tree)
        new_files: dict[str, list[str]] = {}
        for b in touched_buckets:
            bdir = os.path.join(out_dir, f"_bucket={b}")
            new_files[str(b)] = sorted(
                os.path.join(bdir, f)
                for f in self.io.listdir(bdir)  # [] when bucket became empty
                if f.endswith(".parquet")
            )

        buckets = dict(prev["buckets"])
        for b, fl in new_files.items():
            if fl:
                buckets[b] = fl
            else:
                buckets.pop(b, None)
        watermarks = dict(prev["watermarks"])
        for b, wm in new_watermarks.items():
            old = watermarks.get(str(b), WATERMARK_ZERO)
            watermarks[str(b)] = max(old, wm)

        snapshot = {
            **prev,
            "snapshot_id": sid,
            "parent_id": prev["snapshot_id"],
            "timestamp_ms": int(time.time() * 1000),
            "schema_version": schema_version or prev["schema_version"],
            "columns": columns or prev["columns"],
            "buckets": buckets,
            "watermarks": watermarks,
            "stats": stats or prev["stats"],
        }
        self._write_snapshot(snapshot)
        return snapshot

    def watermarks(self) -> dict[str, str]:
        return self.current()["watermarks"]
