"""Zero-copy table cloning (Delta CLONE / Iceberg snapshot-ref export).

``clone_table(src, dst_root)`` materializes an independent LakeTable
whose initial snapshot is byte-identical in CONTENT to a chosen source
snapshot — the standard lakehouse primitive for dev/test forks of a
production table, reproducible-experiment pinning ("train against the
corpus exactly as it was at snapshot 41"), and promoting an audited
state to a new environment.

Two modes, same trade Delta documents for CLONE:

- ``shallow`` (default): METADATA-ONLY — the clone's manifests
  reference the source's data files by absolute path; no data moves,
  the clone costs O(buckets) manifest JSON regardless of table size.
  The clone is a fully independent table for WRITES (its commits land
  under its own root; the source never sees them) but shares data
  files for reads, so retention maintenance on the SOURCE
  (``expire_snapshots`` + ``vacuum``) can delete files the clone still
  references — size source retention to outlive shallow clones, or
  deep-clone anything long-lived. Vacuum on the CLONE is safe by
  construction: it sweeps only the clone's own ``data/`` dir, which
  starts empty.
- ``deep``: additionally byte-copies every referenced data file under
  the clone's root and rewrites manifest paths — fully self-contained,
  O(data) cost. Copies run through ``FileIO.copy`` one file at a time
  on the driver (fine at sandbox scale; a 100-TB deep clone belongs to
  a distributed copy — parallelize the same path list over an RDD or
  DistCp and keep the manifest rewrite here).

The clone's snapshot chain STARTS at the cloned snapshot (parent
``None``): history below the clone point — time travel, ``changes()``
ranges, rollback targets — lives only in the source, exactly like a
Delta shallow clone. Per-bucket watermarks carry over, so a CDCEngine
pointed at the clone resumes exactly-once ingest from the cloned
position (the fork-and-replay workflow).

No reference analog: the reference library has no storage layer; this
is engine-tier surface for the CDC-ingest north rule (fork a table for
audit/backfill without copying 100 TB).
"""

from __future__ import annotations

import os
import time

from filters_spark.lake.table import LakeTable, _rel_to_data

__all__ = ["clone_table"]


def clone_table(
    src: LakeTable,
    dst_root: str,
    snapshot_id: int | None = None,
    mode: str = "shallow",
) -> LakeTable:
    """Clone ``src`` at ``snapshot_id`` (default: current) into a new
    table at ``dst_root``. Returns the clone's LakeTable handle; its
    head snapshot keeps the SOURCE's snapshot id (so "clone of snapshot
    41" reads as snapshot 41) with ``operation="clone"`` and a
    ``clone_source`` provenance block. ``clone_source`` is TABLE-level
    provenance, not snapshot-level: commit paths build children as
    ``{**prev, ...}``, so the block deliberately rides every descendant
    header — it answers "which table/snapshot was this table forked
    from", never "what does this snapshot's content derive from" (that
    is ``parent_id``/``operation``). Raises if ``dst_root`` already
    holds a table, or (deep mode) if a destination file already exists
    — a clone never overwrites."""
    if mode not in ("shallow", "deep"):
        raise ValueError(f"mode must be 'shallow' or 'deep', got {mode!r}")
    snap = src.snapshot(snapshot_id)  # resolved: manifest refs -> file lists
    dst = LakeTable(src.spark, dst_root)
    if dst.io.exists(os.path.join(dst.meta_dir, "version-hint.text")):
        raise FileExistsError(f"lake table already exists at {dst_root}")
    dst.io.makedirs(dst.meta_dir)
    dst.io.makedirs(dst.data_dir)

    header = dict(snap)
    header.pop("wap_id", None)
    header.pop("ref", None)
    header["parent_id"] = None
    header["timestamp_ms"] = int(time.time() * 1000)
    header["operation"] = "clone"
    header["clone_source"] = {
        "root": src.root,
        "snapshot_id": snap["snapshot_id"],
        "mode": mode,
    }

    if mode == "deep":
        header["buckets"] = _copy_files(src, dst, snap["buckets"])
        header["deltas"] = _copy_files(src, dst, snap.get("deltas", {}))
        if snap.get("delete_vectors"):
            header["delete_vectors"] = _copy_files(
                src, dst, snap["delete_vectors"]
            )
    else:
        # stats ride the manifests: resolving ``snap`` above loaded the
        # source's per-file min/max into ITS cache; seed the clone's so
        # the re-written manifests keep file-skipping selective
        for files in (
            list(snap["buckets"].values())
            + list(snap.get("deltas", {}).values())
            + list(snap.get("delete_vectors", {}).values())
        ):
            for f in files:
                st = src._file_stats_cache.get(f)
                if st is not None:
                    dst._file_stats_cache[f] = st
    dst._write_snapshot(header)
    return dst


def _copy_files(
    src: LakeTable, dst: LakeTable, mapping: dict[str, list[str]]
) -> dict[str, list[str]]:
    """Byte-copy every file in ``mapping`` under the clone's data dir
    (same path relative to ``data/``, so file identity survives) and
    return the re-pathed mapping; per-file stats re-key alongside."""
    out: dict[str, list[str]] = {}
    copied: dict[str, str] = {}
    for b, files in mapping.items():
        new_files = []
        for f in files:
            new = copied.get(f)
            if new is None:
                new = os.path.join(dst.data_dir, _rel_to_data(f))
                if dst.io.exists(new):
                    raise FileExistsError(f"clone destination exists: {new}")
                dst.io.copy(f, new)
                copied[f] = new
                st = src._file_stats_cache.get(f)
                if st is not None:
                    dst._file_stats_cache[new] = st
            new_files.append(new)
        out[b] = new_files
    return out
