"""BranchTable — a :class:`LakeTable` view bound to a branch ref, so
EVERY consumer of the table interface (including ``CDCEngine`` and the
streaming front-end, unchanged) can read from and commit to a branch
instead of main.

This is the Iceberg audit-branch pattern at stream granularity: fork a
branch, point an ingest engine at ``BranchTable(t, "audit")``, replay
the whole change stream onto it — watermarks, dead-letter routing and
exactly-once all scoped to the branch head — validate the result, then
``t.fast_forward("audit")`` publishes the entire ingest to main as one
metadata-only adoption, or ``t.drop_branch`` discards it without main
ever having seen a row.

How the redirection works: every LakeTable operation derives its state
from ``current_snapshot_id()`` and persists through
``_write_snapshot``; this subclass resolves the former via the ref and
routes the latter to the branch persistence path (globally-unique
ref-marked header + CAS ref advance — see
``LakeTable._persist_branch_snapshot``). Data files for branch commits
land under collision-free ``branch-<name>*`` dirs, never the
``snap-<id>`` dirs main's id sequence owns.

Scoping (raises RuntimeError): table-wide maintenance and ref surgery
— ``expire_snapshots`` / ``vacuum`` / ``maintain`` / ``rescale`` /
``rollback`` / ``fast_forward`` and ref create/drop — must run through
the MAIN handle; their retention and ancestry rules are defined against
main plus all refs, not against one branch's view of the world.

Shared state to know about: the CDC engine's dead-letter store lives
under the table root, outside snapshot isolation — dead letters
accumulated by a branch ingest remain visible after the branch is
dropped (they are an operational log, not table state).
"""

from __future__ import annotations

from filters_spark.lake.table import LakeTable


class BranchTable(LakeTable):
    """A LakeTable handle whose head is a branch ref (see module doc)."""

    def __init__(self, base: LakeTable, branch: str):
        super().__init__(base.spark, base.root, base.io)
        self.branch = branch
        base._branch_head(branch)  # raises if absent

    # -- head resolution ------------------------------------------------------

    def current_snapshot_id(self) -> int:
        return self._branch_head(self.branch)

    # -- persistence ----------------------------------------------------------

    def _write_snapshot(self, snapshot: dict) -> None:
        # every commit path (commit_bucket_files / commit_delta_files /
        # compact) funnels through here; the branch twin mutates the
        # snapshot to the id that landed, exactly like the main path
        self._persist_branch_snapshot(self.branch, snapshot)

    def commit_buckets(self, df, touched_buckets, new_watermarks, **kw) -> dict:
        prev = self.current()
        out_dir = self._fresh_stage_dir(f"branch-{self.branch}")
        new_files = self._write_bucket_data(
            df, out_dir, touched_buckets, prev.get("sort_cols")
        )
        return self.commit_bucket_files(
            new_files, new_watermarks,
            basis_snapshot_id=prev["snapshot_id"], **kw,
        )

    def commit_deltas(self, df, touched_buckets, new_watermarks, **kw) -> dict:
        prev = self.current()
        out_dir = self._fresh_stage_dir(f"branch-delta-{self.branch}")
        new_files = self._write_delta_data(df, out_dir, touched_buckets)
        return self.commit_delta_files(
            new_files, new_watermarks,
            basis_snapshot_id=prev["snapshot_id"], **kw,
        )

    def publish_wap(self, wap_id: str) -> dict:
        """Publish a staged commit onto the BRANCH head (the engine's
        ``audit_fn`` gate works unchanged on branch ingest)."""
        raw = self._wap_raw(wap_id)
        cur = self.current_snapshot_id()
        if raw["parent_id"] != cur:
            raise ValueError(
                f"cannot publish {wap_id!r}: staged on parent "
                f"{raw['parent_id']} but branch head is {cur} — re-stage"
            )
        snap = self._resolve_header({k: v for k, v in raw.items() if k != "wap_id"})
        self._persist_branch_snapshot(self.branch, snap)
        self.io.remove(self._wap_path(wap_id))
        return snap

    # -- out of scope on a branch view ---------------------------------------

    def _main_only(self, op: str):
        raise RuntimeError(
            f"{op} operates on the whole table (main + all refs): run it "
            "through the main LakeTable handle, not a branch view"
        )

    def expire_snapshots(self, *a, **kw):
        self._main_only("expire_snapshots")

    def vacuum(self, *a, **kw):
        self._main_only("vacuum")

    def maintain(self, *a, **kw):
        self._main_only("maintain")

    def rescale(self, *a, **kw):
        self._main_only("rescale")

    def rewrite_data_files(self, *a, **kw):
        self._main_only("rewrite_data_files")

    def rewrite_zorder(self, *a, **kw):
        self._main_only("rewrite_zorder")

    def rollback(self, *a, **kw):
        self._main_only("rollback")

    def fast_forward(self, *a, **kw):
        self._main_only("fast_forward")

    def create_tag(self, *a, **kw):
        self._main_only("create_tag")

    def create_branch(self, *a, **kw):
        self._main_only("create_branch")

    def drop_branch(self, *a, **kw):
        self._main_only("drop_branch")

    def drop_tag(self, *a, **kw):
        self._main_only("drop_tag")
