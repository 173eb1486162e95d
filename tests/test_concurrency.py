"""Optimistic-commit retry (Iceberg commit-retry semantics).

Multi-writer behavior of the metadata commit layer, exercised with two
table handles on one root and a hook that injects the racer's commit
inside the loser's write window. All metadata-only (no Spark jobs):
commit_bucket_files/commit_delta_files record already-written paths.

- CoW rewrite: rebase allowed only when the racer's buckets are
  disjoint from ours; overlap raises (a stale-basis rewrite would drop
  the racer's rows).
- Delta append: commutative (read-time LWW merges base ∪ all deltas),
  so same-bucket concurrent appends rebase and BOTH survive.
- A concurrent rescale always raises: our _bucket ids are stale.
"""

import pytest

from filters_spark.lake.table import LakeTable


def _mk(spark, tmp_path, name):
    t = LakeTable.create(spark, str(tmp_path / name), ["repo", "path"], num_buckets=4)
    t.commit_bucket_files(
        {"0": ["data/snap-1/b0-f0.parquet"], "1": ["data/snap-1/b1-f0.parquet"]},
        {0: "c01:0000000001", 1: "c01:0000000001"},
    )
    return t


def _inject_racer(victim, racer_commit):
    """Make the victim handle's FIRST header write lose: the racer
    commits inside the victim's write window."""
    orig = victim._write_snapshot
    state = {"fired": False}

    def hooked(snapshot):
        if not state["fired"]:
            state["fired"] = True
            racer_commit()
        return orig(snapshot)

    victim._write_snapshot = hooked


class TestCowRetry:
    def test_disjoint_rebase_keeps_both_commits(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        b = LakeTable.load(spark, a.root)
        _inject_racer(a, lambda: b.commit_bucket_files(
            {"1": ["data/snap-2/b1-f1.parquet"]}, {1: "c02:0000000001"}))

        snap = a.commit_bucket_files(
            {"0": ["data/snap-3/b0-f1.parquet"]}, {0: "c02:0000000002"},
            retry_conflicts=3,
        )
        # a's commit landed ON TOP of b's, neither lost
        assert snap["snapshot_id"] == 3 and snap["parent_id"] == 2
        cur = a.current()
        assert cur["buckets"]["0"] == ["data/snap-3/b0-f1.parquet"]
        assert cur["buckets"]["1"] == ["data/snap-2/b1-f1.parquet"]
        assert cur["watermarks"]["0"] == "c02:0000000002"
        assert cur["watermarks"]["1"] == "c02:0000000001"

    def test_overlapping_racer_raises(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        b = LakeTable.load(spark, a.root)
        _inject_racer(a, lambda: b.commit_bucket_files(
            {"0": ["data/snap-2/b0-racer.parquet"]}, {0: "c02:0000000001"}))
        with pytest.raises(ValueError, match="concurrent writer modified"):
            a.commit_bucket_files(
                {"0": ["data/snap-3/b0-f1.parquet"]}, {0: "c02:0000000002"},
                retry_conflicts=3,
            )

    def test_default_zero_retries_propagates_race(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        b = LakeTable.load(spark, a.root)
        _inject_racer(a, lambda: b.commit_bucket_files(
            {"1": ["data/snap-2/b1-f1.parquet"]}, {1: "c02:0000000001"}))
        with pytest.raises(FileExistsError):
            a.commit_bucket_files(
                {"0": ["data/snap-3/b0-f1.parquet"]}, {0: "c02:0000000002"}
            )


class TestDeltaRetry:
    def test_same_bucket_appends_both_survive(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        b = LakeTable.load(spark, a.root)
        _inject_racer(a, lambda: b.commit_delta_files(
            {"0": ["data/delta-2/b0-racer.parquet"]}, {0: "c02:0000000001"}))

        a.commit_delta_files(
            {"0": ["data/delta-3/b0-mine.parquet"]}, {0: "c02:0000000002"},
            retry_conflicts=3,
        )
        # commutative: the rebase re-appended our file after the racer's
        assert a.current()["deltas"]["0"] == [
            "data/delta-2/b0-racer.parquet", "data/delta-3/b0-mine.parquet",
        ]
        assert a.current()["watermarks"]["0"] == "c02:0000000002"

    def test_concurrent_rescale_raises(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        b = LakeTable.load(spark, a.root)

        def racer_rescale():
            # metadata shape of a rescale commit (a real rescale() also
            # rewrites data, irrelevant to the layout-guard under test)
            snap = b._next_bucket_snapshot({}, {})
            snap["num_buckets"] = 8
            snap["operation"] = "rescale"
            b._write_snapshot(snap)

        _inject_racer(a, racer_rescale)
        with pytest.raises(ValueError, match="rescale"):
            a.commit_delta_files(
                {"0": ["data/delta-9/b0-mine.parquet"]}, {0: "c02:0000000002"},
                retry_conflicts=3,
            )


class TestComputeBasis:
    """A racer landing between the caller's COMPUTE and the metadata
    call is invisible to head-at-call-time checks; basis_snapshot_id
    declares the true basis so the disjointness validation still runs."""

    def test_pre_call_overlapping_racer_caught_via_basis(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        basis = a.current_snapshot_id()
        b = LakeTable.load(spark, a.root)
        # racer commits to bucket 0 BEFORE a's metadata call
        b.commit_bucket_files(
            {"0": ["data/snap-9/b0-racer.parquet"]}, {0: "c05:0000000001"}
        )
        with pytest.raises(ValueError, match="concurrent writer modified"):
            a.commit_bucket_files(
                {"0": ["data/snap-9/b0-mine.parquet"]}, {0: "c05:0000000002"},
                basis_snapshot_id=basis,
            )

    def test_pre_call_disjoint_racer_rebases_via_basis(self, spark, tmp_path):
        a = _mk(spark, tmp_path, "lake")
        basis = a.current_snapshot_id()
        b = LakeTable.load(spark, a.root)
        b.commit_bucket_files(
            {"1": ["data/snap-9/b1-racer.parquet"]}, {1: "c05:0000000001"}
        )
        snap = a.commit_bucket_files(
            {"0": ["data/snap-9/b0-mine.parquet"]}, {0: "c05:0000000002"},
            basis_snapshot_id=basis,
        )
        cur = a.current()
        assert snap["snapshot_id"] == 3
        assert cur["buckets"]["0"] == ["data/snap-9/b0-mine.parquet"]
        assert cur["buckets"]["1"] == ["data/snap-9/b1-racer.parquet"]
