"""Incremental aggregate view maintenance (lake/mview.py): the view
after N incremental refreshes must equal a from-scratch GROUP BY of the
source's current snapshot, including retractions for updates/deletes;
refreshes must be crash-idempotent and no-op when up to date."""

import pyspark.sql.functions as F
import pytest

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.mview import AggView
from filters_spark.lake.table import LakeTable
from filters_spark.sources.datagen import gen_events

GROUP = ["lang"]
SUMS = {"total_bytes": "length(content)"}


def _recompute(t):
    df = t.read()
    if df is None:
        return set()
    agg = df.groupBy(*GROUP).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.coalesce(F.expr("length(content)"), F.lit(0)).cast("long")).alias(
            "total_bytes"
        ),
    )
    return {tuple(r) for r in agg.collect()}


def _view_rows(v):
    return {tuple(r) for r in v.current().select("lang", "n_rows", "total_bytes").collect()}


@pytest.fixture()
def src(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), ["repo", "path"], num_buckets=8)
    eng = CDCEngine(spark, t, default_registry(), write_mode="mor", compact_after=99)
    # two DISJOINT commit ranges over the SAME key space: the second
    # wave lands updates and deletes on keys the first created (same
    # n_repos/n_paths), which is what forces real retractions
    ev1 = gen_events(
        spark, n_events=2500, n_repos=30, n_paths=300,
        hot_frac=0.2, dirty_frac=0.0, seed=11, start_commit=1,
    )
    ev2 = gen_events(
        spark, n_events=2500, n_repos=30, n_paths=300,
        hot_frac=0.2, dirty_frac=0.0, seed=12, start_commit=1000,
    )
    return t, eng, ev1, ev2


class TestAggView:
    def test_incremental_equals_recompute(self, spark, tmp_path, src):
        t, eng, ev1, ev2 = src
        v = AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS)
        eng.replay(ev1, num_batches=1)
        r1 = v.refresh()
        assert r1["mode"] == "full" and r1["refreshed"]
        assert _view_rows(v) == _recompute(t)
        # second replay lands updates AND deletes over existing keys —
        # the refresh must retract their old contributions
        eng.replay(ev2, num_batches=1)
        r2 = v.refresh()
        assert r2["mode"] == "incremental"
        assert _view_rows(v) == _recompute(t)

    def test_refresh_noop_when_current(self, spark, tmp_path, src):
        t, eng, ev1, ev2 = src
        eng.replay(ev1, num_batches=1)
        v = AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS)
        assert v.refresh()["refreshed"]
        again = v.refresh()
        assert not again["refreshed"]
        assert again["source_snapshot_id"] == t.current_snapshot_id()

    def test_crash_before_state_flip_is_idempotent(self, spark, tmp_path, src):
        t, eng, ev1, ev2 = src
        v = AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS)
        eng.replay(ev1, num_batches=1)
        v.refresh()
        state_after_1 = v.io.read_text(v._state_path())
        eng.replay(ev2, num_batches=1)
        v.refresh()
        want = _view_rows(v)
        # simulate a crash between the view write and the state flip:
        # roll state.json back and refresh again — same final view
        v.io.write_text_atomic(v._state_path(), state_after_1)
        r = v.refresh()
        assert r["refreshed"] and r["mode"] == "incremental"
        assert _view_rows(v) == want == _recompute(t)

    def test_reopen_restores_spec_and_rejects_mismatch(self, spark, tmp_path, src):
        t, eng, ev1, ev2 = src
        eng.replay(ev1, num_batches=1)
        AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS).refresh()
        re = AggView(spark, t, str(tmp_path / "view"))
        assert re.group_cols == GROUP and re.sum_exprs == SUMS
        with pytest.raises(ValueError):
            AggView(spark, t, str(tmp_path / "view"), group_cols=["repo"])
        with pytest.raises(ValueError):
            AggView(spark, t, str(tmp_path / "view2"))  # new view, no spec

    def test_group_vanishes_when_all_rows_deleted(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "s2"), ["repo", "path"], num_buckets=4)
        rows = [
            ("r1", f"p{i}", f"{c:012x}", i, lang, "xx", "I")
            for i, (c, lang) in enumerate([(1, "go"), (2, "go"), (3, "py")])
        ]
        ddl = ("repo string, path string, commit string, event_seq long, "
               "lang string, content string, op string")
        from filters_spark.lake.table import bucket_expr

        def commit(data, wm_commit):
            df = spark.createDataFrame(data, ddl).select(
                "*",
                bucket_expr(F.col("repo"), F.col("path"), 4, 16).alias("_bucket"),
            )
            touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
            t.commit_deltas(df, touched, {b: f"{wm_commit:012x}:0000000000" for b in touched})

        commit(rows, 3)
        v = AggView(spark, t, str(tmp_path / "v2"), GROUP, SUMS)
        v.refresh()
        assert {r[0] for r in v.current().select("lang").collect()} == {"go", "py"}
        # delete every go row
        dels = [
            ("r1", "p0", f"{10:012x}", 10, None, None, "D"),
            ("r1", "p1", f"{11:012x}", 11, None, None, "D"),
        ]
        commit(dels, 10)
        v.refresh()
        got = {tuple(r) for r in v.current().collect()}
        assert got == {("py", 1, 2)}


class TestMaintenanceInteraction:
    def test_compact_only_range_is_a_noop_refresh(self, spark, tmp_path, src):
        t, eng, ev1, ev2 = src
        eng.replay(ev1, num_batches=1)
        v = AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS)
        v.refresh()
        before = _view_rows(v)
        # compaction is a physical reorg: changes() skips it, and the
        # refresh must advance state without touching the view
        assert t.compact() is not None
        r = v.refresh()
        assert r["mode"] == "noop" and r["refreshed"]
        assert v.last_refreshed_snapshot() == t.current_snapshot_id()
        assert _view_rows(v) == before == _recompute(t)
        # and a LATER data commit still folds in incrementally
        eng.replay(ev2, num_batches=1)
        assert v.refresh()["mode"] == "incremental"
        assert _view_rows(v) == _recompute(t)

    def test_sum_exprs_mismatch_rejected(self, spark, tmp_path, src):
        t, eng, ev1, ev2 = src
        eng.replay(ev1, num_batches=1)
        AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS).refresh()
        with pytest.raises(ValueError):
            AggView(
                spark, t, str(tmp_path / "view"), GROUP,
                {"total_bytes": "length(content) * 2"},
            )


def test_refresh_follows_rollback(spark, tmp_path, src):
    """A rollback in the refresh range emits revert rows through
    changes(); the view retracts the undone contributions and matches
    a from-scratch recompute of the rolled-back state."""
    t, eng, ev1, ev2 = src
    v = AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS)
    eng.replay(ev1, num_batches=1)
    good = t.current_snapshot_id()
    v.refresh()
    eng.replay(ev2, num_batches=1)
    v.refresh()
    t.rollback(good)
    r = v.refresh()
    assert r["mode"] == "incremental"
    assert _view_rows(v) == _recompute(t)


def test_vacuum_drops_superseded_view_dirs(spark, tmp_path, src):
    """Each refresh writes a fresh v-* dir and flips the state pointer;
    vacuum sweeps every non-live dir (min-age guarded) without
    disturbing the live view."""
    t, eng, ev1, ev2 = src
    v = AggView(spark, t, str(tmp_path / "view"), GROUP, SUMS)
    eng.replay(ev1, num_batches=1)
    v.refresh()
    eng.replay(ev2, num_batches=1)
    v.refresh()
    live = v._read_state()["view_dir"]
    dirs = sorted(n for n in v.io.listdir(v.root) if n.startswith("v-"))
    assert len(dirs) == 2 and live in dirs
    assert v.vacuum() == []  # default min-age protects fresh dirs
    dropped = v.vacuum(min_age_seconds=0)
    assert dropped == [d for d in dirs if d != live]
    assert sorted(
        n for n in v.io.listdir(v.root) if n.startswith("v-")
    ) == [live]
    assert _view_rows(v) == _recompute(t)
    assert v.vacuum(min_age_seconds=0) == []  # idempotent
