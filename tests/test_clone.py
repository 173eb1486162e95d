"""Table cloning (lake/clone.py): shallow (metadata-only) and deep
(byte-copied) clones — state equality at the cloned snapshot, write
independence in both directions, watermark carryover for exactly-once
resume, vacuum safety on the clone, deep-clone survival of source
deletion, and stats/pruning carryover."""

import os

import pyspark.sql.functions as F
import pytest

from filters_spark.lake.clone import clone_table
from filters_spark.lake.table import LakeTable

from tests.test_cdc_engine import events_df, final_state, make_engine


def _table_state(t, **kw):
    df = t.read(**kw)
    if df is None:
        return {}
    return {(r.repo, r.path): r.content_sha for r in df.collect()}


def test_shallow_clone_matches_source_at_snapshot(spark, tmp_path):
    """Clone at current == source read; clone at an OLDER snapshot ==
    the source's time-travel read there — and the clone's head carries
    the source snapshot id with clone provenance."""
    eng = make_engine(spark, str(tmp_path / "src"))
    ev = events_df(spark, n_events=600, seed=11, dirty_frac=0.05)
    eng.replay(ev, num_batches=2)
    t = eng.table
    mid = t.snapshots()[1]  # after batch 1

    c_head = clone_table(t, str(tmp_path / "c1"))
    assert _table_state(c_head) == _table_state(t)
    assert c_head.current_snapshot_id() == t.current_snapshot_id()
    snap = c_head.current()
    assert snap["operation"] == "clone"
    assert snap["clone_source"] == {
        "root": t.root, "snapshot_id": t.current_snapshot_id(),
        "mode": "shallow",
    }
    assert snap["parent_id"] is None  # history lives only in the source

    c_mid = clone_table(t, str(tmp_path / "c2"), snapshot_id=mid)
    assert _table_state(c_mid) == _table_state(t, snapshot_id=mid)

    # a re-loaded handle resolves the clone's own manifests
    re = LakeTable.load(spark, str(tmp_path / "c1"))
    assert _table_state(re) == _table_state(t)


def test_shallow_clone_mor_pending_deltas(spark, tmp_path):
    """A merge-on-read clone folds the SOURCE's pending delta files at
    read time exactly as the source does."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry

    t = LakeTable.create(spark, str(tmp_path / "src"), ["repo", "path"],
                         num_buckets=8, path_salt=4)
    eng = CDCEngine(spark, t, default_registry(), write_mode="mor",
                    compact_after=99)  # keep deltas pending
    eng.replay(events_df(spark, n_events=500, seed=23, dirty_frac=0.0),
               num_batches=2)
    assert any(t.current().get("deltas", {}).values())  # really pending
    c = clone_table(t, str(tmp_path / "c"))
    assert _table_state(c) == _table_state(t)


def test_clone_write_independence_and_watermark_resume(spark, tmp_path):
    """Writes to the clone never appear in the source (and vice versa);
    cloned watermarks make a redelivered batch dedupe on the clone —
    the fork-and-resume workflow."""
    eng = make_engine(spark, str(tmp_path / "src"))
    ev = events_df(spark, n_events=400, seed=7, dirty_frac=0.0)
    eng.apply_batch(ev)
    src_state = final_state(eng)

    c = clone_table(eng.table, str(tmp_path / "c"))
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry

    ceng = CDCEngine(spark, c, default_registry())
    # exactly-once resume: the SAME batch is a pure replay on the clone
    m = ceng.apply_batch(ev)
    assert m["applied"] == 0 and m["skipped_replays"] > 0

    extra = events_df(spark, n_events=200, seed=99, dirty_frac=0.0,
                      start_commit=5000)
    ceng.apply_batch(extra)
    assert final_state(eng) == src_state  # source never moved
    assert final_state(ceng) != src_state

    clone_before = final_state(ceng)
    back = events_df(spark, n_events=100, seed=55, dirty_frac=0.0,
                     start_commit=9000)
    eng.apply_batch(back)
    assert final_state(ceng) == clone_before  # source write never leaks in
    assert _table_state(c) != _table_state(eng.table)


def test_clone_vacuum_never_touches_source_files(spark, tmp_path):
    """Vacuum on a shallow clone sweeps only the clone's own data dir
    (empty at first, clone-local after its own commits) — the shared
    source files survive even a zero-min-age sweep."""
    eng = make_engine(spark, str(tmp_path / "src"))
    eng.apply_batch(events_df(spark, n_events=300, seed=3, dirty_frac=0.0))
    t = eng.table
    c = clone_table(t, str(tmp_path / "c"))
    src_files = set(t.live_files())

    assert c.vacuum(min_age_seconds=0) == []
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry

    ceng = CDCEngine(spark, c, default_registry())
    ceng.apply_batch(events_df(spark, n_events=200, seed=42, dirty_frac=0.0,
                               start_commit=7000))
    c.vacuum(min_age_seconds=0)
    assert all(t.io.exists(f) for f in src_files)
    assert _table_state(t) != {}


def test_deep_clone_survives_source_deletion(spark, tmp_path):
    """A deep clone is self-contained: deleting the ENTIRE source root
    leaves it fully readable with identical state."""
    eng = make_engine(spark, str(tmp_path / "src"))
    eng.apply_batch(events_df(spark, n_events=300, seed=17, dirty_frac=0.0))
    t = eng.table
    want = _table_state(t)

    c = clone_table(t, str(tmp_path / "c"), mode="deep")
    snap = c.current()
    assert snap["clone_source"]["mode"] == "deep"
    assert all(
        f.startswith(c.data_dir)
        for files in snap["buckets"].values() for f in files
    )
    t.io.rmtree(t.root)
    assert _table_state(LakeTable.load(spark, str(tmp_path / "c"))) == want


def test_clone_refuses_existing_root_and_bad_mode(spark, tmp_path):
    eng = make_engine(spark, str(tmp_path / "src"))
    eng.apply_batch(events_df(spark, n_events=50, seed=1, dirty_frac=0.0))
    clone_table(eng.table, str(tmp_path / "c"))
    with pytest.raises(FileExistsError, match="already exists"):
        clone_table(eng.table, str(tmp_path / "c"))
    with pytest.raises(ValueError, match="shallow.*deep"):
        clone_table(eng.table, str(tmp_path / "c2"), mode="full")


def test_clone_carries_file_skipping_stats(spark, tmp_path):
    """Per-file min/max stats ride the clone's manifests in BOTH modes,
    so `read(where=...)` pruning stays selective on a fresh handle."""
    t = LakeTable.create(
        spark, str(tmp_path / "src"), ["repo", "path"], num_buckets=4,
        stats_cols=["event_seq"], sort_cols=["event_seq"],
    )
    from filters_spark.lake.table import bucket_expr

    df = spark.range(4000).select(
        F.concat(F.lit("r"), (F.col("id") % 7)).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lpad(F.conv((F.col("id") / 500).cast("long") + 1, 10, 16), 12, "0").alias("commit"),
        F.col("id").alias("event_seq"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("c"), F.col("id")).alias("content"),
    ).withColumn("content_sha", F.sha2("content", 256)).select(
        "*", bucket_expr(F.col("repo"), F.col("path"), 4, 16).cast("int").alias("_bucket")
    ).repartition(8)
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {})

    import json

    for name, root in [("shallow", "cs"), ("deep", "cd")]:
        c = clone_table(t, str(tmp_path / root), mode=name)
        fresh = LakeTable.load(spark, str(tmp_path / root))
        got = fresh.read(where=("event_seq", 1000, 1099)).count()
        assert got == 100, name
        # the clone's own manifests carry the stats blocks
        manifests = [
            n for n in fresh.io.listdir(fresh.meta_dir)
            if n.startswith("manifest-")
        ]
        bodies = [
            json.loads(fresh.io.read_text(os.path.join(fresh.meta_dir, n)))
            for n in manifests
        ]
        assert any("stats" in b and b["stats"] for b in bodies), name
