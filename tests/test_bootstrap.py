"""Snapshot-bootstrap + switchover (CDCEngine.bootstrap).

The classic CDC handoff: seed an empty table from a fuzzy snapshot of
the source, then tail the binlog from a LOW watermark, with the overlap
window (changes the snapshot may or may not already reflect) reconciled
by the per-row LWW merge instead of the bucket watermark gate. The
ground truth in every test is the from-zero full replay of the same
stream — final state must be byte-identical (content_sha included).
"""

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.table import LakeTable, watermark_str
from filters_spark.sources.datagen import gen_events


def _wm_end_of_commit(commit_idx: int, events_per_commit: int = 100) -> str:
    return f"{commit_idx:012x}:{events_per_commit - 1:020d}"


def _source_state(events, wm_cut: str):
    """What the source database holds at position ``wm_cut``: per key,
    the payload of the last change at/below the cut, with the row
    carrying that change's (commit, event_seq) — raw (un-normalized)
    values, exactly what a snapshot SELECT against the source reads."""
    ev = events.withColumn("_swm", watermark_str(F.col("commit"), F.col("event_seq")))
    w = Window.partitionBy("repo", "path").orderBy(F.col("_swm").desc())
    return (
        ev.filter(F.col("_swm") <= wm_cut)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select("repo", "path", "commit", "event_seq", "lang", "content",
                "schema_version")
    )


def _state_rows(table):
    return sorted(
        (r.repo, r.path, r.commit, r.event_seq, r.lang, r.content, r.content_sha)
        for r in table.read().collect()
    )


@pytest.fixture(scope="module")
def stream(spark):
    # 40 commits x 100 events; deletes but NO dirty events: the source
    # applied every change, so a snapshot of it contains values our
    # validation would reject — dead-letter divergence is covered
    # separately in test_bootstrap_dead_letters_dirty_snapshot.
    df = gen_events(
        spark, n_events=4000, n_repos=12, n_paths=120,
        delete_frac=0.15, dirty_frac=0.0, seed=7,
    ).cache()
    df.count()
    yield df
    df.unpersist()


def _mk(spark, tmp_path, name, **kw):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), name), ["repo", "path"], num_buckets=8
    )
    return t, CDCEngine(spark, t, default_registry(), **kw)


def test_bootstrap_matches_full_replay(spark, tmp_path, stream):
    low = _wm_end_of_commit(24)      # replay_from: tail starts after c24
    snap_cut = _wm_end_of_commit(28)  # fuzzy snapshot saw through c28
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")

    t_full, e_full = _mk(spark, tmp_path, "full")
    e_full.replay(stream, num_batches=2)

    t_boot, e_boot = _mk(spark, tmp_path, "boot")
    m = e_boot.bootstrap(_source_state(stream, snap_cut), replay_from=(f"{24:012x}", 99))
    assert m["bootstrap"] and m["replay_from"] == low and m["dead_lettered"] == 0
    # every bucket's watermark is the LOW position, not the seeding max
    wms = t_boot.current()["watermarks"]
    assert set(wms) == {str(b) for b in range(8)} and set(wms.values()) == {low}

    tail = stream.filter(commit_long > 24)  # overlap window = c25..c28
    e_boot.replay(tail, num_batches=2)

    assert _state_rows(t_boot) == _state_rows(t_full)


def test_bootstrap_tail_rereplay_idempotent(spark, tmp_path, stream):
    low = _wm_end_of_commit(30)
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
    t, e = _mk(spark, tmp_path, "idem")
    e.bootstrap(_source_state(stream, low), replay_from=low)
    tail = stream.filter(commit_long > 30)
    e.replay(tail)
    before = _state_rows(t)
    m = e.replay(tail)[0]  # full tail re-delivery: all replays
    assert m["applied"] == 0 and m["skipped_replays"] == m["events_in"] > 0
    assert _state_rows(t) == before


def test_bootstrap_refuses_nonempty_table(spark, tmp_path, stream):
    t, e = _mk(spark, tmp_path, "nonempty")
    e.apply_batch(stream.limit(50))
    with pytest.raises(ValueError, match="empty table"):
        e.bootstrap(_source_state(stream, _wm_end_of_commit(10)),
                    replay_from=_wm_end_of_commit(10))


def test_bootstrap_arg_validation(spark, tmp_path, stream):
    t, e = _mk(spark, tmp_path, "args")
    snap = _source_state(stream, _wm_end_of_commit(10))
    with pytest.raises(ValueError, match="event_seq must be >= 0"):
        e.bootstrap(snap, replay_from=("0" * 12, -1))
    with pytest.raises(ValueError, match="malformed watermark"):
        e.bootstrap(snap, replay_from="nocolon")
    with pytest.raises(ValueError, match="event_seq.*decimal integer"):
        # non-numeric seq half: would lexicographically mis-sort
        e.bootstrap(snap, replay_from=("a" * 12) + ":abc")
    with pytest.raises(ValueError, match="schema_version"):
        e.bootstrap(snap.drop("schema_version"), replay_from=("0" * 12, 0))


def test_bootstrap_string_seq_normalized(spark, tmp_path, stream):
    # an UNPADDED seq in string form must behave exactly like the
    # tuple form (which %020d-pads): before the fix, 'commit:5' sorted
    # above 'commit:00000000000000000042' and dropped tail events as
    # replays after the handoff
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
    low_commit = f"{30:012x}"
    t_s, e_s = _mk(spark, tmp_path, "seqstr")
    t_t, e_t = _mk(spark, tmp_path, "seqtup")
    snap = _source_state(stream, _wm_end_of_commit(30))
    e_s.bootstrap(snap, replay_from=low_commit + ":0")       # unpadded
    e_t.bootstrap(snap, replay_from=(low_commit, 0))         # tuple
    tail = stream.filter(commit_long > 30)
    m_s = e_s.replay(tail)[0]
    m_t = e_t.replay(tail)[0]
    assert m_s["applied"] == m_t["applied"] > 0
    assert _state_rows(t_s) == _state_rows(t_t)


def test_bootstrap_defaults_and_schema_version_literal(spark, tmp_path, stream):
    # drop op/event_seq/schema_version: rows default to I/0/literal
    t, e = _mk(spark, tmp_path, "defaults")
    snap = _source_state(stream, _wm_end_of_commit(10)).drop("schema_version")
    m = e.bootstrap(snap, replay_from=_wm_end_of_commit(10), schema_version=1)
    assert m["applied"] == snap.count() and m["dead_lettered"] == 0


def test_bootstrap_dead_letters_dirty_snapshot(spark, tmp_path, stream):
    # the source applied a change our chains reject (bad lang): the
    # snapshot row dead-letters with full error channel, rest applies
    t, e = _mk(spark, tmp_path, "dirty")
    snap = _source_state(stream, _wm_end_of_commit(10))
    dirty = snap.withColumn(
        "lang",
        F.when(F.col("path").endswith("0.py"), F.lit("klingon")).otherwise(F.col("lang")),
    )
    n_bad = dirty.filter(F.col("lang") == "klingon").count()
    assert n_bad > 0
    m = e.bootstrap(dirty, replay_from=_wm_end_of_commit(10))
    assert m["dead_lettered"] == n_bad
    dl = e.dead_letters()
    assert dl is not None and dl.filter(
        F.col("errors_json").contains("lang")
    ).count() == n_bad


def test_bootstrap_chunked_matches_single_shot(spark, tmp_path, stream):
    low = _wm_end_of_commit(24)
    snap = _source_state(stream, _wm_end_of_commit(28))
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
    tail = stream.filter(commit_long > 24)

    t_one, e_one = _mk(spark, tmp_path, "one")
    e_one.bootstrap(snap, replay_from=low)
    e_one.replay(tail)

    t_chk, e_chk = _mk(spark, tmp_path, "chk")
    m = e_chk.bootstrap(snap, replay_from=low, num_chunks=4)
    assert m["chunks"] == 4 and m["bootstrap"]
    assert not os.path.exists(os.path.join(t_chk.root, "bootstrap-state.json"))
    assert not os.path.isdir(os.path.join(t_chk.root, "_staging", "bootstrap"))
    e_chk.replay(tail)
    assert _state_rows(t_chk) == _state_rows(t_one)


def test_bootstrap_chunked_crash_resume(spark, tmp_path, stream, monkeypatch):
    """Crash after chunk 1 of 4 has COMMITTED but before its checkpoint
    record (the worst window): resume must re-apply it as all-replays,
    apply the remaining chunks, and land byte-identical to an
    uncrashed run."""
    low = _wm_end_of_commit(24)
    snap = _source_state(stream, _wm_end_of_commit(28))

    t_ok, e_ok = _mk(spark, tmp_path, "ok")
    e_ok.bootstrap(snap, replay_from=low, num_chunks=4)

    t_cr, e_cr = _mk(spark, tmp_path, "cr")
    real_apply = CDCEngine._apply_staged
    calls = {"n": 0}

    def crashing(self, *a, **kw):
        out = real_apply(self, *a, **kw)
        calls["n"] += 1
        if calls["n"] == 2:  # chunk COMMITTED, record not yet written
            raise RuntimeError("simulated crash after chunk commit")
        return out

    monkeypatch.setattr(CDCEngine, "_apply_staged", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        e_cr.bootstrap(snap, replay_from=low, num_chunks=4)
    monkeypatch.setattr(CDCEngine, "_apply_staged", real_apply)

    # state file survived the crash and records exactly one done chunk;
    # the staged snapshot carries Spark's job-commit marker (what the
    # resume path keys completeness on)
    import json
    state_path = os.path.join(t_cr.root, "bootstrap-state.json")
    assert json.loads(open(state_path).read())["chunks_done"] == [0]
    assert os.path.exists(os.path.join(t_cr.root, "_staging", "bootstrap", "_SUCCESS"))

    m = e_cr.bootstrap(snap, replay_from=low, num_chunks=4)
    # the committed-but-unrecorded chunk re-applied as pure replays,
    # and the returned totals span BOTH invocations: every snapshot row
    # counted exactly once, split between applied and skipped_replays
    assert m["skipped_replays"] > 0
    assert m["events_in"] == snap.count()
    assert m["applied"] + m["skipped_replays"] == m["events_in"]
    assert not os.path.exists(state_path)
    assert _state_rows(t_cr) == _state_rows(t_ok)
    # watermarks identical: every bucket at the low handoff position
    assert t_cr.current()["watermarks"] == t_ok.current()["watermarks"]


def test_bootstrap_resume_arg_mismatch_raises(spark, tmp_path, stream, monkeypatch):
    low = _wm_end_of_commit(24)
    snap = _source_state(stream, _wm_end_of_commit(28))
    t, e = _mk(spark, tmp_path, "mismatch")
    real_apply = CDCEngine._apply_staged

    def crashing(self, *a, **kw):
        real_apply(self, *a, **kw)
        raise RuntimeError("boom")

    monkeypatch.setattr(CDCEngine, "_apply_staged", crashing)
    with pytest.raises(RuntimeError):
        e.bootstrap(snap, replay_from=low, num_chunks=4)
    monkeypatch.setattr(CDCEngine, "_apply_staged", real_apply)
    with pytest.raises(ValueError, match="bootstrap-state.json records"):
        e.bootstrap(snap, replay_from=low, num_chunks=8)
    with pytest.raises(ValueError, match="bootstrap-state.json records"):
        e.bootstrap(snap, replay_from=_wm_end_of_commit(20), num_chunks=4)


def test_bootstrap_single_shot_crash_resumes(spark, tmp_path, stream, monkeypatch):
    """num_chunks=1 runs the same checkpointed path: a crash between
    the seeding commit and the watermark handoff resumes instead of
    stranding seeding-max watermarks on a non-empty table."""
    low = _wm_end_of_commit(24)
    snap = _source_state(stream, _wm_end_of_commit(28))
    t, e = _mk(spark, tmp_path, "oneshot_crash")
    real_apply = CDCEngine._apply_staged

    def crashing(self, *a, **kw):
        real_apply(self, *a, **kw)
        raise RuntimeError("crash before handoff")

    monkeypatch.setattr(CDCEngine, "_apply_staged", crashing)
    with pytest.raises(RuntimeError):
        e.bootstrap(snap, replay_from=low)
    monkeypatch.setattr(CDCEngine, "_apply_staged", real_apply)

    m = e.bootstrap(snap, replay_from=low)  # resume, same args
    assert m["events_in"] == snap.count()
    wms = t.current()["watermarks"]
    assert set(wms.values()) == {low}


def test_bootstrap_resume_foreign_commit_raises(spark, tmp_path, stream, monkeypatch):
    """Resume refuses when commits beyond the one-commit crash window
    landed since the checkpoint — re-seeding + regressing watermarks
    under live ingest would re-admit the whole tail range."""
    low = _wm_end_of_commit(24)
    snap = _source_state(stream, _wm_end_of_commit(28))
    t, e = _mk(spark, tmp_path, "foreign")
    real_apply = CDCEngine._apply_staged
    calls = {"n": 0}

    def crashing(self, *a, **kw):
        out = real_apply(self, *a, **kw)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("boom")
        return out

    monkeypatch.setattr(CDCEngine, "_apply_staged", crashing)
    with pytest.raises(RuntimeError):
        e.bootstrap(snap, replay_from=low, num_chunks=4)
    monkeypatch.setattr(CDCEngine, "_apply_staged", real_apply)

    # foreign ingest moves the head past the crash window
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
    e.replay(stream.filter(commit_long > 38))
    e.replay(stream.filter(commit_long > 36))
    with pytest.raises(ValueError, match="foreign commits"):
        e.bootstrap(snap, replay_from=low, num_chunks=4)


def test_bootstrap_commit_width_validation(spark, tmp_path, stream):
    t, e = _mk(spark, tmp_path, "width")
    snap = _source_state(stream, _wm_end_of_commit(10))
    with pytest.raises(ValueError, match="12-char"):
        e.bootstrap(snap, replay_from=("7530", 30000))  # unpadded hex
    with pytest.raises(ValueError, match="12-char"):
        e.bootstrap(snap, replay_from=("X" * 12, 0))  # not hex


def test_bootstrap_fsck_and_changes_accept_handoff(spark, tmp_path, stream):
    """The sanctioned downward watermark move must not read as
    corruption (fsck) nor wedge the changefeed (changes()) on a MoR
    table bootstrapped then tailed."""
    from filters_spark.lake.fsck import verify_table

    low = _wm_end_of_commit(24)
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
    t, e = _mk(spark, tmp_path, "fsck_mor", write_mode="mor")
    e.bootstrap(_source_state(stream, _wm_end_of_commit(28)), replay_from=low,
                num_chunks=2)
    e.replay(stream.filter(commit_long > 24))

    rep = verify_table(t)
    assert rep["ok"], rep["errors"]

    # a changefeed range crossing the handoff commit stays readable and
    # carries both the seeded rows and the tail's changes
    feed = t.changes(0, t.current_snapshot_id())
    assert feed is not None and feed.count() > 0


def test_bootstrap_mor_mode_matches_full_replay(spark, tmp_path, stream):
    commit_long = F.conv(F.col("commit"), 16, 10).cast("long")
    t_full, e_full = _mk(spark, tmp_path, "full_mor", write_mode="mor")
    e_full.replay(stream, num_batches=3)

    low = _wm_end_of_commit(20)
    t_boot, e_boot = _mk(spark, tmp_path, "boot_mor", write_mode="mor")
    e_boot.bootstrap(_source_state(stream, _wm_end_of_commit(26)), replay_from=low)
    e_boot.replay(stream.filter(commit_long > 20), num_batches=2)
    assert _state_rows(t_boot) == _state_rows(t_full)
