"""Write-audit-publish (WAP) staged commits on the lake table.

Iceberg's WAP pattern (spark.wap.id / apache/iceberg docs): a commit is
written — data files, manifests, a full snapshot header — but the table
head does not advance until an auditor approves it. Readers of the table
never observe an unaudited state; an abandoned stage leaves only vacuum
orphans. The reference library has no storage layer; this is engine-tier
surface for the CDC ingest north rule (audit a replayed batch's state
before exposing it).
"""

import os

import pyspark.sql.functions as F
import pytest

from filters_spark.lake.table import LakeTable, bucket_expr

def _bkt():
    # built lazily: Column construction needs an active Spark context
    return bucket_expr(F.col("repo"), F.col("path"), 4, 16).cast("int").alias("_bucket")


def _df(spark, rows):
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, event_seq long, "
        "lang string, content string",
    )
    return df.withColumn("content_sha", F.sha2("content", 256)).select("*", _bkt())


def _state(df):
    if df is None:
        return []
    cols = ["repo", "path", "commit", "event_seq", "lang", "content"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


BASE = [
    ("r1", "a.py", "c01", 1, "py", "print(1)"),
    ("r1", "b.py", "c01", 2, "py", "print(2)"),
    ("r2", "c.go", "c01", 3, "go", "func c()"),
    ("r2", "d.go", "c01", 4, "go", "func d()"),
]
STAGED = [
    ("r1", "a.py", "c02", 5, "py", "print(1); print(9)"),  # update
    ("r1", "b.py", "c01", 2, "py", "print(2)"),            # carried
    ("r2", "c.go", "c01", 3, "go", "func c()"),
    ("r2", "d.go", "c01", 4, "go", "func d()"),
    ("r3", "e.rs", "c02", 6, "rs", "fn e()"),              # insert
]


def _mk(spark, tmp_path, name="lake"):
    t = LakeTable.create(spark, str(tmp_path / name), ["repo", "path"], num_buckets=4)
    df = _df(spark, BASE)
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {b: "c01:0000000001" for b in touched})
    return t


def _stage_full(t, spark, wap_id="audit-1"):
    df = _df(spark, STAGED)
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    return t.stage_buckets(
        df, touched, {b: "c02:0000000001" for b in touched}, wap_id
    )


class TestStagePublish:
    def test_stage_is_invisible_until_published(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        head = t.current_snapshot_id()
        _stage_full(t, spark)
        # head unmoved, default read sees only the base state
        assert t.current_snapshot_id() == head
        assert _state(t.read()) == _state(_df(spark, BASE))
        assert t.wap_ids() == ["audit-1"]
        # ...but the audit view sees exactly what publish would expose
        assert _state(t.read(wap_id="audit-1")) == _state(_df(spark, STAGED))

    def test_publish_advances_head_atomically(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        head = t.current_snapshot_id()
        _stage_full(t, spark)
        snap = t.publish_wap("audit-1")
        assert snap["snapshot_id"] == head + 1
        assert snap["parent_id"] == head
        assert t.current_snapshot_id() == head + 1
        assert _state(t.read()) == _state(_df(spark, STAGED))
        assert t.wap_ids() == []
        # time travel through the published snapshot chain still works
        assert _state(t.read(snapshot_id=head)) == _state(_df(spark, BASE))

    def test_publish_after_intervening_commit_refuses(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        # a concurrent writer lands a commit while the audit runs
        extra = _df(spark, [("r9", "z.py", "c03", 9, "py", "z")])
        touched = sorted(r[0] for r in extra.select("_bucket").distinct().collect())
        t.commit_buckets(extra, touched, {b: "c03:0000000001" for b in touched})
        with pytest.raises(ValueError, match="re-stage"):
            t.publish_wap("audit-1")
        # the stage survives the refusal for re-audit bookkeeping
        assert t.wap_ids() == ["audit-1"]

    def test_stage_deltas_audit_reads_merged(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        d = spark.createDataFrame(
            [("r1", "a.py", "c02", 5, "py", "NEW", "U"),
             ("r2", "c.go", "c02", 6, None, None, "D")],
            "repo string, path string, commit string, event_seq long, "
            "lang string, content string, op string",
        ).select("*", _bkt())
        touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.stage_deltas(d, touched, {b: "c02:0000000001" for b in touched}, "mor-audit")
        # table head still reads the bare base scan
        assert _state(t.read()) == _state(_df(spark, BASE))
        want = [r for r in BASE if r[1] != "c.go"]
        want = [("r1", "a.py", "c02", 5, "py", "NEW") if r[1] == "a.py" else r
                for r in want]
        got = _state(t.read(wap_id="mor-audit"))
        assert got == sorted(want)
        snap = t.publish_wap("mor-audit")
        assert snap["operation"] == "append-deltas"
        assert _state(t.read()) == sorted(want)

    def test_read_rejects_both_selectors(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        with pytest.raises(ValueError, match="not both"):
            t.read(snapshot_id=1, wap_id="audit-1")


class TestAbandonAndGC:
    def test_abandon_drops_header_keeps_shared_manifests(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        base_state = _state(t.read())
        _stage_full(t, spark)
        t.abandon_wap("audit-1")
        assert t.wap_ids() == []
        with pytest.raises(ValueError):
            t.read(wap_id="audit-1")
        # shared manifests survived: every retained snapshot still reads
        assert _state(t.read()) == base_state

    def test_vacuum_protects_pending_then_sweeps_abandoned(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        # pending stage: its data files are NOT orphans even at age 0
        assert t.vacuum(dry_run=True, min_age_seconds=0) == []
        t.abandon_wap("audit-1")
        orphans = t.vacuum(min_age_seconds=0)
        assert orphans and all(f"{os.sep}wap-audit-1{os.sep}" in p for p in orphans)
        assert _state(t.read()) == _state(_df(spark, BASE))

    def test_expire_keeps_manifests_referenced_by_pending_wap(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)  # shares untouched-bucket manifests with snap 1
        # land two more commits so snapshot 1 expires
        for i, (cmt, seq) in enumerate([("c03", 9), ("c04", 10)]):
            df = _df(spark, [("r9", f"f{i}.py", cmt, seq, "py", f"x{i}")])
            touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
            t.commit_buckets(df, touched, {b: f"{cmt}:0000000001" for b in touched})
        t.expire_snapshots(keep_last=1)
        # the staged commit's manifests (shared with expired snap 1) live on
        assert _state(t.read(wap_id="audit-1")) == _state(_df(spark, STAGED))

    def test_bad_and_duplicate_wap_ids(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        for bad in ("", "  x", "a/b", ".hidden"):
            with pytest.raises(ValueError, match="bad wap id"):
                t.stage_buckets(_df(spark, BASE), [0], {}, bad)
        _stage_full(t, spark, "dup")
        with pytest.raises(ValueError, match="already exists"):
            _stage_full(t, spark, "dup")
        with pytest.raises(ValueError, match="no such staged"):
            t.publish_wap("ghost")


def test_restage_same_id_after_abandon(spark, tmp_path):
    """An abandoned stage's data files await vacuum; re-staging the
    SAME wap id must not collide with them."""
    t = _mk(spark, tmp_path)
    _stage_full(t, spark, "retry-me")
    t.abandon_wap("retry-me")
    _stage_full(t, spark, "retry-me")  # must not raise path-exists
    assert _state(t.read(wap_id="retry-me")) == _state(_df(spark, STAGED))
    t.publish_wap("retry-me")
    assert _state(t.read()) == _state(_df(spark, STAGED))


class TestResumablePublish:
    """publish_wap is three IO steps (snapshot header, version hint,
    staged-header delete); a crash between any two must be finishable
    by re-calling publish_wap — recovery (engine/txn.py) rolls decided
    commits forward and can never accept a refusal for its own partial
    work."""

    def test_republish_after_crash_before_staged_header_delete(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        wap_file = t._wap_path("audit-1")
        staged_header = t.io.read_text(wap_file)
        snap = t.publish_wap("audit-1")
        # crash window: header + hint landed, staged header survived
        t.io.write_text_atomic(wap_file, staged_header)
        again = t.publish_wap("audit-1")
        assert again["snapshot_id"] == snap["snapshot_id"]
        assert t.wap_ids() == []
        assert t.current_snapshot_id() == snap["snapshot_id"]
        assert _state(t.read()) == _state(_df(spark, STAGED))

    def test_republish_resumes_below_later_commits(self, spark, tmp_path):
        """Later commits above the published-but-unfinished snapshot
        (post-publish compaction, the next batch) must not turn the
        resume into a refusal — the chain walk finds our header."""
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        wap_file = t._wap_path("audit-1")
        staged_header = t.io.read_text(wap_file)
        snap = t.publish_wap("audit-1")
        extra = _df(spark, [("r9", "z.py", "c03", 9, "py", "z")])
        touched = sorted(r[0] for r in extra.select("_bucket").distinct().collect())
        t.commit_buckets(extra, touched, {b: "c03:0000000001" for b in touched})
        head = t.current_snapshot_id()
        t.io.write_text_atomic(wap_file, staged_header)
        again = t.publish_wap("audit-1")
        assert again["snapshot_id"] == snap["snapshot_id"]
        assert t.current_snapshot_id() == head  # resume never moves the head
        assert t.wap_ids() == []

    def test_crash_between_header_and_hint_resumes(self, spark, tmp_path):
        """The earliest window: the snapshot header landed but the hint
        never moved. The retry's create-exclusive loss content-matches
        its own earlier write and finishes; a reader between the two
        calls still sees the pre-publish state (hint is the decider)."""
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        head = t.current_snapshot_id()
        real = t.io.write_text_atomic

        def die_on_hint(path, data, fail_if_exists=False):
            if path.endswith("version-hint.text"):
                raise RuntimeError("crash before the hint")
            real(path, data, fail_if_exists=fail_if_exists)

        t.io.write_text_atomic = die_on_hint
        try:
            with pytest.raises(RuntimeError, match="crash before the hint"):
                t.publish_wap("audit-1")
        finally:
            t.io.write_text_atomic = real
        assert t.current_snapshot_id() == head  # hint never moved
        assert _state(t.read()) == _state(_df(spark, BASE))
        snap = t.publish_wap("audit-1")
        assert snap["snapshot_id"] == head + 1
        assert t.current_snapshot_id() == head + 1
        assert _state(t.read()) == _state(_df(spark, STAGED))
        assert t.wap_ids() == []

    def test_genuine_head_move_never_content_matches(self, spark, tmp_path):
        """A DIFFERENT commit occupying the staged parent's child slot
        (a real concurrent writer, not our crash residue) must still
        refuse — resuming over it would silently drop that commit."""
        t = _mk(spark, tmp_path)
        _stage_full(t, spark)
        extra = _df(spark, [("r9", "z.py", "c03", 9, "py", "z")])
        touched = sorted(r[0] for r in extra.select("_bucket").distinct().collect())
        t.commit_buckets(extra, touched, {b: "c03:0000000001" for b in touched})
        with pytest.raises(ValueError, match="re-stage"):
            t.publish_wap("audit-1")
        assert t.wap_ids() == ["audit-1"]  # stage survives for re-audit
