"""Branch refs (lake/table.py create_branch/commit_*_to/fast_forward):
isolation from main, ancestry-correct changefeeds, expiry protection,
fast-forward publish, self-heal and concurrency guards."""

import os

import pytest
import pyspark.sql.functions as F

from filters_spark.lake.table import LakeTable, bucket_expr

PAY = ["repo", "path", "commit", "event_seq", "lang", "content"]
SRC_DDL = ("repo string, path string, `commit` string, event_seq long, "
           "lang string, content string")


def _bucketed(df, n=4):
    return df.select(
        "*",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
        bucket_expr(F.col("repo"), F.col("path"), n, 16).cast("int").alias("_bucket"),
    )


def _delta_bucketed(spark, rows, n=4):
    df = spark.createDataFrame(rows, SRC_DDL + ", op string")
    return df.select(
        "*", bucket_expr(F.col("repo"), F.col("path"), n, 16).cast("int").alias("_bucket")
    )


def _mk(spark, root, rows):
    t = LakeTable.create(spark, str(root), ["repo", "path"], num_buckets=4)
    df = _bucketed(spark.createDataFrame(rows, SRC_DDL))
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {})
    return t


BASE = [
    ("r1", "a.py", "000000000001", 1, "py", "alpha"),
    ("r2", "b.go", "000000000001", 2, "go", "beta"),
]


def _contents(t, sid=None):
    df = t.read(sid)
    return {} if df is None else {
        (r["repo"], r["path"]): r["content"] for r in df.collect()
    }


def test_branch_commit_isolated_from_main(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    main_head = t.current_snapshot_id()
    t.create_branch("audit")
    df = _bucketed(spark.createDataFrame(
        [("r1", "a.py", "000000000002", 1, "py", "alpha-v2")], SRC_DDL))
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    snap = t.commit_buckets_to("audit", df, touched, {})
    # main untouched; branch sees the new row
    assert t.current_snapshot_id() == main_head
    assert _contents(t)[("r1", "a.py")] == "alpha"
    assert _contents(t, t.resolve_ref("audit"))[("r1", "a.py")] == "alpha-v2"
    assert snap["ref"] == "audit" and snap["parent_id"] == main_head
    # beta's bucket carried over by reference onto the branch
    assert _contents(t, t.resolve_ref("audit"))[("r2", "b.go")] == "beta"


def test_branch_mor_commits_and_changefeed(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    fork = t.current_snapshot_id()
    t.create_branch("dev")
    d1 = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "v2", "U")])
    d2 = _delta_bucketed(spark, [("r2", "b.go", "000000000003", 1, None, None, "D")])
    for d in (d1, d2):
        touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas_to("dev", d, touched, {})
    head = t.resolve_ref("dev")
    # branch read folds both deltas; main sees neither
    bc = _contents(t, head)
    assert bc[("r1", "a.py")] == "v2" and ("r2", "b.go") not in bc
    assert _contents(t) == {("r1", "a.py"): "alpha", ("r2", "b.go"): "beta"}
    # ancestry changefeed over the branch segment
    ch = t.changes(fork, head)
    ops = {(r["repo"], r["path"]): r["op"] for r in ch.collect()}
    assert ops == {("r1", "a.py"): "U", ("r2", "b.go"): "D"}


def test_main_changes_skip_branch_snapshots(spark, tmp_path):
    """A branch commit interleaves a snapshot id into the global
    sequence; main's changefeed must walk ancestry, never numeric
    ranges, or it would ingest the branch's rows."""
    t = _mk(spark, tmp_path / "l", BASE)
    since = t.current_snapshot_id()
    t.create_branch("side")
    bd = _delta_bucketed(spark, [("r9", "x.c", "000000000002", 1, "c", "X", "U")])
    t.commit_deltas_to(
        "side", bd, sorted(r[0] for r in bd.select("_bucket").distinct().collect()), {})
    md = _delta_bucketed(spark, [("r1", "a.py", "000000000003", 1, "py", "m3", "U")])
    t.commit_deltas(
        md, sorted(r[0] for r in md.select("_bucket").distinct().collect()), {})
    rows = t.changes(since).collect()
    assert {(r["repo"], r["path"]) for r in rows} == {("r1", "a.py")}
    # and a range that crosses chains raises instead of mixing them
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(t.resolve_ref("side"), t.current_snapshot_id())


def test_fast_forward_publishes_branch(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    fork = t.current_snapshot_id()
    t.create_branch("backfill")
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "ff", "U")])
    t.commit_deltas_to(
        "backfill", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    head = t.resolve_ref("backfill")
    snap = t.fast_forward("backfill")
    # published via an ADOPTION commit: a new main header whose parent
    # is the branch head, serialized by the create-exclusive protocol
    assert snap["operation"] == "fast-forward"
    assert snap["parent_id"] == head
    assert t.current_snapshot_id() == snap["snapshot_id"] > head
    assert "ref" not in t._raw_snapshot(snap["snapshot_id"])
    assert _contents(t)[("r1", "a.py")] == "ff"
    # main's changefeed now includes the branch segment (the adoption
    # itself carries no logical change)
    assert t.changes(fork).count() == 1
    # and main history flows through the adopted branch headers
    assert t.snapshot_as_of(snap["timestamp_ms"]) == snap["snapshot_id"]


def test_fast_forward_refuses_diverged_main(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_branch("slow")
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "b", "U")])
    t.commit_deltas_to(
        "slow", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    m = _delta_bucketed(spark, [("r2", "b.go", "000000000003", 1, "go", "m", "U")])
    t.commit_deltas(
        m, sorted(r[0] for r in m.select("_bucket").distinct().collect()), {})
    with pytest.raises(ValueError, match="not fast-forwardable"):
        t.fast_forward("slow")


def test_expiry_protects_live_branch_then_releases_dropped(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_branch("keepme")
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "kb", "U")])
    t.commit_deltas_to(
        "keepme", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    bhead = t.resolve_ref("keepme")
    # pile main commits on top, then expire hard
    for c in (3, 4, 5):
        md = _delta_bucketed(spark, [("r2", "b.go", "%012x" % c, 1, "go", f"m{c}", "U")])
        t.commit_deltas(
            md, sorted(r[0] for r in md.select("_bucket").distinct().collect()), {})
    expired = t.expire_snapshots(keep_last=1)
    assert bhead not in expired
    assert _contents(t, bhead)[("r1", "a.py")] == "kb"  # branch still readable
    t.drop_branch("keepme")
    expired2 = t.expire_snapshots(keep_last=1)
    assert bhead in expired2  # protection released with the ref


def test_vacuum_keeps_branch_data(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_branch("dev")
    df = _bucketed(spark.createDataFrame(
        [("r1", "a.py", "000000000002", 1, "py", "VV")], SRC_DDL))
    t.commit_buckets_to(
        "dev", df, sorted(r[0] for r in df.select("_bucket").distinct().collect()), {})
    assert t.vacuum(dry_run=True, min_age_seconds=0) == []
    assert _contents(t, t.resolve_ref("dev"))[("r1", "a.py")] == "VV"


def test_branch_single_writer_guard(spark, tmp_path):
    """A racer moving the ref between this writer's basis read and its
    ref update must be refused (never silent last-writer-wins)."""
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_branch("x")
    head = t.resolve_ref("x")
    basis = t._next_delta_snapshot({}, {}, prev=t.snapshot(head))
    # the racer lands first
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "z", "U")])
    touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
    t.commit_deltas_to("x", d, touched, {})
    with pytest.raises(ValueError, match="stale head"):
        t._commit_to_branch("x", head, basis)
    # the refused attempt left the winner's head in place
    assert t.resolve_ref("x") != head
    rows = t.read(t.resolve_ref("x")).filter(F.col("content") == "z").count()
    assert rows == 1


def test_self_heal_skips_branch_heads(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    main_head = t.current_snapshot_id()
    t.create_branch("b")
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "bb", "U")])
    t.commit_deltas_to(
        "b", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    os.remove(os.path.join(t.meta_dir, "version-hint.text"))
    t2 = LakeTable(spark, t.root)
    assert t2.current_snapshot_id() == main_head  # NOT the branch head


def test_ref_namespace_shared_with_tags(spark, tmp_path):
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("v1")
    with pytest.raises(ValueError, match="no such branch"):
        t.drop_branch("v1")
    t.create_branch("dev")
    with pytest.raises(ValueError, match="no such tag"):
        t.drop_tag("dev")
    assert t.resolve_ref("v1") == t.resolve_tag("v1")
    assert t.resolve_ref("dev") == t.branches()["dev"]


def test_concurrent_commits_to_two_branches_both_survive(spark, tmp_path):
    """Per-ref files: advancing branch X can never lose branch Y's
    advance to a shared read-modify-write (each ref is its own file)."""
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_branch("x")
    t.create_branch("y")
    hx, hy = t.resolve_ref("x"), t.resolve_ref("y")
    # interleave the two writers' read-basis and commit phases
    sx = t._next_delta_snapshot({}, {}, prev=t.snapshot(hx))
    sy = t._next_delta_snapshot({}, {}, prev=t.snapshot(hy))
    cx = t._commit_to_branch("x", hx, sx)
    cy = t._commit_to_branch("y", hy, sy)
    assert t.resolve_ref("x") == cx["snapshot_id"]
    assert t.resolve_ref("y") == cy["snapshot_id"]


def test_fast_forward_serializes_with_main_commits(spark, tmp_path):
    """The adoption commit goes through the create-exclusive header
    protocol, so a main commit racing the fast-forward cannot make
    either side's data silently vanish."""
    t = _mk(spark, tmp_path / "l", BASE)
    fork = t.current_snapshot_id()
    t.create_branch("b")
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "B", "U")])
    t.commit_deltas_to(
        "b", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    t.fast_forward("b")
    # a main commit AFTER the fast-forward builds on the adoption
    m = _delta_bucketed(spark, [("r2", "b.go", "000000000003", 1, "go", "M", "U")])
    t.commit_deltas(
        m, sorted(r[0] for r in m.select("_bucket").distinct().collect()), {})
    st = _contents(t)
    assert st[("r1", "a.py")] == "B" and st[("r2", "b.go")] == "M"
    assert t.changes(fork).count() == 2  # both segments in the feed


class TestBranchIngest:
    """BranchTable (lake/branch.py): the WHOLE CDC engine runs against
    a branch view unchanged — the Iceberg audit-branch pattern at
    stream granularity."""

    def _engines(self, spark, tmp_path, write_mode):
        from filters_spark.engine.cdc import CDCEngine
        from filters_spark.engine.defaults import default_registry
        from filters_spark.lake.branch import BranchTable

        from tests.test_cdc_engine import events_df

        ev = events_df(spark, n_events=1200, dirty_frac=0.08)
        main_t = LakeTable.create(
            spark, str(tmp_path / "direct"), ["repo", "path"], num_buckets=4)
        direct = CDCEngine(spark, main_t, default_registry(),
                           write_mode=write_mode)

        t = LakeTable.create(
            spark, str(tmp_path / "branched"), ["repo", "path"], num_buckets=4)
        t.create_branch("ingest")
        via_branch = CDCEngine(spark, BranchTable(t, "ingest"),
                               default_registry(), write_mode=write_mode)
        return ev, direct, via_branch, t

    @staticmethod
    def _shas(df):
        return sorted((r["repo"], r["path"], r["content_sha"])
                      for r in df.select("repo", "path", "content_sha").collect())

    def test_replay_onto_branch_then_fast_forward(self, spark, tmp_path):
        ev, direct, via_branch, t = self._engines(spark, tmp_path, "cow")
        direct.replay(ev, num_batches=2)
        expected = self._shas(direct.table.read())

        main_head = t.current_snapshot_id()
        via_branch.replay(ev, num_batches=2)
        # main never saw a row; the branch holds the full replay
        assert t.current_snapshot_id() == main_head
        assert t.read() is None or self._shas(t.read()) == []
        assert self._shas(via_branch.table.read()) == expected

        # exactly-once is scoped to the branch: full re-replay no-ops
        m = via_branch.replay(ev, num_batches=1)
        assert sum(x["applied"] for x in m) == 0

        t.fast_forward("ingest")
        assert self._shas(t.read()) == expected  # published to main

    def test_mor_replay_and_compaction_on_branch(self, spark, tmp_path):
        ev, direct, via_branch, t = self._engines(spark, tmp_path, "mor")
        direct.replay(ev, num_batches=3)
        expected = self._shas(direct.table.read())
        via_branch.replay(ev, num_batches=3)
        assert self._shas(via_branch.table.read()) == expected
        # compaction through the branch view stays on the branch
        via_branch.table.compact()
        assert self._shas(via_branch.table.read()) == expected
        main_head = t.current_snapshot_id()
        assert not any(t.snapshot(main_head)["buckets"].values())

    def test_engine_audit_gate_on_branch(self, spark, tmp_path):
        from filters_spark.engine.cdc import CDCEngine
        from filters_spark.engine.defaults import default_registry
        from filters_spark.lake.branch import BranchTable

        from tests.test_cdc_engine import events_df

        ev = events_df(spark, n_events=400, dirty_frac=0.0)
        t = LakeTable.create(spark, str(tmp_path / "l"), ["repo", "path"],
                             num_buckets=4)
        t.create_branch("audit")
        bt = BranchTable(t, "audit")
        eng = CDCEngine(spark, bt, default_registry())
        head = bt.current_snapshot_id()
        # rejecting audit leaves the BRANCH head unmoved too
        eng.apply_batch(ev, audit_fn=lambda table, wap_id: False)
        assert bt.current_snapshot_id() == head
        # accepting publishes onto the branch, main still dark
        m = eng.apply_batch(ev, audit_fn=lambda table, wap_id: True)
        assert m["applied"] > 0
        assert bt.current_snapshot_id() != head
        assert t.read() is None

    def test_branch_view_blocks_table_wide_ops(self, spark, tmp_path):
        from filters_spark.lake.branch import BranchTable

        t = _mk(spark, tmp_path / "l", BASE)
        t.create_branch("b")
        bt = BranchTable(t, "b")
        for op in ("expire_snapshots", "vacuum", "maintain", "rescale",
                   "rollback", "fast_forward", "rewrite_data_files",
                   "rewrite_zorder", "create_tag", "create_branch",
                   "drop_branch", "drop_tag"):
            with pytest.raises(RuntimeError, match="main LakeTable handle"):
                getattr(bt, op)()
        with pytest.raises(ValueError, match="no such branch"):
            BranchTable(t, "nope")


def test_fast_forward_lifecycle_continues(spark, tmp_path):
    """Publish-and-keep-ingesting: after a fast_forward the ref points
    at the adoption, so later branch commits still fast-forward (the
    first implementation left the ref behind and dead-ended the branch
    after one publish); a repeat fast_forward with nothing new is a
    no-op."""
    t = _mk(spark, tmp_path / "l", BASE)
    t.create_branch("ing")

    def commit_to_branch(content, c):
        d = _delta_bucketed(spark, [("r1", "a.py", "%012x" % c, 1, "py", content, "U")])
        t.commit_deltas_to(
            "ing", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})

    commit_to_branch("v2", 2)
    s1 = t.fast_forward("ing")
    assert t.resolve_ref("ing") == s1["snapshot_id"]  # ref advanced
    assert t.fast_forward("ing")["snapshot_id"] == s1["snapshot_id"]  # no-op
    commit_to_branch("v3", 3)
    s2 = t.fast_forward("ing")  # second publish works
    assert s2["snapshot_id"] > s1["snapshot_id"]
    assert _contents(t)[("r1", "a.py")] == "v3"


def test_as_of_uses_publish_time_for_adopted_snapshots(spark, tmp_path):
    """An adopted branch snapshot became main-visible at the ADOPTION's
    commit time, not its own write time — as-of must never expose
    ingest data no main reader could see then."""
    import time as _time

    t = _mk(spark, tmp_path / "l", BASE)
    fork_sid = t.current_snapshot_id()
    t.create_branch("b")
    _time.sleep(0.02)
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "hidden", "U")])
    t.commit_deltas_to(
        "b", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    _time.sleep(0.02)
    between = int(_time.time() * 1000)
    _time.sleep(0.02)
    adoption = t.fast_forward("b")
    # between the branch write and the publish, main showed the fork
    assert t.snapshot_as_of(between) == fork_sid
    assert t.snapshot_as_of(adoption["timestamp_ms"]) == adoption["snapshot_id"]


def test_branch_view_as_of_resolves_branch_head(spark, tmp_path):
    """On a BranchTable view, the branch's OWN ref-marked snapshots
    became current-to-branch-readers at their commit time: as-of-now
    must resolve the branch head, not silently fall back to the fork
    (which would hide every branch ingest from time travel)."""
    import time as _time

    from filters_spark.lake.branch import BranchTable

    t = _mk(spark, tmp_path / "l", BASE)
    fork_sid = t.current_snapshot_id()
    t.create_branch("b")
    bt = BranchTable(t, "b")
    d = _delta_bucketed(spark, [("r1", "a.py", "000000000002", 1, "py", "bb", "U")])
    t.commit_deltas_to(
        "b", d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
    head = t.resolve_ref("b")
    now = int(_time.time() * 1000) + 1000
    assert bt.snapshot_as_of(now) == head
    # main's view is unchanged: the un-adopted branch stays invisible
    assert t.snapshot_as_of(now) == fork_sid
    # and pre-fork times resolve identically through either handle
    fork_ts = t._raw_snapshot(fork_sid)["timestamp_ms"]
    assert bt.snapshot_as_of(fork_ts) == t.snapshot_as_of(fork_ts) == fork_sid
