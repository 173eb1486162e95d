"""Lake maintenance (expire_snapshots / vacuum) and dead-letter retry.

Reference parity tier: the reference library has no storage layer; these
pin the engine-side operational loops a real deployment needs — snapshot
GC (Iceberg expire_snapshots/remove_orphan_files semantics) and
"fix the spec, drain the dead-letter backlog" reprocessing.
"""

import os

import pyspark.sql.functions as F
import pytest

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import CANONICAL_COLUMNS, FIELD_SPECS_V1, default_registry
from filters_spark.engine.evolution import SpecRegistry, VersionSpec
from filters_spark.lake.table import LakeTable
from filters_spark.sources.datagen import gen_events

EVENT_DDL = (
    "commit string, event_seq long, op string, repo string, path string, "
    "lang string, content string, schema_version int"
)


def _rows(df):
    if df is None:
        return []
    cols = ["repo", "path", "commit", "event_seq", "lang", "content"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestExpireVacuum:
    @pytest.fixture(scope="class")
    def table(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("maint") / "lake")
        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=4)
        eng = CDCEngine(spark, t, default_registry())
        p = str(tmp_path_factory.mktemp("maint_ev") / "events.parquet")
        gen_events(spark, n_events=3000, n_repos=10, n_paths=100, seed=3).write.parquet(p)
        eng.replay(spark.read.parquet(p), num_batches=3)
        return t

    def test_expire_keeps_current_and_drops_old(self, table):
        ids = table.snapshots()
        assert len(ids) >= 4  # create + 3 commits
        expired = table.expire_snapshots(keep_last=1)
        assert expired == ids[:-1]
        assert table.snapshots() == [ids[-1]]
        # time travel to an expired snapshot is gone
        with pytest.raises(Exception):
            table.snapshot(expired[0])

    def test_vacuum_deletes_only_orphans(self, table):
        before = _rows(table.read())
        # default retention window protects freshly-written files (they
        # could belong to an in-flight commit) — nothing is deletable yet
        assert table.vacuum(dry_run=True) == []
        orphans = table.vacuum(dry_run=True, min_age_seconds=0)
        assert orphans, "CoW rewrites must leave orphan files after expiry"
        live = table.live_files()
        assert not set(orphans) & live
        deleted = table.vacuum(min_age_seconds=0)
        assert sorted(deleted) == sorted(orphans)
        # table unchanged, and a second vacuum finds nothing
        assert _rows(table.read()) == before
        assert table.vacuum(dry_run=True, min_age_seconds=0) == []

    def test_vacuum_with_respelled_root_sees_live_files(self, spark, tmp_path):
        # manifests record the committing handle's root spelling; a
        # handle opened with a different spelling (relative segments,
        # './', symlinks) must still recognize live files — otherwise
        # vacuum deletes live table data
        root = str(tmp_path / "lake3")
        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry())
        ev = spark.createDataFrame(
            [("%012x" % 1, 0, "U", "r1", "a.py", "py", "v1", 1)], EVENT_DDL
        )
        eng.apply_batch(ev)
        before = _rows(t.read())
        respelled = os.path.join(str(tmp_path), ".", "lake3", "")
        t2 = LakeTable(spark, respelled)
        assert t2.vacuum(dry_run=True, min_age_seconds=0) == []
        t2.vacuum(min_age_seconds=0)  # must be a no-op
        assert _rows(t.read()) == before

    def test_vacuum_respects_retained_history(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lake2"), ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry())
        ev = spark.createDataFrame(
            [("%012x" % c, 0, "U", "r1", "a.py", "py", f"v{c}", 1) for c in (1, 2)],
            EVENT_DDL,
        )
        eng.apply_batch(ev.filter(F.col("commit") == "%012x" % 1))
        eng.apply_batch(ev.filter(F.col("commit") == "%012x" % 2))
        ids = t.snapshots()
        t.expire_snapshots(keep_last=2)  # keep the last two commits
        t.vacuum(min_age_seconds=0)
        old = _rows(t.read(snapshot_id=ids[-2]))  # older RETAINED snapshot
        assert old and old[0][5] == "v1"
        assert _rows(t.read())[0][5] == "v2"

    def test_vacuum_sweeps_orphan_manifests(self, spark, tmp_path):
        # manifests are written BEFORE the create-exclusive snapshot
        # header, so a commit-race loser / crash orphans manifest files
        # no header references; vacuum must GC them (with the min-age
        # guard) without touching referenced manifests
        t = LakeTable.create(spark, str(tmp_path / "lakem"), ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry())
        eng.apply_batch(spark.createDataFrame(
            [("%012x" % 1, 0, "U", "r1", "a.py", "py", "v1", 1)], EVENT_DDL
        ))
        before = _rows(t.read())
        # simulate the crashed-commit leftover
        orphan = os.path.join(t.meta_dir, "manifest-deadbeefdeadbeefdead.json")
        t.io.write_text_atomic(orphan, '{"files": ["data/snap-99/x.parquet"]}')
        # young orphan survives the retention window
        assert orphan not in t.vacuum(dry_run=True)
        found = t.vacuum(dry_run=True, min_age_seconds=0)
        assert orphan in found
        t.vacuum(min_age_seconds=0)
        assert not t.io.exists(orphan)
        # referenced manifests survived; table reads unchanged
        assert _rows(t.read()) == before
        assert t.vacuum(dry_run=True, min_age_seconds=0) == []


class TestManifestScaling:
    """Format-2 metadata: snapshot header = O(buckets) refs; per-bucket
    file lists live in content-addressed manifest files, written only
    for buckets a commit touches (Iceberg manifest-list design)."""

    DDL = (
        "repo string, path string, commit string, event_seq long, "
        "lang string, content string, content_sha string, _bucket int"
    )

    def _row(self, b, c, content="c"):
        return (f"r{b}", "a.py", "%012x" % c, 0, "py", content, f"sha{content}", b)

    def test_commit_metadata_is_o_touched_buckets(self, spark, tmp_path):
        import json as js

        t = LakeTable.create(spark, str(tmp_path / "lakeM"), ["repo", "path"], num_buckets=8)
        seed = spark.createDataFrame([self._row(b, 1) for b in range(8)], self.DDL)
        t.commit_buckets(seed, list(range(8)), {b: "000000000001:0" for b in range(8)})
        before = {f for f in t.io.listdir(t.meta_dir) if f.startswith("manifest-")}
        one = spark.createDataFrame([self._row(0, 2, "c2")], self.DDL)
        t.commit_buckets(one, [0], {0: "000000000002:0"})
        after = {f for f in t.io.listdir(t.meta_dir) if f.startswith("manifest-")}
        # exactly ONE new manifest: the touched bucket's
        assert len(after - before) == 1
        # the header carries refs only — no data-file path ever again
        raw = t._raw_snapshot()
        assert ".parquet" not in js.dumps(raw)
        # untouched buckets reference the parent's manifests BY NAME
        parent = t._raw_snapshot(raw["parent_id"])
        assert all(raw["buckets"][str(b)] == parent["buckets"][str(b)] for b in range(1, 8))
        assert raw["buckets"]["0"] != parent["buckets"]["0"]
        # reconstituted reads unchanged
        assert t.read().count() == 8
        # a fresh handle (cold manifest cache) resolves identically
        t2 = LakeTable.load(spark, t.root)
        assert t2.current()["buckets"] == t.current()["buckets"]

    def test_delta_commit_writes_one_manifest(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lakeD"), ["repo", "path"], num_buckets=8)
        seed = spark.createDataFrame([self._row(b, 1) for b in range(8)], self.DDL)
        t.commit_buckets(seed, list(range(8)), {b: "000000000001:0" for b in range(8)})
        before = {f for f in t.io.listdir(t.meta_dir) if f.startswith("manifest-")}
        delta = spark.createDataFrame(
            [("r3", "a.py", "%012x" % 2, 0, "py", "c2", "U", 3)],
            "repo string, path string, commit string, event_seq long, "
            "lang string, content string, op string, _bucket int",
        )
        t.commit_deltas(delta, [3], {3: "000000000002:0"})
        after = {f for f in t.io.listdir(t.meta_dir) if f.startswith("manifest-")}
        assert len(after - before) == 1  # only bucket 3's delta manifest

    def test_optimistic_commit_conflict_loser_raises(self, spark, tmp_path):
        # Iceberg-style optimistic concurrency: the snapshot header is
        # create-exclusive, so of two writers racing to commit the same
        # snapshot id, exactly one wins and the loser RAISES (its data
        # files become vacuum-able orphans; no torn metadata)
        t = LakeTable.create(spark, str(tmp_path / "lakeC"), ["repo", "path"], num_buckets=2)
        seed = spark.createDataFrame([self._row(b, 1) for b in range(2)], self.DDL)
        t.commit_buckets(seed, [0, 1], {b: "000000000001:0" for b in range(2)})
        winner = t.current()
        with pytest.raises(Exception):
            t._write_snapshot(dict(winner))  # same snapshot_id -> loser
        # table metadata unchanged by the failed commit
        assert t.current()["snapshot_id"] == winner["snapshot_id"]
        assert _rows(t.read()) == _rows(t.read(winner["snapshot_id"]))

    def test_expire_gc_drops_only_unreferenced_manifests(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lakeG"), ["repo", "path"], num_buckets=4)
        seed = spark.createDataFrame([self._row(b, 1) for b in range(4)], self.DDL)
        t.commit_buckets(seed, list(range(4)), {b: "000000000001:0" for b in range(4)})
        for c in (2, 3):
            one = spark.createDataFrame([self._row(0, c, f"c{c}")], self.DDL)
            t.commit_buckets(one, [0], {0: "%012x:0" % c})
        rows_before = sorted(tuple(r) for r in t.read().collect())
        t.expire_snapshots(keep_last=1)
        # shared manifests (buckets 1-3, referenced by the retained
        # snapshot) survive; only bucket 0's superseded manifests die
        assert sorted(tuple(r) for r in t.read().collect()) == rows_before
        live_refs = set(t._raw_snapshot()["buckets"].values())
        on_disk = {f for f in t.io.listdir(t.meta_dir) if f.startswith("manifest-")}
        assert live_refs <= on_disk
        assert on_disk == live_refs  # nothing unreferenced left


def _fixed_registry() -> SpecRegistry:
    """The 'spec fix': lang choice now admits 'klingon'."""
    fixed = dict(FIELD_SPECS_V1)
    fixed["lang"] = {"chain": ["strip", "ascii_lower", ("choice", {"choices": [
        "py", "js", "go", "rs", "java", "c", "cpp", "rb", "klingon"]})]}
    reg = SpecRegistry(CANONICAL_COLUMNS)
    reg.register(VersionSpec(1, fixed))
    return reg


class TestRetryDeadLetters:
    def test_retry_applies_fixed_events_and_respects_lww(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lake"), ["repo", "path"], num_buckets=4)
        eng = CDCEngine(spark, t, default_registry())
        events = spark.createDataFrame(
            [
                # dead (lang not in choices), no later write -> must apply on retry
                ("%012x" % 1, 1, "U", "r1", "solo.py", "klingon", "repaired wins", 1),
                # dead, but a NEWER clean write follows -> retry must NOT overwrite
                ("%012x" % 1, 2, "U", "r1", "raced.py", "klingon", "stale loser", 1),
                ("%012x" % 2, 1, "U", "r1", "raced.py", "py", "newer applied", 1),
                # clean control row
                ("%012x" % 2, 2, "U", "r2", "ok.py", "py", "fine", 1),
            ],
            EVENT_DDL,
        )
        m = eng.apply_batch(events)
        assert m["dead_lettered"] == 2 and m["applied"] == 2
        assert eng.dead_letters().count() == 2

        # retry WITHOUT a fix: everything stays dead, table unchanged
        state0 = _rows(t.read())
        m0 = eng.retry_dead_letters()
        assert m0["applied"] == 0 and m0["dead_lettered"] == 2
        assert _rows(t.read()) == state0

        # fix the spec, retry again
        eng2 = CDCEngine(spark, t, _fixed_registry())
        m1 = eng2.retry_dead_letters()
        assert m1["applied"] == 2 and m1["dead_lettered"] == 0
        rows = {(r[0], r[1]): r for r in _rows(t.read())}
        assert rows[("r1", "solo.py")][5] == "repaired wins"
        assert rows[("r1", "raced.py")][5] == "newer applied"  # LWW safety
        # backlog drained; a further retry is a no-op
        assert eng2.dead_letters() is None or eng2.dead_letters().count() == 0
        m2 = eng2.retry_dead_letters()
        assert m2["applied"] == 0 and m2["dead_lettered"] == 0

    def test_retry_is_idempotent_when_rerun(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lake"), ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry())
        ev = spark.createDataFrame(
            [("%012x" % 1, 1, "U", "r1", "a.py", "klingon", "body", 1)], EVENT_DDL
        )
        eng.apply_batch(ev)
        eng2 = CDCEngine(spark, t, _fixed_registry())
        assert eng2.retry_dead_letters()["applied"] == 1
        state = _rows(t.read())
        # simulate the crash-between-commit-and-cleanup path: re-applying
        # the same event must change nothing — the retry advanced the
        # bucket watermark, so the replay is skipped outright
        m = eng2.apply_batch(ev)
        assert m["applied"] == 0 and m["skipped_replays"] == 1
        assert _rows(t.read()) == state


class TestReviewRegressions:
    """Pins for the round-2 code-review findings."""

    def test_empty_registry_rejected(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lk"), ["repo", "path"], num_buckets=2)
        with pytest.raises(ValueError, match="no registered schema versions"):
            CDCEngine(spark, t, SpecRegistry(CANONICAL_COLUMNS))

    def test_version_hint_self_heals(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lk"), ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry())
        eng.apply_batch(spark.createDataFrame(
            [("%012x" % 1, 0, "U", "r", "a.py", "py", "x", 1)], EVENT_DDL))
        sid = t.current_snapshot_id()
        os.remove(os.path.join(t.meta_dir, "version-hint.text"))
        assert t.current_snapshot_id() == sid  # max manifest id wins
        assert t.read().count() == 1

    def test_changes_raises_on_expired_range(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lk"), ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry(), write_mode="mor")
        for c in (1, 2, 3):
            eng.apply_batch(spark.createDataFrame(
                [("%012x" % c, 0, "U", "r", "a.py", "py", f"v{c}", 1)], EVENT_DDL))
        t.expire_snapshots(keep_last=1)
        with pytest.raises(ValueError, match="expired"):
            t.changes(0)
        assert t.changes(t.current_snapshot_id() - 1).count() == 1  # intact tail

    def test_file_uri_root_routes_to_hadoop_io(self, spark, tmp_path):
        from filters_spark.lake.fileio import HadoopFileIO

        root = "file://" + str(tmp_path / "lk")
        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=2)
        assert isinstance(t.io, HadoopFileIO)
        eng = CDCEngine(spark, t, default_registry())
        m = eng.apply_batch(spark.createDataFrame(
            [("%012x" % 1, 0, "U", "r", "a.py", "py", "x", 1)], EVENT_DDL))
        assert m["applied"] == 1 and t.read().count() == 1
        # and NO stray literal 'file:...' directory appeared under cwd
        assert not os.path.exists("file:")


class TestRescale:
    def test_rescale_preserves_state_and_exactly_once(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "lk"), ["repo", "path"],
                             num_buckets=4, path_salt=4)
        eng = CDCEngine(spark, t, default_registry(), write_mode="mor")
        p = str(tmp_path / "ev.parquet")
        gen_events(spark, n_events=2000, n_repos=10, n_paths=80,
                   delete_frac=0.2, seed=9).write.parquet(p)
        ev = spark.read.parquet(p)
        eng.replay(ev, num_batches=2)
        before = _rows(t.read())
        pre_sid = t.current_snapshot_id()

        snap = t.rescale(num_buckets=16, path_salt=8)
        assert snap["num_buckets"] == 16 and snap["path_salt"] == 8
        assert not snap["deltas"]  # MoR deltas folded into the new layout
        assert _rows(t.read()) == before                    # state identical
        assert _rows(t.read(snapshot_id=pre_sid)) == before  # old layout readable
        assert t.changes(pre_sid) is None  # reorganization: no logical change

        # exactly-once survives the layout change: full replay = all skipped
        m = eng.replay(ev, num_batches=1)
        assert sum(x["applied"] for x in m) == 0
        assert sum(x["skipped_replays"] for x in m) > 0
        assert _rows(t.read()) == before

        # and genuinely new events (later commits) land in the new layout
        p2 = str(tmp_path / "ev2.parquet")
        gen_events(spark, n_events=500, n_repos=10, n_paths=80, seed=9,
                   start_commit=100).write.parquet(p2)
        m2 = eng.replay(spark.read.parquet(p2), num_batches=1)
        assert sum(x["applied"] for x in m2) > 0
        # every data row hashes into the new bucket space
        from filters_spark.lake.table import bucket_expr
        mis = t.read().withColumn(
            "_b2", bucket_expr(F.col("repo"), F.col("path"), 16, 8)
        ).filter(F.col("_bucket") != F.col("_b2")).count() if "_bucket" in t.read().columns else 0
        assert mis == 0


class TestSnapshotDiff:
    """snapshot_diff (lake/table.py): the state-comparison changefeed
    for tables whose history cannot provide one (CoW overwrites)."""

    def _mk(self, spark, root):
        from filters_spark.lake.table import LakeTable, bucket_expr
        import pyspark.sql.functions as F

        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=4)
        ddl = ("repo string, path string, commit string, event_seq long, "
               "lang string, content string, op string")

        def commit(rows, wm):
            df = spark.createDataFrame(rows, ddl).select(
                "*", bucket_expr(F.col("repo"), F.col("path"), 4, 16).alias("_bucket")
            )
            touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
            t.commit_deltas(df, touched, {b: f"{wm:012x}:0000000000" for b in touched})

        commit(
            [
                ("r1", "p1", f"{1:012x}", 1, "go", "aaa", "I"),
                ("r1", "p2", f"{2:012x}", 2, "py", "bbb", "I"),
                ("r1", "p3", f"{3:012x}", 3, "py", "ccc", "I"),
            ],
            3,
        )
        commit(
            [
                ("r1", "p2", f"{10:012x}", 10, "py", "bbb2", "U"),  # content change
                ("r1", "p3", f"{11:012x}", 11, None, None, "D"),     # delete
                ("r1", "p4", f"{12:012x}", 12, "rs", "ddd", "I"),    # insert
                ("r1", "p1", f"{13:012x}", 13, "go", "aaa", "U"),    # no-op rewrite
            ],
            13,
        )
        return t

    def test_iud_classification_and_noop_suppression(self, spark, tmp_path):
        from filters_spark.lake.table import snapshot_diff

        t = self._mk(spark, str(tmp_path / "sd"))
        got = {
            (r.repo, r.path): (r.op, r.lang, r.content)
            for r in snapshot_diff(t, 1, 2).collect()
        }
        # p1's rewrite carried an identical payload -> NOT in the diff
        assert got == {
            ("r1", "p2"): ("U", "py", "bbb2"),
            ("r1", "p3"): ("D", None, None),
            ("r1", "p4"): ("I", "rs", "ddd"),
        }

    def test_same_snapshot_diff_is_empty(self, spark, tmp_path):
        from filters_spark.lake.table import snapshot_diff

        t = self._mk(spark, str(tmp_path / "sd2"))
        assert snapshot_diff(t, 2, 2).count() == 0


class TestTags:
    """Named snapshot refs (Iceberg tag semantics): stable names for
    snapshots, protected from expire_snapshots."""

    def _table(self, spark, root):
        from filters_spark.lake.table import LakeTable, bucket_expr
        import pyspark.sql.functions as F

        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=4)
        ddl = ("repo string, path string, commit string, event_seq long, "
               "lang string, content string, op string")
        for wm in (3, 7):
            df = spark.createDataFrame(
                [("r1", f"p{wm}", f"{wm:012x}", wm, "go", f"c{wm}", "I")], ddl
            ).select(
                "*", bucket_expr(F.col("repo"), F.col("path"), 4, 16).alias("_bucket")
            )
            touched = [r[0] for r in df.select("_bucket").distinct().collect()]
            t.commit_deltas(df, touched, {b: f"{wm:012x}:0000000000" for b in touched})
        return t

    def test_create_resolve_drop(self, spark, tmp_path):
        t = self._table(spark, str(tmp_path / "t1"))
        sid = t.create_tag("rel-1", 1)
        assert sid == 1 and t.tags() == {"rel-1": 1}
        assert t.resolve_tag("rel-1") == 1
        t.drop_tag("rel-1")
        assert t.tags() == {}
        with pytest.raises(ValueError):
            t.resolve_tag("rel-1")

    def test_tagged_snapshot_survives_expiry(self, spark, tmp_path):
        t = self._table(spark, str(tmp_path / "t2"))
        t.create_tag("pin", 1)
        expired = t.expire_snapshots(keep_last=1)
        assert 1 not in expired
        # readable through the tag after expiry of everything untagged
        assert t.read(t.resolve_tag("pin")) is not None
        # dropping the tag releases it for the next expiry
        t.drop_tag("pin")
        assert 1 in t.expire_snapshots(keep_last=1)

    def test_validation(self, spark, tmp_path):
        t = self._table(spark, str(tmp_path / "t3"))
        t.create_tag("a")
        with pytest.raises(ValueError):
            t.create_tag("a")  # duplicate
        with pytest.raises(ValueError):
            t.create_tag("bad/name")
        with pytest.raises(ValueError):
            t.create_tag("ghost", 99)  # nonexistent snapshot


class TestMaintainOrchestrator:
    def test_maintain_runs_full_cycle(self, spark, tmp_path_factory):
        """maintain(): compact ripe MoR buckets, pack small files,
        expire old snapshots, vacuum orphans — one idempotent call."""
        import pyspark.sql.functions as F
        from filters_spark.lake.table import LakeTable, bucket_expr

        root = str(tmp_path_factory.mktemp("morch") / "lake")
        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=2)
        bkt = bucket_expr(F.col("repo"), F.col("path"), 2, 16).cast("int").alias("_bucket")
        for i in range(3):  # build a delta backlog + snapshot history
            d = spark.createDataFrame(
                [(f"r{j%4}", f"p{j}", f"c{i:02d}", i * 100 + j, "py", f"v{i}-{j}", "U")
                 for j in range(40)],
                "repo string, path string, commit string, event_seq long, "
                "lang string, content string, op string",
            ).select("*", bkt).repartition(4)
            touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
            t.commit_deltas(d, touched, {b: f"c{i:02d}:0000000001" for b in touched})
        before = sorted(tuple(r) for r in t.read().collect())

        dry = t.maintain(max_delta_files=1, keep_last=1, min_age_seconds=0,
                         dry_run=True)
        assert dry["compacted_buckets"] and dry["expired_snapshots"] == []
        assert t.current().get("deltas")  # dry run changed nothing

        rep = t.maintain(max_delta_files=1, keep_last=1, min_age_seconds=0)
        assert rep["compacted_buckets"]
        assert rep["expired_snapshots"]
        assert rep["vacuumed"]
        assert not t.current()["deltas"]  # backlog folded
        assert sorted(tuple(r) for r in t.read().collect()) == before

        # idempotent steady state: second run finds nothing to do
        rep2 = t.maintain(max_delta_files=1, keep_last=1, min_age_seconds=0)
        assert rep2["compacted_buckets"] == [] and rep2["rewrote"] is None
