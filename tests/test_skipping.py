"""File-level data skipping (manifest min/max stats + sort clustering)
and snapshot rollback.

Reference parity tier: the reference library has no storage layer; these
pin the lake-side scan-pruning and restore semantics a 100-TB deployment
leans on — Iceberg-style data skipping (per-file column ranges recorded
at commit, range predicates skip non-overlapping files) and
metadata-only rollback.
"""

import pyspark.sql.functions as F
import pytest

from filters_spark.lake.table import LakeTable, bucket_expr

DDL = (
    "repo string, path string, commit string, event_seq long, "
    "lang string, content string, content_sha string"
)

DELTA_DDL = (
    "repo string, path string, commit string, event_seq long, "
    "lang string, content string, op string"
)


def _rows(df):
    if df is None:
        return []
    cols = ["repo", "path", "event_seq", "content"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _with_bucket(df, num_buckets):
    return df.withColumn(
        "_bucket",
        bucket_expr(F.col("repo"), F.col("path"), num_buckets, 16).cast("int"),
    )


class TestDataSkipping:
    @pytest.fixture(scope="class")
    def table(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("skip") / "lake")
        t = LakeTable.create(
            spark, root, ["repo", "path"], num_buckets=4,
            stats_cols=["event_seq"], sort_cols=["event_seq"],
        )
        rows = [
            (f"r{i % 7}", f"p{i % 251}.py", "%012x" % 1, i, "py", f"v{i}", f"s{i}")
            for i in range(2000)
        ]
        df = _with_bucket(spark.createDataFrame(rows, DDL), 4)
        # range-partition on the stats column so each write task holds a
        # contiguous event_seq slice -> many files per bucket with
        # DISJOINT ranges (the layout sort_cols clustering produces at
        # scale; here forced explicitly so the test has >1 file/bucket)
        df = df.repartitionByRange(8, "event_seq")
        t.commit_buckets(df, list(range(4)), {b: "000000000001:0" for b in range(4)})
        return t

    def test_manifests_carry_stats(self, table):
        import json, os

        with_stats = 0
        for name in table.io.listdir(table.meta_dir):
            if not name.startswith("manifest-"):
                continue
            body = json.loads(table.io.read_text(os.path.join(table.meta_dir, name)))
            for f, st in body.get("stats", {}).items():
                assert set(st) == {
                    "event_seq", "__rows", "__bytes", "__nulls:event_seq"
                }
                mn, mx = st["event_seq"]
                assert 0 <= mn <= mx < 2000
                assert st["__rows"] > 0
                with_stats += 1
        assert with_stats > 4, "expected multiple files per bucket with stats"

    def test_metadata_row_count(self, spark, table):
        assert table.metadata_row_count() == 2000
        assert table.metadata_row_count() == table.read().count()
        # survives a reload (counts come from manifest bodies)
        t2 = LakeTable.load(spark, table.root)
        assert t2.metadata_row_count() == 2000

    def test_range_read_prunes_files(self, table):
        rep = table.prune_report(("event_seq", 100, 200))
        assert rep["files_total"] >= 16  # 8 range tasks x 4 buckets (minus empties)
        assert rep["files_skipped"] > rep["files_total"] // 2
        assert rep["buckets_with_deltas"] == []
        # pruned read == unpruned read + filter, exactly
        expect = _rows(table.read().filter(F.col("event_seq").between(100, 200)))
        got = _rows(table.read(where=("event_seq", 100, 200)))
        assert got == expect and len(got) == 101

    def test_open_bounds(self, table):
        rep = table.prune_report(("event_seq", 1900, None))
        assert 0 < rep["files_read"] < rep["files_total"]
        got = _rows(table.read(where=("event_seq", 1900, None)))
        assert got == _rows(table.read().filter(F.col("event_seq") >= 1900))

    def test_stats_survive_reload(self, spark, table):
        t2 = LakeTable.load(spark, table.root)
        assert t2.prune_report(("event_seq", 100, 200)) == table.prune_report(
            ("event_seq", 100, 200)
        )
        assert _rows(t2.read(where=("event_seq", 100, 200))) == _rows(
            table.read(where=("event_seq", 100, 200))
        )

    def test_no_stats_cols_reads_everything(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "nostats"), ["repo", "path"],
                             num_buckets=2)
        rows = [("r1", f"p{i}.py", "%012x" % 1, i, "py", f"v{i}", f"s{i}")
                for i in range(50)]
        df = _with_bucket(spark.createDataFrame(rows, DDL), 2)
        t.commit_buckets(df, [0, 1], {0: "000000000001:0", 1: "000000000001:0"})
        rep = t.prune_report(("event_seq", 0, 5))
        assert rep["files_skipped"] == 0
        assert _rows(t.read(where=("event_seq", 0, 5))) == _rows(
            t.read().filter(F.col("event_seq") <= 5)
        )


class TestStringBoundTruncation:
    """Long-string stats store through the truncate(16) transform
    (lake/table.py _truncate_bound_lower/_upper): bounds stay O(16)
    chars in the manifests, pruning stays sound and selective, and
    string-range DML triage gains the whole-file drop proof."""

    def _long(self, prefix, i):
        # > 16 chars so the transform actually truncates
        return f"{prefix}{i:04d}" + "x" * 40

    @pytest.fixture(scope="class")
    def table(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("strskip") / "lake")
        t = LakeTable.create(
            spark, root, ["repo", "path"], num_buckets=2,
            stats_cols=["content"], sort_cols=["content"],
        )
        rows = [
            (f"r{i % 3}", f"p{i}.py", "%012x" % 1, i, "py",
             self._long("a" if i < 400 else "m" if i < 800 else "z", i),
             f"s{i}")
            for i in range(1200)
        ]
        df = _with_bucket(spark.createDataFrame(rows, DDL), 2)
        df = df.repartitionByRange(6, "content")
        t.commit_buckets(df, [0, 1], {b: "000000000001:0" for b in range(2)})
        return t

    def test_bounds_stored_truncated_and_safe(self, table):
        import json, os

        seen = 0
        for name in table.io.listdir(table.meta_dir):
            if not name.startswith("manifest-"):
                continue
            body = json.loads(table.io.read_text(os.path.join(table.meta_dir, name)))
            for f, st in body.get("stats", {}).items():
                if "content" not in st:
                    continue
                mn, mx = st["content"]
                assert len(mn) <= 16 and len(mx) <= 16
                assert mn <= mx
                seen += 1
        assert seen > 2

    def test_string_range_read_prunes_and_stays_exact(self, table):
        # 'm'-prefix slab only: 'a'- and 'z'-slab files must skip
        w = ("content", "m", "n")
        rep = table.prune_report(w)
        assert rep["files_skipped"] > 0
        got = _rows(table.read(where=w))
        expect = _rows(
            table.read().filter(F.col("content").between("m", "n"))
        )
        assert got == expect and len(got) == 400

    def test_boundary_values_never_lost(self, table):
        # bounds are CONSERVATIVE: a range starting exactly at a
        # truncation point keeps the file (never skips a matching row)
        probe = self._long("a", 399)  # a real max-ish 'a'-slab value
        got = _rows(table.read(where=("content", probe, probe)))
        assert len(got) == 1

    def test_truncate_upper_edge_cases(self):
        from filters_spark.lake.table import (
            _truncate_bound_lower, _truncate_bound_upper,
        )

        long = "abcdefghijklmnopqrstuvwxyz"
        assert _truncate_bound_lower(long) == long[:16]
        up = _truncate_bound_upper(long)
        assert len(up) == 16 and up > long
        assert _truncate_bound_upper("short") == "short"
        # last char at the surrogate boundary skips the gap
        v = "a" * 15 + "퟿" + "tail_beyond_16__"
        up2 = _truncate_bound_upper(v)
        assert up2 == "a" * 15 + "" and up2 > v
        # every char at the max code point: no finite bound
        assert _truncate_bound_upper("\U0010ffff" * 20) is None
        # carry into the previous char when the last is maxed
        v3 = "ab" + "\U0010ffff" * 20
        up3 = _truncate_bound_upper(v3)
        assert up3 == "ac" and up3 > v3

    def test_string_range_delete_drops_files_metadata_only(self, spark, tmp_path):
        from filters_spark.lake.dml import delete_where

        t = LakeTable.create(
            spark, str(tmp_path / "strdml"), ["repo", "path"], num_buckets=2,
            stats_cols=["content"], sort_cols=["content"],
        )
        rows = [
            ("r1", f"p{i}.py", "%012x" % 1, i, "py", self._long("a", i), f"s{i}")
            for i in range(200)
        ] + [
            ("r1", f"q{i}.py", "%012x" % 1, i, "py", self._long("z", i), f"s{i}")
            for i in range(200)
        ]
        df = _with_bucket(spark.createDataFrame(rows, DDL), 2)
        df = df.repartitionByRange(4, "content")
        t.commit_buckets(df, [0, 1], {b: "000000000001:0" for b in range(2)})
        # every 'a'-slab file is PROVABLY inside (None, 'b'): with raw
        # 44-char bounds this declined (len > 64... legacy guard) — the
        # truncate(16) bounds make the drop proof fire, zero IO
        rep = delete_where(t, where=("content", None, "b"))
        assert rep["files_dropped"] > 0
        assert rep["rows_dropped_metadata_only"] == 200
        assert rep["files_scanned"] == 0
        got = _rows(t.read())
        assert len(got) == 200
        assert all(c.startswith("z") for _, _, _, c in got)


class TestSkippingMoRSoundness:
    def test_delta_buckets_are_never_value_pruned(self, spark, tmp_path):
        """A key's winning version can live OUTSIDE the predicate range
        (an out-of-range update, or a delete tombstone): pruning the
        file holding it would resurrect the stale in-range row. Buckets
        with deltas must be read in full and filtered post-merge."""
        t = LakeTable.create(
            spark, str(tmp_path / "mor"), ["repo", "path"], num_buckets=2,
            stats_cols=["event_seq"], sort_cols=["event_seq"],
        )
        base = _with_bucket(spark.createDataFrame(
            [
                ("r1", "a.py", "%012x" % 1, 5, "py", "old-a", "sa"),
                ("r1", "b.py", "%012x" % 1, 6, "py", "keep-b", "sb"),
            ], DDL), 2)
        touched = sorted(r._bucket for r in base.select("_bucket").distinct().collect())
        t.commit_buckets(base, touched, {b: "000000000001:0" for b in touched})

        # a.py is updated at seq 100 (outside [0,10]); delivered as a delta
        delta = _with_bucket(spark.createDataFrame(
            [("r1", "a.py", "%012x" % 2, 100, "py", "new-a", "U")], DELTA_DDL), 2)
        dtouched = sorted(r._bucket for r in delta.select("_bucket").distinct().collect())
        t.commit_deltas(delta, dtouched, {b: "000000000002:0" for b in dtouched})

        # metadata-only count declines while deltas are pending (LWW
        # fold could drop rows), works again after compaction
        assert t.metadata_row_count() is None

        got = _rows(t.read(where=("event_seq", 0, 10)))
        # the stale in-range version of a.py must NOT reappear
        assert got == [("r1", "b.py", 6, "keep-b")]
        assert got == _rows(t.read().filter(F.col("event_seq").between(0, 10)))
        rep = t.prune_report(("event_seq", 0, 10))
        assert rep["buckets_with_deltas"] == dtouched
        # after compaction the bucket is prunable again, same answer
        t.compact()
        assert _rows(t.read(where=("event_seq", 0, 10))) == got
        assert t.prune_report(("event_seq", 0, 10))["buckets_with_deltas"] == []
        assert t.metadata_row_count() == t.read().count()


class TestRollback:
    def test_rollback_restores_state_metadata_only(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "rb"), ["repo", "path"],
                             num_buckets=2)
        v1 = _with_bucket(spark.createDataFrame(
            [("r1", "a.py", "%012x" % 1, 1, "py", "v1", "s1")], DDL), 2)
        touched = sorted(r._bucket for r in v1.select("_bucket").distinct().collect())
        t.commit_buckets(v1, touched, {b: "000000000001:0" for b in touched})
        sid1 = t.current_snapshot_id()
        rows1 = _rows(t.read())

        v2 = _with_bucket(spark.createDataFrame(
            [("r1", "a.py", "%012x" % 2, 2, "py", "v2", "s2")], DDL), 2)
        t.commit_buckets(v2, touched, {b: "000000000002:0" for b in touched})
        assert _rows(t.read()) != rows1

        n_data_files = len(t.live_files())
        snap = t.rollback(sid1)
        assert snap["operation"] == "rollback"
        assert _rows(t.read()) == rows1
        # forward-revert watermarks: bumped strictly ABOVE the undone
        # range's max, so a re-sent commit 2 dedupes as a replay and the
        # changefeed's revert rows win any downstream LWW fold
        pre_max = max(t.snapshot(sid1 + 1)["watermarks"].values())
        assert all(w > pre_max for w in snap["watermarks"].values())
        # metadata-only: no new data files were written
        assert len({f for f in t.live_files()}) <= n_data_files
        # history intact — the rolled-over snapshot is still readable
        assert _rows(t.read(sid1 + 1)) != rows1
        # and the table keeps accepting commits after the rollback
        t.commit_buckets(v2, touched, {b: "000000000002:0" for b in touched})
        assert _rows(t.read()) != rows1
