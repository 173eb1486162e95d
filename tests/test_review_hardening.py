"""Regression pins for the round-4 review findings: lake protocol
holes (create-exclusive commits, rollback-across-rescale layout,
vacuum vs in-flight writes, grouped-replay commit basis, move-nesting)
and operator semantics (sketch NULL handling, empty-stream replay,
dead-letter schema merge)."""

import glob
import os
import time

import pyspark.sql.functions as F
import pytest

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.fileio import LocalFileIO
from filters_spark.lake.table import LakeTable

from tests.test_cdc_engine import events_df, make_engine


class TestCreateExclusive:
    def test_lost_race_leaves_no_temp_files(self, tmp_path):
        io = LocalFileIO()
        p = str(tmp_path / "snap-1.json")
        io.write_text_atomic(p, "winner", fail_if_exists=True)
        with pytest.raises(FileExistsError):
            io.write_text_atomic(p, "loser", fail_if_exists=True)
        assert io.read_text(p) == "winner"
        assert glob.glob(str(tmp_path / "*.tmp-*")) == []

    def test_exclusive_is_atomic_not_check_then_rename(self, tmp_path):
        """The exclusive write must fail even when the destination
        appears AFTER any pre-check could have run: simulate the
        adversarial interleaving by racing through a subclass whose
        temp write drops the winner's file in first."""
        io = LocalFileIO()
        p = str(tmp_path / "snap-2.json")

        class RacingIO(LocalFileIO):
            def write_text_atomic(self, path, data, fail_if_exists=False):
                # the racer lands between our temp write and publish
                if fail_if_exists and not os.path.exists(p):
                    LocalFileIO().write_text_atomic(p, "racer")
                return super().write_text_atomic(path, data, fail_if_exists)

        with pytest.raises(FileExistsError):
            RacingIO().write_text_atomic(p, "loser", fail_if_exists=True)
        assert io.read_text(p) == "racer"


class TestRollbackAcrossRescale:
    def test_rollback_restores_bucket_layout(self, spark, tmp_path):
        eng = make_engine(spark, str(tmp_path), num_buckets=8)
        ev = events_df(spark)
        eng.replay(ev, num_batches=1)
        t = eng.table
        pre_sid = t.current_snapshot_id()
        pre_rows = sorted(
            (r.repo, r.path, r.content_sha) for r in t.read().collect()
        )
        t.rescale(num_buckets=16)
        assert t.current()["num_buckets"] == 16
        snap = t.rollback(pre_sid)
        # layout travels with the manifests it indexes
        assert snap["num_buckets"] == 8
        assert snap["path_salt"] == t.snapshot(pre_sid)["path_salt"]
        rows = sorted(
            (r.repo, r.path, r.content_sha) for r in t.read().collect()
        )
        assert rows == pre_rows
        # point lookup computes bucket ids against the restored modulus
        repo, path = pre_rows[0][0], pre_rows[0][1]
        hit = t.lookup(repo, path)
        assert hit is not None and hit.count() == 1


class TestVacuumInFlightGuard:
    def _mk(self, spark, tmp_path):
        t = LakeTable.create(
            spark, str(tmp_path / "lake"), ["repo", "path"], num_buckets=4
        )
        df = spark.createDataFrame(
            [("r1", "a.py", "c01", 1, "py", "x", "s", 0)],
            "repo string, path string, commit string, event_seq long, "
            "lang string, content string, content_sha string, _bucket int",
        )
        t.commit_buckets(df, [0], {0: "c01:0000000001"})
        return t

    def test_young_inflight_write_dir_survives(self, spark, tmp_path):
        t = self._mk(spark, tmp_path)
        # an in-flight Spark write: output only under _temporary/, no
        # committed parquet at the manifest depth yet
        inflight = os.path.join(t.data_dir, "snap-00000099")
        tmpdir = os.path.join(inflight, "_temporary", "0")
        os.makedirs(tmpdir)
        with open(os.path.join(tmpdir, "part-0.parquet"), "w") as f:
            f.write("wip")
        t.vacuum(min_age_seconds=3600)
        assert os.path.isdir(inflight), "vacuum swept an in-flight write dir"

    def test_stale_aborted_write_dir_is_swept(self, spark, tmp_path):
        t = self._mk(spark, tmp_path)
        aborted = os.path.join(t.data_dir, "snap-00000098")
        tmpdir = os.path.join(aborted, "_temporary", "0")
        os.makedirs(tmpdir)
        fp = os.path.join(tmpdir, "part-0.parquet")
        with open(fp, "w") as f:
            f.write("junk")
        old = time.time() - 7200
        for p in (fp, tmpdir, os.path.dirname(tmpdir), aborted):
            os.utime(p, (old, old))
        t.vacuum(min_age_seconds=3600)
        assert not os.path.isdir(aborted)
        # the live committed data was never touched
        assert t.read().count() == 1


class TestGroupedReplayBasis:
    def _race(self, spark, tmp_path, overlap: bool):
        eng = make_engine(spark, str(tmp_path), num_buckets=8)
        ev = events_df(spark)
        table = eng.table
        foreign = LakeTable.load(spark, table.root)
        orig = table.commit_bucket_files
        state = {"fired": False}

        def hooked(*args, **kwargs):
            if not state["fired"]:
                state["fired"] = True
                if overlap:
                    # foreign commit rewrites every bucket -> overlaps
                    # whatever the group's first batch touched (an
                    # empty file list would REMOVE the bucket — a no-op
                    # on a fresh table — so reference a real-looking
                    # file to move the refs)
                    foreign.commit_bucket_files(
                        {str(b): [f"data/foreign/b{b}.parquet"] for b in range(8)},
                        {b: "zzz:9999999999" for b in range(8)},
                    )
                else:
                    # metadata-only foreign commit touching no bucket
                    foreign.commit_bucket_files({}, {})
            return orig(*args, **kwargs)

        table.commit_bucket_files = hooked
        return eng, ev

    def test_overlapping_foreign_commit_raises(self, spark, tmp_path):
        eng, ev = self._race(spark, tmp_path, overlap=True)
        with pytest.raises(ValueError, match="concurrent|stale"):
            eng.replay(ev, num_batches=3)

    def test_disjoint_foreign_commit_rebases(self, spark, tmp_path):
        eng, ev = self._race(spark, tmp_path, overlap=False)
        metrics = eng.replay(ev, num_batches=3)
        # sequential oracle run on a fresh table
        eng2 = make_engine(spark, str(tmp_path / "oracle"), num_buckets=8)
        eng2.replay(ev, num_batches=3)
        rows = lambda t: sorted(
            (r.repo, r.path, r.content_sha) for r in t.read().collect()
        )
        assert rows(eng.table) == rows(eng2.table)
        # the foreign commit consumed one sid: the metrics report the
        # ACTUAL snapshot ids, shifted past it
        sids = [m["snapshot_id"] for m in metrics if m["applied"]]
        assert sids == sorted(sids)
        assert eng.table.current_snapshot_id() == max(sids)


class TestEmptyStreamReplay:
    def test_replay_empty_events_zero_metrics(self, spark, tmp_path):
        eng = make_engine(spark, str(tmp_path))
        empty = events_df(spark).filter(F.lit(False))
        metrics = eng.replay(empty, num_batches=3)
        assert metrics and all(m["applied"] == 0 for m in metrics)
        assert all(m["events_in"] == 0 for m in metrics)


class TestSketchNulls:
    def test_kmv_and_hll_exclude_nulls(self, spark):
        from filters_spark.operators.sketches import (
            hll_distinct, kmv_distinct,
        )

        vals = [("g", f"v{i}") for i in range(10)] + [("g", None)] * 50
        df = spark.createDataFrame(vals, "grp string, v string")
        kmv = kmv_distinct(df, "v", ["grp"], k=64).collect()[0]
        assert kmv.n_kept == 10 and kmv.est_distinct == 10.0
        hll = hll_distinct(df, "v", ["grp"], p=10, linear_counting=True).collect()[0]
        # exactly 10 registers hit: the NULLs minted no phantom bucket
        assert hll.used == 10
        # small-range (linear counting) correction is near-exact here
        assert abs(hll.est - 10.0) < 1.0

    def test_cms_and_bloom_exclude_nulls(self, spark):
        from filters_spark.operators.sketches import (
            bloom_build, bloom_might_contain, cms_build, cms_estimate,
        )

        df = spark.createDataFrame(
            [("a",), ("a",), (None,), (None,)], "v string"
        )
        cms = cms_build(df, "v", depth=2, width=64)
        # every populated cell's count comes from 'a' alone
        assert all(r.cnt == 2 for r in cms.collect())
        bloom = bloom_build(df, "v", m_bits=256, k=3)
        items = spark.createDataFrame([("a",), ("b",)], "v string")
        hits = {
            r.v: r.might_contain
            for r in bloom_might_contain(bloom, items, "v", m_bits=256, k=3).collect()
        }
        assert hits["a"] is True


class TestDeadLetterSchemaMerge:
    def test_dead_letters_union_across_column_add(self, spark, tmp_path):
        """Dead-letter batches written BEFORE a schema-evolution column
        ADD lack the new raw column; the read must surface it for
        batches written AFTER (mergeSchema), not sample one footer and
        silently drop it."""
        from filters_spark.engine.defaults import CANONICAL_COLUMNS, FIELD_SPECS_V1
        from filters_spark.engine.evolution import SpecRegistry, VersionSpec

        reg = SpecRegistry(CANONICAL_COLUMNS)
        reg.register(VersionSpec(1, FIELD_SPECS_V1))
        table = LakeTable.create(
            spark, str(tmp_path / "lake"), ["repo", "path"], num_buckets=4
        )
        eng = CDCEngine(spark, table, reg)
        bad_v1 = spark.createDataFrame(
            [("%012x" % 1, 0, "U", "r1", "a.py", "klingon", "x", 1)],
            "commit string, event_seq long, op string, repo string, "
            "path string, lang string, content string, schema_version int",
        )  # lang outside Choice -> dead letter, staged WITHOUT license
        m1 = eng.apply_batch(bad_v1)
        assert m1["dead_lettered"] == 1

        reg.register(VersionSpec(
            3, {**FIELD_SPECS_V1, "license": {"chain": ["strip", "ascii_lower"]}}
        ))
        bad_v3 = spark.createDataFrame(
            [("%012x" % 2, 0, "U", "r1", "b.py", "klingon", "y", "MIT", 3)],
            "commit string, event_seq long, op string, repo string, "
            "path string, lang string, content string, license string, "
            "schema_version int",
        )
        m2 = eng.apply_batch(bad_v3)
        assert m2["dead_lettered"] == 1

        dl = eng.dead_letters()
        rows = {r.commit: r for r in dl.collect()}
        assert len(rows) == 2
        assert rows["%012x" % 2].license == "MIT"  # raw value survives
        assert rows["%012x" % 1].license is None  # pre-widening batch
