"""Merge-on-read write mode: delta commits + lazy LWW fold + compaction
must be observably identical to copy-on-write."""

import os

import pyspark.sql.functions as F
import pytest

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.table import LakeTable
from filters_spark.sources.datagen import gen_events


def _rows(df):
    cols = ["repo", "path", "commit", "event_seq", "lang", "content", "content_sha"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mor") / "events.parquet")
    gen_events(
        spark, n_events=8000, n_repos=40, n_paths=400,
        hot_frac=0.25, dirty_frac=0.06, seed=7,
    ).write.parquet(p)
    return spark.read.parquet(p)


class TestMorEqualsCow:
    def test_final_state_identical(self, spark, tmp_path, events):
        cow_t = LakeTable.create(spark, str(tmp_path / "cow"), ["repo", "path"], num_buckets=8)
        mor_t = LakeTable.create(spark, str(tmp_path / "mor"), ["repo", "path"], num_buckets=8)
        cow = CDCEngine(spark, cow_t, default_registry())
        # compact_after high enough that NO compaction triggers: the
        # equality below exercises the pure read-time fold
        mor = CDCEngine(spark, mor_t, default_registry(), write_mode="mor", compact_after=99)
        mc = cow.replay(events, num_batches=3)
        mm = mor.replay(events, num_batches=3)
        assert sum(m["applied"] for m in mc) == sum(m["applied"] for m in mm)
        assert _rows(cow_t.read()) == _rows(mor_t.read())
        # MoR really did defer the fold: deltas exist, no post-0 base rewrite
        assert mor_t.current().get("deltas")
        assert not any(
            d.startswith("snap-000000") and d != "snap-00000000"
            for d in os.listdir(os.path.join(str(tmp_path / "mor"), "data"))
        )

    def test_compaction_preserves_state_and_clears_deltas(self, spark, tmp_path, events):
        mor_t = LakeTable.create(spark, str(tmp_path / "mor2"), ["repo", "path"], num_buckets=8)
        mor = CDCEngine(spark, mor_t, default_registry(), write_mode="mor", compact_after=99)
        mor.replay(events, num_batches=3)
        before = _rows(mor_t.read())
        snap = mor_t.compact()
        assert snap is not None and not snap["deltas"]
        assert _rows(mor_t.read()) == before
        # compaction is a no-op when nothing has deltas
        assert mor_t.compact() is None

    def test_auto_compaction_threshold(self, spark, tmp_path, events):
        mor_t = LakeTable.create(spark, str(tmp_path / "mor3"), ["repo", "path"], num_buckets=8)
        # every batch appends ~1 delta file per bucket; threshold 2 =>
        # compaction fires during the replay
        mor = CDCEngine(spark, mor_t, default_registry(), write_mode="mor", compact_after=2)
        mor.replay(events, num_batches=4)
        snap = mor_t.current()
        assert all(len(fl) < 2 for fl in snap.get("deltas", {}).values())
        # still equal to a cow replay of the same stream
        cow_t = LakeTable.create(spark, str(tmp_path / "cow3"), ["repo", "path"], num_buckets=8)
        CDCEngine(spark, cow_t, default_registry()).replay(events, num_batches=4)
        assert _rows(mor_t.read()) == _rows(cow_t.read())

    def test_mor_idempotent_replay(self, spark, tmp_path, events):
        mor_t = LakeTable.create(spark, str(tmp_path / "mor4"), ["repo", "path"], num_buckets=8)
        mor = CDCEngine(spark, mor_t, default_registry(), write_mode="mor", compact_after=99)
        mor.replay(events, num_batches=2)
        state = _rows(mor_t.read())
        m = mor.apply_batch(events)  # full re-delivery
        assert m["applied"] == 0
        assert m["skipped_replays"] > 0
        assert _rows(mor_t.read()) == state

    def test_mor_deletes_tombstone_until_compaction(self, spark, tmp_path):
        mor_t = LakeTable.create(spark, str(tmp_path / "mor5"), ["repo", "path"], num_buckets=4)
        mor = CDCEngine(spark, mor_t, default_registry(), write_mode="mor", compact_after=99)
        schema = ("commit string, event_seq long, op string, repo string, path string, "
                  "lang string, content string, schema_version int")
        mor.apply_batch(spark.createDataFrame(
            [("000000000001", 0, "I", "r1", "a.py", "py", "print(1)", 1),
             ("000000000001", 1, "I", "r1", "b.py", "py", "print(2)", 1)], schema))
        # deletes in this WAL carry the last payload (datagen.py does
        # the same); a payload-less delete would dead-letter on the
        # 'required' content chain by design
        mor.apply_batch(spark.createDataFrame(
            [("000000000002", 0, "D", "r1", "a.py", "py", "print(1)", 1)], schema))
        paths = {r.path for r in mor_t.read().collect()}
        assert paths == {"b.py"}
        mor_t.compact()
        assert {r.path for r in mor_t.read().collect()} == {"b.py"}


class TestIncrementalChanges:
    def test_changes_reconstruct_state_and_range(self, spark, tmp_path, events):
        from pyspark.sql import Window

        t = LakeTable.create(spark, str(tmp_path / "inc"), ["repo", "path"], num_buckets=8)
        eng = CDCEngine(spark, t, default_registry(), write_mode="mor", compact_after=99)
        eng.replay(events, num_batches=2)
        sids = [s for s in t.snapshots() if t.snapshot(s).get("operation") == "append-deltas"]
        assert len(sids) == 2

        ch = t.changes(0)
        assert set(r.snapshot_id for r in ch.select("snapshot_id").distinct().collect()) == set(sids)
        # scale pin: the incremental read is ONE scan + a broadcast
        # file->snapshot map, not one relation per snapshot (a long
        # range would stop analyzing)
        plan = ch._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1
        # replaying ONLY the change log must reproduce the table state
        w = Window.partitionBy("repo", "path").orderBy(
            F.col("commit").desc(), F.col("event_seq").desc()
        )
        state = (
            ch.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        )
        assert _rows(state.withColumn("content_sha",
                     F.sha2(F.coalesce("content", F.lit("")), 256))) == _rows(t.read())

        # a mid-range read returns only the later commit's rows
        later = t.changes(sids[0])
        assert set(r.snapshot_id for r in later.select("snapshot_id").distinct().collect()) == {sids[1]}
        assert later.count() < ch.count()
        # empty range
        assert t.changes(t.current_snapshot_id()) is None

    def test_changes_survive_respelled_root(self, spark, tmp_path):
        # manifests record one spelling of the root; input_file_name()
        # yields a normalized absolute URI — the file->snapshot join
        # must match on the data-dir-relative identity or the
        # changefeed silently comes back EMPTY
        root = os.path.join(str(tmp_path), ".", "lake_rel")
        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=2)
        eng = CDCEngine(spark, t, default_registry(), write_mode="mor", compact_after=99)
        schema = ("commit string, event_seq long, op string, repo string, path string, "
                  "lang string, content string, schema_version int")
        eng.apply_batch(spark.createDataFrame(
            [("000000000001", 0, "I", "r1", "a.py", "py", "v1", 1)], schema))
        ch = t.changes(0)
        assert ch is not None and ch.count() == 1
        assert {r.path for r in ch.collect()} == {"a.py"}

    def test_compaction_adds_no_changes_and_cow_raises(self, spark, tmp_path, events):
        t = LakeTable.create(spark, str(tmp_path / "inc2"), ["repo", "path"], num_buckets=8)
        eng = CDCEngine(spark, t, default_registry(), write_mode="mor", compact_after=99)
        eng.replay(events, num_batches=2)
        n_before = t.changes(0).count()
        t.compact()
        assert t.changes(0).count() == n_before  # compact snapshots are skipped

        cow_t = LakeTable.create(spark, str(tmp_path / "cow"), ["repo", "path"], num_buckets=8)
        cow = CDCEngine(spark, cow_t, default_registry())
        cow.replay(events, num_batches=1)
        with pytest.raises(ValueError, match="copy-on-write"):
            cow_t.changes(0)


class TestIncrementalMirrorSync:
    """lake/sync.py: changefeed-follower mirror — O(changed rows) reads,
    idempotent re-application, different bucket layout on the mirror."""

    def test_mirror_follows_source_incrementally(self, spark, tmp_path, events):
        from filters_spark.lake.sync import last_synced_snapshot, sync_incremental

        src_t = LakeTable.create(spark, str(tmp_path / "srcT"), ["repo", "path"], num_buckets=8)
        src = CDCEngine(spark, src_t, default_registry(), write_mode="mor", compact_after=99)
        # mirror deliberately uses a DIFFERENT bucket layout
        dst_t = LakeTable.create(spark, str(tmp_path / "dstT"), ["repo", "path"],
                                 num_buckets=4, path_salt=2)

        src.replay(events, num_batches=2)
        assert sync_incremental(src_t, dst_t) is not None
        assert _rows(dst_t.read()) == _rows(src_t.read())
        first_synced = last_synced_snapshot(dst_t)
        assert first_synced == src_t.current_snapshot_id()

        # no new source commits -> no-op
        assert sync_incremental(src_t, dst_t) is None

        # one more source batch; the next sync reads ONLY that commit's
        # delta files, not the table
        more = events.withColumn(
            "commit", F.concat(F.lit("fffff"), F.col("commit").substr(6, 7))
        )
        src.apply_batch(more)
        ch = src_t.changes(first_synced, src_t.current_snapshot_id())
        n_change_files = len(ch.inputFiles())
        all_src_files = sum(len(v) for v in src_t.current()["buckets"].values()) + sum(
            len(v) for v in src_t.current().get("deltas", {}).values()
        )
        assert n_change_files < all_src_files
        assert sync_incremental(src_t, dst_t) is not None
        assert _rows(dst_t.read()) == _rows(src_t.read())

    def test_sync_is_idempotent_after_crash(self, spark, tmp_path, events):
        """Crash between mirror commit and sync-state write: the same
        change range re-applies; state is unchanged (LWW absorption)."""
        import os as _os

        from filters_spark.lake.sync import _STATE_FILE, sync_incremental

        src_t = LakeTable.create(spark, str(tmp_path / "srcI"), ["repo", "path"], num_buckets=4)
        src = CDCEngine(spark, src_t, default_registry(), write_mode="mor", compact_after=99)
        dst_t = LakeTable.create(spark, str(tmp_path / "dstI"), ["repo", "path"], num_buckets=4)
        src.replay(events, num_batches=2)
        sync_incremental(src_t, dst_t)
        expected = _rows(dst_t.read())

        # simulate the crash: roll the state file back and re-sync
        _os.remove(_os.path.join(dst_t.meta_dir, _STATE_FILE))
        assert sync_incremental(src_t, dst_t) is not None
        assert _rows(dst_t.read()) == expected

    def test_mirror_schema_mismatch_raises(self, spark, tmp_path, events):
        from filters_spark.lake.sync import sync_incremental

        src_t = LakeTable.create(spark, str(tmp_path / "srcS"), ["repo", "path"], num_buckets=4)
        src = CDCEngine(spark, src_t, default_registry(), write_mode="mor", compact_after=99)
        src.replay(events, num_batches=1)
        dst_t = LakeTable.create(
            spark, str(tmp_path / "dstS"), ["repo", "path"], num_buckets=4,
            columns=["repo", "path", "lang", "content", "extra_col"],
        )
        with pytest.raises(ValueError, match="payload"):
            sync_incremental(src_t, dst_t)


class TestChangesWithImages:
    """changes_with_images (lake/table.py): Delta-CDF / Debezium-before
    pre-images on the incremental feed, event-level, seeded from the
    state at `since`."""

    BASE_DDL = ("repo string, path string, `commit` string, event_seq long, "
                "lang string, content string")

    def _mk(self, spark, root):
        from filters_spark.lake.table import bucket_expr

        t = LakeTable.create(spark, str(root), ["repo", "path"], num_buckets=8)
        bkt = bucket_expr(F.col("repo"), F.col("path"), 8, 16).cast("int").alias("_bucket")
        base = spark.createDataFrame(
            [("r1", "a.py", "000000000001", 1, "py", "v0"),
             ("r1", "c.py", "000000000001", 2, "py", "c0")],
            self.BASE_DDL,
        ).select("*", F.sha2(F.coalesce("content", F.lit("")), 256).alias("content_sha"), bkt)
        touched = sorted(r[0] for r in base.select("_bucket").distinct().collect())
        t.commit_buckets(base, touched, {})
        for rows in (
            # snapshot 2: update A, insert B (spelled as U), delete C
            [("r1", "a.py", "000000000002", 1, "py", "v1", "U"),
             ("r1", "b.py", "000000000002", 2, "py", "b1", "U"),
             ("r1", "c.py", "000000000002", 3, None, None, "D")],
            # snapshot 3: A twice in ONE commit, B update, C re-insert
            [("r1", "a.py", "000000000003", 1, "py", "v2", "U"),
             ("r1", "a.py", "000000000003", 2, "py", "v3", "U"),
             ("r1", "b.py", "000000000003", 3, "py", "b2", "U"),
             ("r1", "c.py", "000000000003", 4, "py", "c1", "U")],
        ):
            d = spark.createDataFrame(rows, self.BASE_DDL + ", op string").select("*", bkt)
            dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
            t.commit_deltas(d, dt, {})
        return t

    def test_pre_images_event_level(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "img")
        out = {
            (r["path"], r["commit"], r["event_seq"]): r
            for r in t.changes_with_images(1).collect()
        }
        assert len(out) == 7
        # A: chained through both snapshots, seeded from base
        a1 = out[("a.py", "000000000002", 1)]
        assert (a1["pre_op"], a1["pre_content"], a1["op_effective"]) == ("K", "v0", "U")
        a2 = out[("a.py", "000000000003", 1)]
        assert (a2["pre_op"], a2["pre_content"], a2["op_effective"]) == ("U", "v1", "U")
        a3 = out[("a.py", "000000000003", 2)]
        # same-commit predecessor: ordered by event_seq within commit
        assert (a3["pre_op"], a3["pre_content"], a3["op_effective"]) == ("U", "v2", "U")
        # B: absent at since -> effective INSERT, then a true update
        b1 = out[("b.py", "000000000002", 2)]
        assert b1["pre_op"] is None and b1["op_effective"] == "I"
        b2 = out[("b.py", "000000000003", 3)]
        assert (b2["pre_op"], b2["pre_content"], b2["op_effective"]) == ("U", "b1", "U")
        # C: delete carries the true pre-image; re-insert after the
        # delete is effectively an INSERT with no pre-payload
        c1 = out[("c.py", "000000000002", 3)]
        assert (c1["pre_op"], c1["pre_content"], c1["op_effective"]) == ("K", "c0", "D")
        c2 = out[("c.py", "000000000003", 4)]
        assert (c2["pre_op"], c2["pre_content"], c2["op_effective"]) == ("D", None, "I")

    def test_mid_range_seeds_from_since_state(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "img2")
        out = {
            (r["path"], r["event_seq"]): r for r in t.changes_with_images(2).collect()
        }
        assert len(out) == 4
        # A's first in-range event seeds from the state AT snapshot 2
        assert (out[("a.py", 1)]["pre_op"], out[("a.py", 1)]["pre_content"]) == ("K", "v1")
        assert (out[("b.py", 3)]["pre_op"], out[("b.py", 3)]["pre_content"]) == ("K", "b1")
        # C was deleted as of snapshot 2: absent from the seed
        assert out[("c.py", 4)]["pre_op"] is None
        assert out[("c.py", 4)]["op_effective"] == "I"
        # empty range contract unchanged
        assert t.changes_with_images(t.current_snapshot_id()) is None

    def test_egress_with_true_before_images(self, spark, tmp_path):
        import json as _json

        import pytest as _pytest

        from filters_spark.sources.debezium import to_debezium

        t = self._mk(spark, tmp_path / "img3")
        feed = t.changes_with_images(1)
        wire = to_debezium(
            feed, ["repo", "path", "lang", "content"],
            op_col="op_effective",
            before_cols={"repo": "repo", "path": "path",
                         "lang": "pre_lang", "content": "pre_content"},
        )
        envs = {}
        for r in wire.collect():
            e = _json.loads(r["value"])
            img = e.get("after") or e.get("before")
            envs[(img["path"], e["source"]["file"], e["source"]["pos"])] = e
        assert len(envs) == 7
        # u event: before AND after, true pre-image
        a1 = [e for (p, *_), e in envs.items() if p == "a.py" and e["op"] == "u"]
        assert all(e["before"]["content"] is not None for e in a1)
        first_a = min(a1, key=lambda e: (e["source"]["file"], e["source"]["pos"]))
        assert first_a["before"]["content"] == "v0" and first_a["after"]["content"] == "v1"
        # c event (absent key): NO before
        b_ins = [e for (p, *_), e in envs.items() if p == "b.py" and e["op"] == "c"]
        assert len(b_ins) == 1 and b_ins[0].get("before") is None
        # d event: before is the TRUE pre-image, not tombstone residue
        c_del = [e for (p, *_), e in envs.items() if p == "c.py" and e["op"] == "d"]
        assert len(c_del) == 1 and c_del[0]["before"]["content"] == "c0"
        # re-insert after delete: c with no before
        c_re = [e for (p, *_), e in envs.items() if p == "c.py" and e["op"] == "c"]
        assert len(c_re) == 1 and c_re[0].get("before") is None
        # before_cols without the images feed is a loud error
        with _pytest.raises(ValueError, match="pre_op"):
            to_debezium(feed.drop("pre_op"), ["repo", "path"],
                        before_cols={"repo": "repo", "path": "path"})

    def test_payload_carrying_tombstone_masks_pre_images(self, spark, tmp_path):
        """The engine's WAL convention has deletes CARRY the last
        payload (cdc.py keeps tombstones as-is; _rollback_reverts and
        dml emit them that way). The event AFTER such a delete must
        still see NULL pre-images — the key was absent — not the
        deleted payload lagged through."""
        from filters_spark.lake.table import bucket_expr

        t = LakeTable.create(spark, str(tmp_path / "img5"), ["repo", "path"],
                             num_buckets=8)
        bkt = bucket_expr(F.col("repo"), F.col("path"), 8, 16).cast("int").alias("_bucket")
        base = spark.createDataFrame(
            [("r1", "x.py", "000000000001", 1, "py", "x0")], self.BASE_DDL,
        ).select("*", F.sha2(F.coalesce("content", F.lit("")), 256).alias("content_sha"), bkt)
        t.commit_buckets(base, sorted(r[0] for r in base.select("_bucket").distinct().collect()), {})
        for rows in (
            # delete CARRYING the last payload (engine convention)
            [("r1", "x.py", "000000000002", 1, "py", "x0", "D")],
            # re-insert after the delete
            [("r1", "x.py", "000000000003", 1, "py", "x1", "U")],
        ):
            d = spark.createDataFrame(rows, self.BASE_DDL + ", op string").select("*", bkt)
            t.commit_deltas(d, sorted(r[0] for r in d.select("_bucket").distinct().collect()), {})
        out = {r["commit"]: r for r in t.changes_with_images(1).collect()}
        dele = out["000000000002"]
        # the delete's OWN pre-image is the true prior state
        assert (dele["pre_op"], dele["pre_content"], dele["op_effective"]) == ("K", "x0", "D")
        re_ins = out["000000000003"]
        # after the payload-carrying tombstone: NULL pre-images, effective I
        assert re_ins["pre_op"] == "D"
        assert re_ins["pre_content"] is None and re_ins["pre_lang"] is None
        assert re_ins["op_effective"] == "I"

    def test_rescale_in_range_falls_back_to_full_seed(self, spark, tmp_path):
        """A mid-range rescale renumbers buckets, so the metadata
        bucket-prune of the seed read must disable itself (params
        differ between since and to) — pre-images stay correct."""
        from filters_spark.lake.table import bucket_expr

        t = self._mk(spark, tmp_path / "img4")
        t.rescale(16)
        d = spark.createDataFrame(
            [("r1", "a.py", "000000000004", 1, "py", "v4", "U")],
            self.BASE_DDL + ", op string",
        ).select("*", bucket_expr(F.col("repo"), F.col("path"), 16, 16)
                 .cast("int").alias("_bucket"))
        dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas(d, dt, {})
        out = {
            (r["path"], r["commit"], r["event_seq"]): r
            for r in t.changes_with_images(1).collect()
        }
        assert len(out) == 8
        a4 = out[("a.py", "000000000004", 1)]
        assert (a4["pre_op"], a4["pre_content"], a4["op_effective"]) == ("U", "v3", "U")
        # the pre-rescale chain is unchanged
        a1 = out[("a.py", "000000000002", 1)]
        assert (a1["pre_op"], a1["pre_content"]) == ("K", "v0")

    def test_schema_widened_range_null_fills_seed(self, spark, tmp_path):
        """A column ADDED inside the range widens the feed's payload;
        the seed (read at `since`, which predates the column) must
        NULL-fill it instead of failing to resolve."""
        from filters_spark.lake.table import bucket_expr

        t = self._mk(spark, tmp_path / "img5")
        d = spark.createDataFrame(
            [("r1", "a.py", "000000000004", 1, "py", "v4", "X", "U")],
            self.BASE_DDL.replace(", content string",
                                  ", content string, extra string") + ", op string",
        ).select("*", bucket_expr(F.col("repo"), F.col("path"), 8, 16)
                 .cast("int").alias("_bucket"))
        dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas(d, dt, {}, columns=["repo", "path", "lang", "content", "extra"])
        out = {
            (r["path"], r["commit"], r["event_seq"]): r
            for r in t.changes_with_images(1).collect()
        }
        assert len(out) == 8
        a4 = out[("a.py", "000000000004", 1)]
        assert (a4["pre_content"], a4["extra"], a4["pre_extra"]) == ("v3", "X", None)
        # pre-widening rows read the new column (and its pre) as NULL
        a1 = out[("a.py", "000000000002", 1)]
        assert (a1["pre_op"], a1["pre_content"], a1["extra"]) == ("K", "v0", None)

    def test_rescale_roundtrip_disables_bucket_prune(self, spark, tmp_path):
        """8 -> 16 -> 8 buckets with a commit at the 16-layout in
        between: endpoints agree but mid-range bucket ids are from
        another layout — the prune must see the MID-RANGE header and
        fall back, or pre-images silently corrupt."""
        from filters_spark.lake.table import bucket_expr

        t = self._mk(spark, tmp_path / "img6")
        t.rescale(16)
        d = spark.createDataFrame(
            [("r1", "a.py", "000000000004", 1, "py", "v4", "U")],
            self.BASE_DDL + ", op string",
        ).select("*", bucket_expr(F.col("repo"), F.col("path"), 16, 16)
                 .cast("int").alias("_bucket"))
        dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas(d, dt, {})
        t.rescale(8)
        d2 = spark.createDataFrame(
            [("r1", "a.py", "000000000005", 1, "py", "v5", "U")],
            self.BASE_DDL + ", op string",
        ).select("*", bucket_expr(F.col("repo"), F.col("path"), 8, 16)
                 .cast("int").alias("_bucket"))
        dt2 = sorted(r[0] for r in d2.select("_bucket").distinct().collect())
        t.commit_deltas(d2, dt2, {})
        out = {
            (r["path"], r["commit"]): r
            for r in t.changes_with_images(1).collect()
        }
        a5 = out[("a.py", "000000000005")]
        assert (a5["pre_op"], a5["pre_content"], a5["op_effective"]) == ("U", "v4", "U")
        a4 = out[("a.py", "000000000004")]
        assert (a4["pre_op"], a4["pre_content"]) == ("U", "v3")

    def test_egress_double_delete_keeps_key(self, spark, tmp_path):
        """A delete with NO known pre-image (key absent at since) must
        still emit a before image carrying the key — consumers (and
        parse_debezium) read the delete key from `before`."""
        import json as _json

        from filters_spark.lake.table import bucket_expr
        from filters_spark.sources.debezium import to_debezium

        t = self._mk(spark, tmp_path / "img7")
        d = spark.createDataFrame(
            [("r9", "ghost.py", "000000000004", 1, None, None, "D")],
            self.BASE_DDL + ", op string",
        ).select("*", bucket_expr(F.col("repo"), F.col("path"), 8, 16)
                 .cast("int").alias("_bucket"))
        dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas(d, dt, {})
        feed = t.changes_with_images(3)  # only the ghost delete in range
        wire = to_debezium(
            feed, ["repo", "path", "lang", "content"],
            op_col="op_effective",
            before_cols={"repo": "repo", "path": "path",
                         "lang": "pre_lang", "content": "pre_content"},
        )
        envs = [_json.loads(r["value"]) for r in wire.collect()]
        assert len(envs) == 1 and envs[0]["op"] == "d"
        assert envs[0]["before"]["repo"] == "r9"
        assert envs[0]["before"]["path"] == "ghost.py"


class TestRollbackChangefeed:
    """A rollback snapshot EMITS its revert through changes() — every
    key changed in the undone range goes back to (or away from) its
    target-state with a feed identity that supersedes the undone rows,
    so mirrors and publishers follow instead of wedging."""

    BASE_DDL = ("repo string, path string, `commit` string, event_seq long, "
                "lang string, content string")

    def _mk(self, spark, root):
        from filters_spark.lake.table import bucket_expr

        t = LakeTable.create(spark, str(root), ["repo", "path"], num_buckets=4)
        bkt = bucket_expr(F.col("repo"), F.col("path"), 4, 16).cast("int").alias("_bucket")
        # base lands as MoR deltas too, so feeds can span the whole
        # history (sync_incremental reads changes(0))
        base = spark.createDataFrame(
            [("r1", "a.py", "000000000001", 1, "py", "v0", "U"),
             ("r1", "c.py", "000000000001", 2, "py", "c0", "U")],
            self.BASE_DDL + ", op string",
        ).select("*", bkt)
        bt = sorted(r[0] for r in base.select("_bucket").distinct().collect())
        t.commit_deltas(base, bt, {})
        d = spark.createDataFrame(
            [("r1", "a.py", "000000000002", 1, "py", "v1", "U"),
             ("r1", "b.py", "000000000002", 2, "py", "b1", "U"),
             ("r1", "c.py", "000000000002", 3, None, None, "D")],
            self.BASE_DDL + ", op string",
        ).select("*", bkt)
        dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas(d, dt, {})
        return t

    def test_revert_rows_and_identity(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "rb")
        t.rollback(1)
        rows = {r["path"]: r for r in t.changes(2).collect()}
        # A reverts to v0, B (absent at target) deletes CARRYING its
        # undone payload, C (deleted in range) restores c0
        assert (rows["a.py"]["op"], rows["a.py"]["content"]) == ("U", "v0")
        assert (rows["b.py"]["op"], rows["b.py"]["content"]) == ("D", "b1")
        assert (rows["c.py"]["op"], rows["c.py"]["content"]) == ("U", "c0")
        # identity supersedes every undone row: (max undone commit,
        # max undone seq + 1)
        assert all(
            (r["commit"], r["event_seq"]) == ("000000000002", 4)
            for r in rows.values()
        )
        assert all(r["snapshot_id"] == 3 for r in rows.values())
        # LWW over the FULL feed reproduces the rolled-back state
        from pyspark.sql import Window
        w = Window.partitionBy("repo", "path").orderBy(
            F.col("commit").desc(), F.col("event_seq").desc())
        state = (t.changes(1).withColumn("rn", F.row_number().over(w))
                 .filter((F.col("rn") == 1) & (F.col("op") != "D")))
        assert (sorted((r["path"], r["content"]) for r in state.collect())
                == [("a.py", "v0"), ("c.py", "c0")])

    def test_mirror_sync_follows_rollback(self, spark, tmp_path):
        from filters_spark.lake.sync import sync_incremental

        src = self._mk(spark, tmp_path / "rbsrc")
        dst = LakeTable.create(spark, str(tmp_path / "rbdst"), ["repo", "path"],
                               num_buckets=8)
        sync_incremental(src, dst)
        assert (sorted((r["path"], r["content"]) for r in dst.read().collect())
                == [("a.py", "v1"), ("b.py", "b1")])
        src.rollback(1)
        sync_incremental(src, dst)
        want = sorted((r["path"], r["content"]) for r in src.read().collect())
        got = sorted((r["path"], r["content"]) for r in dst.read().collect())
        assert got == want == [("a.py", "v0"), ("c.py", "c0")]

    def test_images_across_rollback(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "rbi")
        t.rollback(1)
        out = {(r["path"], r["snapshot_id"]): r
               for r in t.changes_with_images(1).collect()}
        a = out[("a.py", 3)]
        assert (a["pre_op"], a["pre_content"], a["op_effective"]) == ("U", "v1", "U")
        b = out[("b.py", 3)]
        assert (b["pre_op"], b["pre_content"], b["op_effective"]) == ("U", "b1", "D")
        # C restored after its in-range delete: effectively an INSERT
        c = out[("c.py", 3)]
        assert (c["pre_op"], c["op_effective"]) == ("D", "I")

    def test_double_rollback_composes(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "rb2")
        t.rollback(1)   # snapshot 3: back to base
        t.rollback(2)   # snapshot 4: forward again to the delta state
        rows = {r["path"]: r for r in t.changes(3).collect()}
        assert (rows["a.py"]["op"], rows["a.py"]["content"]) == ("U", "v1")
        assert (rows["b.py"]["op"], rows["b.py"]["content"]) == ("U", "b1")
        assert rows["c.py"]["op"] == "D"
        # outer identity supersedes the inner revert rows
        assert all(r["event_seq"] == 5 for r in rows.values())
        from pyspark.sql import Window
        w = Window.partitionBy("repo", "path").orderBy(
            F.col("commit").desc(), F.col("event_seq").desc())
        state = (t.changes(1).withColumn("rn", F.row_number().over(w))
                 .filter((F.col("rn") == 1) & (F.col("op") != "D")))
        assert (sorted((r["path"], r["content"]) for r in state.collect())
                == [("a.py", "v1"), ("b.py", "b1")])

    def test_legacy_rollback_header_raises(self, spark, tmp_path):
        import json as _json

        t = self._mk(spark, tmp_path / "rbl")
        t.rollback(1)
        p = t._snap_path(3)
        raw = _json.loads(t.io.read_text(p))
        raw.pop("rollback_of")
        t.io.remove(p)
        t.io.write_text_atomic(p, _json.dumps(raw))
        with pytest.raises(ValueError, match="rollback_of"):
            t.changes(2).collect()

    def test_rollback_dedupes_undone_replay_and_mirror_converges(
            self, spark, tmp_path):
        """The rollback bumps watermarks past the revert identity, so
        (a) re-sending the undone WAL range is dropped as a replay —
        corrected data must arrive under NEW commits — and (b) no
        future admitted event can collide with the revert rows; the
        mirror follows the whole sequence to byte-equality."""
        from filters_spark.lake.sync import sync_incremental

        schema = ("commit string, event_seq long, op string, repo string, "
                  "path string, lang string, content string, schema_version int")
        t = LakeTable.create(spark, str(tmp_path / "rbw"), ["repo", "path"],
                             num_buckets=4)
        eng = CDCEngine(spark, t, default_registry(), write_mode="mor",
                        compact_after=99)
        eng.apply_batch(spark.createDataFrame(
            [("000000000001", 0, "I", "r1", "a.py", "py", "good", 1)], schema))
        good = t.current_snapshot_id()
        bad = spark.createDataFrame(
            [("000000000002", 0, "U", "r1", "a.py", "py", "bad", 1)], schema)
        eng.apply_batch(bad)
        dst = LakeTable.create(spark, str(tmp_path / "rbwd"), ["repo", "path"],
                               num_buckets=8)
        sync_incremental(t, dst)
        t.rollback(good)
        # undone replay: dropped, state unchanged
        m = eng.apply_batch(bad)
        assert m["applied"] == 0 and m["skipped_replays"] == 1
        assert [r["content"] for r in t.read().collect()] == ["good"]
        # corrected data under a NEW commit: admitted
        m2 = eng.apply_batch(spark.createDataFrame(
            [("000000000003", 0, "U", "r1", "a.py", "py", "fixed", 1)], schema))
        assert m2["applied"] == 1
        sync_incremental(t, dst)
        src_rows = sorted(tuple(r) for r in t.read()
                          .select("repo", "path", "content_sha").collect())
        dst_rows = sorted(tuple(r) for r in dst.read()
                          .select("repo", "path", "content_sha").collect())
        assert src_rows == dst_rows
        assert [r["content"] for r in dst.read().collect()] == ["fixed"]

    def test_expiry_retains_rollback_dependencies(self, spark, tmp_path):
        """expire_snapshots must keep a retained rollback's target and
        undone-range headers — changes() re-derives the revert from
        them; expiring them would wedge every range crossing the
        rollback."""
        t = self._mk(spark, tmp_path / "rbe")      # snapshots 1, 2
        t.rollback(1)                              # snapshot 3
        d = spark.createDataFrame(
            [("r1", "z.py", "000000000009", 1, "py", "z1", "U")],
            self.BASE_DDL + ", op string",
        )
        from filters_spark.lake.table import bucket_expr
        d = d.select("*", bucket_expr(F.col("repo"), F.col("path"), 4, 16)
                     .cast("int").alias("_bucket"))
        dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
        t.commit_deltas(d, dt, {})                 # snapshot 4
        expired = t.expire_snapshots(keep_last=2)  # keeps {4, 3} + deps
        assert expired == [0]                      # 1 and 2 are deps of 3
        rows = {r["path"]: r for r in t.changes(2).collect()}
        assert rows["a.py"]["content"] == "v0" and rows["z.py"]["content"] == "z1"
