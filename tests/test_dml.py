"""Row-level DML (lake/dml.py): DELETE/UPDATE ... WHERE over a
LakeTable — metadata-only file triage (kept-by-reference / dropped-
whole / scanned), CoW rewrite semantics, MoR delta-append semantics,
SET validation, content_sha re-derivation, delta-bucket folding."""

import pytest
import pyspark.sql.functions as F

from filters_spark.lake.dml import delete_where, update_where
from filters_spark.lake.table import LakeTable, bucket_expr

PAY = ["repo", "path", "commit", "event_seq", "lang", "content"]


def _mk_table(spark, root, rows, num_buckets=4, **create_kw):
    t = LakeTable.create(
        spark, str(root), ["repo", "path"], num_buckets=num_buckets, **create_kw
    )
    if rows:
        df = spark.createDataFrame(rows, PAY).select(
            "*",
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
            bucket_expr(F.col("repo"), F.col("path"), num_buckets, 16)
            .cast("int").alias("_bucket"),
        )
        touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
        t.commit_buckets(df, touched, {})
    return t


def _state(t):
    df = t.read()
    if df is None:
        return {}
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"], r["content_sha"])
        for r in df.collect()
    }


BASE = [
    ("r1", "a.py", "000000000001", 1, "py", "alpha"),
    ("r1", "b.py", "000000000001", 2, "py", "beta"),
    ("r2", "c.go", "000000000002", 3, "go", "gamma"),
    ("r2", "d.go", "000000000002", 4, "go", "delta"),
    ("r3", "e.rs", "000000000003", 5, "rs", "epsilon"),
]


# -- condition / argument validation ---------------------------------------

def test_no_condition_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    with pytest.raises(ValueError, match="predicate and/or where"):
        delete_where(t)
    with pytest.raises(ValueError, match="predicate and/or where"):
        update_where(t, {"lang": "'x'"})


def test_bad_mode_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    with pytest.raises(ValueError, match="mode"):
        delete_where(t, predicate="true", mode="nope")


@pytest.mark.parametrize("col", ["repo", "path", "commit", "event_seq", "content_sha"])
def test_update_set_guards_non_payload(spark, tmp_path, col):
    t = _mk_table(spark, tmp_path / f"l{col}", BASE)
    with pytest.raises(ValueError, match="non-payload"):
        update_where(t, {col: "'x'"}, predicate="true")


# -- CoW delete: metadata-only triage ---------------------------------------

def test_cow_delete_predicate_only(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    rep = delete_where(t, predicate="lang = 'py'")
    assert rep["snapshot"]["operation"] == "delete"
    st = _state(t)
    assert ("r1", "a.py") not in st and ("r1", "b.py") not in st
    assert len(st) == 3
    # no range: nothing is provably droppable or skippable
    assert rep["files_dropped"] == 0 and rep["files_kept_by_reference"] == 0


def test_cow_delete_whole_file_drop_metadata_only(spark, tmp_path):
    # every row shares commit=...001|002|003; a cutoff above the max
    # proves every file fully matches -> zero files scanned, no Spark IO
    t = _mk_table(
        spark, tmp_path / "l", BASE,
        stats_cols=["commit"], sort_cols=["commit"],
    )
    n_files = sum(len(fl) for fl in t.current()["buckets"].values())
    rep = delete_where(t, where=("commit", None, "000000000009"))
    assert rep["files_dropped"] == n_files
    assert rep["files_scanned"] == 0
    assert rep["rows_dropped_metadata_only"] == len(BASE)
    assert t.read() is None
    assert rep["snapshot"]["buckets"] == {}


def test_cow_delete_kept_by_reference_no_commit(spark, tmp_path):
    # range below every file's min -> provably nothing to touch, NO commit
    t = _mk_table(
        spark, tmp_path / "l", BASE,
        stats_cols=["commit"], sort_cols=["commit"],
    )
    sid = t.current()["snapshot_id"]
    rep = delete_where(t, where=("commit", "000000000010", None))
    assert rep["snapshot"] is None
    assert rep["files_scanned"] == 0 and rep["files_dropped"] == 0
    assert rep["files_kept_by_reference"] > 0
    assert t.current()["snapshot_id"] == sid
    assert len(_state(t)) == len(BASE)


def test_cow_delete_boundary_files_scanned(spark, tmp_path):
    # no stats_cols -> no file is provably droppable or skippable:
    # a pure-range delete must take the boundary-scan path everywhere
    # and still produce exact row semantics
    t = _mk_table(spark, tmp_path / "l", BASE)
    rep = delete_where(t, where=("commit", None, "000000000001"))
    assert rep["files_dropped"] == 0 and rep["files_scanned"] > 0
    assert rep["files_kept_by_reference"] == 0
    st = _state(t)
    assert set(st) == {("r2", "c.go"), ("r2", "d.go"), ("r3", "e.rs")}


def test_cow_delete_range_plus_predicate(spark, tmp_path):
    t = _mk_table(
        spark, tmp_path / "l", BASE,
        stats_cols=["commit"], sort_cols=["commit"],
    )
    # predicate makes the condition residual: whole-file drops must NOT
    # happen even though the range alone covers commit=2 files
    rep = delete_where(
        t, predicate="lang = 'go'", where=("commit", "000000000002", "000000000002")
    )
    assert rep["files_dropped"] == 0
    st = _state(t)
    assert set(st) == {("r1", "a.py"), ("r1", "b.py"), ("r3", "e.rs")}


def test_cow_delete_null_condition_keeps_row(spark, tmp_path):
    # SQL semantics: UNKNOWN (NULL lang) does not match -> row kept
    rows = BASE + [("r4", "f.c", "000000000004", 6, None, "zeta")]
    t = _mk_table(spark, tmp_path / "l", rows)
    delete_where(t, predicate="lang != 'py'")
    st = _state(t)
    assert ("r4", "f.c") in st  # NULL != 'py' is UNKNOWN, kept
    assert set(st) == {("r1", "a.py"), ("r1", "b.py"), ("r4", "f.c")}


# -- CoW update --------------------------------------------------------------

def test_cow_update_recomputes_content_sha(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    rep = update_where(t, {"content": "content || '!'"}, predicate="lang = 'py'")
    assert rep["snapshot"]["operation"] == "update"
    st = _state(t)
    import hashlib
    assert st[("r1", "a.py")][2] == "alpha!"
    assert st[("r1", "a.py")][3] == hashlib.sha256(b"alpha!").hexdigest()
    # untouched rows keep value AND sha
    assert st[("r2", "c.go")][2] == "gamma"
    assert st[("r2", "c.go")][3] == hashlib.sha256(b"gamma").hexdigest()


def test_cow_update_set_swap_reads_old_row(spark, tmp_path):
    # {lang: content, content: lang} must evaluate both over the OLD row
    t = _mk_table(spark, tmp_path / "l", BASE)
    update_where(t, {"lang": "content", "content": "lang"}, predicate="repo = 'r3'")
    st = _state(t)
    assert st[("r3", "e.rs")][1] == "epsilon" and st[("r3", "e.rs")][2] == "rs"


def test_cow_update_never_drops_files_whole(spark, tmp_path):
    # an update must visit every matching row: pure-range UPDATE still scans
    t = _mk_table(
        spark, tmp_path / "l", BASE,
        stats_cols=["commit"], sort_cols=["commit"],
    )
    rep = update_where(
        t, {"lang": "upper(lang)"}, where=("commit", None, "000000000009")
    )
    assert rep["files_dropped"] == 0 and rep["files_scanned"] > 0
    assert all(v[1] == v[1].upper() for v in _state(t).values())


# -- delta (MoR) buckets under CoW DML --------------------------------------

def _add_delta(t, rows_with_op):
    spark = t.spark
    snap = t.current()
    df = spark.createDataFrame(
        rows_with_op,
        "repo string, path string, `commit` string, event_seq long, "
        "lang string, content string, op string",
    ).withColumn(
        "_bucket",
        bucket_expr(F.col("repo"), F.col("path"), snap["num_buckets"],
                    snap["path_salt"]).cast("int"),
    )
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    wm = {b: "000000000009:0000000001" for b in touched}
    t.commit_deltas(df.repartition("_bucket"), touched, wm)
    return touched


def test_cow_delete_folds_pending_deltas_first(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    # delta: update a.py's content, delete b.py — pending, unfolded
    _add_delta(t, [
        ("r1", "a.py", "000000000009", 1, "py", "ALPHA9", "U"),
        ("r1", "b.py", "000000000009", 1, None, None, "D"),
    ])
    # DML over lang='py' must see the folded state: a.py (now ALPHA9)
    # deleted; b.py already gone via tombstone
    rep = delete_where(t, predicate="lang = 'py'")
    st = _state(t)
    assert ("r1", "a.py") not in st and ("r1", "b.py") not in st
    assert len(st) == 3
    # the rewritten buckets carry no pending deltas anymore
    snap = t.current()
    for b in rep["buckets_rewritten"]:
        assert not snap.get("deltas", {}).get(str(b))


def test_cow_delete_skips_delta_bucket_outside_range(spark, tmp_path):
    # a delta bucket whose files can't match the range is kept whole
    # (base refs carried, deltas left pending) — no fold, no rewrite
    t = _mk_table(
        spark, tmp_path / "l", BASE,
        stats_cols=["commit"], sort_cols=["commit"],
    )
    touched = _add_delta(
        t, [("r1", "a.py", "000000000004", 1, "py", "ALPHA4", "U")]
    )
    rep = delete_where(t, where=("commit", "000000000020", None))
    assert rep["snapshot"] is None
    snap = t.current()
    for b in touched:
        assert snap["deltas"].get(str(b))  # still pending
    assert _state(t)[("r1", "a.py")][2] == "ALPHA4"


# -- MoR DML -----------------------------------------------------------------

def test_mor_delete_appends_tombstones(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre = t.current()
    rep = delete_where(t, predicate="lang = 'go'", mode="mor")
    assert rep["rows_changed"] == 2
    snap = rep["snapshot"]
    assert snap["operation"] == "append-deltas"
    # base files untouched (O(matched) append, no bucket rewrite)
    assert snap["buckets"] == pre["buckets"]
    st = _state(t)
    assert ("r2", "c.go") not in st and ("r2", "d.go") not in st
    assert len(st) == 3


def test_mor_update_lww_wins_and_sha_recomputed(spark, tmp_path):
    import hashlib
    t = _mk_table(spark, tmp_path / "l", BASE)
    rep = update_where(
        t, {"content": "'v2:' || content"}, predicate="repo = 'r1'", mode="mor"
    )
    assert rep["rows_changed"] == 2
    st = _state(t)
    assert st[("r1", "a.py")][2] == "v2:alpha"
    assert st[("r1", "a.py")][3] == hashlib.sha256(b"v2:alpha").hexdigest()


def test_mor_identity_beats_existing_watermarks(spark, tmp_path):
    # matched rows carry commits ABOVE the bucket watermarks (they came
    # in via commit_buckets, not the engine): the synthetic identity
    # must still beat the rows' own (commit, seq), or the LWW fold
    # would keep the old row
    t = _mk_table(spark, tmp_path / "l", [
        ("r1", "a.py", "0000000000ff", 999, "py", "high"),
    ])
    rep = delete_where(t, predicate="true", mode="mor")
    assert rep["rows_changed"] == 1
    assert _state(t) == {}
    # and the touched bucket's watermark advanced past the row's own
    snap = t.current()
    wms = [w for w in snap["watermarks"].values()]
    assert max(wms) > "0000000000ff:%020d" % 999


def test_mor_dml_flows_through_changes_feed(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre_sid = t.current()["snapshot_id"]
    delete_where(t, predicate="lang = 'rs'", mode="mor")
    ch = t.changes(pre_sid, t.current()["snapshot_id"])
    rows = {(r["repo"], r["path"]): r["op"] for r in ch.collect()}
    assert rows == {("r3", "e.rs"): "D"}


def test_mor_no_match_no_commit(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    sid = t.current()["snapshot_id"]
    rep = delete_where(t, predicate="lang = 'cobol'", mode="mor")
    assert rep["snapshot"] is None and rep["rows_changed"] == 0
    assert t.current()["snapshot_id"] == sid


def test_mor_repeated_dml_identities_monotonic(spark, tmp_path):
    # two successive MoR updates to the same key: the second identity
    # must be strictly above the first (it reads the bumped watermark)
    t = _mk_table(spark, tmp_path / "l", BASE)
    update_where(t, {"lang": "'a'"}, predicate="path = 'a.py'", mode="mor")
    update_where(t, {"lang": "'b'"}, predicate="path = 'a.py'", mode="mor")
    assert _state(t)[("r1", "a.py")][1] == "b"


# -- full-table spellings ----------------------------------------------------

def test_explicit_full_table_delete(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    rep = delete_where(t, predicate="true")
    assert t.read() is None
    assert rep["snapshot"]["operation"] == "delete"


def test_cow_dml_retries_past_crashed_attempt_dir(spark, tmp_path):
    """A crashed CoW DML leaves its data dir behind (awaiting vacuum);
    the retry at the same head must pick a FRESH dir instead of
    tripping Spark's path-exists error on the residue."""
    import os

    t = _mk_table(spark, str(tmp_path / "t"), BASE)
    head = t.current_snapshot_id()
    # residue of a previous attempt that died before its header commit
    crashed = f"snap-{head + 1:08d}-dml"
    t.io.makedirs(os.path.join(t.data_dir, crashed))
    rep = delete_where(t, predicate="lang = 'py'")
    assert rep["snapshot"] is not None and rep["files_scanned"] > 0
    assert all(r[0] != "py" for r in t.read().select("lang").collect())
    # the residue is untouched (vacuum's job), the retry went elsewhere
    assert t.io.isdir(os.path.join(t.data_dir, crashed))


# -- deletion vectors (mode='dv': Iceberg v2 position-delete semantics) ------

def test_dv_delete_no_rewrite_and_state_matches_cow(spark, tmp_path):
    t_dv = _mk_table(spark, tmp_path / "dv", BASE)
    t_cow = _mk_table(spark, tmp_path / "cow", BASE)
    pre = t_dv.current()
    rep = delete_where(t_dv, predicate="lang = 'go'", mode="dv")
    assert rep["rows_changed"] == 2
    snap = rep["snapshot"]
    assert snap["operation"] == "delete-vectors"
    # ZERO bucket rewrites: base file lists are byte-identical
    assert snap["buckets"] == pre["buckets"]
    assert any(fl for fl in snap["delete_vectors"].values())
    delete_where(t_cow, predicate="lang = 'go'", mode="cow")
    assert _state(t_dv) == _state(t_cow)
    assert len(_state(t_dv)) == 3


def test_dv_update_not_supported(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    with pytest.raises(ValueError, match="mode"):
        update_where(t, {"lang": "'x'"}, predicate="true", mode="dv")


def test_dv_requires_delta_free_table(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    delete_where(t, predicate="lang = 'rs'", mode="mor")  # pending delta
    with pytest.raises(ValueError, match="delta-free"):
        delete_where(t, predicate="lang = 'py'", mode="dv")
    t.compact()
    rep = delete_where(t, predicate="lang = 'py'", mode="dv")
    assert rep["rows_changed"] == 2
    assert set(_state(t)) == {("r2", "c.go"), ("r2", "d.go")}


def test_dv_resweep_never_remarks_and_metadata_count_exact(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE, stats_cols=["commit"])
    assert t.metadata_row_count() == 5
    rep1 = delete_where(t, predicate="lang = 'go'", mode="dv")
    assert rep1["rows_changed"] == 2
    # metadata-only count stays exact: base rows minus DV rows
    assert t.metadata_row_count() == 3 == t.read().count()
    # second sweep matching EVERYTHING marks only the 3 survivors
    rep2 = delete_where(t, predicate="true", mode="dv")
    assert rep2["rows_changed"] == 3
    assert t.metadata_row_count() == 0
    df = t.read()
    assert df is None or df.count() == 0


def test_dv_changes_feed_emits_tombstones(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre_sid = t.current()["snapshot_id"]
    delete_where(t, predicate="lang = 'go'", mode="dv")
    ch = t.changes(pre_sid, t.current()["snapshot_id"])
    rows = {(r["repo"], r["path"]): (r["op"], r["content"]) for r in ch.collect()}
    # D tombstones carrying the last payload (WAL convention)
    assert rows == {("r2", "c.go"): ("D", "gamma"),
                    ("r2", "d.go"): ("D", "delta")}
    # feed identity beats the deleted rows' own positions and the
    # touched buckets' watermarks advanced to it
    snap = t.current()
    ident = {r["commit"]: r["event_seq"]
             for r in ch.collect()}
    for c, s in ident.items():
        assert f"{c}:{s:020d}" in snap["watermarks"].values()
        assert f"{c}:{s:020d}" > "000000000002:%020d" % 4


def test_dv_compact_folds_vectors(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE, stats_cols=["commit"])
    delete_where(t, predicate="lang = 'py'", mode="dv")
    before = _state(t)
    snap = t.compact()
    assert snap is not None and snap["operation"] == "compact"
    assert not any(fl for fl in snap.get("delete_vectors", {}).values())
    assert _state(t) == before
    assert t.metadata_row_count() == 3


def test_dv_keeps_file_pruning_where_mor_cannot(spark, tmp_path):
    """THE read-amplification win: a DV bucket keeps min/max data
    skipping (vectors only remove rows), while a row-delta bucket must
    scan every base file (value-pruning under read-time LWW is
    unsound). Same delete, same data — the DV table still prunes."""
    t_dv = _mk_table(spark, tmp_path / "dv", BASE,
                     stats_cols=["commit"], sort_cols=["commit"])
    t_mor = _mk_table(spark, tmp_path / "mor", BASE,
                      stats_cols=["commit"], sort_cols=["commit"])
    delete_where(t_dv, predicate="lang = 'py'", mode="dv")
    delete_where(t_mor, predicate="lang = 'py'", mode="mor")
    # range matching only commit=...003 rows: files for 001/002 prunable
    w = ("commit", "000000000003", None)
    rep_dv = t_dv.prune_report(where=w)
    rep_mor = t_mor.prune_report(where=w)
    assert rep_dv["buckets_with_deltas"] == []
    assert rep_dv["files_skipped"] > 0
    assert rep_mor["files_skipped"] < rep_dv["files_skipped"]
    # and the pruned read is still CORRECT
    got = {(r["repo"], r["path"]) for r in t_dv.read(where=w).collect()}
    assert got == {("r3", "e.rs")}


def test_dv_write_bytes_beat_cow_rewrite(spark, tmp_path):
    """Write-amp: the DV commit writes O(deleted positions) bytes and
    rewrites nothing, where CoW rewrites every touched bucket."""
    rows = [("r1", f"p{i}.py", "0000000000a0", i, "py", "x" * 200)
            for i in range(400)]
    t_dv = _mk_table(spark, tmp_path / "dv", rows)
    t_cow = _mk_table(spark, tmp_path / "cow", rows)
    rep_dv = delete_where(t_dv, predicate="event_seq % 100 = 0", mode="dv")
    rep_cow = delete_where(t_cow, predicate="event_seq % 100 = 0", mode="cow")
    assert rep_dv["rows_changed"] == 4
    dv_bytes = sum(t_dv.io.size(f)
                   for fl in rep_dv["snapshot"]["delete_vectors"].values()
                   for f in fl)
    cow_bytes = sum(
        t_cow.io.size(f)
        for f in set().union(*rep_cow["snapshot"]["buckets"].values())
        - set().union(*map(set, t_dv.current()["buckets"].values()))
    ) or sum(t_cow.io.size(f)
             for fl in rep_cow["snapshot"]["buckets"].values() for f in fl)
    assert dv_bytes < cow_bytes
    assert _state(t_dv) == _state(t_cow)


def test_dv_fsck_vacuum_clone_integration(spark, tmp_path):
    from filters_spark.lake.clone import clone_table
    from filters_spark.lake.fsck import verify_table

    t = _mk_table(spark, tmp_path / "l", BASE)
    delete_where(t, predicate="lang = 'go'", mode="dv")
    rep = verify_table(t)
    assert rep["ok"], rep["errors"]
    # vacuum must not sweep live DV files
    assert t.vacuum(dry_run=True, min_age_seconds=0) == []
    c = clone_table(t, str(tmp_path / "c"), mode="deep")
    assert _state(c) == _state(t)
    assert verify_table(c)["ok"]


def test_dv_changes_with_images_pre_images(spark, tmp_path):
    # the Debezium-before shape composes over a DV commit: the deleted
    # rows' pre-image is their seeded base state, op_effective = 'D'
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre_sid = t.current()["snapshot_id"]
    delete_where(t, predicate="lang = 'go'", mode="dv")
    ch = t.changes_with_images(pre_sid)
    rows = {
        (r["repo"], r["path"]): (r["op_effective"], r["pre_op"], r["pre_content"])
        for r in ch.collect()
    }
    assert rows == {("r2", "c.go"): ("D", "K", "gamma"),
                    ("r2", "d.go"): ("D", "K", "delta")}


def test_cow_dml_on_dv_table_does_not_resurrect(spark, tmp_path):
    """A CoW DML rewriting a DV-carrying bucket must fold the vectors
    (read()-path), never scan base files raw — else position-deleted
    rows resurrect in the rewrite (which also clears the DV map)."""
    t = _mk_table(spark, tmp_path / "l", BASE)
    delete_where(t, predicate="lang = 'go'", mode="dv")
    assert set(_state(t)) == {("r1", "a.py"), ("r1", "b.py"), ("r3", "e.rs")}
    rep = update_where(t, {"content": "content || '!'"}, predicate="lang = 'py'")
    assert rep["snapshot"]["operation"] == "update"
    st = _state(t)
    # the DV-deleted go rows must NOT come back
    assert set(st) == {("r1", "a.py"), ("r1", "b.py"), ("r3", "e.rs")}
    assert st[("r1", "a.py")][2] == "alpha!"
    # and a follow-up CoW delete composes the same way
    rep2 = delete_where(t, predicate="lang = 'rs'")
    assert set(_state(t)) == {("r1", "a.py"), ("r1", "b.py")}


def test_cow_range_delete_keeps_untouched_dv_bucket_by_reference(spark, tmp_path):
    # a DV bucket provably outside the range keeps BOTH its base files
    # and its vectors by reference — no rewrite, deletes still applied
    t = _mk_table(spark, tmp_path / "l", BASE,
                  stats_cols=["commit"], sort_cols=["commit"])
    delete_where(t, predicate="lang = 'go'", mode="dv")
    rep = delete_where(t, where=("commit", "000000000010", None))
    assert rep["snapshot"] is None  # nothing provably touched
    assert set(_state(t)) == {("r1", "a.py"), ("r1", "b.py"), ("r3", "e.rs")}


def test_dv_paths_survive_hostile_root_containing_data_segment(spark, tmp_path):
    """A table ROOT whose path itself contains '/data/' must not
    confuse the data-file identity derivation (_rel_to_data and its
    substring_index(file_path, '/data/', -1) SQL twins split on the
    LAST occurrence): DV reads, metadata counts and the changefeed all
    key files by that suffix."""
    root = tmp_path / "data" / "warehouse"
    t = _mk_table(spark, root, BASE, stats_cols=["commit"])
    assert "/data/" in str(root).replace("\\", "/")
    pre_sid = t.current()["snapshot_id"]
    rep = delete_where(t, predicate="lang = 'go'", mode="dv")
    assert rep["rows_changed"] == 2
    # read-side: deleted rows are gone, survivors intact
    assert set(_state(t)) == {("r1", "a.py"), ("r1", "b.py"), ("r3", "e.rs")}
    assert t.metadata_row_count() == 3 == t.read().count()
    # changefeed across the DV commit: tombstones reconstructed from the
    # same /data/-relative identity
    ch = t.changes(pre_sid, t.current()["snapshot_id"])
    rows = {(r["repo"], r["path"]): r["op"] for r in ch.collect()}
    assert rows == {("r2", "c.go"): "D", ("r2", "d.go"): "D"}
