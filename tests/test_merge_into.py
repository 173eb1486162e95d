"""Declarative MERGE INTO (lake/merge.py): clause semantics, ANSI
cardinality, bucket pruning, delta folding, empty-table merges."""

import pytest
import pyspark.sql.functions as F

from filters_spark.lake.merge import merge_into
from filters_spark.lake.table import LakeTable, bucket_expr

PAY = ["repo", "path", "commit", "event_seq", "lang", "content"]


def _mk_table(spark, root, rows, num_buckets=4):
    t = LakeTable.create(spark, str(root), ["repo", "path"], num_buckets=num_buckets)
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
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"], r["content_sha"])
        for r in t.read().collect()
    } if t.read() is not None else {}


BASE = [
    ("r1", "a.py", "000000000001", 1, "py", "alpha"),
    ("r1", "b.py", "000000000001", 2, "py", "beta"),
    ("r2", "c.go", "000000000001", 3, "go", "gamma"),
    ("r2", "d.go", "000000000001", 4, "go", "delta"),
]


_SRC_DDL = ("repo string, path string, `commit` string, event_seq long, "
            "lang string, content string, op string")


def _src(spark, rows, ddl=None):
    return spark.createDataFrame(rows, ddl or _SRC_DDL)


def test_upsert_update_delete_insert(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [
        ("r1", "a.py", "000000000002", 9, "py", "ALPHA2", "U"),
        ("r1", "b.py", "000000000002", 9, None, None, "D"),
        ("r9", "new.rs", "000000000002", 9, "rs", "fresh", "I"),
    ])
    merge_into(t, src, delete_when="s.op = 'D'")
    st = _state(t)
    assert st[("r1", "a.py")][2] == "ALPHA2"
    assert ("r1", "b.py") not in st
    assert st[("r9", "new.rs")][2] == "fresh"
    # untouched keys keep their rows
    assert st[("r2", "c.go")][2] == "gamma" and st[("r2", "d.go")][2] == "delta"
    assert t.current()["operation"] == "merge"


def test_conditional_update_and_computed_columns(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [
        ("r1", "a.py", "000000000002", 10, "py", "newA", "U"),   # even: applies
        ("r2", "c.go", "000000000002", 11, "go", "newC", "U"),   # odd: skipped
    ])
    merge_into(
        t, src,
        update={"content": "'M:' || s.content",
                "lang": "coalesce(s.lang, t.lang)",
                "commit": "s.commit", "event_seq": "s.event_seq"},
        update_when="s.event_seq % 2 = 0",
        insert=None,
    )
    st = _state(t)
    assert st[("r1", "a.py")][2] == "M:newA"
    assert st[("r2", "c.go")][2] == "gamma"  # condition false: untouched
    # content_sha is recomputed derived state
    import hashlib
    assert st[("r1", "a.py")][3] == hashlib.sha256(b"M:newA").hexdigest()


def test_insert_subset_clause_nulls_unlisted(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [("r7", "x.c", "000000000003", 1, "c", "xx", "I")])
    merge_into(
        t, src, update=None,
        insert={"repo": "s.repo", "path": "s.path", "content": "s.content",
                "commit": "s.commit", "event_seq": "s.event_seq"},
    )
    r = t.read().filter(F.col("repo") == "r7").collect()[0]
    assert r["content"] == "xx" and r["lang"] is None


def test_insert_when_filters_inserts(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [
        ("r7", "x.c", "000000000003", 1, "c", "xx", "I"),
        ("r7", "y.c", "000000000003", 2, "c", "yy", "D"),  # delete of absent key
    ])
    merge_into(t, src, update=None, insert_when="s.op <> 'D'")
    paths = {r["path"] for r in t.read().filter(F.col("repo") == "r7").collect()}
    assert paths == {"x.c"}


def test_cardinality_violation_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [
        ("r1", "a.py", "000000000002", 1, "py", "one", "U"),
        ("r1", "a.py", "000000000002", 2, "py", "two", "U"),
    ])
    with pytest.raises(Exception, match="cardinality"):
        merge_into(t, src)


def test_untouched_buckets_carry_over_by_reference(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE, num_buckets=8)
    before = t._raw_snapshot()
    src = _src(spark, [("r1", "a.py", "000000000002", 9, "py", "A2", "U")])
    from filters_spark.lake.xxh import bucket_of
    touched_b = str(bucket_of("r1", "a.py", 8, 16))
    merge_into(t, src)
    after = t._raw_snapshot()
    for b in before["buckets"]:
        if b != touched_b:
            assert after["buckets"][b] == before["buckets"][b]  # same manifest ref
    assert after["buckets"][touched_b] != before["buckets"].get(touched_b)


def test_merge_folds_pending_deltas(spark, tmp_path):
    """A MoR bucket's deltas fold into the merge basis and the commit
    clears them — the post-merge read equals merging over the folded
    state, never a stale base."""
    t = _mk_table(spark, tmp_path / "l", BASE, num_buckets=1)
    d = spark.createDataFrame(
        [("r1", "a.py", "000000000002", 1, "py", "alpha-v2", "U")],
        [*PAY, "op"],
    ).select("*", F.lit(0).alias("_bucket"))
    t.commit_deltas(d, [0], {0: "000000000002:0000000001"})
    src = _src(spark, [("r1", "b.py", "000000000003", 1, "py", "beta-v3", "U")])
    merge_into(t, src)
    st = _state(t)
    assert st[("r1", "a.py")][2] == "alpha-v2"   # delta survived the merge
    assert st[("r1", "b.py")][2] == "beta-v3"
    assert not any(t.current()["deltas"].values())


def test_merge_into_empty_table_inserts(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", [])
    src = _src(spark, [("r1", "a.py", "000000000001", 1, "py", "hello", "I")])
    merge_into(t, src)
    assert _state(t)[("r1", "a.py")][2] == "hello"


def test_delete_only_merge(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [("r1", "a.py", "x", 1, None, None, "D")])
    merge_into(t, src, update=None, insert=None, delete_when="s.op = 'D'")
    st = _state(t)
    assert ("r1", "a.py") not in st and len(st) == 3


def test_no_clauses_raises_and_empty_source_noop(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    with pytest.raises(ValueError, match="no-op"):
        merge_into(t, _src(spark, []), update=None, insert=None)
    sid = t.current_snapshot_id()
    assert merge_into(t, _src(spark, [])) is None
    assert t.current_snapshot_id() == sid


def test_unknown_clause_column_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    with pytest.raises(ValueError, match="unknown column"):
        merge_into(t, _src(spark, []), update={"nope": "s.content"})


def test_time_travel_spans_merge(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre = t.current_snapshot_id()
    merge_into(t, _src(spark, [("r1", "a.py", "000000000002", 9, "py", "A2", "U")]))
    old = {r["path"]: r["content"] for r in t.read(pre).collect()}
    assert old["a.py"] == "alpha"


def test_by_source_delete_snapshot_sync(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE — the snapshot-sync
    shape: the source IS the full new state; target rows absent from
    it are deleted, matched rows update, new rows insert."""
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [
        ("r1", "a.py", "000000000002", 9, "py", "ALPHA2", "U"),
        ("r9", "new.rs", "000000000002", 9, "rs", "fresh", "I"),
    ])
    merge_into(t, src, delete_by_source_when="true")
    st = _state(t)
    assert set(st) == {("r1", "a.py"), ("r9", "new.rs")}
    assert st[("r1", "a.py")][2] == "ALPHA2"


def test_by_source_conditional_delete_and_update(spark, tmp_path):
    """Conditional BY SOURCE: delete only stale go rows, mark the
    remaining unmatched rows via an update over t; matched/insert
    clauses behave as before; s is NULL in by-source expressions."""
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [
        ("r1", "a.py", "000000000002", 9, "py", "ALPHA2", "U"),
    ])
    merge_into(
        t, src,
        delete_by_source_when="t.lang = 'go'",
        update_by_source={"content": "'STALE:' || t.content"},
    )
    st = _state(t)
    assert ("r2", "c.go") not in st and ("r2", "d.go") not in st
    assert st[("r1", "b.py")][2] == "STALE:beta"      # unmatched, kept, marked
    assert st[("r1", "a.py")][2] == "ALPHA2"          # matched update untouched
    # content_sha recomputed for the by-source update
    import hashlib
    assert st[("r1", "b.py")][3] == hashlib.sha256(b"STALE:beta").hexdigest()


def test_by_source_empty_source_deletes_everything(spark, tmp_path):
    """An EMPTY feed + unconditional BY SOURCE delete = truncate —
    the degenerate snapshot sync, must not early-exit as a no-op."""
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [])
    merge_into(t, src, delete_by_source_when="true")
    assert _state(t) == {}


def test_by_source_off_keeps_unmatched_untouched(spark, tmp_path):
    """Default (clauses None): unmatched target rows untouched and the
    merge stays bucket-pruned (regression guard for the new params)."""
    t = _mk_table(spark, tmp_path / "l", BASE)
    src = _src(spark, [("r1", "a.py", "000000000002", 9, "py", "A2", "U")])
    merge_into(t, src)
    st = _state(t)
    assert len(st) == 4 and st[("r2", "c.go")][2] == "gamma"


def test_by_source_reaches_delta_only_buckets(spark, tmp_path):
    """Regression (review finding): a MoR bucket whose rows live purely
    in delta files (no base commit) must still be swept by BY SOURCE
    clauses — snapshot sync deletes feed-absent rows wherever they
    live."""
    t = _mk_table(spark, tmp_path / "l", [])  # empty table: no base buckets
    d = spark.createDataFrame(
        [("r1", "a.py", "000000000001", 1, "py", "alpha", "U"),
         ("r2", "c.go", "000000000001", 2, "go", "gamma", "U")],
        _SRC_DDL,
    ).select("*", bucket_expr(F.col("repo"), F.col("path"), 4, 16)
             .cast("int").alias("_bucket"))
    touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
    t.commit_deltas(d.drop(), touched, {})
    assert t.current()["buckets"] == {} and t.current()["deltas"]

    src = _src(spark, [("r1", "a.py", "000000000002", 9, "py", "A2", "U")])
    merge_into(t, src, delete_by_source_when="true")
    st = _state(t)
    assert set(st) == {("r1", "a.py")}
    assert st[("r1", "a.py")][2] == "A2"
