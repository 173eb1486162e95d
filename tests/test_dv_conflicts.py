"""Deletion-vector conflict hardening (round-6 advice closures):

- commit_delete_vectors refuses to build on a head whose referenced
  base files were replaced between scan and commit (the silent
  data-retention race: a compact/rewrite landing mid-sweep makes the
  vectors' relfiles unresolvable at read time and 'deleted' rows
  resurface).
- _dv_deletes raises, instead of silently emitting no tombstones, when
  a DV commit's referenced base files are absent from the parent
  manifests, and when the commit lacks a dv_identity.
"""

import pytest
import pyspark.sql.functions as F

from filters_spark.lake.dml import delete_where
from filters_spark.lake.table import LakeTable, bucket_expr

PAY = ["repo", "path", "commit", "event_seq", "lang", "content"]

BASE = [
    ("r1", "a.py", "000000000001", 1, "py", "alpha"),
    ("r1", "b.py", "000000000001", 2, "py", "beta"),
    ("r2", "c.go", "000000000002", 3, "go", "gamma"),
    ("r2", "d.go", "000000000002", 4, "go", "delta"),
    ("r3", "e.rs", "000000000003", 5, "rs", "epsilon"),
]


def _mk_table(spark, root, rows, num_buckets=4, **kw):
    t = LakeTable.create(spark, str(root), ["repo", "path"], num_buckets=num_buckets, **kw)
    df = spark.createDataFrame(rows, PAY).select(
        "*",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
        bucket_expr(F.col("repo"), F.col("path"), num_buckets, 16)
        .cast("int").alias("_bucket"),
    )
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {})
    return t


def test_commit_refused_when_scanned_files_replaced(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    snap = t.current()
    base_files = [f for fl in snap["buckets"].values() for f in fl]
    # build a real matched frame the way _dml_dv would (one row)
    b0 = sorted(int(b) for b in snap["buckets"])[0]
    rel = snap["buckets"][str(b0)][0].replace("\\", "/").rsplit("/data/", 1)[-1]
    dv = spark.createDataFrame([(rel, 0, b0)], "_relfile string, _pos long, _bucket int")
    # a foreign commit replaces the bucket's files (rewrite)
    t.rewrite_data_files()
    with pytest.raises(ValueError, match="gone from the head's bucket"):
        t.commit_delete_vectors(
            dv, [b0], {b0: "000000000009:" + "0" * 19 + "1"},
            dv_identity={"commit": "000000000009", "event_seq": 1},
            basis_snapshot_id=snap["snapshot_id"],
            basis_files=base_files,
        )
    # and the sweep re-run against the fresh head succeeds
    rep = delete_where(t, predicate="lang = 'go'", mode="dv")
    assert rep["rows_changed"] == 2 and t.read().count() == 3


def test_commit_refused_after_rescale(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    snap = t.current()
    base_files = [f for fl in snap["buckets"].values() for f in fl]
    b0 = sorted(int(b) for b in snap["buckets"])[0]
    rel = snap["buckets"][str(b0)][0].replace("\\", "/").rsplit("/data/", 1)[-1]
    dv = spark.createDataFrame([(rel, 0, b0)], "_relfile string, _pos long, _bucket int")
    t.rescale(8)
    with pytest.raises(ValueError, match="rescaled"):
        t.commit_delete_vectors(
            dv, [b0], {b0: "000000000009:" + "0" * 19 + "1"},
            dv_identity={"commit": "000000000009", "event_seq": 1},
            basis_snapshot_id=snap["snapshot_id"],
            basis_files=base_files,
        )


def test_same_head_commit_still_works(spark, tmp_path):
    # the basis check is a no-op when nothing landed since the scan —
    # the normal single-writer sweep path keeps working end to end
    t = _mk_table(spark, tmp_path / "l", BASE)
    rep = delete_where(t, predicate="lang = 'py'", mode="dv")
    assert rep["rows_changed"] == 2
    assert {r["repo"] for r in t.read().collect()} == {"r2", "r3"}


def test_dv_deletes_raises_on_unresolvable_relfiles(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre = t.current()["snapshot_id"]
    delete_where(t, predicate="lang = 'go'", mode="dv")
    sid = t.current()["snapshot_id"]
    raw = t._raw_snapshot(sid)
    raw = t._resolve_header(dict(raw))
    # corrupt the parent linkage: point the commit at a parent whose
    # manifests do not hold the referenced files (fresh empty table)
    t2 = LakeTable.create(spark, str(tmp_path / "empty"), ["repo", "path"], num_buckets=4)
    raw2 = dict(raw)
    raw2["parent_id"] = t2.current()["snapshot_id"]
    with pytest.raises(ValueError, match="absent from its parent"):
        t2._dv_deletes(sid, raw2, ["lang", "content"])


def test_dv_deletes_raises_without_identity(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "l", BASE)
    pre = t.current()["snapshot_id"]
    delete_where(t, predicate="lang = 'go'", mode="dv")
    raw = t._resolve_header(dict(t._raw_snapshot()))
    raw.pop("dv_identity", None)
    with pytest.raises(ValueError, match="dv_identity"):
        t._dv_deletes(raw["snapshot_id"], raw, ["lang", "content"])
