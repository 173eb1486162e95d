"""Timestamp time travel + metadata tables (lake/table.py
snapshot_as_of / history / files) — Iceberg FOR TIMESTAMP AS OF and
the history/files metadata-table surface, driver-side only."""

import time

import pytest
import pyspark.sql.functions as F

from filters_spark.lake.table import LakeTable, bucket_expr

DDL = ("repo string, path string, `commit` string, event_seq long, "
       "lang string, content string")


def _commit(t, spark, rows, wm="000000000001:0000000000"):
    df = spark.createDataFrame(rows, DDL).select(
        "*",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
        bucket_expr(F.col("repo"), F.col("path"), 2, 16).cast("int").alias("_bucket"),
    )
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    return t.commit_buckets(df, touched, {b: wm for b in touched})


def test_snapshot_as_of(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "l"), ["repo", "path"], num_buckets=2)
    t0 = int(time.time() * 1000)
    time.sleep(0.02)
    s1 = _commit(t, spark, [("r", "a", "000000000001", 1, "py", "v1")])
    time.sleep(0.02)
    mid = int(time.time() * 1000)
    time.sleep(0.02)
    s2 = _commit(t, spark, [("r", "a", "000000000002", 1, "py", "v2")])

    assert t.snapshot_as_of(int(time.time() * 1000) + 1000) == s2["snapshot_id"]
    assert t.snapshot_as_of(mid) == s1["snapshot_id"]
    assert t.snapshot_as_of(t0) == 0  # the create snapshot
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.snapshot_as_of(t0 - 100_000)
    # reads compose: state AS OF mid is v1
    row = t.read(t.snapshot_as_of(mid)).collect()[0]
    assert row["content"] == "v1"


def test_as_of_ignores_branch_snapshots(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "l"), ["repo", "path"], num_buckets=2)
    _commit(t, spark, [("r", "a", "000000000001", 1, "py", "v1")])
    t.create_branch("b")
    df = spark.createDataFrame(
        [("r", "a", "000000000002", 1, "py", "branch-only")], DDL
    ).select(
        "*",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        bucket_expr(F.col("repo"), F.col("path"), 2, 16).cast("int").alias("_bucket"),
    )
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets_to("b", df, touched, {})
    time.sleep(0.02)
    # "now" resolves to main's head, never the newer branch snapshot
    sid = t.snapshot_as_of(int(time.time() * 1000) + 1000)
    assert sid == t.current_snapshot_id()
    assert t.read(sid).collect()[0]["content"] == "v1"


def test_history_flags_offchain_and_branch(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "l"), ["repo", "path"], num_buckets=2)
    s1 = _commit(t, spark, [("r", "a", "000000000001", 1, "py", "v1")])
    s2 = _commit(t, spark, [("r", "a", "000000000002", 1, "py", "v2")])
    t.rollback(s1["snapshot_id"])  # s2 stays retained but off-chain
    t.create_branch("dev")
    df = spark.createDataFrame(
        [("r", "z", "000000000003", 1, "py", "bb")], DDL
    ).select(
        "*",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        bucket_expr(F.col("repo"), F.col("path"), 2, 16).cast("int").alias("_bucket"),
    )
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    bs = t.commit_buckets_to("dev", df, touched, {})

    h = {r["snapshot_id"]: r for r in t.history()}
    assert h[s1["snapshot_id"]]["is_current_ancestor"] is True
    # rollback APPENDS (parent = superseded head, history intact), so
    # the rolled-back snapshot remains an ancestor; only branch
    # snapshots are off-chain
    assert h[s2["snapshot_id"]]["is_current_ancestor"] is True
    assert h[bs["snapshot_id"]]["ref"] == "dev"
    assert h[bs["snapshot_id"]]["is_current_ancestor"] is False
    assert h[t.current_snapshot_id()]["operation"] == "rollback"


def test_files_metadata_table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "l"), ["repo", "path"], num_buckets=2,
        stats_cols=["event_seq"],
    )
    _commit(t, spark, [
        ("r", "a", "000000000001", 1, "py", "v1"),
        ("r", "b", "000000000001", 2, "go", "v2"),
    ])
    d = spark.createDataFrame(
        [("r", "a", "000000000002", 3, "py", "v3", "U")], DDL + ", op string"
    ).select("*", bucket_expr(F.col("repo"), F.col("path"), 2, 16)
             .cast("int").alias("_bucket"))
    touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
    t.commit_deltas(d, touched, {})

    rows = t.files()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"base", "delta"}
    snap = t.current()
    n_manifest_files = sum(len(fl) for fl in snap["buckets"].values()) + sum(
        len(fl) for fl in snap["deltas"].values()
    )
    assert len(rows) == n_manifest_files
    base = [r for r in rows if r["kind"] == "base"]
    assert all(r["size_bytes"] > 0 for r in rows)
    assert sum(r["rows"] for r in base) == 2          # footer row counts
    assert all("event_seq" in (r["stats"] or {}) for r in base)
    # time travel: the files table of snapshot 1 has no deltas
    assert {r["kind"] for r in t.files(1)} == {"base"}


def test_partitions_metadata_table(spark, tmp_path):
    """partitions() — the per-bucket rollup of files(): manifest-only
    totals, delta backlog, watermarks; rows/bytes None without
    harvested stats, exact with them."""
    t = LakeTable.create(
        spark, str(tmp_path / "l"), ["repo", "path"], num_buckets=2,
        stats_cols=["event_seq"],
    )
    _commit(t, spark, [
        ("r", "a", "000000000001", 1, "py", "v1"),
        ("r", "b", "000000000001", 2, "py", "v2"),
        ("q", "c", "000000000001", 3, "rs", "v3"),
    ])
    parts = {p["bucket"]: p for p in t.partitions()}
    assert sum(p["files"] for p in parts.values()) >= 1
    assert sum(p["rows"] for p in parts.values()) == 3
    assert all(p["bytes"] > 0 for p in parts.values())
    assert all(p["delta_files"] == 0 for p in parts.values())
    assert all(p["watermark"] == "000000000001:0000000000" for p in parts.values())

    # MoR backlog shows up under delta_*
    ddf = spark.createDataFrame(
        [("r", "a", "000000000002", 9, "py", "v9", "U")],
        DDL + ", op string",
    ).select(
        "*",
        bucket_expr(F.col("repo"), F.col("path"), 2, 16).cast("int").alias("_bucket"),
    )
    b = ddf.select("_bucket").first()[0]
    t.commit_deltas(ddf, [b], {b: "000000000002:0000000009"})
    parts2 = {p["bucket"]: p for p in t.partitions()}
    assert parts2[b]["delta_files"] == 1
    assert parts2[b]["delta_rows"] == 1
    assert parts2[b]["watermark"] == "000000000002:0000000009"
    # history is queryable: the pre-delta snapshot still shows no backlog
    pre = {p["bucket"]: p for p in t.partitions(snapshot_id=1)}
    assert pre[b]["delta_files"] == 0

    # without stats harvesting, totals degrade to None, never to wrong
    t2 = LakeTable.create(spark, str(tmp_path / "l2"), ["repo", "path"], num_buckets=2)
    _commit(t2, spark, [("r", "a", "000000000001", 1, "py", "v1")])
    p2 = [p for p in t2.partitions() if p["files"]]
    assert p2 and all(p["rows"] is None and p["bytes"] is None for p in p2)


def test_expire_older_than_time_based_retention(spark, tmp_path):
    """expire_snapshots(older_than_ms=...) — Iceberg's expireOlderThan
    composed with the count floor: young snapshots survive beyond
    keep_last; a cutoff in the future degrades to plain keep_last."""
    t = LakeTable.create(spark, str(tmp_path / "l"), ["repo", "path"], num_buckets=2)
    s1 = _commit(t, spark, [("r", "a", "000000000001", 1, "py", "v1")])
    s2 = _commit(t, spark, [("r", "a", "000000000002", 2, "py", "v2")])
    s3 = _commit(t, spark, [("r", "a", "000000000003", 3, "py", "v3")])

    # cutoff before every commit: everything is "young", nothing beyond
    # keep_last's own floor expires
    cutoff = t.snapshot(s1["snapshot_id"])["timestamp_ms"]
    expired = t.expire_snapshots(keep_last=1, older_than_ms=cutoff)
    assert expired == [] or all(
        t._raw_snapshot_if_retained(i) is None for i in expired
    )
    assert t.read(s1["snapshot_id"]) is not None  # still time-travelable

    # cutoff in the future: pure keep_last behavior
    future = t.snapshot(s3["snapshot_id"])["timestamp_ms"] + 10_000
    expired = t.expire_snapshots(keep_last=1, older_than_ms=future)
    assert s1["snapshot_id"] in expired and s2["snapshot_id"] in expired
    import pytest as _pytest
    with _pytest.raises(Exception):
        t.read(s1["snapshot_id"])
    assert t.read().collect()[0]["content"] == "v3"
