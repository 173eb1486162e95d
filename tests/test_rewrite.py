"""rewrite_data_files: small-file bin-packing compaction.

Iceberg's rewrite_data_files(binpack) analog: a pure physical reorg that
folds a bucket's long tail of small parquet files into ~target-size
files. Invariants pinned here: read() state identical before/after,
changes() skips the rewrite snapshot, buckets with pending deltas are
never touched, replaced files become vacuum orphans, and data-skipping
stats are re-harvested for the new files.
"""

import os

import pyspark.sql.functions as F

from filters_spark.lake.table import LakeTable, bucket_expr


def _rows(n, rev=0):
    return [
        (f"r{i % 5}", f"p{i}", f"c{rev:02d}", rev * 100000 + i, "py", f"body-{i}-{rev}")
        for i in range(n)
    ]


def _df(spark, rows, nparts=8):
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, event_seq long, "
        "lang string, content string",
    ).withColumn("content_sha", F.sha2("content", 256))
    bkt = bucket_expr(F.col("repo"), F.col("path"), 4, 16).cast("int").alias("_bucket")
    # many small files per bucket: each of nparts tasks writes one file
    # per bucket value it holds
    return df.select("*", bkt).repartition(nparts)


def _state(df):
    cols = ["repo", "path", "commit", "event_seq", "lang", "content"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _files_per_bucket(t):
    return {b: len(fl) for b, fl in t.current()["buckets"].items()}


def _mk(spark, tmp_path, n=200):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), ["repo", "path"], num_buckets=4,
        stats_cols=["event_seq"],
    )
    df = _df(spark, _rows(n))
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {b: "c00:0000000001" for b in touched})
    return t


def test_rewrite_packs_small_files_state_identical(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before_state = _state(t.read())
    before_files = _files_per_bucket(t)
    assert any(n > 1 for n in before_files.values()), "fixture must fragment"

    snap = t.rewrite_data_files(target_file_bytes=1 << 30)  # pack to 1 file
    assert snap is not None and snap["operation"] == "rewrite"
    after_files = _files_per_bucket(t)
    assert all(n == 1 for n in after_files.values()), after_files
    assert _state(t.read()) == before_state

    # second pass: everything already packed -> no-op
    assert t.rewrite_data_files(target_file_bytes=1 << 30) is None


def test_rewrite_skips_buckets_with_pending_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # append a delta to ONE bucket
    d = _df(spark, [("r0", "p0", "c01", 100001, "py", "upd")], nparts=1) \
        .withColumn("op", F.lit("U"))
    b0 = d.select("_bucket").first()[0]
    t.commit_deltas(d, [b0], {b0: "c01:0000000001"})
    before_state = _state(t.read())

    snap = t.rewrite_data_files(target_file_bytes=1 << 30)
    assert snap is not None
    # the MoR bucket's base files are untouched; others packed to 1
    files = _files_per_bucket(t)
    assert files[str(b0)] > 1
    assert all(n == 1 for b, n in files.items() if b != str(b0))
    assert _state(t.read()) == before_state


def test_changes_skips_rewrite_snapshot(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "lake2"), ["repo", "path"], num_buckets=4,
    )
    d = _df(spark, [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in _rows(60)]) \
        .withColumn("op", F.lit("U"))
    touched = sorted(r[0] for r in d.select("_bucket").distinct().collect())
    t.commit_deltas(d, touched, {b: "c00:0000000001" for b in touched})
    t.compact()  # fold deltas (leaves one packed file per bucket)
    # fragment again with a CoW overwrite so buckets qualify for rewrite
    frag = _df(spark, _rows(60, rev=1))
    t.commit_buckets(frag, touched, {b: "c01:0000000001" for b in touched})
    assert any(n > 1 for n in _files_per_bucket(t).values())
    base_sid = t.current_snapshot_id()
    assert t.rewrite_data_files(target_file_bytes=1 << 30) is not None
    # the incremental feed across the rewrite carries no phantom changes
    ch = t.changes(base_sid)
    assert ch is None or ch.count() == 0


def test_rewrite_orphans_swept_and_stats_reharvested(spark, tmp_path):
    t = _mk(spark, tmp_path)
    old_files = {f for fl in t.current()["buckets"].values() for f in fl}
    t.rewrite_data_files(target_file_bytes=1 << 30)
    t.expire_snapshots(keep_last=1)
    orphans = set(t.vacuum(min_age_seconds=0))
    assert old_files <= orphans
    # skipping stats exist for the NEW files (re-harvested at commit)
    rep = t.prune_report(("event_seq", 0, 10))
    assert rep["files_total"] > 0


def test_rewrite_converges_no_repeated_churn(spark, tmp_path):
    """A bucket whose planned slot count would not REDUCE its file
    count must not qualify — otherwise just-under-target buckets
    rewrite the same bytes on every maintenance run forever."""
    t = _mk(spark, tmp_path, n=120)
    files = [f for fl in t.current()["buckets"].values() for f in fl]
    # target below every file size -> slots >= len(files) per bucket
    tiny_target = min(t.io.size(f) for f in files) // 2 or 1
    assert t.rewrite_data_files(target_file_bytes=tiny_target) is None


def test_rewrite_preserves_sort_clustering(spark, tmp_path):
    """On a sort_cols table the pack slots follow the sort order, so
    packed files keep tight min/max ranges and skipping stays
    selective after the rewrite."""
    import pyspark.sql.functions as F
    from filters_spark.lake.table import bucket_expr

    t = LakeTable.create(
        spark, str(tmp_path / "lakez"), ["repo", "path"], num_buckets=1,
        path_salt=1, stats_cols=["event_seq"], sort_cols=["event_seq"],
    )
    rows = [("r0", f"p{i}", "c00", i, "py", f"b{i}") for i in range(400)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, event_seq long, "
        "lang string, content string",
    ).withColumn("content_sha", F.sha2("content", 256))
    bkt = bucket_expr(F.col("repo"), F.col("path"), 1, 1).cast("int").alias("_bucket")
    df = df.select("*", bkt).repartition(8)  # 8 fragmented files
    t.commit_buckets(df, [0], {0: "c00:0000000001"})
    before = _state(t.read())

    sizes = [t.io.size(f) for f in t.current()["buckets"]["0"]]
    # pack 8 files -> ~4: every output file should span ~1/4 of the range
    snap = t.rewrite_data_files(target_file_bytes=max(1, sum(sizes) // 4))
    assert snap is not None
    assert _state(t.read()) == before
    rep = t.prune_report(("event_seq", 0, 40))
    assert rep["files_skipped"] > 0, rep  # clustering survived the rewrite
