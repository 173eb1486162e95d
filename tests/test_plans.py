"""Plan audits: pushdown, pruning, broadcast, shuffle budget — the
'would this survive 100×' checks (SURVEY.md §4)."""

import os

import pyspark.sql.functions as F

from filters_spark.plans import (
    has_python_eval,
    pushed_filters,
    scan_columns,
)
from filters_spark.plans.audit import (
    broadcast_join_count,
    exchange_count,
    formatted_plan,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey")
    pushed = pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    cols = scan_columns(df)
    assert cols and set(cols[0]) == {"l_orderkey", "l_quantity"}, cols


def test_engine_validate_python_is_arrow_batched_only(spark, tmp_path):
    """The ENGINE's staged validation: the only Python in the plan is
    the Arrow-batched kernel stage (content's Unicode NFC has no native
    twin); row-at-a-time Python (BatchEvalPython) must never appear,
    and WAL columns outside the kernel-needing chains stay JVM-native
    (non-string sources are CAST to string — the WAL payload contract —
    not diverted to an extra kernel stage)."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.plans.audit import executed_plan
    from filters_spark.sources.datagen import gen_events

    t = LakeTable.create(spark, str(tmp_path / "lakeP"), ["repo", "path"], num_buckets=4)
    eng = CDCEngine(spark, t, default_registry())
    ev = gen_events(spark, 500, n_repos=5, n_paths=40, seed=9)
    plan = executed_plan(eng._validated(ev))
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python, ever
    # exactly one fused Arrow stage (per-field kernel stages would
    # multiply the Arrow serialization round trips)
    assert plan.count("ArrowEvalPython") <= 1


def test_native_validation_has_no_python(spark):
    from filters_spark.operators.validate import validate

    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = validate(
        df,
        {"text": ["required", "strip", ("max_length", {"max_length": 10000})]},
        keep_raw=False,
    )
    assert not has_python_eval(out)
    # and pruning still works through the validation projection
    cols = scan_columns(out.select("doc_id", "_errors"))
    assert cols and "lang" not in cols[0]


def test_small_dim_join_broadcasts(spark):
    import __spark_entry__ as m

    df = m.queries()["join_revenue_by_nation"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_merge_path_single_shuffle(spark, tmp_path):
    """The CDC merge plan must contain exactly ONE hash exchange (by
    _bucket) between validated events and the written files."""
    from filters_spark.lake.table import bucket_expr, watermark_str
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("repo"),
        F.col("source").alias("path"),
        F.lit("0000").alias("commit"),
        F.lit(0).cast("long").alias("event_seq"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.lit("U").alias("op"),
    ).withColumn("_bucket", bucket_expr(F.col("repo"), F.col("path"), 8, 4)) \
     .withColumn("_wm", watermark_str(F.col("commit"), F.col("event_seq")))

    mw = Window.partitionBy("_bucket").orderBy("repo", "path", F.col("_wm").desc())
    head = (
        F.lag("repo").over(mw).isNull()
        | (F.lag("repo").over(mw) != F.col("repo"))
        | (F.lag("path").over(mw) != F.col("path"))
    )
    merged = ev.withColumn("_head", F.coalesce(head, F.lit(True))).filter(
        F.col("_head") & (F.col("op") != "D")
    )
    assert exchange_count(merged) == 1, merged._jdf.queryExecution().executedPlan().toString()


def test_mor_read_single_shuffle(spark, tmp_path):
    """The merge-on-read fold (base ∪ deltas → LWW) must cost exactly
    ONE hash exchange — the window on _bucket — and stay Python-free."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events

    t = LakeTable.create(spark, str(tmp_path / "lake"), ["repo", "path"], num_buckets=4)
    eng = CDCEngine(spark, t, default_registry(), write_mode="mor", compact_after=99)
    p = str(tmp_path / "ev.parquet")
    gen_events(spark, 2000, n_repos=10, n_paths=80, seed=5).write.parquet(p)
    eng.replay(spark.read.parquet(p), num_batches=2)
    assert t.current()["deltas"], "precondition: deltas must exist"

    df = t.read()
    assert exchange_count(df) == 1, formatted_plan(df)
    assert not has_python_eval(df)


def test_funnel_single_user_exchange(spark):
    """funnel(): N stacked conditional-min windows must share ONE
    exchange on the user key — a per-stage shuffle would make funnel
    depth multiply network cost at corpus scale."""
    from filters_spark.operators.events import funnel

    ev = spark.createDataFrame(
        [(i % 7, ["view", "click", "purchase"][i % 3], float(i)) for i in range(60)],
        "user_id long, event_type string, ts double",
    )
    out = funnel(ev, ["view", "click", "purchase"])
    out.collect()
    # one shuffle for the windows + one for the distinct on user rows
    assert exchange_count(out) <= 2, formatted_plan(out)


def test_transitions_one_data_scale_exchange(spark):
    """transition_counts(): the lead window is the only data-scale
    shuffle; the pair groupBy and from_total window run constant-width
    (|types|^2 rows)."""
    from filters_spark.operators.events import transition_counts

    ev = spark.createDataFrame(
        [(i % 7, ["a", "b", "c"][i % 3], float(i), i) for i in range(60)],
        "user_id long, event_type string, ts double, event_id long",
    )
    out = transition_counts(ev)
    out.collect()
    # window(user) + groupBy(pair) + window(from) = 3 exchanges, but
    # only the FIRST touches data-scale rows
    assert exchange_count(out) <= 3, formatted_plan(out)


def test_rewrite_read_stays_bare_scan(spark, tmp_path):
    """After rewrite_data_files the bucket read must remain a bare
    scan — the physical reorg must not introduce merge work."""
    import pyspark.sql.functions as F
    from filters_spark.lake.table import LakeTable, bucket_expr

    t = LakeTable.create(
        spark, str(tmp_path / "lakerw"), ["repo", "path"], num_buckets=2
    )
    bkt = bucket_expr(F.col("repo"), F.col("path"), 2, 16).cast("int").alias("_bucket")
    df = spark.createDataFrame(
        [(f"r{i%3}", f"p{i}", "c00", i, "py", f"b{i}") for i in range(80)],
        "repo string, path string, commit string, event_seq long, "
        "lang string, content string",
    ).withColumn("content_sha", F.sha2("content", 256)).select("*", bkt).repartition(6)
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {b: "c00:0000000001" for b in touched})
    assert t.rewrite_data_files(target_file_bytes=1 << 30) is not None
    rd = t.read()
    rd.collect()
    assert exchange_count(rd) == 0, formatted_plan(rd)


def test_merge_into_minimal_exchange_budget(spark, tmp_path):
    """Declarative MERGE INTO (lake/merge.py): exactly THREE exchanges
    — target keyed, source keyed (the cardinality window and the
    full-outer join SHARE the source exchange), and the bucketed-write
    repartition — with zero Python. A fourth exchange would mean the
    window picked a partitioning the join can't reuse; at 10^10 rows
    that is a second full shuffle of the source."""
    from filters_spark.lake.merge import merge_into
    from filters_spark.lake.table import LakeTable, bucket_expr

    t = LakeTable.create(spark, str(tmp_path / "l"), ["repo", "path"],
                         num_buckets=4)
    rows = [(f"r{i % 5}", f"p{i}.py", "000000000001", i, "py", f"c{i}")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "repo string, path string, `commit` string, event_seq long, "
              "lang string, content string"
    ).select(
        "*",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha"),
        bucket_expr(F.col("repo"), F.col("path"), 4, 16).cast("int").alias("_bucket"),
    )
    touched = sorted(r[0] for r in df.select("_bucket").distinct().collect())
    t.commit_buckets(df, touched, {})

    src = spark.createDataFrame(
        [("r1", "p1.py", "000000000002", 1, "py", "X", "U")],
        "repo string, path string, `commit` string, event_seq long, "
        "lang string, content string, op string",
    )
    captured = {}
    t.commit_buckets = lambda d, *a, **k: captured.update(df=d) or {"snapshot_id": -1}
    merge_into(t, src, delete_when="s.op = 'D'")
    out = captured["df"]
    assert not has_python_eval(out)
    assert exchange_count(out) == 3, out._jdf.queryExecution().executedPlan().toString()


def test_changes_with_images_exchange_budget(spark, tmp_path):
    """Pre-image feed (lake/table.py changes_with_images): at most
    THREE data-scale exchanges — the seed and key sides keyed for the
    semi-join, and the union keyed for the lag window — plus broadcast
    file->snapshot maps; the feed scan stays ONE parquet relation and
    nothing crosses into Python."""
    import pyspark.sql.functions as F
    from filters_spark.lake.table import LakeTable, bucket_expr

    t = LakeTable.create(spark, str(tmp_path / "lci"), ["repo", "path"], num_buckets=4)
    bkt = bucket_expr(F.col("repo"), F.col("path"), 4, 16).cast("int").alias("_bucket")
    base = spark.createDataFrame(
        [(f"r{i%3}", f"p{i}", "000000000001", i, "py", f"b{i}") for i in range(60)],
        "repo string, path string, commit string, event_seq long, "
        "lang string, content string",
    ).withColumn("content_sha", F.sha2("content", 256)).select("*", bkt)
    touched = sorted(r[0] for r in base.select("_bucket").distinct().collect())
    t.commit_buckets(base, touched, {})
    d = spark.createDataFrame(
        [(f"r{i%3}", f"p{i}", "000000000002", i, "py", f"n{i}", "U") for i in range(0, 60, 2)],
        "repo string, path string, commit string, event_seq long, "
        "lang string, content string, op string",
    ).select("*", bkt)
    dt = sorted(r[0] for r in d.select("_bucket").distinct().collect())
    t.commit_deltas(d, dt, {})
    feed = t.changes_with_images(1)
    feed.collect()
    assert not has_python_eval(feed)
    assert exchange_count(feed) <= 3, formatted_plan(feed)
    plan = feed._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # one scan for the feed, one (bucket-pruned) for the seed, one for
    # the key side — never one relation per snapshot
    assert plan.count("Scan parquet") <= 3


def test_interval_join_batch_plan_budget(spark):
    """Batch-mode interval join: one key-equality shuffle per side
    (the range rides as a join residual, never a cartesian), zero
    Python, filters on the sides pushed to the scans."""
    from filters_spark.streaming.joins import interval_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    j = interval_join(
        ev.filter(F.col("event_type") == "signup").select("ts", "user_id", "event_id"),
        ev.filter(F.col("event_type") == "purchase").select("ts", "user_id", "event_id"),
        ("user_id",), lower_s=0.0, upper_s=1800.0, watermark="10 minutes",
    )
    plan = formatted_plan(j)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert not has_python_eval(j)
    assert exchange_count(j) <= 2, plan
    assert any("signup" in p or "purchase" in p for p in pushed_filters(j))


def test_corpus_segment_dedupe_plan_budget(spark):
    """corpus_segment_dedupe(): the hot-set agg, the flag join and the
    per-doc rebuild are the only shuffles (<= 3 exchanges), zero
    Python anywhere, and broadcast_hot=True turns the flag join into a
    broadcast (no extra exchange for the corpus side). The corpus must
    CONTAIN boilerplate: on a hot-set-free input AQE's empty-relation
    propagation deletes the join outright (nice, but it would make
    these assertions vacuous)."""
    from filters_spark.operators.textstats import corpus_segment_dedupe

    docs = spark.createDataFrame(
        [(i, f"unique text {i}. subscribe now. more {i}") for i in range(40)],
        "doc_id long, text string",
    )
    out = corpus_segment_dedupe(docs)
    out.collect()
    assert not has_python_eval(out)
    # un-hinted: AQE converts the flag join to broadcast at runtime,
    # but the SMJ-planned probe-side seg exchange has already run — 4
    # shuffles total (count_distinct's pair+seg, probe seg, rebuild)
    assert exchange_count(out) <= 4, formatted_plan(out)

    # the explicit hint never plans the probe-side exchange: one fewer
    # data-scale shuffle of the exploded corpus
    hinted = corpus_segment_dedupe(docs, broadcast_hot=True)
    hinted.collect()
    assert broadcast_join_count(hinted) >= 1, formatted_plan(hinted)
    assert exchange_count(hinted) <= 3, formatted_plan(hinted)
