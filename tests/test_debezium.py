"""Debezium envelope adapter (sources/debezium.py): envelope decode,
ordering derivation, drop semantics, and end-to-end composition with
the CDC engine."""

import json
import os

import pyspark.sql.functions as F

from filters_spark.sources.debezium import (
    default_commit_expr,
    default_seq_expr,
    parse_debezium,
)

FIELDS = ["repo", "path", "lang", "content"]


def _env(op, after=None, before=None, file="mysql-bin.000003", pos=154,
         row=0, wrap=True):
    payload = {
        "before": before,
        "after": after,
        "source": {"connector": "mysql", "db": "d", "table": "t",
                   "file": file, "pos": pos, "row": row, "ts_ms": 1465581029523},
        "op": op,
        "ts_ms": 1465581029523,
    }
    return json.dumps({"schema": {"type": "struct"}, "payload": payload}
                      if wrap else payload)


def _values_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_parse_ops_and_images(spark):
    row_after = {"repo": "r1", "path": "a.py", "lang": "py", "content": "x"}
    row_key = {"repo": "r1", "path": "a.py"}
    vals = [
        _env("c", after=row_after),
        _env("r", after=row_after, pos=10),
        _env("u", after={**row_after, "content": "y"}, before=row_after, pos=20),
        _env("d", before=row_key, after=None, pos=30),
    ]
    out = parse_debezium(_values_df(spark, vals), FIELDS).orderBy("event_seq")
    rows = out.collect()  # ordered by pos: r(10), u(20), d(30), c(154)
    assert [r["op"] for r in rows] == ["I", "U", "D", "I"]
    # c/r/u read the after image; d reads before (key only, payload NULL)
    assert rows[0]["content"] == "x" and rows[1]["content"] == "y"
    assert rows[2]["repo"] == "r1" and rows[2]["content"] is None
    assert all(r["schema_version"] == 1 for r in rows)
    # binlog file suffix -> 12-hex commit; (pos, row) -> packed long
    assert rows[3]["commit"] == "000000000003"
    assert rows[3]["event_seq"] == 154 * 65536


def test_schemas_disabled_spelling(spark):
    """Without the schema wrapper the value IS the payload object."""
    v = _env("c", after={"repo": "r", "path": "p", "lang": "go", "content": "c"},
             wrap=False)
    rows = parse_debezium(_values_df(spark, [v]), FIELDS).collect()
    assert len(rows) == 1 and rows[0]["op"] == "I" and rows[0]["lang"] == "go"


def test_drop_tombstones_garbage_and_nonrow_ops(spark):
    vals = [
        None,                       # Kafka compaction tombstone
        "not json at all",          # unparseable
        '{"weird": true}',          # parseable, not an envelope
        _env("t"),                  # truncate: no row image
        _env("m"),                  # message op
        _env("c", after={"repo": "r", "path": "p"}),
    ]
    out = parse_debezium(_values_df(spark, vals), FIELDS)
    assert out.count() == 1


def test_ordering_matches_binlog_order(spark):
    """Watermark string order over (commit, event_seq) == binlog
    (file, pos, row) order — the exactly-once dedupe contract."""
    vals = [
        _env("c", after={"repo": "r", "path": "p1"}, file="mysql-bin.000009",
             pos=5, row=1),
        _env("c", after={"repo": "r", "path": "p2"}, file="mysql-bin.000009",
             pos=5, row=0),
        _env("c", after={"repo": "r", "path": "p3"}, file="mysql-bin.000010",
             pos=1, row=0),
        _env("c", after={"repo": "r", "path": "p4"}, file="mysql-bin.000009",
             pos=4, row=9),
    ]
    out = parse_debezium(_values_df(spark, vals), FIELDS)
    ordered = [r["path"] for r in out.orderBy("commit", "event_seq").collect()]
    assert ordered == ["p4", "p2", "p1", "p3"]


def test_missing_fields_arrive_null(spark):
    """Absent image keys -> NULL columns (the validation chain's
    presence filters route them, not the parser)."""
    v = _env("c", after={"repo": "r", "path": "p"})
    r = parse_debezium(_values_df(spark, [v]), FIELDS).collect()[0]
    assert r["lang"] is None and r["content"] is None


def test_include_source_lineage(spark):
    v = _env("u", after={"repo": "r", "path": "p"}, before={"repo": "r"})
    r = parse_debezium(_values_df(spark, [v]), FIELDS, include_source=True).collect()[0]
    assert r["_src_db"] == "d" and r["_src_table"] == "t"
    assert r["_src_ts_ms"] == 1465581029523


def test_custom_order_exprs_lsn(spark):
    """Postgres-shaped feed: commit/seq derived from source.lsn."""
    payload = {
        "before": None,
        "after": {"repo": "r", "path": "p"},
        "source": {"connector": "postgresql", "db": "d", "table": "t",
                   "lsn": 123456789},
        "op": "c",
    }
    df = _values_df(spark, [json.dumps(payload)])
    out = parse_debezium(
        df, FIELDS,
        commit_expr=lambda s: F.format_string(
            "%012x", (s["lsn"] / F.lit(4096)).cast("bigint")),
        seq_expr=lambda s: s["lsn"].cast("long"),
    )
    r = out.collect()[0]
    assert r["commit"] == "%012x" % (123456789 // 4096)
    assert r["event_seq"] == 123456789


def test_parse_is_map_only(spark):
    """No shuffle, no Python UDF: the parse must stay one codegen'd
    map stage at 10^10 events."""
    v = _env("c", after={"repo": "r", "path": "p"})
    plan = parse_debezium(_values_df(spark, [v] * 4), FIELDS)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def envelope_df(ev):
    """Wrap an engine event frame as Debezium envelopes (one JSON per
    row in column ``value``): commit hex -> binlog file suffix
    (decimal), event_seq -> pos; row images as maps. Deletes carry the
    FULL before image (MySQL's default binlog_row_image=FULL): the
    engine's validation chain runs on every event including tombstones,
    so a key-only before image would dead-letter the delete on the
    required-content filter. Recover ordering with
    ``seq_expr=lambda s: s["pos"].cast("long")``."""
    dbz_op = (
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    image = F.create_map(
        F.lit("repo"), F.col("repo"), F.lit("path"), F.col("path"),
        F.lit("lang"), F.col("lang"), F.lit("content"), F.col("content"),
    )
    src = F.struct(
        F.concat(F.lit("mysql-bin."),
                 F.lpad(F.conv(F.col("commit"), 16, 10), 9, "0")).alias("file"),
        F.col("event_seq").alias("pos"),
        F.lit(0).alias("row"),
    )
    return ev.select(
        F.to_json(
            F.struct(
                F.when(F.col("op") == "D", image).alias("before"),
                F.when(F.col("op") != "D", image).alias("after"),
                src.alias("source"),
                dbz_op.alias("op"),
            )
        ).alias("value")
    )


def test_engine_end_to_end_vs_direct_apply(spark, tmp_path):
    """gen_events -> wrap as Debezium envelopes -> parse -> apply_batch
    produces byte-identical final state to applying the events
    directly (the adapter composes with the whole engine)."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events

    ev = gen_events(spark, n_events=2000, n_repos=20, n_paths=150,
                    hot_frac=0.1, dirty_frac=0.05, seed=7)
    parsed = parse_debezium(
        envelope_df(ev), ["repo", "path", "lang", "content"],
        seq_expr=lambda s: s["pos"].cast("long"),
    )

    def run(events, root):
        t = LakeTable.create(spark, str(root), ["repo", "path"], num_buckets=8)
        eng = CDCEngine(spark, t, default_registry())
        eng.apply_batch(events)
        return sorted(
            (r["repo"], r["path"], r["content_sha"])
            for r in t.read().select("repo", "path", "content_sha").collect()
        )

    direct = run(ev, tmp_path / "direct")
    via_dbz = run(parsed, tmp_path / "dbz")
    assert via_dbz == direct and len(direct) > 0


def test_default_exprs_exposed(spark):
    """default_commit_expr/default_seq_expr are public for feeds that
    compose them (e.g. add a server-id tiebreak)."""
    df = _values_df(spark, [_env("c", after={"repo": "r", "path": "p"},
                                 file="binlog.000255", pos=7, row=3)])
    env = F.from_json(F.col("value"), "struct<payload: struct<source: "
                      "struct<file string, pos bigint, row int>>>")
    r = df.select(
        default_commit_expr(env["payload"]["source"]).alias("c"),
        default_seq_expr(env["payload"]["source"]).alias("s"),
    ).collect()[0]
    assert r["c"] == "%012x" % 255 and r["s"] == 7 * 65536 + 3


def test_streaming_debezium_source_end_to_end(spark, tmp_path):
    """The full production shape: Debezium JSON envelopes landing as
    text WAL segments -> streaming tail (open_source 'debezium-files')
    -> foreachBatch engine apply == the direct batch apply, and a
    restart over the same checkpoint changes nothing (exactly-once)."""
    from filters_spark.streaming.stream import open_source, start_cdc_stream

    from tests.test_cdc_engine import events_df, final_state, make_engine

    ev = events_df(spark, n_events=800, dirty_frac=0.05)
    batch_engine = make_engine(spark, str(tmp_path / "batch"))
    batch_engine.apply_batch(ev)
    expected = final_state(batch_engine)

    # WAL segments must respect source order (the adapter contract:
    # per key, (commit, event_seq) non-decreasing across delivery) —
    # split by commit, never arbitrarily
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    mid = "000000000005"
    envelope_df(ev.filter(F.col("commit") <= mid)).coalesce(1).write.text(
        os.path.join(wal, "f1"))
    envelope_df(ev.filter(F.col("commit") > mid)).coalesce(1).write.text(
        os.path.join(wal, "f2"))

    stream_engine = make_engine(spark, str(tmp_path / "stream"))
    src = open_source(spark, "debezium-files", {
        "path": wal + "/*/",
        "seq_expr": lambda s: s["pos"].cast("long"),
        "max_files_per_trigger": 1,
    })
    assert src.isStreaming
    q = start_cdc_stream(stream_engine, src, str(tmp_path / "ckpt"),
                         trigger_once=True)
    q.awaitTermination(300)
    assert final_state(stream_engine) == expected

    sid = stream_engine.table.current_snapshot_id()
    q2 = start_cdc_stream(stream_engine, open_source(spark, "debezium-files", {
        "path": wal + "/*/", "seq_expr": lambda s: s["pos"].cast("long"),
    }), str(tmp_path / "ckpt"), trigger_once=True)
    q2.awaitTermination(300)
    assert stream_engine.table.current_snapshot_id() == sid
    assert final_state(stream_engine) == expected


def test_egress_roundtrip_mirrors_table_via_wire_format(spark, tmp_path):
    """Cross-system replication over the standard wire: changes() ->
    to_debezium -> (wire) -> parse_debezium -> apply on a SECOND table
    produces a byte-identical mirror — the lake is both a Debezium
    consumer AND producer."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable as LT
    from filters_spark.sources.debezium import to_debezium

    from tests.test_cdc_engine import events_df, final_state

    def mor_engine(root):
        t = LT.create(spark, os.path.join(root, "lake"),
                      key_cols=["repo", "path"], num_buckets=8, path_salt=4)
        return CDCEngine(spark, t, default_registry(), write_mode="mor")

    ev = events_df(spark, n_events=600, dirty_frac=0.05)
    src_engine = mor_engine(str(tmp_path / "src"))
    src_engine.apply_batch(ev)
    feed = src_engine.table.changes(0)

    wire = to_debezium(feed, ["repo", "path", "lang", "content"])
    back = parse_debezium(
        wire, ["repo", "path", "lang", "content"],
        seq_expr=lambda s: s["pos"].cast("long"),
    )
    # commit/event_seq round-trip exactly through source.file/pos
    a = feed.select("commit", "event_seq", "op", "repo", "path", "lang", "content")
    b = back.select("commit", "event_seq", "op", "repo", "path", "lang", "content")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    dst_engine = mor_engine(str(tmp_path / "dst"))
    dst_engine.apply_batch(back)
    assert final_state(dst_engine) == final_state(src_engine)

    plan = wire._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_egress_rejects_noncanonical_op(spark):
    """An op outside {I,U,D,R} must FAIL the egress job, not serialize
    an op:null envelope that parse_debezium's non-row-op filter would
    silently drop downstream (replica missing rows, no error)."""
    import pytest

    from filters_spark.sources.debezium import to_debezium

    df = spark.createDataFrame(
        [("r1", "p.py", "000000000001", 1, "py", "c", "K")],
        "repo string, path string, `commit` string, event_seq long, "
        "lang string, content string, op string",
    )
    wire = to_debezium(df, ["repo", "path", "lang", "content"])
    with pytest.raises(Exception, match="outside \\{I,U,D,R\\}"):
        wire.collect()
    # the canonical ops still serialize
    ok = df.withColumn("op", F.lit("D"))
    row = to_debezium(ok, ["repo", "path", "lang", "content"]).collect()[0]
    env = json.loads(row["value"])
    assert env["op"] == "d" and env["before"]["path"] == "p.py"


def test_publish_changes_checkpointed_producer(spark, tmp_path):
    """publish_changes (lake/sync.py): the lake as a CONTINUOUS
    Debezium producer — checkpointed range publishes, resume from
    state, at-least-once wire delivery that stays exactly-once through
    a consuming engine's watermark dedupe."""
    import glob

    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.sync import last_published_snapshot, publish_changes
    from filters_spark.lake.table import LakeTable as LT

    from tests.test_cdc_engine import events_df, final_state

    def mor_engine(root):
        t = LT.create(spark, os.path.join(root, "lake"),
                      key_cols=["repo", "path"], num_buckets=8, path_salt=4)
        return CDCEngine(spark, t, default_registry(), write_mode="mor")

    ev = events_df(spark, n_events=600, dirty_frac=0.05)
    src = mor_engine(str(tmp_path / "src"))
    sink = str(tmp_path / "sink")
    # sequential halves: the engine's watermark dedupe treats
    # lower-(commit,seq) events in a LATER batch as replays by design
    half = ev.filter(F.col("commit") <= "000000000003")
    rest = ev.filter(F.col("commit") >= "000000000004")

    src.apply_batch(half)
    m1 = publish_changes(src.table, sink)
    assert m1 is not None and m1["since"] == 0 and m1["events"] > 0
    assert last_published_snapshot(src.table, sink) == m1["to"]
    # up to date -> no-op, checkpoint unchanged
    assert publish_changes(src.table, sink) is None

    src.apply_batch(rest)
    m2 = publish_changes(src.table, sink)
    assert m2 is not None and m2["since"] == m1["to"]
    assert sorted(glob.glob(os.path.join(sink, "batch-*"))) == [m1["path"], m2["path"]]

    # consume the whole sink through a second engine: exactly-once
    dst = mor_engine(str(tmp_path / "dst"))
    wire = spark.read.text(os.path.join(sink, "batch-*"))
    back = parse_debezium(
        wire, ["repo", "path", "lang", "content"],
        seq_expr=lambda s: s["pos"].cast("long"),
    )
    dst.apply_batch(back)
    assert final_state(dst) == final_state(src)
    # redelivery of the full sink is dropped by the watermark dedupe
    m = dst.apply_batch(back)
    assert m["applied"] == 0

    # crash between batch write and state write: re-publish overwrites
    # the SAME deterministic directory — no partial-batch duplication
    src.table.io.remove(os.path.join(sink, "egress-state.json"))
    import json as _json

    src.table.io.write_text_atomic(
        os.path.join(sink, "egress-state.json"),
        _json.dumps({"source_snapshot_id": m1["to"]}),
    )
    m2b = publish_changes(src.table, sink)
    assert m2b["path"] == m2["path"] and m2b["events"] == m2["events"]


def test_publish_changes_with_before_images(spark, tmp_path):
    """before_images=True publishes the full Debezium event shape:
    u envelopes carry before AND after, ops re-classified against the
    pre-image (first sight of a key is c even if the engine spelled
    it U)."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.sync import publish_changes
    from filters_spark.lake.table import LakeTable as LT

    from tests.test_cdc_engine import events_df

    t = LT.create(spark, os.path.join(str(tmp_path), "lake"),
                  key_cols=["repo", "path"], num_buckets=8, path_salt=4)
    eng = CDCEngine(spark, t, default_registry(), write_mode="mor")
    ev = events_df(spark, n_events=600, dirty_frac=0.0)
    eng.apply_batch(ev.filter(F.col("commit") <= "000000000003"))
    sink = str(tmp_path / "sink")
    publish_changes(t, sink, before_images=True)
    eng.apply_batch(ev.filter(F.col("commit") >= "000000000004"))
    m = publish_changes(t, sink, before_images=True)
    envs = [json.loads(r["value"])
            for r in spark.read.text(m["path"]).collect()]
    ups = [e for e in envs if e["op"] == "u"]
    assert ups, "second batch must contain updates of first-batch keys"
    assert all(e.get("before") and e.get("after") for e in ups)
    assert all(e["before"]["content"] is not None for e in ups)
    news = [e for e in envs if e["op"] == "c"]
    assert all(e.get("before") is None for e in news)


def test_egress_db_table_stamp_makes_feed_routable(spark, tmp_path):
    """db/table stamp source.db/source.table on egress envelopes (and
    are OMITTED when unset — Debezium's omit-absent spelling), so a
    published feed drives table-keyed consumers: publish two tables'
    changefeeds into one sink, fan the mixed wire back out into mirror
    tables, and each mirror equals its source."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.engine.fanout import TableRoute, fan_out_debezium
    from filters_spark.lake.sync import publish_changes
    from filters_spark.lake.table import LakeTable as LT
    from filters_spark.sources.debezium import to_debezium

    from tests.test_cdc_engine import events_df, final_state

    def mor_engine(root):
        t = LT.create(spark, os.path.join(root, "lake"),
                      key_cols=["repo", "path"], num_buckets=8, path_salt=4)
        return CDCEngine(spark, t, default_registry(), write_mode="mor")

    # unit: the stamp appears when set, is absent when None
    df = spark.createDataFrame(
        [("r1", "p.py", "000000000001", 1, "py", "c", "I")],
        "repo string, path string, `commit` string, event_seq long, "
        "lang string, content string, op string",
    )
    fields = ["repo", "path", "lang", "content"]
    env = json.loads(to_debezium(df, fields, db="prod", table="repos").collect()[0]["value"])
    assert env["source"]["db"] == "prod" and env["source"]["table"] == "repos"
    bare = json.loads(to_debezium(df, fields).collect()[0]["value"])
    assert "db" not in bare["source"] and "table" not in bare["source"]

    # end-to-end: two sources -> one stamped wire sink -> fan-out mirrors
    ev_a = events_df(spark, n_events=400, seed=11, dirty_frac=0.0)
    ev_b = events_df(spark, n_events=300, seed=23, dirty_frac=0.0)
    src_a, src_b = mor_engine(str(tmp_path / "sa")), mor_engine(str(tmp_path / "sb"))
    src_a.apply_batch(ev_a)
    src_b.apply_batch(ev_b)
    sink = str(tmp_path / "sink")
    assert publish_changes(src_a.table, sink + "/a", db="prod", table="repos")
    assert publish_changes(src_b.table, sink + "/b", db="prod", table="users")

    wire = spark.read.text(os.path.join(sink, "*", "batch-*"))
    mir_a, mir_b = mor_engine(str(tmp_path / "ma")), mor_engine(str(tmp_path / "mb"))
    report = fan_out_debezium(
        wire,
        [TableRoute("repos", mir_a, db="prod"), TableRoute("users", mir_b, db="prod")],
        seq_expr=lambda s: s["pos"].cast("long"),
    )
    assert report["unrouted"] == {}
    assert final_state(mir_a) == final_state(src_a)
    assert final_state(mir_b) == final_state(src_b)


def test_snapshot_export_bootstrap_replication_chain(spark, tmp_path):
    """snapshot_export closes the export→bootstrap replication chain
    over the standard wire format: export A's state as Debezium 'r'
    envelopes, parse → B.bootstrap(replay_from = A's max applied
    position), then tail A's subsequent changes over the wire into B —
    B must mirror A byte-identically, and a full WAL re-delivery to B
    (the overlap window) must change nothing (the bootstrap watermark
    handoff + LWW reconcile it)."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable as LT
    from filters_spark.sources.debezium import snapshot_export, to_debezium

    from tests.test_cdc_engine import events_df, final_state

    def engine(root, mode="mor"):
        t = LT.create(spark, os.path.join(root, "lake"),
                      key_cols=["repo", "path"], num_buckets=8, path_salt=4)
        return CDCEngine(spark, t, default_registry(), write_mode=mode)

    ev = events_df(spark, n_events=800, dirty_frac=0.05, seed=41)
    cut = ev.selectExpr("percentile_approx(conv(commit, 16, 10), 0.5)").first()[0]
    b1 = ev.filter(F.conv("commit", 16, 10).cast("long") <= cut)
    b2 = ev.filter(F.conv("commit", 16, 10).cast("long") > cut)
    assert b1.count() > 0 and b2.count() > 0

    a = engine(str(tmp_path / "a"))
    a.apply_batch(b1)

    # export A's snapshot over the wire; each row carries its last-writer
    # position through source.file/pos
    wire = snapshot_export(a.table, db="prod", table_name="repos")
    rows = parse_debezium(
        wire, ["repo", "path", "lang", "content"],
        seq_expr=lambda s: s["pos"].cast("long"),
    )
    assert rows.filter(F.col("op") != "I").count() == 0  # r -> upsert

    # B: bootstrap from the export, then tail A's post-snapshot changes
    b = engine(str(tmp_path / "b"))
    replay_from = max(a.table.current()["watermarks"].values())
    b.bootstrap(rows, replay_from=replay_from)

    a.apply_batch(b2)
    tail_wire = to_debezium(
        a.table.changes(1), ["repo", "path", "lang", "content"]
    )
    tail = parse_debezium(
        tail_wire, ["repo", "path", "lang", "content"],
        seq_expr=lambda s: s["pos"].cast("long"),
    )
    b.apply_batch(tail)
    assert final_state(b) == final_state(a)

    # overlap/full re-delivery: the whole original WAL lands on B too —
    # watermark gate + LWW must leave the mirror untouched
    m = b.apply_batch(ev)
    assert m["applied"] == 0
    assert final_state(b) == final_state(a)

    # export is map-only, no Python
    plan = wire._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
