"""Structured Streaming front-end: file-source tail -> foreachBatch CDC
apply, exactly-once across stream restarts."""

import os

import pyspark.sql.functions as F

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.table import LakeTable
from filters_spark.streaming import start_cdc_stream, tail_directory

from tests.test_cdc_engine import events_df, final_state, make_engine


def test_stream_matches_batch(spark, tmp_path):
    ev = events_df(spark, n_events=1000, dirty_frac=0.05)

    # batch reference
    batch_engine = make_engine(spark, str(tmp_path / "batch"))
    batch_engine.apply_batch(ev)
    expected = final_state(batch_engine)

    # streaming: drop the same events as two files into a tailed dir
    events_dir = str(tmp_path / "wal")
    os.makedirs(events_dir)
    mid = "00000000000" + "5"
    ev.filter(F.col("commit") <= mid).coalesce(1).write.parquet(os.path.join(events_dir, "f1"))
    ev.filter(F.col("commit") > mid).coalesce(1).write.parquet(os.path.join(events_dir, "f2"))

    stream_engine = make_engine(spark, str(tmp_path / "stream"))
    # file source needs a flat dir of files; point at the parquet parts
    stream = tail_directory(spark, events_dir + "/*/")
    q = start_cdc_stream(stream_engine, stream, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    assert final_state(stream_engine) == expected

    # restart the stream over the same directory: source checkpoint +
    # engine watermarks -> no state change (exactly-once)
    sid = stream_engine.table.current_snapshot_id()
    q2 = start_cdc_stream(stream_engine, tail_directory(spark, events_dir + "/*/"),
                          str(tmp_path / "ckpt"), trigger_once=True)
    q2.awaitTermination(300)
    assert stream_engine.table.current_snapshot_id() == sid
    assert final_state(stream_engine) == expected


def test_kill_resume_with_redelivery_is_exactly_once(spark, tmp_path):
    """Checkpointed restart: a stream is stopped, new WAL segments land
    — INCLUDING a re-delivered copy of already-applied events (the
    at-least-once failure mode of a real binlog tail) — and a NEW query
    over the same checkpoint must (a) skip files the source checkpoint
    already consumed, (b) drop re-delivered events via the engine
    watermarks, and (c) land exactly the full-replay state."""
    ev = events_df(spark, n_events=1000, dirty_frac=0.05)
    batch_engine = make_engine(spark, str(tmp_path / "batch"))
    batch_engine.apply_batch(ev)
    expected = final_state(batch_engine)

    events_dir = str(tmp_path / "wal")
    os.makedirs(events_dir)
    mid = "00000000000" + "5"
    first = ev.filter(F.col("commit") <= mid)
    second = ev.filter(F.col("commit") > mid)
    first.coalesce(1).write.parquet(os.path.join(events_dir, "f1"))

    engine = make_engine(spark, str(tmp_path / "stream"))
    ckpt = str(tmp_path / "ckpt")
    # rate-limited: one file per micro-batch (back-pressure surface)
    q = start_cdc_stream(
        engine, tail_directory(spark, events_dir + "/*/", max_files_per_trigger=1),
        ckpt, trigger_once=True, query_name="cdc_tail",
    )
    q.awaitTermination(300)
    partial = final_state(engine)
    assert partial  # something applied before the "crash"

    # stream is down; the tail redelivers the first half AND ships the rest
    first.coalesce(1).write.parquet(os.path.join(events_dir, "f1_redelivered"))
    second.coalesce(1).write.parquet(os.path.join(events_dir, "f2"))

    q2 = start_cdc_stream(
        engine, tail_directory(spark, events_dir + "/*/", max_files_per_trigger=1),
        ckpt, trigger_once=True, query_name="cdc_tail",
    )
    q2.awaitTermination(300)
    assert final_state(engine) == expected


def test_stream_mor_matches_batch_cow(spark, tmp_path):
    """The streaming front-end composed with merge-on-read: micro-batch
    delta commits + read-time LWW fold must land the same final state
    as the batch copy-on-write reference."""
    ev = events_df(spark, n_events=1000, dirty_frac=0.05)
    batch_engine = make_engine(spark, str(tmp_path / "batch"))
    batch_engine.apply_batch(ev)
    expected = final_state(batch_engine)

    events_dir = str(tmp_path / "wal")
    os.makedirs(events_dir)
    mid = "00000000000" + "5"
    ev.filter(F.col("commit") <= mid).coalesce(1).write.parquet(os.path.join(events_dir, "f1"))
    ev.filter(F.col("commit") > mid).coalesce(1).write.parquet(os.path.join(events_dir, "f2"))

    table = LakeTable.create(
        spark, str(tmp_path / "mor" / "lake"), key_cols=["repo", "path"],
        num_buckets=8, path_salt=4,
    )
    mor_engine = CDCEngine(spark, table, default_registry(), write_mode="mor")
    q = start_cdc_stream(mor_engine, tail_directory(spark, events_dir + "/*/"),
                         str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    assert final_state(mor_engine) == expected


def test_source_adapter_contract(spark, tmp_path):
    """The engine runs through the adapter INDIRECTION (open_source) —
    the seam a Kafka/binlog connector drops into; the file adapter is
    the contract's reference implementation."""
    import pytest

    from filters_spark.streaming.stream import open_source

    ev = events_df(spark, n_events=500, dirty_frac=0.05)
    batch_engine = make_engine(spark, str(tmp_path / "batch"))
    batch_engine.apply_batch(ev)
    expected = final_state(batch_engine)

    events_dir = str(tmp_path / "wal")
    os.makedirs(events_dir)
    ev.coalesce(1).write.parquet(os.path.join(events_dir, "f1"))

    stream_engine = make_engine(spark, str(tmp_path / "stream"))
    src = open_source(spark, "files", {"path": events_dir + "/*/",
                                       "max_files_per_trigger": 1})
    assert src.isStreaming
    q = start_cdc_stream(stream_engine, src, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    assert final_state(stream_engine) == expected

    with pytest.raises(ValueError, match="unknown source kind"):
        open_source(spark, "pulsar", {})


def test_stream_dedupe_stateful_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState keyed dedupe: duplicates are dropped
    within a micro-batch, across micro-batches, and across a stream
    RESTART (state lives in the checkpoint), while new higher
    watermarks always pass."""
    from filters_spark.streaming.stateful import stream_dedupe

    ddl = ("commit string, event_seq long, op string, repo string, "
           "path string, lang string, content string, schema_version int")

    def ev(commit, seq, repo="r1", path="a.py"):
        return ("%012x" % commit, seq, "U", repo, path, "py", f"c{commit}:{seq}", 1)

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    seen = []

    def run(ckpt):
        stream = tail_directory(spark, wal + "/*/").withColumn(
            "_src", F.lit("s"))
        stream = stream.drop("_src")
        q = (
            stream_dedupe(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("maxFilesPerTrigger", 1)
            .trigger(availableNow=True)
            .foreachBatch(lambda df, bid: seen.extend(
                (r.repo, r.path, r.commit, r.event_seq) for r in df.collect()))
            .start()
        )
        q.awaitTermination(300)

    ckpt = str(tmp_path / "ckpt")
    b1 = [ev(1, 0), ev(1, 0), ev(2, 0, repo="r2")]        # in-batch dup
    b2 = [ev(1, 0), ev(3, 0), ev(2, 0, repo="r2")]        # cross-batch dups + one new
    spark.createDataFrame(b1, ddl).coalesce(1).write.parquet(wal + "/f1")
    spark.createDataFrame(b2, ddl).coalesce(1).write.parquet(wal + "/f2")
    run(ckpt)
    got = sorted(seen)
    assert got == sorted([
        ("r1", "a.py", "%012x" % 1, 0),
        ("r2", "a.py", "%012x" % 2, 0),
        ("r1", "a.py", "%012x" % 3, 0),
    ])

    # restart over the SAME checkpoint: a redelivered wm plus one new
    seen.clear()
    b3 = [ev(3, 0), ev(4, 0)]
    spark.createDataFrame(b3, ddl).coalesce(1).write.parquet(wal + "/f3")
    run(ckpt)
    assert seen == [("r1", "a.py", "%012x" % 4, 0)]


def test_windowed_agg_append_finalizes_and_drops_late(spark, tmp_path):
    """Event-time windowed aggregation under a watermark, across a
    stream restart: the watermark is persisted in the checkpoint, a row
    later than the allowed lateness is DROPPED on the next run (pinned
    via the state operator's numRowsDroppedByWatermark), and append
    mode emits each finalized window exactly once. The streamed result
    matches the batch run of the SAME operator over the on-time rows."""
    from filters_spark.streaming.windows import windowed_event_stats

    ddl = "ts timestamp, event_type string, value double"

    def frame(rows):
        raw = spark.createDataFrame(rows, "ts string, event_type string, value double")
        return raw.select(F.to_timestamp("ts").alias("ts"), "event_type", "value")

    d = str(tmp_path / "winsrc")
    os.makedirs(d)
    out = str(tmp_path / "winout")

    def run():
        stream = spark.readStream.schema(ddl).parquet(d + "/*/")
        agg = windowed_event_stats(stream, window="1 hour", watermark="10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "winckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    # run 1: on-time rows in the 10:00 hour -> watermark 10:30 checkpointed
    frame(
        [
            ("2026-01-01 10:00:30", "click", 1.5),
            ("2026-01-01 10:20:00", "click", 2.0),
            ("2026-01-01 10:40:00", "view", 4.0),
        ]
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    run()

    # run 2 (restart): a watermark-advancing row at 13:00 plus a LATE row
    # back in the long-closed 09:00 hour — below the restored 10:30
    # watermark, so it must be dropped, not aggregated
    frame(
        [
            ("2026-01-01 13:00:00", "click", 8.0),
            ("2026-01-01 09:10:00", "click", 99.0),  # too late: dropped
        ]
    ).coalesce(1).write.parquet(os.path.join(d, "f2"))
    q2 = run()
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q2.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1

    got = {
        (r.win_start.isoformat(), r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # only the 10:00 windows finalized (13:00's stays open in state;
    # 09:00's late row was dropped, so that window never materializes)
    assert got == {
        ("2026-01-01T10:00:00", "click"): (2, 3.5),
        ("2026-01-01T10:00:00", "view"): (1, 4.0),
    }

    # batch mode of the same operator over the on-time rows agrees
    batch = windowed_event_stats(
        spark.read.schema(ddl).parquet(os.path.join(d, "f1")),
        window="1 hour",
        watermark="10 minutes",
    )
    bgot = {
        (r.win_start.isoformat(), r.event_type): (r.n, r.sum_value)
        for r in batch.collect()
    }
    assert bgot == got


def test_session_window_stream_merges_across_restart(spark, tmp_path):
    """Gap-based session windows under Structured Streaming
    (streaming/windows.py:session_event_stats): an OPEN session in the
    checkpoint is extended by an event arriving in a later run (within
    the gap of its last event), and the merged session is emitted
    exactly once, when the watermark passes its end. Batch-vs-stream
    value equality is pinned by the oracled stream_session_stats
    query."""
    from filters_spark.streaming.windows import session_event_stats

    ddl = "ts timestamp, user_id bigint, value double"

    def frame(rows):
        raw = spark.createDataFrame(rows, "ts string, user_id long, value double")
        return raw.select(F.to_timestamp("ts").alias("ts"), "user_id", "value")

    d = str(tmp_path / "sesssrc")
    os.makedirs(d)
    out = str(tmp_path / "sessout")

    def run():
        stream = spark.readStream.schema(ddl).parquet(d + "/*/")
        agg = session_event_stats(
            stream, gap="30 minutes", watermark="10 minutes", group_cols=("user_id",)
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "sessckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    # run 1: two events 10 minutes apart -> one open session in state
    frame(
        [("2026-01-01 10:00:00", 1, 1.0), ("2026-01-01 10:10:00", 1, 2.0)]
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    run()

    # run 2 (restart): 10:25 is within 30min of the session's last event
    # -> MERGES into the restored session; 13:00 advances the watermark
    # past the merged session's end (10:55), finalizing it
    frame(
        [("2026-01-01 10:25:00", 1, 4.0), ("2026-01-01 13:00:00", 2, 8.0)]
    ).coalesce(1).write.parquet(os.path.join(d, "f2"))
    run()

    rows = {
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat()):
            (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {(1, "2026-01-01T10:00:00", "2026-01-01T10:55:00"): (3, 7.0)}


def test_stream_dedupe_key_spanning_multiple_arrow_chunks(spark, tmp_path):
    """A hot key whose micro-batch spans SEVERAL Arrow chunks must not
    lose events: chunks arrive in no particular watermark order, so a
    genuinely-new lower-watermark event in a later chunk has to pass
    (the regression was advancing the dedupe watermark chunk-by-chunk,
    which silently dropped such events)."""
    from filters_spark.streaming.stateful import stream_dedupe

    ddl = ("commit string, event_seq long, op string, repo string, "
           "path string, lang string, content string, schema_version int")
    # ONE key, 40 distinct watermarks, written in DESCENDING order so
    # later chunks carry lower watermarks than earlier ones
    rows = [("%012x" % c, 0, "U", "r1", "a.py", "py", f"c{c}", 1)
            for c in range(40, 0, -1)]
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(wal + "/f1")

    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf)
    seen = []
    try:
        spark.conf.set(conf, "5")  # force ~8 chunks for the one key
        q = (
            stream_dedupe(tail_directory(spark, wal + "/*/"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .foreachBatch(lambda df, bid: seen.extend(
                r.commit for r in df.collect()))
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set(conf, prev)
    assert sorted(seen) == sorted("%012x" % c for c in range(1, 41))


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join (streaming/joins.py): the SAME
    operator over two file-source streams (watermarked inner join,
    append mode) and over the static frames must produce the same
    match set; a row arriving later than the watermark allows is
    dropped from the join state (pinned via numRowsDroppedByWatermark),
    so its would-be match never materializes."""
    from filters_spark.streaming.joins import interval_join

    ddl = "ts timestamp, user_id long, event_id long"

    def frame(rows):
        raw = spark.createDataFrame(rows, "ts string, user_id long, event_id long")
        return raw.select(F.to_timestamp("ts").alias("ts"), "user_id", "event_id")

    ld, rd = str(tmp_path / "lsrc"), str(tmp_path / "rsrc")
    os.makedirs(ld)
    os.makedirs(rd)
    out = str(tmp_path / "ijout")

    # left: signups; right: purchases. Match = same user, purchase
    # within [0, 30 min] after signup.
    lefts = [
        ("2026-01-01 10:00:00", 1, 100),
        ("2026-01-01 10:05:00", 2, 101),
        ("2026-01-01 11:00:00", 1, 102),
    ]
    rights = [
        ("2026-01-01 10:10:00", 1, 900),   # matches 100 (10 min after)
        ("2026-01-01 10:29:00", 2, 901),   # matches 101 (24 min after)
        ("2026-01-01 10:45:00", 1, 902),   # matches nothing (45 > 30 after 100)
        ("2026-01-01 11:20:00", 1, 903),   # matches 102
        ("2026-01-01 09:59:00", 2, 904),   # before any signup: no match
    ]

    def run():
        ls = spark.readStream.schema(ddl).parquet(ld + "/*/")
        rs = spark.readStream.schema(ddl).parquet(rd + "/*/")
        j = interval_join(
            ls, rs, ("user_id",), lower_s=0.0, upper_s=1800.0,
            watermark="10 minutes",
        )
        q = (
            j.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ijckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    frame(lefts).coalesce(1).write.parquet(os.path.join(ld, "f1"))
    frame(rights).coalesce(1).write.parquet(os.path.join(rd, "f1"))
    run()

    # restart: watermark is far past 10:00 now (max event 11:20 - 10min);
    # a LATE left row at 09:00 must be dropped by the restored watermark
    # even though an on-time right row at 09:20 would have matched it
    frame([("2026-01-01 09:00:00", 3, 103)]).coalesce(1).write.parquet(
        os.path.join(ld, "f2")
    )
    frame([("2026-01-01 11:30:00", 9, 905)]).coalesce(1).write.parquet(
        os.path.join(rd, "f2")
    )
    q2 = run()
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q2.recentProgress
        if p["stateOperators"]
    )
    assert dropped >= 1

    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 100, 900), (1, 102, 903), (2, 101, 901)]

    # batch mode of the same operator over the on-time files agrees
    batch = interval_join(
        spark.read.schema(ddl).parquet(os.path.join(ld, "f1")),
        spark.read.schema(ddl).parquet(os.path.join(rd, "f1")),
        ("user_id",), lower_s=0.0, upper_s=1800.0, watermark="10 minutes",
    )
    bgot = sorted(
        (r.user_id, r.l_event_id, r.r_event_id) for r in batch.collect()
    )
    assert bgot == got


def test_interval_join_tiny_bound_fixed_point_literal(spark):
    """Sub-1e-4 bounds must render as fixed-point INTERVAL literals:
    Python float repr would spell 1e-05 in scientific notation, which
    Spark's interval parser rejects at analysis time."""
    from filters_spark.streaming.joins import interval_join

    def frame(rows):
        raw = spark.createDataFrame(rows, "ts string, user_id long, event_id long")
        return raw.select(F.to_timestamp("ts").alias("ts"), "user_id", "event_id")

    left = frame([("2026-01-01 10:00:00", 1, 100)])
    right = frame([
        ("2026-01-01 10:00:00.000005", 1, 900),  # 5e-06 s: below lower bound
        ("2026-01-01 10:00:00.500000", 1, 901),  # inside [1e-05 s, 1 s]
        ("2026-01-01 10:00:02", 1, 902),         # beyond upper
    ])
    j = interval_join(left, right, ("user_id",), lower_s=1e-05, upper_s=1.0)
    got = sorted(r.r_event_id for r in j.collect())
    assert got == [901]


def test_interval_join_left_outer_stream_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer interval join over streams: an unmatched left row emits
    (right side NULL) only once the watermark proves no partner can
    still arrive — and the streamed result equals the batch run of the
    SAME operator."""
    from filters_spark.streaming.joins import interval_join

    ddl = "ts timestamp, user_id long, event_id long"

    def frame(rows):
        raw = spark.createDataFrame(rows, "ts string, user_id long, event_id long")
        return raw.select(F.to_timestamp("ts").alias("ts"), "user_id", "event_id")

    ld, rd = str(tmp_path / "lsrc"), str(tmp_path / "rsrc")
    os.makedirs(ld)
    os.makedirs(rd)
    out = str(tmp_path / "loout")

    def run():
        ls = spark.readStream.schema(ddl).parquet(ld + "/*/")
        rs = spark.readStream.schema(ddl).parquet(rd + "/*/")
        j = interval_join(
            ls, rs, ("user_id",), lower_s=0.0, upper_s=600.0,
            watermark="5 minutes", how="left_outer",
        )
        q = (
            j.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "lockpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    frame([
        ("2026-01-01 10:00:00", 1, 100),   # will match
        ("2026-01-01 10:00:00", 2, 101),   # will NOT match
    ]).coalesce(1).write.parquet(os.path.join(ld, "f1"))
    frame([
        ("2026-01-01 10:05:00", 1, 900),
    ]).coalesce(1).write.parquet(os.path.join(rd, "f1"))
    run()
    # advance the watermark far past 10:10 so user 2's window closes
    frame([("2026-01-01 12:00:00", 8, 102)]).coalesce(1).write.parquet(
        os.path.join(ld, "f2")
    )
    frame([("2026-01-01 12:00:00", 9, 901)]).coalesce(1).write.parquet(
        os.path.join(rd, "f2")
    )
    run()
    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out).collect()
    )
    assert (2, 101, None) in got          # unmatched left emitted with NULLs
    assert (1, 100, 900) in got           # the inner match

    batch = interval_join(
        spark.read.schema(ddl).parquet(ld + "/*/"),
        spark.read.schema(ddl).parquet(rd + "/*/"),
        ("user_id",), lower_s=0.0, upper_s=600.0,
        watermark="5 minutes", how="left_outer",
    )
    bgot = sorted(
        (r.user_id, r.l_event_id, r.r_event_id) for r in batch.collect()
    )
    # batch emits ALL outer rows immediately; streaming trails the
    # watermark, so the 12:00 frontier row's no-match verdict is still
    # pending when the stream drains — the streamed set is exactly the
    # batch set minus the open frontier
    assert set(got) <= set(bgot)
    assert set(bgot) - set(got) == {(8, 102, None)}


def test_interval_join_state_stays_bounded_across_watermark_advances(spark, tmp_path):
    """The scaling claim behind the stream-stream interval join
    (streaming/joins.py): watermark + interval bound make BOTH sides'
    state evictable, so state size tracks the rows inside the
    (watermark-lag + interval) window — O(keys x interval density) —
    and NOT the cumulative input. Measured via StateOperatorProgress:
    feed 4 batches each advancing event time by an hour (far past the
    10-minute watermark + 30s interval), assert numRowsTotal never
    exceeds ~one batch's rows while cumulative input grows 4x."""
    from filters_spark.streaming.joins import interval_join

    ddl = "ts timestamp, user_id long, event_id long"
    rows_per_batch = 50

    def frame(rows):
        raw = spark.createDataFrame(rows, "ts string, user_id long, event_id long")
        return raw.select(F.to_timestamp("ts").alias("ts"), "user_id", "event_id")

    ld, rd = str(tmp_path / "lsrc"), str(tmp_path / "rsrc")
    os.makedirs(ld)
    os.makedirs(rd)
    out = str(tmp_path / "bsout")

    def run():
        ls = spark.readStream.schema(ddl).parquet(ld + "/*/")
        rs = spark.readStream.schema(ddl).parquet(rd + "/*/")
        j = interval_join(
            ls, rs, ("user_id",), lower_s=0.0, upper_s=30.0,
            watermark="10 minutes",
        )
        q = (
            j.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "bsckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    state_totals = []
    out_counts = []
    for batch in range(4):
        base_h = 10 + batch  # each batch a full hour later
        lrows = [(f"2026-01-01 {base_h}:00:{i % 50:02d}", i % 10, batch * 1000 + i)
                 for i in range(rows_per_batch)]
        rrows = [(f"2026-01-01 {base_h}:00:{i % 50 + 5:02d}", i % 10,
                  batch * 1000 + 500 + i) for i in range(rows_per_batch)]
        frame(lrows).coalesce(1).write.parquet(os.path.join(ld, f"f{batch}"))
        frame(rrows).coalesce(1).write.parquet(os.path.join(rd, f"f{batch}"))
        q = run()
        ops = [p["stateOperators"][0] for p in q.recentProgress
               if p["stateOperators"]]
        assert ops, "expected state operator progress"
        state_totals.append(max(op["numRowsTotal"] for op in ops))
        out_counts.append(spark.read.parquet(out).count())
    # every batch produced matches (the operator is live, not draining);
    # the parquet sink reports numOutputRows=-1, so count the sink files
    assert all(b > a for a, b in zip([0] + out_counts, out_counts)), out_counts
    # BOUNDED: cumulative input is 4 x 2 x rows_per_batch = 400 rows,
    # but state plateaus at TWO batches' worth (the incoming batch plus
    # the prior batch, whose rows evict only once the new batch's
    # watermark commits) — never the cumulative stream
    cap = 2 * (2 * rows_per_batch) + 10
    assert max(state_totals) <= cap, (state_totals, cap)
    # and it PLATEAUS instead of growing with input (eviction works):
    # batch 3's peak is no higher than batch 1's
    assert state_totals[-1] <= state_totals[1] + 10, state_totals
