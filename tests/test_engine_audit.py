"""Engine-level write-audit-publish: apply_batch(events, audit_fn=...).

The batch's merge is staged (never visible), the audit callback inspects
the staged state, and only approval publishes. Rejection must leave the
table head, the watermarks AND the dead-letter table untouched — so the
same batch re-applies later without being skipped as a replay
(exactly-once preserved across the human/automated audit loop).
"""

import os

import pytest

from filters_spark.engine.cdc import CDCEngine
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.table import LakeTable

V1_DDL = (
    "commit string, event_seq long, op string, repo string, path string, "
    "lang string, content string, schema_version int"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, V1_DDL)


BATCH1 = [
    ("%012x" % 1, 0, "U", "r1", "a.py", "py", "one", 1),
    ("%012x" % 1, 1, "U", "r2", "b.py", "py", "two", 1),
]
BATCH2 = [
    ("%012x" % 2, 0, "U", "r1", "a.py", "py", "one-v2", 1),
    ("%012x" % 2, 1, "U", "r3", "c.py", "py", "three", 1),
]


@pytest.fixture(params=["cow", "mor"])
def eng(request, spark, tmp_path):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "lake"), ["repo", "path"], num_buckets=4
    )
    e = CDCEngine(spark, t, default_registry(), write_mode=request.param,
                  compact_after=99)
    e.apply_batch(_ev(spark, BATCH1))
    return e


def _state(t):
    return sorted(
        (r.repo, r.path, r.content) for r in t.read().collect()
    )


def test_reject_leaves_everything_untouched_then_reapply(eng, spark):
    t = eng.table
    head = t.current_snapshot_id()
    wms = dict(t.watermarks())
    before = _state(t)

    seen = {}

    def reject(table, wap_id):
        # the audit view sees the post-merge state; the table does not
        seen["staged_rows"] = table.read(wap_id=wap_id).count()
        seen["visible_rows"] = table.read().count()
        return False

    m = eng.apply_batch(_ev(spark, BATCH2), audit_fn=reject)
    assert m["audit"] == "rejected" and m["applied"] == 0
    assert seen["staged_rows"] == 3 and seen["visible_rows"] == 2
    assert t.current_snapshot_id() == head
    assert t.watermarks() == wms
    assert _state(t) == before
    assert t.wap_ids() == []  # no pending stage left behind

    # the SAME batch re-applies cleanly — not skipped as a replay
    m2 = eng.apply_batch(_ev(spark, BATCH2), audit_fn=lambda tb, w: True)
    assert m2["audit"] == "published" and m2["applied"] == 2
    assert m2["skipped_replays"] == 0
    assert ("r1", "a.py", "one-v2") in _state(t)
    assert ("r3", "c.py", "three") in _state(t)


def test_audit_exception_abandons_stage_and_propagates(eng, spark):
    t = eng.table
    head = t.current_snapshot_id()

    def boom(table, wap_id):
        raise RuntimeError("auditor crashed")

    with pytest.raises(RuntimeError, match="auditor crashed"):
        eng.apply_batch(_ev(spark, BATCH2), audit_fn=boom)
    assert t.current_snapshot_id() == head
    assert t.wap_ids() == []


def test_publish_path_equals_direct_commit(eng, spark, tmp_path):
    # audited-and-approved must be byte-identical to a plain apply
    t = eng.table
    eng.apply_batch(_ev(spark, BATCH2), audit_fn=lambda tb, w: True)
    audited = _state(t)

    t2 = LakeTable.create(
        spark, os.path.join(str(tmp_path), "lake_direct"), ["repo", "path"],
        num_buckets=4,
    )
    e2 = CDCEngine(spark, t2, default_registry(), write_mode=eng.write_mode,
                   compact_after=99)
    e2.apply_batch(_ev(spark, BATCH1))
    e2.apply_batch(_ev(spark, BATCH2))
    assert audited == _state(t2)


def test_publish_failure_mid_audit_abandons_stage(eng, spark):
    """A concurrent commit during the audit makes the publish
    impossible; the stage must be abandoned, never orphaned."""
    t = eng.table

    def audit_and_race(table, wap_id):
        # concurrent writer advances the head while the audit runs
        table.commit_delta_files(
            {"0": ["data/delta-race/f.parquet"]}, {0: "zzzzzzzzzzzz:0000000000"}
        )
        return True  # approve -> publish will fail on the moved head

    with pytest.raises(ValueError, match="re-stage"):
        eng.apply_batch(_ev(spark, BATCH2), audit_fn=audit_and_race)
    assert t.wap_ids() == []


def test_rejected_metrics_schema_uniform(eng, spark):
    m = eng.apply_batch(_ev(spark, BATCH2), audit_fn=lambda tb, w: False)
    ok = eng.apply_batch(_ev(spark, BATCH2), audit_fn=lambda tb, w: True)
    assert set(m) == set(ok), (set(m), set(ok))
    assert m["touched_buckets"] == 0
