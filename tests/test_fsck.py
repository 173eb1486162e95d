"""Table consistency verification (lake/fsck.py): a healthy table
verifies clean across commits, branches, stages and expiry; every
corruption class the checker claims to catch is planted and caught."""

import json
import os

import pytest

from filters_spark.lake.clone import clone_table
from filters_spark.lake.fsck import TableCorruption, verify_table

from tests.test_cdc_engine import events_df, make_engine


def _built(spark, tmp_path, name="src"):
    eng = make_engine(spark, str(tmp_path / name))
    eng.replay(events_df(spark, n_events=400, seed=5, dirty_frac=0.05),
               num_batches=2)
    return eng.table


def test_healthy_table_verifies_clean(spark, tmp_path):
    t = _built(spark, tmp_path)
    t.create_tag("audited")
    rep = verify_table(t)
    assert rep["ok"] and rep["errors"] == []
    assert rep["counts"]["chain_length"] == len(t.snapshots())
    assert rep["counts"]["data_files"] > 0
    assert rep["counts"]["missing_data_files"] == 0
    assert rep["counts"]["refs"] == 1

    # expiry truncates history but is NOT corruption: the floor is
    # reported, the table still verifies
    t.expire_snapshots(keep_last=1)
    rep2 = verify_table(t)
    assert rep2["ok"]
    assert rep2["counts"]["chain_length"] == 1
    assert "history_floor" in rep2["counts"]


def test_missing_data_file_detected(spark, tmp_path):
    t = _built(spark, tmp_path)
    victim = sorted(t.live_files())[0]
    t.io.remove(victim)
    rep = verify_table(t)
    assert not rep["ok"]
    assert rep["counts"]["missing_data_files"] == 1
    assert any(victim in e for e in rep["errors"])
    with pytest.raises(TableCorruption, match="missing"):
        verify_table(t, raise_on_error=True)
    # the cheap metadata-only pass skips the per-file probe
    assert verify_table(t, check_data_files=False)["ok"]


def test_missing_manifest_and_dangling_ref_detected(spark, tmp_path):
    t = _built(spark, tmp_path)
    manifest = next(
        n for n in t.io.listdir(t.meta_dir) if n.startswith("manifest-")
    )
    t.io.remove(os.path.join(t.meta_dir, manifest))
    t.io.write_text_atomic(
        t._ref_file("ghost"), json.dumps({"type": "tag", "snapshot_id": 999})
    )
    rep = verify_table(t, check_data_files=False)
    assert not rep["ok"]
    assert any(manifest in e for e in rep["errors"])
    assert any("ghost" in e and "999" in e for e in rep["errors"])


def test_watermark_regression_detected(spark, tmp_path):
    t = _built(spark, tmp_path)
    sid = t.current_snapshot_id()
    raw = t._raw_snapshot(sid)
    b, wm = next(iter(raw["watermarks"].items()))
    raw["watermarks"][b] = "000000000000:" + "0" * 20  # below the parent's
    t.io.write_text_atomic(t._snap_path(sid), json.dumps(raw))
    rep = verify_table(t, check_data_files=False)
    assert not rep["ok"]
    assert any("regressed" in e and f"bucket {b} " in e for e in rep["errors"])


def test_sanctioned_watermark_lowering_warns_not_errors(spark, tmp_path):
    # a set-watermarks commit may lower watermarks (bootstrap handoff)
    # without corrupting the table — but the label is caller-supplied,
    # so fsck must still SURFACE the regression as a warning instead of
    # skipping it silently
    t = _built(spark, tmp_path)
    wms = dict(t.current()["watermarks"])
    b = next(iter(wms))
    wms[b] = "000000000000:" + "0" * 20
    t.set_watermarks(wms)
    rep = verify_table(t, check_data_files=False)
    assert rep["ok"] and rep["errors"] == []
    assert any("lowered" in w and f"bucket {b} " in w for w in rep["warnings"])


def test_shallow_clone_verifies_until_source_retention_eats_it(spark, tmp_path):
    """The clone-vs-source-retention hazard clone_table documents, made
    observable: a shallow clone verifies clean while the source's files
    live, and verify_table is exactly the tool that flags the breakage
    after the source is deleted."""
    t = _built(spark, tmp_path)
    c = clone_table(t, str(tmp_path / "c"))
    assert verify_table(c)["ok"]
    t.io.rmtree(t.root)
    rep = verify_table(c)
    assert not rep["ok"]
    assert rep["counts"]["missing_data_files"] == rep["counts"]["data_files"]


def test_hint_pointing_at_missing_snapshot(spark, tmp_path):
    t = _built(spark, tmp_path)
    t.io.write_text_atomic(
        os.path.join(t.meta_dir, "version-hint.text"), "424242"
    )
    rep = verify_table(t, check_data_files=False)
    assert not rep["ok"]
    assert any("424242" in e for e in rep["errors"])
