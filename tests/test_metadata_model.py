"""Model-based check of the lake metadata protocol.

A seeded random sequence of METADATA operations — bucket commits, delta
appends, staged (WAP) commits with publish/abandon, tags, rollback,
expire, vacuum — runs against both the real LakeTable and a trivial
in-memory model. After every step the resolved table state must match
the model, and vacuum must never delete a file the model still
references. Hand-written scenario tests pin individual features; this
pins their INTERACTIONS (e.g. expire while a stage pends, rollback then
vacuum, re-stage after abandon) across hundreds of random interleavings.

Metadata-only: file paths are synthetic (no parquet IO, no Spark jobs),
so 300 random steps run in seconds. Randomness is seeded — failures
reproduce exactly.
"""

import os
import random

import pytest

from filters_spark.lake.table import LakeTable

WM = "zz:0000000000"  # constant watermark — watermark logic has its own tests


class Model:
    """What the table SHOULD look like: per-bucket base files + delta
    lists at the head, tag pins, pending stages, live snapshot states."""

    def __init__(self):
        self.head = {"buckets": {}, "deltas": {}}
        self.history = {0: {"buckets": {}, "deltas": {}}}  # sid -> state
        self.sid = 0
        self.tags = {}
        self.stages = {}  # wap_id -> (state, parent_sid)
        self.retained = {0}
        self.parents = {0: None}  # sid -> parent sid
        self.rollbacks = {}  # rollback sid -> target sid

    def _snap(self, state):
        return {
            "buckets": {b: list(f) for b, f in state["buckets"].items()},
            "deltas": {b: list(f) for b, f in state["deltas"].items()},
        }

    def _commit(self, state):
        self.parents[self.sid + 1] = self.sid
        self.sid += 1
        self.head = state
        self.history[self.sid] = self._snap(state)
        self.retained.add(self.sid)

    def next_bucket_state(self, new_files):
        s = self._snap(self.head)
        for b, fl in new_files.items():
            if fl:
                s["buckets"][b] = list(fl)
            else:
                s["buckets"].pop(b, None)
            s["deltas"].pop(b, None)
        return s

    def next_delta_state(self, new_files):
        s = self._snap(self.head)
        for b, fl in new_files.items():
            if fl:
                s["deltas"][b] = s["deltas"].get(b, []) + list(fl)
        return s

    def live_files(self):
        live = set()
        states = [self.history[s] for s in self.retained]
        states += [st for st, _ in self.stages.values()]
        for st in states:
            for fl in st["buckets"].values():
                live.update(fl)
            for fl in st["deltas"].values():
                live.update(fl)
        return live


def _check(t, m):
    cur = t.current()
    assert {b: fl for b, fl in cur["buckets"].items()} == m.head["buckets"]
    assert {b: fl for b, fl in cur.get("deltas", {}).items() if fl} == m.head["deltas"]
    assert t.current_snapshot_id() == m.sid
    assert set(t.snapshots()) == m.retained
    assert t.tags() == m.tags
    assert sorted(t.wap_ids()) == sorted(m.stages)
    # every model-live file is table-live (vacuum safety)
    assert m.live_files() <= t.live_files()
    # every retained snapshot and pending stage still RESOLVES exactly —
    # this is what catches a manifest wrongly swept by vacuum/abandon
    for sid in m.retained:
        snap = t.snapshot(sid)
        assert snap["buckets"] == m.history[sid]["buckets"], sid
        assert {b: fl for b, fl in snap.get("deltas", {}).items() if fl} \
            == m.history[sid]["deltas"], sid
    for wid, (st, _) in m.stages.items():
        ws = t.wap_snapshot(wid)
        assert ws["buckets"] == st["buckets"], wid
        assert {b: fl for b, fl in ws.get("deltas", {}).items() if fl} \
            == st["deltas"], wid


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_metadata_interleavings(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = LakeTable.create(
        spark, str(tmp_path / f"lake{seed}"), ["repo", "path"], num_buckets=4
    )
    m = Model()
    counter = [0]

    def paths(b):
        counter[0] += 1
        return [f"data/gen-{counter[0]:05d}/b{b}-f{i}.parquet"
                for i in range(rng.randint(1, 3))]

    def some_files():
        return {str(b): paths(b) for b in rng.sample(range(4), rng.randint(1, 3))}

    def op_commit():
        nf = some_files()
        t.commit_bucket_files(nf, {int(b): WM for b in nf})
        m._commit(m.next_bucket_state(nf))

    def op_delta():
        nf = some_files()
        t.commit_delta_files(nf, {int(b): WM for b in nf})
        m._commit(m.next_delta_state(nf))

    def op_stage():
        wid = f"w{rng.randint(0, 3)}"
        nf = some_files()
        if wid in m.stages:
            return  # duplicate-id rejection has its own scenario test
        kind = rng.choice(["b", "d"])
        # the public stage_* wrappers write real parquet; this test is
        # metadata-only, so build the snapshot dict + staged header the
        # exact way stage_buckets/stage_deltas do
        if kind == "b":
            snap = t._next_bucket_snapshot(nf, {int(b): WM for b in nf})
            st = m.next_bucket_state(nf)
        else:
            snap = t._next_delta_snapshot(nf, {int(b): WM for b in nf})
            st = m.next_delta_state(nf)
        t._write_wap_header(snap, wid)
        m.stages[wid] = (m._snap(st), m.sid)

    def op_publish():
        if not m.stages:
            return
        wid = rng.choice(sorted(m.stages))
        st, parent = m.stages[wid]
        if parent == m.sid:
            t.publish_wap(wid)
            del m.stages[wid]
            m._commit(st)
        else:
            with pytest.raises(ValueError):
                t.publish_wap(wid)

    def op_abandon():
        if not m.stages:
            return
        wid = rng.choice(sorted(m.stages))
        t.abandon_wap(wid)
        del m.stages[wid]

    def op_tag():
        name = f"t{rng.randint(0, 3)}"
        sid = rng.choice(sorted(m.retained))
        if name in m.tags:
            with pytest.raises(ValueError):
                t.create_tag(name, sid)
        else:
            t.create_tag(name, sid)
            m.tags[name] = sid

    def op_rollback():
        targets = sorted(m.retained - {m.sid})
        if not targets:
            return
        sid = rng.choice(targets)
        t.rollback(sid)
        m._commit(m._snap(m.history[sid]))
        m.rollbacks[m.sid] = sid

    def op_expire():
        keep = rng.randint(1, 3)
        t.expire_snapshots(keep_last=keep)
        kept = set(sorted(m.retained)[-keep:]) | {m.sid} | set(m.tags.values())
        # mirror the expiry closure: a retained rollback keeps its
        # target and the whole undone (target, parent] chain,
        # transitively (kept deps may be rollbacks themselves); the
        # walk stops where headers are already gone
        frontier, seen = list(kept), set()
        while frontier:
            s = frontier.pop()
            if s in seen or s not in m.rollbacks:
                seen.add(s)
                continue
            seen.add(s)
            tgt, dep = m.rollbacks[s], m.parents[s]
            while dep is not None:
                if dep not in kept:
                    kept.add(dep)
                    frontier.append(dep)
                if dep == tgt or dep not in m.retained:
                    break
                dep = m.parents[dep]
        m.retained &= kept
        m.retained.add(m.sid)

    def op_vacuum():
        # REAL vacuum (not dry-run): a wrongly-swept manifest breaks
        # the resolution checks in _check on the very next step
        t.vacuum(min_age_seconds=0)

    ops = [op_commit, op_delta, op_stage, op_publish, op_abandon,
           op_tag, op_rollback, op_expire, op_vacuum]
    for step in range(120):
        rng.choice(ops)()
        _check(t, m)
