"""Host-health sentinel: the gate that keeps throttled-host bench
artifacts from masquerading as perf regressions (or wins)."""

import bench


def test_host_sentinel_shape():
    s = bench.host_sentinel(dur=0.05)
    assert set(s) == {"st_ops", "mt4_ops", "mt8_ops", "steal_pct"}
    assert s["st_ops"] > 0 and s["mt4_ops"] > 0
    assert 0 <= s["steal_pct"] <= 100


def test_sentinel_degraded_logic():
    ref = bench.SENTINEL_REF
    healthy = {"st_ops": ref["st_ops"], "mt4_ops": ref["mt4_ops"], "steal_pct": 0.0}
    assert bench.sentinel_degraded(healthy) == []
    # 1.5x below reference on either gated metric trips the gate
    slow_st = dict(healthy, st_ops=ref["st_ops"] / 2)
    assert len(bench.sentinel_degraded(slow_st)) == 1
    slow_mt = dict(healthy, mt4_ops=ref["mt4_ops"] / 2)
    assert len(bench.sentinel_degraded(slow_mt)) == 1
    # hypervisor steal trips it even with healthy hash throughput
    stolen = dict(healthy, steal_pct=20.0)
    assert len(bench.sentinel_degraded(stolen)) == 1
    # just inside the band is fine
    edge = dict(healthy, st_ops=ref["st_ops"] / 1.4, mt4_ops=ref["mt4_ops"] / 1.4)
    assert bench.sentinel_degraded(edge) == []


def test_implausible_queries_ceilings():
    # calibrated at sf0.1 only
    q = {"dedup_minhash_lsh": 573.8, "cdc_replay_mor": 292.1, "warmup": 17.1}
    flagged = bench.implausible_queries(q, 0.1)
    assert len(flagged) == 2
    assert any("dedup_minhash_lsh" in f for f in flagged)
    assert any("cdc_replay_mor" in f for f in flagged)
    # the real clean round-4 artifact passes with wide margin
    clean = {"warmup": 15.8, "cdc_replay": 21.6, "cdc_replay_mor": 15.7,
             "dedup_minhash_lsh": 5.9, "cdc_lww_merge": 0.7}
    assert bench.implausible_queries(clean, 0.1) == []
    # other SFs: shape-only, never flagged
    assert bench.implausible_queries(q, 0.001) == []


def test_steal_monitor_samples_and_gates():
    mon = bench.StealMonitor(interval=0.05)
    with mon:
        import time
        time.sleep(0.8)
    s = mon.summary()
    assert s["n_samples"] >= 1
    assert 0 <= s["max_steal_pct"] <= 100
    # gate logic
    mon.samples = [0.0, 2.5]
    assert mon.degraded() == []
    mon.samples = [0.0, 22.0]
    assert len(mon.degraded()) == 1
