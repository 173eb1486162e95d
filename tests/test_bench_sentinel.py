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
