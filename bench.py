"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

--scaling: replay the same input at N and 4N executors (real separate
executor JVMs via local-cluster mode: 1x2 vs 4x2 cores) and report
events/sec at both + scaling efficiency (T_N/T_4N)/4, writing
BENCH/BASELINE.md. This is the sandbox proxy for the north rule's
two-cluster-size requirement (no real cluster here).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --- host-health sentinel ----------------------------------------------------
# This benchmark runs on a hypervisor-shared VM whose CPU delivery varies
# wildly: a round-3 artifact showed a uniform 6.4x "regression" that an
# idle-host A/B proved was pure throttling (OS view during the event: 1%
# user time, 76% idle with 9 runnable processes, 5-6% steal). A wall-clock
# number is only meaningful relative to how much CPU the host actually
# delivered, so every bench artifact now carries a before/after probe and
# REFUSES (non-zero exit, "throttled": true) when delivery is >1.5x below
# the reference recorded with the official BASELINE numbers.
#
# Gate metrics (chosen for stability, measured +-8% run-to-run on an idle
# host): single-thread sha256 ops/sec and 4-thread aggregate (hashlib
# releases the GIL, so threads scale). The 8/16-thread aggregates are
# recorded as observables but NOT gated: this hypervisor burst-caps wide
# bursts (16 threads measure LESS total than 1), with 2x run-to-run noise.

SENTINEL_REF = {"st_ops": 17000.0, "mt4_ops": 58000.0}  # idle-host, 2026-08-17
SENTINEL_FACTOR = 1.5

_SENTINEL_BUF = b"\xa5" * 65536


def _hash_loop(dur: float) -> float:
    n = 0
    h = hashlib.sha256
    end = time.perf_counter() + dur
    while time.perf_counter() < end:
        h(_SENTINEL_BUF).digest()
        n += 1
    return n / dur


def _steal_pct(gap: float = 0.3) -> float:
    def read():
        try:
            with open("/proc/stat") as f:
                return list(map(int, f.readline().split()[1:]))
        except OSError:
            return None

    a = read()
    if a is None:
        return 0.0
    time.sleep(gap)
    b = read()
    if b is None:  # /proc/stat went away mid-sample (procfs restriction,
        # fd exhaustion) — report "no steal observed", don't TypeError:
        # inside StealMonitor a crash here kills the sampler thread
        # silently and an empty sample set reads as a healthy run
        return 0.0
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(d[7] / tot * 100, 2) if tot and len(d) > 7 else 0.0


def host_sentinel(dur: float = 0.4) -> dict:
    """CPU-delivery probe: sha256 ops/sec at 1 and 4 threads (gated) and
    8 threads (observable), plus a /proc/stat steal sample."""
    st = _hash_loop(dur)
    out = {"st_ops": round(st)}
    for threads in (4, 8):
        counts = [0.0] * threads

        def worker(i):
            counts[i] = _hash_loop(dur)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        out[f"mt{threads}_ops"] = round(sum(counts))
    out["steal_pct"] = _steal_pct()
    return out


def sentinel_degraded(sent: dict) -> list[str]:
    """Reasons this host is delivering materially less CPU than the
    reference state the BASELINE numbers were recorded in."""
    reasons = []
    for key in ("st_ops", "mt4_ops"):
        if sent[key] < SENTINEL_REF[key] / SENTINEL_FACTOR:
            reasons.append(
                f"{key} {sent[key]:,} < ref {SENTINEL_REF[key]:,.0f}/{SENTINEL_FACTOR}"
            )
    if sent.get("steal_pct", 0) > 10:
        reasons.append(f"steal {sent['steal_pct']}% > 10%")
    return reasons


# Per-query plausibility ceilings: 8x the best recorded idle-host run
# (BENCH/ANALYSIS.md round-4 artifact). The endpoint sentinels have a
# blind spot — a hypervisor throttle that starts after the "before"
# probe and drains before the "after" one brackets a poisoned run with
# two healthy sentinels (observed live: minhash 5.9s -> 574s with clean
# sentinels on both sides). A query exceeding its ceiling cannot be a
# valid measurement of this code on a healthy host — mid-run throttle
# or a real regression, either must flag loudly, never publish quietly.
QUERY_CEILING_FACTOR = 8
REF_QUERY_SECONDS = {
    "warmup": 35, "cdc_replay": 30, "cdc_replay_mor": 25,
    # calibrated from the first clean idle-host run at r5 HEAD
    # (2026-08-20: 20.9s / 24.3s, sentinel mt8 47k, steal 0.06%)
    "fanout_replay": 21, "fanout_replay_2pc": 25,
    "cdc_lww_merge": 1.5, "cdc_checkpoint_offsets": 1.2,
    "agg_pricing_summary": 1.3, "join_revenue_by_nation": 2.2,
    "window_topk_per_user": 1.5, "filter_unicode_normalize": 0.9,
    "dedup_exact_stats": 0.8, "dedup_minhash_lsh": 8,
    "text_token_stats": 1.3, "ann_cosine_topk": 3.5,
}


def implausible_queries(queries: dict, sf: float) -> list[str]:
    """Headline timings beyond any healthy-host explanation. Ceilings
    are calibrated at sf0.1; at other SFs only the relative shape is
    meaningful, so the check is skipped."""
    if abs(sf - 0.1) > 1e-9:
        return []
    return [
        f"{k}={v:.1f}s > {REF_QUERY_SECONDS[k] * QUERY_CEILING_FACTOR:.0f}s ceiling"
        for k, v in queries.items()
        if k in REF_QUERY_SECONDS
        and v > REF_QUERY_SECONDS[k] * QUERY_CEILING_FACTOR
    ]


class StealMonitor:
    """Passive mid-run /proc/stat sampler (no CPU probes — an active
    probe can't distinguish the bench's own load from hypervisor
    withholding while the bench runs). Steal IS attributable: it is
    cycles the hypervisor refused while a vCPU was runnable."""

    def __init__(self, interval: float = 15.0):
        self.interval = interval
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.wait(self.interval):
            self.samples.append(_steal_pct(0.5))

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)

    def summary(self) -> dict:
        return {
            "n_samples": len(self.samples),
            "max_steal_pct": max(self.samples, default=0.0),
        }

    def degraded(self) -> list[str]:
        mx = max(self.samples, default=0.0)
        return [f"mid-run steal {mx}% > 10%"] if mx > 10 else []


HEADLINE = [
    "cdc_lww_merge",
    "cdc_checkpoint_offsets",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "window_topk_per_user",
    "filter_unicode_normalize",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "text_token_stats",
    "ann_cosine_topk",
]

CDC_EVENTS_AT_SF01 = 600_000  # ~lineitem rows at sf0.1


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def make_spark(master: str, shuffle_partitions: int):
    from filters_spark.session import get_spark

    spark = get_spark(
        "filters-spark-bench", master=master, shuffle_partitions=shuffle_partitions,
        # content compresses ~40x: the default 64MB AQE advisory size
        # coalesces post-shuffle stages below cluster width; 16MB keeps
        # wide clusters busy at bench scale without hurting 1-exec runs
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            # the WAL compresses ~40x; 32m splits keep the staging scan
            # at a usable task count. Finer (4m) and coarser (128m)
            # splits both measured slower: fine splits pay per-task
            # python-worker setup and multiply staged file counts,
            # coarse splits leave the wide leg with 1.6 task waves.
            "spark.sql.files.maxPartitionBytes": "33554432",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_cdc_replay(spark, n_events: int, num_buckets: int = 32, batches: int = 4,
                   write_mode: str = "cow") -> dict:
    """The flagship workload: full replay of a skewed, dirty change
    stream into a fresh lake table. Returns events/sec.

    ``write_mode="mor"`` measures the merge-on-read ingest path (delta
    commits + auto-compaction) — the O(batch)-write mode that keeps
    10^10-event replays from rewriting the table every batch."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events

    root = tempfile.mkdtemp(prefix="filters_spark_bench_")
    try:
        table = LakeTable.create(
            spark, os.path.join(root, "lake"), key_cols=["repo", "path"],
            num_buckets=num_buckets,
        )
        engine = CDCEngine(spark, table, default_registry(), write_mode=write_mode)
        # materialize the WAL to parquet first (generation is not part
        # of the measured replay; a real binlog arrives from storage)
        events_path = os.path.join(root, "events.parquet")
        # a real WAL arrives as many segment files; write 64 so scan
        # parallelism is never bounded by the file count (content
        # compresses ~40x, so few-file layouts starve wide clusters)
        gen_events(
            spark, n_events=n_events, n_repos=500, n_paths=5000,
            hot_frac=0.15, dirty_frac=0.05, seed=42,
        ).repartition(64).write.parquet(events_path)
        events = spark.read.parquet(events_path)
        t0 = time.time()
        metrics = engine.replay(events, num_batches=batches)
        dt = time.time() - t0
        rows = table.read().count()
        return {
            "seconds": dt,
            "events": n_events,
            "events_per_sec": n_events / dt,
            "applied": sum(m["applied"] for m in metrics),
            "dead_lettered": sum(m["dead_lettered"] for m in metrics),
            "final_rows": rows,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_fanout_replay(spark, n_events: int, num_buckets: int = 32,
                      atomic: bool = False) -> dict:
    """Two-route Debezium fan-out replay — the multi-table ingest path
    (engine/fanout.py + engine/txn.py). ONE mixed server-level envelope
    stream (two source tables with the flagship replay's skew/dirt
    profile) is materialized to parquet, then the measured section
    decodes it in a single parse pass and applies each route to its own
    fresh lake table. ``atomic=True`` routes through the 2PC
    all-or-none path (stage every table, one durable decision record,
    metadata-only publish) — the delta vs the independent-applies mode
    IS the per-route staged-commit overhead atomicity costs."""
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.engine.fanout import TableRoute, fan_out_debezium
    from filters_spark.engine.txn import fan_out_atomic
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events
    from filters_spark.sources.debezium import to_debezium

    root = tempfile.mkdtemp(prefix="filters_spark_bench_fan_")
    try:
        half = n_events // 2
        fields = ["repo", "path", "lang", "content"]
        env_path = os.path.join(root, "envelopes.parquet")
        ev_a = gen_events(spark, n_events=half, n_repos=250, n_paths=2500,
                          hot_frac=0.15, dirty_frac=0.05, seed=42)
        ev_b = gen_events(spark, n_events=n_events - half, n_repos=250,
                          n_paths=2500, hot_frac=0.15, dirty_frac=0.05, seed=43)
        (
            to_debezium(ev_a, fields, db="d", table="repos")
            .unionAll(to_debezium(ev_b, fields, db="d", table="users"))
            .repartition(64)
            .write.parquet(env_path)
        )
        raw = spark.read.parquet(env_path)
        routes = []
        for name in ("repos", "users"):
            t = LakeTable.create(
                spark, os.path.join(root, name), key_cols=["repo", "path"],
                num_buckets=num_buckets,
            )
            routes.append(TableRoute(name, CDCEngine(spark, t, default_registry())))
        seq = lambda s: s["pos"].cast("long")  # noqa: E731 — pos IS event_seq
        t0 = time.time()
        if atomic:
            report = fan_out_atomic(
                raw, routes, os.path.join(root, "txn"), seq_expr=seq
            )
            assert report["txn"] == "committed"
        else:
            report = fan_out_debezium(raw, routes, seq_expr=seq)
        dt = time.time() - t0
        return {
            "seconds": dt,
            "events": n_events,
            "events_per_sec": n_events / dt,
            "applied": sum(m["applied"] for m in report["tables"].values()),
            "dead_lettered": sum(
                m["dead_lettered"] for m in report["tables"].values()
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def _sentinel_with_retry(label: str) -> dict:
    """host_sentinel with one cooldown retry. Transient load (a Spark
    JVM winding down — its GC/shutdown threads deflate the multithread
    probe for several seconds — or another process's tail) clears in
    seconds; genuine hypervisor throttling doesn't. The retried reading
    is what's recorded. Applies to the AFTER probe too: it runs right
    when the bench's own JVM is tearing down, the single most common
    false-positive throttle flag."""
    sent = host_sentinel()
    if sentinel_degraded(sent):
        print(f"# host sentinel ({label}) degraded ({sent}); retrying in 20s",
              file=sys.stderr)
        time.sleep(20)
        sent = host_sentinel()
    print(f"# host sentinel ({label}): {sent}", file=sys.stderr)
    return sent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scaling", action="store_true", help="local[8] vs local[32] CDC replay")
    ap.add_argument("--events", type=int, default=0, help="CDC replay event count override")
    ap.add_argument("--cores-per-exec", type=int, default=1,
                    help="cores per executor JVM in --scaling legs")
    ap.add_argument("--write-mode", default="cow", choices=["cow", "mor"],
                    help="lake write mode for the --scaling replay legs")
    args = ap.parse_args()

    sf = _sf_from_dir(args.sf)
    n_events = args.events or max(int(CDC_EVENTS_AT_SF01 * (sf / 0.1)), 10_000)

    sent_before = _sentinel_with_retry("before")

    if args.scaling:
        # scaling runs need the parallel fraction to dominate the fixed
        # per-batch costs (Amdahl): 4x the event volume of the plain bench
        if not args.events:
            n_events *= 4
        # N vs 4N EXECUTORS with real separate executor JVMs
        # (local-cluster mode). Single-JVM local[k] is NOT a valid
        # scaling proxy — one shared heap/python worker pool serializes
        # wide configurations (measured: local[32] 4x slower than
        # local[8] on identical input).
        # Default 1 core/executor: every task core runs ~2 CPU threads
        # (JVM task + Arrow python worker), and a pure-CPU host probe
        # scales at 0.96 up to ~8 active threads but only 0.70 at 16 —
        # 1x1 vs 4x1 (~2 vs ~8 threads) is the widest N-vs-4N pair
        # inside the host's linear regime, so it measures the ENGINE;
        # wider pairs measure the hypervisor (see BENCH/ANALYSIS.md).
        # Hypervisor-shared host: trials vary up to 1.5x run-to-run;
        # take the best of 2 per leg as the throughput claim and report
        # both trials.
        results = {}
        cpe = args.cores_per_exec
        # mid-run steal sampling: the scaling legs are the LONGEST runs
        # this harness does (minutes per leg), i.e. the widest window
        # for the endpoint-sentinel blind spot documented above — they
        # need the passive monitor at least as much as the headline run
        with StealMonitor() as mon:
            for n_exec in (1, 4):
                spark = make_spark(
                    f"local-cluster[{n_exec},{cpe},6144]",
                    shuffle_partitions=max(cpe * n_exec, 2),
                )
                trials = [
                    run_cdc_replay(spark, n_events, batches=2, write_mode=args.write_mode)
                    for _ in range(2)
                ]
                spark.stop()
                r = max(trials, key=lambda t: t["events_per_sec"])
                r["trial_seconds"] = [round(t["seconds"], 1) for t in trials]
                results[n_exec] = r
                print(f"# {n_exec} executor(s) x {cpe} cores: {r['events_per_sec']:,.0f} events/s "
                      f"(best of {r['trial_seconds']}s)", file=sys.stderr)
        eff = (results[4]["events_per_sec"] / results[1]["events_per_sec"]) / 4
        sent_after = _sentinel_with_retry("after")
        # per-leg plausibility floors: ref/8 of the recorded idle-host
        # pairs (BENCH/BASELINE.md cow, BENCH/SCALING_MOR.md mor) —
        # calibrated at the default volume (2.4M events at sf0.1), so
        # the check is skipped under --events overrides, like the
        # headline ceilings are skipped off sf0.1
        REF_LEG_EPS = {"cow": {1: 13_000, 4: 45_000},
                       "mor": {1: 15_000, 4: 51_000}}
        implausible = []
        if not args.events and abs(sf - 0.1) < 1e-9:
            for n_exec, r in results.items():
                floor = REF_LEG_EPS[args.write_mode][n_exec] / QUERY_CEILING_FACTOR
                if r["events_per_sec"] < floor:
                    implausible.append(
                        f"{n_exec}-exec leg {r['events_per_sec']:,.0f} ev/s "
                        f"< {floor:,.0f} floor"
                    )
        degraded = (
            sentinel_degraded(sent_before) + sentinel_degraded(sent_after)
            + mon.degraded() + implausible
        )
        md = f"""# BENCH — CDC replay scaling (N vs 4N executors)

Input: {n_events:,} deterministic change events (15% hot-repo skew,
5% dirty), replayed in 2 batches ({args.write_mode} write mode) into a
fresh 32-bucket lake table.
Same input both runs; only the executor count changes. Runs use
`local-cluster` mode — real separate executor JVMs with their own
heaps and Python worker pools, the faithful single-host stand-in for a
multi-executor cluster (single-JVM `local[k]` shares one heap and one
python-worker lock across all task threads and anti-scales).

| cluster size | events/sec | wall sec (trials) | applied | dead-lettered |
|---|---|---|---|---|
| 1 executor x {cpe} core(s) (N) | {results[1]['events_per_sec']:,.0f} | {results[1]['seconds']:.1f} {results[1]['trial_seconds']} | {results[1]['applied']:,} | {results[1]['dead_lettered']:,} |
| 4 executors x {cpe} core(s) (4N) | {results[4]['events_per_sec']:,.0f} | {results[4]['seconds']:.1f} {results[4]['trial_seconds']} | {results[4]['applied']:,} | {results[4]['dead_lettered']:,} |

**Scaling efficiency (T_N/T_4N)/4 = {eff:.3f}** (north-rule target >= 0.8).

Final-state check: {results[1]['final_rows']:,} vs
{results[4]['final_rows']:,} rows (byte-equality pinned separately in
tests/test_scaling.py via content_sha set comparison).

Host sentinel (CPU delivery at measurement time; sha256 ops/sec — see
bench.py host_sentinel, reference {SENTINEL_REF}):
before {sent_before}, after {sent_after}. Numbers in this file are
only comparable to runs whose sentinel is within {SENTINEL_FACTOR}x of the
reference; bench.py exits non-zero and flags `"throttled": true` otherwise.
Mid-run steal monitor: {mon.summary()}.
"""
        if not degraded:
            # the ledger write sits BEHIND the gate: a throttled run must
            # never replace the last good official numbers ("never
            # publish quietly" — the JSON line still reports the run,
            # flagged throttled, but BASELINE.md stays authoritative)
            os.makedirs("BENCH", exist_ok=True)
            # the official (cow) pair owns BASELINE.md; other modes get
            # their own ledger file so the headline never silently swaps
            # semantics
            out = "BENCH/BASELINE.md" if args.write_mode == "cow" else (
                f"BENCH/SCALING_{args.write_mode.upper()}.md"
            )
            analysis = os.path.join("BENCH", "ANALYSIS.md")
            if args.write_mode == "cow" and os.path.exists(analysis):
                with open(analysis) as f:  # stable ledger survives regeneration
                    md += "\n" + f.read()
            with open(out, "w") as f:
                f.write(md)
        print(json.dumps({
            "metric": "cdc_replay_events_per_sec",
            "write_mode": args.write_mode,
            "value": round(results[4]["events_per_sec"], 1),
            "unit": "events/sec",
            "n_exec_events_per_sec": round(results[1]["events_per_sec"], 1),
            "4n_exec_events_per_sec": round(results[4]["events_per_sec"], 1),
            "scaling_efficiency": round(eff, 3),
            "sf": sf,
            "sentinel_before": sent_before,
            "sentinel_after": sent_after,
            "sentinel_midrun": mon.summary(),
            "sentinel_ref": SENTINEL_REF,
            "implausible": implausible,
            "throttled": bool(degraded),
        }))
        if degraded:
            print(f"# THROTTLED host — numbers above are NOT comparable "
                  f"(ledger untouched): {degraded}", file=sys.stderr)
            sys.exit(3)
        return

    # size the local session to the host's EFFECTIVE capacity, not its
    # advertised CPU count: single-JVM local[k] funnels all task
    # threads through one SparkEnv/python-worker lock, and this
    # hypervisor's wide-burst delivery VARIES BY DAY — round 3 measured
    # ~21 effective cores (local[16] optimal: 14.7s vs local[8] 22.6s
    # on the 600k replay), while round 4 measured the cap at ~4-8
    # threads (mt16 probe BELOW single-thread; local[8] 30.7s vs
    # local[16] 36-200s on the same replay). So pick the width from the
    # sentinel just measured: 16 only when 8-thread delivery actually
    # scales past 4-thread delivery, else 8. A real deployment sizes
    # executors the same way: cores <= what the machine serves TODAY.
    wide_ok = sent_before["mt8_ops"] >= 1.5 * sent_before["mt4_ops"]
    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 16 if wide_ok else 8)
    print(f"# local width {cpus} (mt8/mt4 = "
          f"{sent_before['mt8_ops'] / max(sent_before['mt4_ops'], 1):.2f})",
          file=sys.stderr)
    spark = make_spark(f"local[{cpus}]", shuffle_partitions=int(cpus))
    t0 = time.time()
    with StealMonitor() as mon:
        # first-call plan codegen + JIT is ~30s of one-time cost that lands
        # entirely on whichever replay runs first; a small warmup replay
        # pays it OUTSIDE the headline measurements (but INSIDE the total,
        # recorded as its own line — nothing hidden)
        warm = run_cdc_replay(spark, 10_000, batches=2)
        cdc = run_cdc_replay(spark, n_events)
        cdc_mor = run_cdc_replay(spark, n_events, write_mode="mor")
        qtimes = run_queries(spark, args.sf, HEADLINE)
        # comparable headline total = the r1-r4 workload set; the
        # fan-out lines (new in r5) time OUTSIDE it so the cross-round
        # bench_total_sec ratio stays apples-to-apples, and report
        # their own seconds + events/sec below
        total = time.time() - t0
        fan = run_fanout_replay(spark, n_events)
        fan_2pc = run_fanout_replay(spark, n_events, atomic=True)
    queries = {
        "warmup": round(warm["seconds"], 3),
        "cdc_replay": round(cdc["seconds"], 3),
        "cdc_replay_mor": round(cdc_mor["seconds"], 3),
        "fanout_replay": round(fan["seconds"], 3),
        "fanout_replay_2pc": round(fan_2pc["seconds"], 3),
        **qtimes,
    }
    sent_after = _sentinel_with_retry("after")
    implausible = implausible_queries(queries, sf)
    degraded = (
        sentinel_degraded(sent_before) + sentinel_degraded(sent_after)
        + mon.degraded() + implausible
    )
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        # value covers the r1-r4 comparable workload; the fan-out lines
        # below are NEW in r5 and timed outside it (their own seconds
        # appear in queries + events/sec fields)
        "value_excludes": ["fanout_replay", "fanout_replay_2pc"],
        "queries": queries,
        "cdc_events_per_sec": round(cdc["events_per_sec"], 1),
        "cdc_mor_events_per_sec": round(cdc_mor["events_per_sec"], 1),
        "fanout_events_per_sec": round(fan["events_per_sec"], 1),
        "fanout_2pc_events_per_sec": round(fan_2pc["events_per_sec"], 1),
        "sf": sf,
        "sentinel_before": sent_before,
        "sentinel_after": sent_after,
        "sentinel_midrun": mon.summary(),
        "sentinel_ref": SENTINEL_REF,
        "implausible": implausible,
        "throttled": bool(degraded),
    }))
    spark.stop()
    if degraded:
        print(f"# THROTTLED host — numbers above are NOT comparable: "
              f"{degraded}", file=sys.stderr)
        sys.exit(3)


if __name__ == "__main__":
    main()
