"""Distinct-count sketches (operators/sketches.py): KMV + HLL.

Accuracy is checked against exact distinct counts with the error bounds
the estimators guarantee (KMV: ~1/sqrt(k-2) rel. std. error; HLL:
~1.04/sqrt(m)); determinism and cross-engine value equality are pinned
by the oracled queries (sketch_kmv_distinct / sketch_hll_distinct in
tests/test_oracle_parity.py).
"""

import pyspark.sql.functions as F
import pytest

from filters_spark.operators.sketches import (
    hll_distinct,
    hll_merge,
    hll_registers,
    hll_finalize,
    kmv_distinct,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


class TestKMV:
    def test_exact_below_k(self, spark, events):
        # 150 distinct users < k=512 -> the sketch IS the exact count
        out = kmv_distinct(events, "user_id", ["event_type"], k=512).collect()
        exact = {
            r["event_type"]: r["d"]
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        for r in out:
            assert r["n_kept"] == exact[r["event_type"]]
            assert r["est_distinct"] == float(exact[r["event_type"]])

    def test_estimator_within_bound(self, spark, events):
        # 2000-ish distinct event ids, k=64: rel error ~ 1/sqrt(62) ≈ 13%;
        # assert a generous 3-sigma band
        out = kmv_distinct(events, "event_id", ["event_type"], k=64).collect()
        exact = {
            r["event_type"]: r["d"]
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("event_id").alias("d"))
            .collect()
        }
        for r in out:
            e = exact[r["event_type"]]
            assert abs(r["est_distinct"] - e) / e < 0.4, (r, e)

    def test_precap_is_lossless(self, spark, events):
        a = kmv_distinct(events, "event_id", ["event_type"], k=32, precap_salts=32)
        b = kmv_distinct(events, "event_id", ["event_type"], k=32, precap_salts=0)
        rows_a = sorted(tuple(r) for r in a.collect())
        rows_b = sorted(tuple(r) for r in b.collect())
        assert rows_a == rows_b

    def test_k_validation(self, events):
        with pytest.raises(ValueError):
            kmv_distinct(events, "event_id", ["event_type"], k=1)


class TestHLL:
    def test_estimator_within_bound(self, spark, events):
        # p=10 -> m=1024 -> rel error ~ 3.2%; allow 4-sigma
        out = hll_distinct(events, "event_id", ["event_type"], p=10).collect()
        exact = {
            r["event_type"]: r["d"]
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("event_id").alias("d"))
            .collect()
        }
        for r in out:
            e = exact[r["event_type"]]
            assert abs(r["est_raw"] - e) / e < 0.15, (r, e)

    def test_merge_equals_single_pass(self, spark, events):
        """Sketch(shard1 ∪ shard2) == merge(Sketch(shard1), Sketch(shard2))
        — the re-aggregation property a day-partitioned pipeline uses."""
        s1 = events.filter(F.col("event_id") % 2 == 0)
        s2 = events.filter(F.col("event_id") % 2 == 1)
        r1 = hll_registers(s1, "event_id", ["event_type"], p=8)
        r2 = hll_registers(s2, "event_id", ["event_type"], p=8)
        merged = hll_finalize(
            hll_merge(r1.unionByName(r2), ["event_type"]), ["event_type"], p=8
        )
        single = hll_distinct(events, "event_id", ["event_type"], p=8)
        assert sorted(tuple(r) for r in merged.collect()) == sorted(
            tuple(r) for r in single.collect()
        )

    def test_linear_counting_small_range(self, spark, events):
        # 150 distinct users vs m=1024 registers: deep linear-counting
        # territory — corrected estimate must beat the raw one
        out = hll_distinct(
            events, "user_id", ["event_type"], p=10, linear_counting=True
        ).collect()
        for r in out:
            assert abs(r["est"] - 150) / 150 < 0.1, r
            assert abs(r["est"] - 150) <= abs(r["est_raw"] - 150)

    def test_p_validation(self, events):
        with pytest.raises(ValueError):
            hll_registers(events, "event_id", ["event_type"], p=2)

    def test_plan_is_aggregate_only(self, spark, events):
        """The register build must be a plain partial-aggregable
        groupBy — no window, no Python, no join in the plan."""
        plan = hll_distinct(
            events, "event_id", ["event_type"], p=8
        )._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Join" not in plan


class TestCMS:
    def test_estimate_upper_bounds_true_count(self, spark, events):
        from filters_spark.operators.sketches import cms_build, cms_estimate

        d, w = 4, 64
        counters = cms_build(events, "user_id", depth=d, width=w)
        items = events.select("user_id").distinct()
        est = {
            r.user_id: r.est
            for r in cms_estimate(counters, items, "user_id", d, w).collect()
        }
        true = {
            r.user_id: r.cnt
            for r in events.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
        }
        assert set(est) == set(true)
        # CMS never undercounts, and the total overcount is bounded by
        # the collision mass: sum over items of (est - true) <= d items
        # per cell in expectation; assert the hard one-sided guarantee
        # plus a generous aggregate sanity bound
        assert all(est[u] >= true[u] for u in true)
        n = events.count()
        assert sum(est[u] - true[u] for u in true) <= len(true) * (2 * n / w)

    def test_absent_item_estimates_reflect_only_collisions(self, spark, events):
        from filters_spark.operators.sketches import cms_build, cms_estimate

        d, w = 4, 4096
        counters = cms_build(events, "user_id", depth=d, width=w)
        ghosts = spark.range(1_000_000, 1_000_050).select(
            F.col("id").alias("user_id")
        )
        est = cms_estimate(counters, ghosts, "user_id", d, w)
        # wide sketch, never-seen items: min over 4 rows is almost
        # surely an empty cell -> 0 (a nonzero would mean ALL 4 probes
        # collided, p ~ (n/w)^4)
        assert est.filter(F.col("est") > 0).count() == 0

    def test_merge_equals_single_pass(self, spark, events):
        from filters_spark.operators.sketches import cms_build, cms_merge

        d, w = 4, 128
        whole = cms_build(events, "user_id", ["event_type"], depth=d, width=w)
        h1 = cms_build(
            events.filter(F.col("event_id") % 2 == 0),
            "user_id", ["event_type"], depth=d, width=w,
        )
        h2 = cms_build(
            events.filter(F.col("event_id") % 2 == 1),
            "user_id", ["event_type"], depth=d, width=w,
        )
        merged = cms_merge(h1.unionByName(h2), ["event_type"])
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_weighted_counts(self, spark):
        from filters_spark.operators.sketches import cms_build, cms_estimate

        d, w = 3, 512
        df = spark.createDataFrame(
            [("a", 5), ("a", 7), ("b", 1)], ["k", "wt"]
        )
        counters = cms_build(df, "k", depth=d, width=w, weight_col="wt")
        items = spark.createDataFrame([("a",), ("b",)], ["k"])
        est = {r.k: r.est for r in cms_estimate(counters, items, "k", d, w).collect()}
        assert est == {"a": 12, "b": 1}

    def test_param_validation(self, spark, events):
        from filters_spark.operators.sketches import cms_build

        with pytest.raises(ValueError):
            cms_build(events, "user_id", depth=0)


class TestPrioritySample:
    def test_matches_bruteforce_selection_and_tau(self, spark):
        from filters_spark.operators.sampling import priority_sample

        rows = [(i, float((i * 37) % 100 + 1)) for i in range(500)]
        df = spark.createDataFrame(rows, ["id", "wt"])
        k = 20
        out = priority_sample(df, k, "wt", "id").collect()
        assert len(out) == k

        # brute-force recomputation with the same hash via Spark itself
        scored = df.select(
            "id", F.col("wt").cast("double").alias("w"),
            ((F.xxhash64(F.col("id").cast("string")).cast("double")
              / F.lit(float(1 << 64))) + F.lit(0.5)).alias("u"),
        ).collect()
        ranked = sorted(scored, key=lambda r: (r.u / r.w, r.id))
        want_ids = [r.id for r in ranked[:k]]
        tau = 1.0 / (ranked[k].u / ranked[k].w)
        got = {r.id: r for r in out}
        assert sorted(got) == sorted(want_ids)
        for r in out:
            assert r.est_weight == max(r.weight, tau)

    def test_exhaustive_group_keeps_raw_weights(self, spark):
        from filters_spark.operators.sampling import priority_sample

        df = spark.createDataFrame(
            [("g", i, 2.5) for i in range(5)], ["grp", "id", "wt"]
        )
        out = priority_sample(df, 10, "wt", "id", group_cols=["grp"]).collect()
        assert len(out) == 5
        assert all(r.est_weight == r.weight for r in out)

    def test_nonpositive_weights_excluded(self, spark):
        from filters_spark.operators.sampling import priority_sample

        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -4.0), (4, None)], ["id", "wt"]
        )
        out = priority_sample(df, 10, "wt", "id").collect()
        assert [r.id for r in out] == [1]

    def test_precap_is_lossless(self, spark):
        from filters_spark.operators.sampling import priority_sample

        rows = [(i, float(i % 13 + 1)) for i in range(400)]
        df = spark.createDataFrame(rows, ["id", "wt"])
        a = priority_sample(df, 15, "wt", "id", precap_salts=32).collect()
        b = priority_sample(df, 15, "wt", "id", precap_salts=0).collect()
        key = lambda r: (r.id, r.weight, r.rank_key, r.est_weight)
        assert sorted(map(key, a)) == sorted(map(key, b))

    def test_unbiased_subset_sum_in_expectation_shape(self, spark):
        """est_weight sums approximate the true weight total (the
        property the tau adjustment exists for) — loose band, it is a
        single deterministic draw."""
        from filters_spark.operators.sampling import priority_sample

        rows = [(i, float((i * 131) % 997 + 1)) for i in range(2000)]
        df = spark.createDataFrame(rows, ["id", "wt"])
        total = sum(w for _, w in rows)
        out = priority_sample(df, 200, "wt", "id").collect()
        est_total = sum(r.est_weight for r in out)
        assert abs(est_total - total) / total < 0.2


class TestHeavyHitters:
    def test_equals_naive_groupby(self, spark, events):
        from filters_spark.operators.sketches import heavy_hitters

        got = {
            (r.user_id, r.n)
            for r in heavy_hitters(events, "user_id", 0.008).collect()
        }
        total = events.count()
        want = {
            (r.user_id, r.n)
            for r in events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 0.008 * total)
            .collect()
        }
        assert got == want and len(got) > 0

    def test_nulls_never_heavy(self, spark):
        from filters_spark.operators.sketches import heavy_hitters

        df = spark.createDataFrame(
            [(None,)] * 50 + [(1,)] * 30 + [(2,)] * 2, "v: bigint"
        )
        out = heavy_hitters(df, "v", 0.2).collect()
        assert [(r.v, r.n) for r in out] == [(1, 30)]

    def test_total_rows_override_and_plan(self, spark, events):
        from filters_spark.operators.sketches import heavy_hitters
        from filters_spark.plans.audit import executed_plan

        # 0.008 keeps the result non-empty — an empty result lets AQE
        # collapse the whole plan to EmptyRelation and there is nothing
        # left to audit
        out = heavy_hitters(events, "user_id", 0.008, total_rows=events.count())
        assert len(out.collect()) > 0
        plan = executed_plan(out)
        assert "BatchEvalPython" not in plan
        # exactly one Arrow stage (the candidate pass, a MapInPandas
        # node); the verify join must be broadcast, never a shuffled
        # join of the raw rows
        assert plan.count("MapInPandas") == 1
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    def test_param_validation(self, spark, events):
        from filters_spark.operators.sketches import heavy_hitters

        with pytest.raises(ValueError):
            heavy_hitters(events, "user_id", 0.0)

    def test_string_keys(self, spark, events):
        from filters_spark.operators.sketches import heavy_hitters

        got = dict(
            (r.event_type, r.n)
            for r in heavy_hitters(events, "event_type", 0.15).collect()
        )
        total = events.count()
        want = {
            r.event_type: r.n
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 0.15 * total)
            .collect()
        }
        assert got == want


class TestBloom:
    def test_no_false_negatives_and_fp_rate(self, spark, events):
        from filters_spark.operators.sketches import bloom_build, bloom_might_contain

        m, k = 4096, 3
        bloom = bloom_build(events, "user_id", m_bits=m, k=k)
        present = events.select("user_id").distinct()
        got = {
            r.user_id: r.might_contain
            for r in bloom_might_contain(bloom, present, "user_id", m, k).collect()
        }
        assert all(got.values())  # a bloom filter NEVER misses a member
        ghosts = spark.range(5_000_000, 5_002_000).select(
            F.col("id").alias("user_id")
        )
        fp = (
            bloom_might_contain(bloom, ghosts, "user_id", m, k)
            .filter("might_contain")
            .count()
        )
        # 150 keys * 3 probes into 4096 bits -> fill ~ 10.4%; fp ~ 0.11%
        assert fp / 2000 < 0.02

    def test_shard_merge_equals_single_build(self, spark, events):
        from filters_spark.operators.sketches import bloom_build, bloom_merge

        m, k = 2048, 4
        whole = bloom_build(events, "user_id", m_bits=m, k=k)
        h1 = bloom_build(events.filter("event_id % 2 = 0"), "user_id", m_bits=m, k=k)
        h2 = bloom_build(events.filter("event_id % 2 = 1"), "user_id", m_bits=m, k=k)
        merged = bloom_merge(h1.unionByName(h2))
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_probe_is_broadcast_map_only(self, spark, events):
        from filters_spark.operators.sketches import bloom_build, bloom_might_contain
        from filters_spark.plans.audit import executed_plan

        bloom = bloom_build(events, "user_id", m_bits=4096, k=3)
        items = events.select("user_id").distinct()
        out = bloom_might_contain(bloom, items, "user_id", 4096, 3)
        out.collect()
        plan = executed_plan(out)
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_param_validation(self, spark, events):
        from filters_spark.operators.sketches import bloom_build

        with pytest.raises(ValueError):
            bloom_build(events, "user_id", m_bits=100)  # not a multiple of 64
        with pytest.raises(ValueError):
            bloom_build(events, "user_id", k=0)


class TestHeavyHittersBoundedMemory:
    def test_capped_counters_keep_completeness(self, spark):
        """Force the Misra-Gries decrement path: one partition, far
        more distinct values than the counter cap — the heavy value
        must still surface, and the result still equals the exact
        GROUP BY/HAVING."""
        from filters_spark.operators.sketches import heavy_hitters

        rows = [(i,) for i in range(10_000, 11_000)] * 1  # 1000 singletons
        rows += [(7,)] * 600
        df = spark.createDataFrame(rows, "v: bigint").coalesce(1)
        # f=0.3 -> cap = 64 counters << 1001 distinct values
        out = {(r.v, r.n) for r in heavy_hitters(df, "v", 0.3).collect()}
        assert out == {(7, 600)}

    def test_many_moderate_values_survive_cuts(self, spark):
        from filters_spark.operators.sketches import heavy_hitters

        # 20 values x 50 rows (all heavy at f=0.02 of 1600) + 600 noise
        # singletons, single partition, cap = max(64, 400) = 400 >
        # distinct... use f small enough that cap < distinct: f=0.05 ->
        # cap=160 < 620 distinct, every 50-count value must survive
        rows = [(v,) for v in range(20) for _ in range(50)]
        rows += [(i,) for i in range(50_000, 50_600)]
        df = spark.createDataFrame(rows, "v: bigint").coalesce(1)
        total = len(rows)
        got = {(r.v, r.n) for r in heavy_hitters(df, "v", 0.02).collect()}
        want = {(v, 50) for v in range(20) if 50 >= 0.02 * total}
        assert got == want


class TestProbeRowMultiplicity:
    def test_cms_estimate_keeps_duplicate_items(self, spark, events):
        from filters_spark.operators.sketches import cms_build, cms_estimate

        counters = cms_build(events, "user_id", depth=4, width=64)
        dup = spark.createDataFrame([(3,), (3,), (7,)], "user_id: bigint")
        out = cms_estimate(counters, dup, "user_id", 4, 64).collect()
        assert len(out) == 3  # one output row per INPUT row, not per distinct

    def test_bloom_probe_keeps_duplicate_items(self, spark, events):
        from filters_spark.operators.sketches import bloom_build, bloom_might_contain

        bloom = bloom_build(events, "user_id", m_bits=4096, k=3)
        dup = spark.createDataFrame([(3,), (3,)], "user_id: bigint")
        out = bloom_might_contain(bloom, dup, "user_id", 4096, 3).collect()
        assert len(out) == 2 and all(r.might_contain for r in out)
