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
