"""K-means (operators/clustering.py): quality, determinism, plan shape.

Cross-engine value equality of the full iterative run is pinned by the
kmeans_embedding_clusters oracle (tests/test_oracle_parity.py); these
cover the operator-level contracts.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from filters_spark.operators.clustering import (
    initial_centroids,
    kmeans,
    update_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_deterministic_across_runs(spark, emb):
    a, ca = kmeans(emb, "embedding", "vec_id", k=4, iters=1, dim=64)
    b, cb = kmeans(emb, "embedding", "vec_id", k=4, iters=1, dim=64)
    assert ca == cb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_every_vector_assigned_once(spark, emb):
    out, _ = kmeans(emb, "embedding", "vec_id", k=8, iters=2, dim=64)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    assert all(0 <= r["cluster"] < 8 for r in rows)


def test_iterations_do_not_increase_cost(spark, emb):
    """Lloyd monotonicity: total within-cluster SSE after 2 rounds must
    not exceed the SSE after 1 (each step is a local minimizer)."""
    sse = []
    for iters in (1, 2):
        out, _ = kmeans(emb, "embedding", "vec_id", k=8, iters=iters, dim=64)
        sse.append(out.agg(F.sum("dist")).collect()[0][0])
    assert sse[1] <= sse[0] + 1e-9, sse


def test_matches_numpy_reimplementation(spark, emb):
    """Third-engine check: a NumPy Lloyd with the same init, the same
    floor(x·Q+0.5) quantized-integer updates, and the same lowest-cid
    tie-break must produce the identical assignment. (The synthetic
    labels carry no geometric structure — measured intra-label cosine
    ≈ inter-label — so purity-style assertions are meaningless here.)"""
    import hashlib

    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def h64(v: int) -> int:
        u = int(hashlib.sha256(str(v).encode()).hexdigest()[:16], 16)
        return u - (1 << 64) if u >= (1 << 63) else u

    k, iters, Q = 4, 2, 1_000_000
    order = np.lexsort((ids, np.array([h64(i) for i in ids])))
    cents = X[order[:k]].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None]) ** 2).sum(-1)
        assign = d.argmin(1)  # argmin returns the FIRST (lowest) index on ties
        for c in range(k):
            m = assign == c
            if m.any():
                q = np.floor(X[m] * Q + 0.5).sum(0)
                cents[c] = q / (float(m.sum()) * float(Q))
    d = ((X[:, None, :] - cents[None]) ** 2).sum(-1)
    expected = dict(zip(ids.tolist(), d.argmin(1).tolist()))

    out, _ = kmeans(emb, "embedding", "vec_id", k=k, iters=iters, dim=64)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got == expected


def test_k_exceeding_rows_raises(spark, emb):
    with pytest.raises(ValueError):
        initial_centroids(emb.limit(3), "embedding", "vec_id", k=8, dim=64)


def test_empty_cluster_keeps_previous_centroid(spark, emb):
    """Force an empty cluster: a far-away fake centroid attracts no
    points, so the update must return it unchanged."""
    cents = initial_centroids(emb, "embedding", "vec_id", 3, 64)
    far = [1e6] * 64
    updated = update_centroids(emb, "embedding", "vec_id", cents[:2] + [far])
    assert updated[2] == far


def test_assignment_plan_is_map_only(spark, emb):
    out, _ = kmeans(emb, "embedding", "vec_id", k=4, iters=1, dim=64)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, "final assignment must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
