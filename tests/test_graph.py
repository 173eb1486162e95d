"""PageRank (operators/graph.py): integer-exact rank propagation
checked against an independent Python reimplementation; cross-engine
value equality is pinned by the oracled graph_pagerank query."""

import pytest

from filters_spark.operators.graph import pagerank


def pr_py(edges, iters=3, damp=85, scale=10**9):
    from collections import defaultdict

    nodes = sorted({x for e in edges for x in e})
    out = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    base = ((100 - damp) * scale) // 100
    r = {n: scale for n in nodes}
    for _ in range(iters):
        inb = defaultdict(int)
        for s, d in edges:
            inb[d] += r[s] // out[s]
        r = {n: base + (damp * inb.get(n, 0)) // 100 for n in nodes}
    return r


class TestPageRank:
    EDGES = [
        # hub "h" cited by everyone; "d" dangles (no out-edges);
        # "src" has no in-edges (rank decays to base + nothing)
        ("a", "h"), ("b", "h"), ("c", "h"), ("src", "h"),
        ("h", "a"), ("h", "b"), ("a", "b"), ("b", "d"), ("src", "d"),
    ]

    def test_matches_python_twin(self, spark):
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {r.node: r.rank_scaled for r in pagerank(df, iters=3).collect()}
        assert got == pr_py(self.EDGES, iters=3)

    def test_hub_outranks_and_source_decays(self, spark):
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {r.node: r.rank_scaled for r in pagerank(df, iters=4).collect()}
        assert got["h"] == max(got.values())
        assert got["src"] == ((100 - 85) * 10**9) // 100  # base only

    def test_param_validation(self, spark):
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        with pytest.raises(ValueError):
            pagerank(df, iters=0)
        with pytest.raises(ValueError):
            pagerank(df, damping_pct=100)

    def test_reliable_checkpoint_path(self, spark, tmp_path):
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            r.node: r.rank_scaled
            for r in pagerank(df, iters=2, checkpoint_dir=str(tmp_path / "ck")).collect()
        }
        assert got == pr_py(self.EDGES, iters=2)
