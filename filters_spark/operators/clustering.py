"""K-means (Lloyd) over embedding columns — broadcast-centroid iterations.

The Spark-idiomatic k-means shape: centroids are tiny (k×dim doubles),
so each iteration is (1) a MAP-ONLY assignment pass with the centroids
inlined as literals (no join, no shuffle for the assign), and (2) ONE
constant-width groupBy — k rows × dim sum columns — to re-estimate
centroids, collected driver-side for the next iteration's literals.
Rows are never exploded: per-dimension sums are dim separate aggregate
columns over ``x_i``, not a posexplode (which would shuffle rows×dim).
At 100 TB that is iters × (one scan + one k-row shuffle) — the same
plan MLlib's KMeans uses, expressed in pure DataFrame algebra.

Determinism (what makes a DuckDB oracle possible for an ITERATIVE
float algorithm): float sums over a shuffled partitioning are
order-dependent, so centroid re-estimation quantizes components to
integers first — ``floor(x·Q + 0.5)`` with Q=10^6 — sums them exactly
in 64-bit integer space, and derives the centroid as one double
division of exact integers. Distances are unrolled left-associated
term chains over those identical centroid doubles, and the argmin is
``array_min`` over ``struct(d, cid)`` (lexicographic: smallest
distance, lowest cid on exact ties — the mirror of ORDER BY d, cid).
Every engine computing the same algebra gets bit-identical
assignments; the kmeans_embedding_clusters oracle certifies it.

Implementation note: the dim×k expression trees are built as SQL text
and parsed via ONE ``F.expr`` per stage — constructing them node by
node through the Column API costs ~10k py4j round-trips (~20s per
iteration measured at dim=64, k=8; the string path is sub-second for
the identical plan).

Init: the k vectors with the smallest ``(sha64(id), id)`` — a
deterministic hash-spread sample, mirrorable in SQL.

Reference parity: the reference library has no ML/clustering surface;
this is engine-layer north-rule scope (curation pipelines cluster
embeddings for diversity sampling and near-dup triage).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from filters_spark.operators.hashing import sha64

DEFAULT_QUANT = 1_000_000


def _dlit(c: float) -> str:
    """Double literal for Spark SQL text: CAST of the shortest repr —
    repr round-trips through Double.parseDouble to the same double,
    and sidesteps Spark's decimal-typed bare float literals."""
    return f"CAST('{c!r}' AS DOUBLE)"


def _proj_dims(df: DataFrame, vec_col: str, id_col: str, dim: int) -> DataFrame:
    """Project vec[i] -> x{i} double columns once; every later
    expression references the short names (plans collapse back to the
    getItem, but the SQL text shrinks ~3x)."""
    return df.selectExpr(
        id_col, *[f"CAST({vec_col}[{i}] AS DOUBLE) AS x{i}" for i in range(dim)]
    )


def _dist2_sql(centroid: list[float]) -> str:
    return " + ".join(
        f"(x{i} - {_dlit(c)}) * (x{i} - {_dlit(c)})" for i, c in enumerate(centroid)
    )


def _assign_sql(centroids: list[list[float]]) -> str:
    """array_min over struct(d, cid): each distance appears once (a
    when-chain fold would copy prior subtrees ~2^k — the round-1
    nested-CASE lesson)."""
    structs = ", ".join(
        f"named_struct('d', {_dist2_sql(c)}, 'c', {cid})"
        for cid, c in enumerate(centroids)
    )
    return f"array_min(array({structs}))"


def initial_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int, dim: int
) -> list[list[float]]:
    """The k vectors with smallest (sha64(id), id): deterministic,
    hash-spread, one TakeOrdered job (no full sort)."""
    rows = (
        _proj_dims(df, vec_col, id_col, dim)
        .withColumn("_h", sha64(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the {len(rows)} available vectors")
    return [[r[f"x{i}"] for i in range(dim)] for r in rows]


def update_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    quant: int = DEFAULT_QUANT,
) -> list[list[float]]:
    """One Lloyd update: map-only assignment under the given centroid
    literals, then ONE groupBy(cluster) with dim quantized-integer sum
    columns; empty clusters keep their previous centroid."""
    dim = len(centroids[0])
    q = _dlit(float(quant))
    proj = _proj_dims(df, vec_col, id_col, dim)
    agg = (
        proj.selectExpr(
            f"({_assign_sql(centroids)}).c AS _cl",
            *[f"x{i}" for i in range(dim)],
        )
        .groupBy("_cl")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.expr(f"sum(CAST(floor(x{i} * {q} + {_dlit(0.5)}) AS BIGINT))").alias(
                    f"_s{i}"
                )
                for i in range(dim)
            ],
        )
        .collect()
    )
    out = [list(c) for c in centroids]
    for r in agg:
        denom = float(r["_n"]) * float(quant)
        out[r["_cl"]] = [float(r[f"_s{i}"]) / denom for i in range(dim)]
    return out


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    dim: int | None = None,
    quant: int = DEFAULT_QUANT,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd k-means: returns (assignments, centroids) where
    assignments = (id_col, cluster int, dist double) under the FINAL
    centroids. ``iters`` full update rounds after deterministic init;
    each round is one scan + one k-row shuffle (see module docstring).

    ``dim`` is inferred from the first row when omitted (one tiny
    driver action); pass it explicitly in pipelines."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("empty input")
        dim = first["d"]
    cents = initial_centroids(df, vec_col, id_col, k, dim)
    for _ in range(iters):
        cents = update_centroids(df, vec_col, id_col, cents, quant)
    out = _proj_dims(df, vec_col, id_col, dim).selectExpr(
        id_col, f"{_assign_sql(cents)} AS _best"
    ).selectExpr(id_col, "_best.c AS cluster", "_best.d AS dist")
    return out, cents
