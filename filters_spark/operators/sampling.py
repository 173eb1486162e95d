"""Deterministic sampling / splitting / packing for training-data
pipelines — all native Column expressions, no randomness at runtime.

Reproducibility rule: every assignment is a pure function of the row's
id (multiplicative hashing in 31-bit modular space, exactly computable
in any engine with 64-bit integer math), so splits are stable across
runs, engines, partitionings and cluster sizes — the property corpus
splits actually need (a resampled val set invalidates comparisons).

- :func:`hash_split`: weighted train/val/test assignment by id hash.
- :func:`quota_per_group`: cap rows per group (per-domain caps — a
  standard corpus-balancing step), deterministic keep-order.
- :func:`pack_sequences`: greedy contiguous stream packing of documents
  into fixed-token-budget sequences (the "pack docs into 4k-token
  training rows" step), as a window cumsum — one shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# multiplier < 2^31 so (id % 2^31) * MULT stays under 2^62 (no int64
# overflow in either Spark or DuckDB); classic LCG constant
_MULT = 1099087573
_MOD = 2_147_483_648  # 2^31


def _hash01(id_col: Column, salt: int) -> Column:
    """Deterministic uniform-ish [0,1) from a nonnegative integer id —
    pure BIGINT arithmetic, bit-identical across engines."""
    h = F.pmod((F.pmod(id_col.cast("long"), F.lit(_MOD)) + F.lit(salt)) * F.lit(_MULT), F.lit(_MOD))
    return h / float(_MOD)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given weights (e.g.
    ``{"train": 0.98, "val": 0.01, "test": 0.01}``), deterministically
    by id. Map-only: no shuffle, no RNG, stable under re-runs and
    engine changes."""
    total = sum(weights.values())
    frac = _hash01(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        expr = F.when(frac < cum, name) if expr is None else expr.when(frac < cum, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def quota_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    quota: int,
    precap: bool = False,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, deterministically (lowest
    ``order_col`` first) — per-domain / per-source caps. One shuffle
    keyed on the group.

    Skew: a hot group is a SINGLE window task — AQE skew splitting
    applies to joins, not to ``row_number`` windows. ``precap=True``
    adds a pre-pass window partitioned by (input partition id, group):
    a row in the global per-group top-``quota`` is necessarily in the
    top-``quota`` of its own input slice, so each slice keeps its local
    ``quota`` lowest and the hot group's final task sorts at most
    ``quota × n_input_partitions`` rows instead of the whole group.
    Costs one extra exchange — use it when one group can hold a large
    fraction of the corpus (the usual reason a cap exists).

    Determinism requires ``order_col`` to be UNIQUE within each group
    (a doc id, not a score): with ties at the quota boundary,
    ``row_number`` breaks them arbitrarily in EITHER mode, and with
    ``precap`` the surviving tie-subset additionally depends on the
    input partitioning."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    if precap:
        pre = Window.partitionBy(F.spark_partition_id(), group_col).orderBy(F.col(order_col))
        df = (
            df.withColumn("_prn", F.row_number().over(pre))
            .filter(F.col("_prn") <= quota)
            .drop("_prn")
        )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    seq_col: str = "seq_id",
    partition_col: str | None = None,
) -> DataFrame:
    """Greedy contiguous stream packing: documents ordered by id fill
    fixed-budget sequences; a document's sequence is the budget window
    its START offset falls in (the standard pack-then-truncate layout
    for LLM training rows). Deterministic.

    ``partition_col`` is the scale control: without it the cumulative
    sum is an ``orderBy``-only window — Spark moves the ENTIRE input
    through one task (a composite sort key does not help; any global
    window is global). Pass a corpus shard column and packing runs
    per shard (``Window.partitionBy(shard).orderBy(id)``), one
    ordinary keyed shuffle, with the shard key salted into ``seq_id``
    (``"<shard>-<local seq>"``) so ids stay globally unique.
    Only tiny inputs should omit it.

    ``seq_col`` is ALWAYS a string, in both modes — a sharded id has no
    numeric form, and a mode-dependent output type would silently change
    downstream join/order semantics the first time a shard column is
    introduced. In global mode the string is the plain decimal sequence
    number; order numerically via ``seq_id.cast("long")``, not
    lexicographically."""
    if partition_col is not None:
        w = (
            Window.partitionBy(F.col(partition_col))
            .orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = Window.orderBy(F.col(id_col)).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.col(tokens_col)).over(w)
    start = cum - F.col(tokens_col)
    local = F.floor(start / F.lit(max_tokens)).cast("long")
    if partition_col is not None:
        return df.withColumn(
            seq_col, F.concat_ws("-", F.col(partition_col).cast("string"), local.cast("string"))
        )
    return df.withColumn(seq_col, local.cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_frac: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Keep each stratum at its own sampling rate (e.g. downweight a
    crawl source to 10% while keeping curated text at 100%) — the
    corpus-mixing step of a training-data pipeline.

    Map-only: a row survives iff ``hash(id) < fraction(stratum)``, a
    pure function of the row — no shuffle, no count pass, no RNG state,
    stable under re-runs, engine changes and repartitioning, and a
    row's fate never depends on other rows (so incremental batches
    sample consistently with a full-corpus pass). The per-stratum rate
    is hit in expectation, not exactly; exact per-group QUOTAS are
    :func:`quota_per_group`'s job (which pays a shuffle for the
    guarantee). Strata absent from ``fractions`` get ``default_frac``.

    The fraction map rides in as a CASE expression — fine for the
    typical handful of named sources. A million-stratum map belongs in
    a broadcast-joined table instead."""
    frac_expr: Column | None = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(name)
        frac_expr = (
            F.when(cond, F.lit(float(frac)))
            if frac_expr is None
            else frac_expr.when(cond, F.lit(float(frac)))
        )
    frac_expr = (
        F.lit(float(default_frac))
        if frac_expr is None
        else frac_expr.otherwise(F.lit(float(default_frac)))
    )
    return df.filter(_hash01(F.col(id_col), salt) < frac_expr)


def balance_strata(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """Downsample every stratum toward a common size (the smallest
    stratum's count by default, or an explicit ``target``) so no source
    dominates the mix.

    One count aggregate (map-side partial, rows = number of strata)
    broadcast back onto the corpus; the keep decision is then the same
    deterministic per-row hash test as :func:`stratified_sample`, so
    the pass over the data itself is map-only — no window, no hot-key
    task, no per-stratum sort. Strata at or under target keep all rows.
    Sizes land at target in expectation (hash sampling), which is the
    scale-correct trade: an EXACT cut needs a per-stratum global sort
    (:func:`quota_per_group`)."""
    counts = df.groupBy(F.col(strata_col).alias("_stratum")).agg(
        F.count("*").alias("_n")
    )
    if target is None:
        counts = counts.crossJoin(
            F.broadcast(counts.agg(F.min("_n").alias("_target")))
        )
    else:
        counts = counts.withColumn("_target", F.lit(int(target)))
    keep_frac = F.least(F.lit(1.0), F.col("_target") / F.col("_n"))
    out = df.join(
        F.broadcast(counts.select("_stratum", keep_frac.alias("_frac"))),
        on=df[strata_col] == F.col("_stratum"),
        how="inner",
    )
    return out.filter(_hash01(F.col(id_col), salt) < F.col("_frac")).drop(
        "_stratum", "_frac"
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-budget token windows with overlap —
    the standard context-window chunking step before embedding or
    training-row assembly.

    Chunk ``i`` covers whitespace tokens ``[i*step, i*step +
    chunk_tokens)`` with ``step = chunk_tokens - overlap``; the chunk
    count is ``max(1, ceil((n - overlap) / step))`` so every token is
    covered, consecutive chunks share exactly ``overlap`` tokens, and a
    short document yields one (possibly short) chunk. Empty documents
    are dropped.

    Scale shape: map-only — tokenization, ``explode(sequence(...))``
    over the per-document chunk count, and ``slice``/``array_join``
    are all native expressions; no shuffle, no Python. Output rows are
    chunk-sized regardless of how large a single input document is
    (the explode streams; the document's token array is shared, not
    copied per chunk, inside the generated code's row batch).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    w = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    base = df.select(
        F.col(id_col), w.alias("_w"), F.size(w).cast("long").alias("_n")
    ).filter(F.col("_n") > 0)
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(float(step))),
    )
    expanded = base.select(
        id_col, "_w", "_n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * step + 1).cast("long")
    piece = F.slice(F.col("_w"), start.cast("int"), chunk_tokens)
    return expanded.select(
        F.col(id_col),
        F.col("chunk_id"),
        start.alias("start_token"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    hash_fn=None,
    precap_salts: int = 32,
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows (per group):
    priority sampling (Duffield, Lund & Thorup 2007). Each row gets
    priority ``q = w / u`` with ``u`` a uniform [0,1) hash of its id;
    the k largest priorities are the sample, and replacing each kept
    weight with ``est_weight = max(w, tau)`` (``tau`` = the (k+1)-th
    priority) makes any subset-sum estimate unbiased — the principled
    way to downsample a weighted corpus while preserving totals.

    Determinism/oracle contract: ``u = hash/2^64 + 0.5`` is an exact
    double, and rows are RANKED by ``rank_key = u / w`` ascending
    (the same order as q descending) — one IEEE division, no ln/pow —
    so the selection and ``est_weight`` are bit-identical in any
    IEEE-754 engine given the same hash (inject ``sha64`` for a DuckDB
    oracle; ``xxhash64`` is the scale default). Ties on rank_key break
    by id.

    Scale shape: map-only scoring, then the same salted two-stage
    bottom-k as :func:`~filters_spark.operators.sketches.kmv_distinct`
    — stage 1 keeps k+1 per (group, salt) so no window task sees more
    than its salt slice, stage 2 ranks the <= salts*(k+1) survivors.
    Rows with ``w <= 0`` or NULL are excluded (zero weight cannot be
    sampled; negative weight has no sampling semantics).

    Output: group_cols + id_col + ``weight`` + ``rank_key`` +
    ``est_weight`` (== w when the group has <= k rows, i.e. the
    "sample" is exhaustive and tau does not exist).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    group_cols = group_cols or []
    hash_fn = hash_fn or F.xxhash64
    h = hash_fn(F.col(id_col).cast("string"))
    u = (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
    w = F.col(weight_col).cast("double")
    scored = df.filter(w > 0).select(
        *group_cols,
        F.col(id_col),
        w.alias("weight"),
        (u / w).alias("rank_key"),
    )
    if precap_salts:
        salt = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(1)), F.lit(precap_salts))
        w1 = Window.partitionBy(*group_cols, "_salt").orderBy("rank_key", id_col)
        scored = (
            scored.withColumn("_salt", salt)
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k + 1)
            .drop("_rn", "_salt")
        )
    w2 = Window.partitionBy(*group_cols).orderBy("rank_key", id_col)
    ranked = scored.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= k + 1
    )
    wg = Window.partitionBy(*group_cols)
    tau = F.max(F.when(F.col("_rn") == k + 1, F.lit(1.0) / F.col("rank_key"))).over(wg)
    return (
        ranked.withColumn(
            "est_weight",
            F.when(tau.isNull(), F.col("weight")).otherwise(
                F.greatest(F.col("weight"), tau)
            ),
        )
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict,
    out_frac: float,
    hash_fn=None,
    counts: dict | None = None,
) -> DataFrame:
    """Deterministic dataset-mixture resampling: keep a per-source
    hash-sampled subset so the OUTPUT's source composition matches the
    target ``weights`` (the Pile/Dolma-style mixing step that turns a
    crawled corpus into a training mixture). ``out_frac`` sets the
    target output size as a fraction of the input; source ``s`` keeps
    each row with probability ``p_s = min(1, w_s * out_frac * N /
    n_s)`` — capped at 1, so an under-represented source contributes
    everything it has (upsampling/repetition is a separate concern).

    Deterministic and cross-engine: the keep test is ``u01(hash(id)) <
    p_s`` with the same exact-double ``u01`` as priority sampling, and
    ``p_s`` is computed driver-side with one float expression an
    oracle can respell verbatim. Sources absent from ``weights`` are
    dropped.

    Scale shape: one tiny per-source count job (bounded by the number
    of sources; pass ``counts`` to skip it), then a map-only filter —
    nothing shuffles.
    """
    if not 0.0 < out_frac <= 1.0:
        raise ValueError("out_frac must be in (0, 1]")
    if counts is None:
        counts = {
            r[0]: r[1]
            for r in df.groupBy(source_col).agg(F.count(F.lit(1))).collect()
        }
    n_total = sum(counts.values())
    n_out = out_frac * float(n_total)
    p = {
        s: min(1.0, w * n_out / counts[s])
        for s, w in weights.items()
        if counts.get(s)
    }
    if not p:
        raise ValueError("no weighted source present in the data")
    hash_fn = hash_fn or F.xxhash64
    u = (
        hash_fn(F.col(id_col).cast("string")).cast("double")
        / F.lit(float(1 << 64))
    ) + F.lit(0.5)
    p_of = F.create_map(*[x for s, v in p.items() for x in (F.lit(s), F.lit(v))])
    return df.filter(u < p_of[F.col(source_col)])
