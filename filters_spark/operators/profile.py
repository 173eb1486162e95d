"""One-pass column profiling: the observability primitive an ingest
pipeline runs before/after every backfill (did a column go null? did
cardinality collapse? did the domain drift?).

``profile`` melts the requested columns into (column, value-as-string)
pairs with one map-side explode and computes per-column row/null/
distinct counts and lexicographic min/max in ONE aggregation — one
shuffle keyed on the column name for any number of profiled columns,
instead of one job per column (the naive loop). Values are compared as
strings so the operator is type-agnostic; numeric-typed min/max belongs
to the lake's manifest stats (lake/table.py), which already tracks it
per file at commit time.

Exact counts make the profile DuckDB-oracled (``profile_events``). On a
100-TB table, exact ``count(DISTINCT)`` is itself a full shuffle of the
distinct values per column — swap in the HLL registers
(operators/sketches.py) when an estimate suffices; the rest of the
profile is map-side combinable either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Output: ``column, n_rows, n_null, n_distinct, min_value,
    max_value`` — one row per profiled column. ``n_distinct`` excludes
    NULLs (SQL ``count(DISTINCT ...)`` semantics); min/max are over the
    string casts (lexicographic), NULL when the column is all-NULL."""
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    spark = df.sparkSession
    # the contract is one row per REQUESTED column even over an empty
    # input (a backfill that wrote nothing is exactly what a profile
    # check must be able to see) — left-join the literal column list
    names = spark.createDataFrame([(c,) for c in cols], "column string")
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in cols
            ]
        )
    )
    stats = (
        df.select(pairs.alias("p"))
        .select("p.*")
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
            F.countDistinct("value").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    zero = F.lit(0).cast("long")
    return names.join(stats, "column", "left").select(
        "column",
        F.coalesce("n_rows", zero).alias("n_rows"),
        F.coalesce("n_null", zero).alias("n_null"),
        F.coalesce("n_distinct", zero).alias("n_distinct"),
        "min_value",
        "max_value",
    )
