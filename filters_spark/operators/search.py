"""Lexical full-text search over a document corpus: BM25 scoring as
pure native Column algebra.

The query is a handful of terms, so per-term term frequencies are
computed with ``F.size(F.filter(tokens, ...))`` — map-only, no explode,
no shuffle touching the corpus. Corpus statistics (N, avg doc length,
per-term document frequencies) reduce to ONE aggregate row that rides
back in via a broadcast crossJoin. Total plan: one scan + one all-to-one
aggregate + one map pass + a global top-k (TakeOrderedAndProject) —
the same shape at 500 documents and at 10^9.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from filters_spark.operators.textstats import tokens


def _terms(query: str) -> list[str]:
    """Distinct lowercase query terms, first-seen order."""
    out: list[str] = []
    for t in re.split(r"\s+", query.lower()):
        if t and t not in out:
            out.append(t)
    return out


def bm25_score(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query`` with BM25 (Robertson/
    Sparck Jones idf: ln(1 + (N - df + .5)/(df + .5))). Returns
    (id, bm25) with the score rounded to 4 decimals — term
    contributions are summed in fixed query-term order so the float
    result is reproducible across engines."""
    terms = _terms(query)
    if not terms:
        # an empty/whitespace query would otherwise surface as an
        # unresolved-column AnalysisException on _tf_0 deep inside
        # Spark; every document's score over zero terms is 0.0
        return df.select(F.col(id_col), F.lit(0.0).alias("bm25"))
    toks = tokens(F.lower(F.col(text_col)))

    def _tf(term: str) -> Column:
        # NB: the predicate lambda must take exactly ONE parameter —
        # pyspark inspects arity, and a two-param lambda (even with a
        # default) is called as (element, index).
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)]
    per_doc = df.select(F.col(id_col), F.size(toks).alias("_dl"), *tf_cols)
    stats = per_doc.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))

    def contrib(i: int) -> Column:
        tf = F.col(f"_tf_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        return idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
        )

    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)
    return scored.select(F.col(id_col), F.round(score, 4).alias("bm25"))


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25; ties broken by id so
    the cut is deterministic. orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), never a global sort."""
    s = bm25_score(df, query, text_col, id_col, k1, b)
    return s.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def tfidf_topk_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf
    (idf = ln(N / df)) — keyword extraction / doc-signature step of a
    curation pipeline. Returns (id, term, tf, tfidf) rows.

    Shape at scale: one explode + groupBy(doc, term) count (the
    token-scale shuffle an inverted-index build inherently pays, with
    map-side partial aggregation), one vocabulary-scale groupBy for
    document frequencies, a keyed join back on term (vocabulary-sized —
    left to AQE, which broadcasts it when it fits), and a per-doc
    top-k window. The corpus row count rides in as a one-row broadcast.

    Ranking is on the ROUNDED score (4 decimals) with the term as
    tiebreak, so the top-k cut is deterministic and engine-portable;
    ``min_df`` drops hapax noise before the join."""
    toks = tokens(F.lower(F.col(text_col)))
    doc_terms = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    doc_freq = (
        doc_terms.groupBy("term")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
    )
    n_docs = df.agg(F.count("*").alias("_n"))
    scored = (
        doc_terms.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double") * F.log(F.col("_n") / F.col("_df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def inverted_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df_frac: float = 1.0,
    max_postings: int = 1000,
) -> DataFrame:
    """Build an inverted index: per term, its document frequency and a
    CAPPED, sorted posting list (serialized as a comma-joined string —
    engine-portable, and the cap makes the row bounded no matter how
    common the term is). Returns (term, df_count, postings).

    Scale shape: explode of DISTINCT per-doc terms (presence postings,
    so a term repeated 10^4 times in one doc costs one row), then ONE
    exchange on term shared by the rank window and the groupBy
    (identical partitioning — Catalyst reuses it). The posting cap is
    applied BEFORE aggregation via the rank window + conditional
    collect_list, so the aggregation buffer for a stopword-grade term
    holds ``max_postings`` ids, never its full document set —
    df_count still counts every document. ``min_df``/``max_df_frac``
    prune hapax noise and stopwords (the standard index vocabulary
    trim); the corpus size for the frac test rides in as a one-row
    broadcast."""
    toks = tokens(F.lower(F.col(text_col)))
    terms = df.select(
        F.col(id_col), F.explode(F.array_distinct(toks)).alias("term")
    )
    w = Window.partitionBy("term").orderBy(F.col(id_col))
    ranked = terms.withColumn("_rn", F.row_number().over(w))
    agg = ranked.groupBy("term").agg(
        F.count("*").alias("df_count"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rn") <= max_postings, F.col(id_col))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    n_docs = df.agg(F.count("*").alias("_n"))
    return (
        agg.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df_count") >= min_df)
            & (F.col("df_count") <= F.lit(float(max_df_frac)) * F.col("_n"))
        )
        .drop("_n")
    )
