"""Text analysis operators for corpus curation — all native Column
expressions (zero Python in the scan).

- token counting: whitespace tokens + a BPE-ish subword estimate
  (chars/4 heuristic blended with punctuation splits).
- quality scoring: length / punctuation / stopword / repetition ratios
  (Gopher-style heuectics over native functions).
- language ID: stopword-overlap n-gram heuristic across a small
  built-in lexicon (real deployments plug a model via mapInPandas; the
  operator contract is the same).
- fingerprinting: content-defined rolling hash over word windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "les", "des", "que"],
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """Deterministic BPE-ish token-count estimate: word pieces split on
    punctuation boundaries plus length/4 for long words (subword
    overflow). Matches real tokenizers within ~15% on code/text."""
    words = tokens(text)
    per_word = F.transform(
        words,
        lambda w: F.greatest(
            F.lit(1),
            (F.length(w) / 4).cast("int")
            + F.size(F.filter(F.split(w, ""), lambda c: c.rlike(r"[^\w]"))),
        ),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def quality_features(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    mean_word_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(F.transform(toks, F.lower), lambda t: t.isin(all_stop))) / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_word_len": mean_word_len,
        "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0)),
        "distinct_token_ratio": distinct_ratio,
        "stopword_ratio": stop_ratio,
    }


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length sweet spot, alpha share, lexical
    diversity; heavily repeated or punctuation-soup docs score low."""
    f = quality_features(text)
    len_score = F.least(f["n_tokens"] / 50.0, F.lit(1.0))
    return F.round(
        F.greatest(
            F.lit(0.0),
            (0.4 * len_score + 0.3 * f["alpha_ratio"] + 0.3 * f["distinct_token_ratio"])
            - F.when(f["punct_ratio"] > 0.3, 0.5).otherwise(0.0),
        ),
        4,
    )


def lang_id(text: Column, langs: list[str] | None = None) -> Column:
    """Stopword-overlap language guess: the language whose stopword list
    hits the most tokens; 'und' (undetermined) when nothing hits."""
    langs = langs or list(STOPWORDS)
    toks = F.transform(tokens(F.lower(text)), lambda t: F.regexp_replace(t, r"[^\p{L}]", ""))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lg]))).alias("hits"),
            F.lit(lg).alias("lang"),
        )
        for lg in langs
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, window: int = 8, hash_fn=None) -> Column:
    """Document fingerprint: min rolling hash over word windows
    (winnowing-style): robust to small edits, native end to end.

    ``hash_fn(gram) -> Column``: 64-bit gram hash, default xxhash64;
    inject ``operators.hashing.sha64`` for a DuckDB-mirrorable
    fingerprint (driver-verified contract queries)."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    toks = tokens(F.lower(text))
    n = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: hash_fn(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return F.array_min(hashes)


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram model: lowercase whitespace tokens -> (token, n).
    One explode + one groupBy count (map-side partials); vocabulary is
    corpus-bounded (Heaps' law), so the result is small relative to the
    corpus and broadcastable for scoring."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document unigram cross-entropy (avg -ln p(token); e^score =
    perplexity) against a ``(token, n)`` model — the standard
    LM-quality filter for pretraining corpora (boilerplate and natural
    text score low, token soup scores high; threshold or quantile-cut
    downstream).

    Add-``alpha`` smoothing over the model vocabulary handles OOV
    tokens: p(t) = (n_t + alpha) / (total + alpha * (V + 1)), the +1
    the single unseen-token class.

    Plan shape: explode tokens -> hash join against the model
    (broadcast when small — AQE decides; at a 10^8-token vocabulary it
    degrades gracefully to a shuffle join keyed on the token) -> one
    groupBy(id). The totals ride in via a 1-row crossJoin (computed
    once, broadcast). Returns (id, n_tokens, avg_neg_logp)."""
    totals = model.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_vocab")
    )
    toks = df.select(
        F.col(id_col).alias(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    scored = (
        toks.join(model.withColumnRenamed("n", "_n"), "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_neg_logp",
            -F.log(
                (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(alpha))
                / (F.col("_total") + F.lit(alpha) * (F.col("_vocab") + 1))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("_neg_logp"), 4).alias("avg_neg_logp"),
    )


def _word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams (space-joined, lowercased)."""
    toks = tokens(F.lower(text))
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_stats(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's
    characters covered by its single most frequent word ``n``-gram
    (templated/boilerplate text scores high; natural text low).

    Distributed shape — works when single documents are huge: explode
    the grams, ONE groupBy((id, gram)) count with map-side partials,
    then a row_number window on the id to pick the winner (ties broken
    lexicographically for cross-engine determinism). The groupBy and
    the window share the hash-partitioning on the id, so AQE plans one
    exchange. Documents with fewer than ``n`` tokens are dropped (no
    gram exists).
    """
    grams = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_nc"),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy(id_col, "_nc", "gram").agg(F.count("*").alias("n_occ"))
    w = Window.partitionBy(id_col).orderBy(F.desc("n_occ"), F.asc("gram"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("gram").alias("top_gram"),
            F.col("n_occ").alias("top_gram_count"),
            F.round(
                F.col("n_occ") * F.length("gram") / F.col("_nc"), 4
            ).alias("top_gram_char_frac"),
        )
    )


def _segments(text: Column, sep: str) -> Column:
    """Shared segmentation for the duplicate-segment passes: split on
    ``sep``, trim, drop empties. dup_segment_stats (within-doc) and
    corpus_segment_dedupe (corpus-wide) MUST segment identically — and
    each is independently byte-matched to a DuckDB oracle spelling the
    same split/trim/filter."""
    return F.filter(
        F.transform(F.split(text, sep), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def dup_segment_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", sep: str = r"\."
) -> DataFrame:
    """Duplicate-segment fraction (Gopher's duplicate-line filter,
    segment delimiter configurable — '.' for sentences on single-line
    corpora, '\\n' for lines): 1 - distinct/total over trimmed
    non-empty segments. Pure native array expressions, map-only, no
    shuffle."""
    segs = _segments(F.col(text_col), sep)
    n = F.size(segs)
    return df.select(
        F.col(id_col),
        n.alias("n_segments"),
        F.size(F.array_distinct(segs)).alias("distinct_segments"),
        F.when(n > 0, F.round(1 - F.size(F.array_distinct(segs)) / n, 4))
        .otherwise(F.lit(0.0))
        .alias("dup_segment_frac"),
    )


def corpus_segment_dedupe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\.",
    join_sep: str = ". ",
    min_docs: int = 2,
    broadcast_hot: bool = False,
) -> DataFrame:
    """Cross-document boilerplate removal (the CCNet/RefinedWeb
    line-dedupe pass): a segment (line or sentence, delimiter ``sep``)
    appearing in >= ``min_docs`` DISTINCT documents is boilerplate
    (navigation, headers, license blurbs, "subscribe" calls) and is
    dropped from EVERY document; each document's text is rebuilt from
    its surviving segments in original order. Complements
    :func:`dup_segment_stats`, which measures repetition WITHIN one
    document — this is the corpus-wide pass.

    Returns ``(id_col, n_segments, n_kept, cleaned_text)`` — one row
    per input document, including documents whose every segment was
    boilerplate (``n_kept=0``, ``cleaned_text=''``).

    Scale shape: ONE scan segments each document (posexplode_outer, so
    a document with no segments still contributes its row); the
    boilerplate set is a groupBy(seg) count_distinct(id) with map-side
    partials, joined back as a hot flag; the
    rebuild is one groupBy(id) with an order-preserving array_sort
    over (pos, seg) structs, counting and concatenating only the
    non-hot segments — so every document survives to the output even
    when all its segments were boilerplate. Three keyed shuffles,
    nothing quadratic, no Python. ``broadcast_hot=True`` hints the
    flag join to broadcast — correct when the hot set is KNOWN small
    (high ``min_docs``, curated corpora); at min_docs=2 over a web
    corpus the duplicated-segment set can be data-scale, so the
    default lets AQE choose from measured sizes. The hint is worth a
    full data-scale shuffle when it applies: AQE's runtime conversion
    happens AFTER the sort-merge-planned probe-side exchange of the
    exploded corpus has already run, while the hint never plans it
    (plan-pinned in tests/test_plans.py). At corpus scale, key
    the frequency agg and flag join on ``xxhash64(seg)`` instead of
    the raw string to keep those exchanges narrow; the semantics are
    unchanged up to hash collisions.
    """
    segs = _segments(F.col(text_col), sep)
    base = df.select(
        F.col(id_col),
        F.coalesce(F.size(segs), F.lit(0)).cast("bigint").alias("n_segments"),
        F.posexplode_outer(segs).alias("pos", "seg"),
    )
    hot = (
        base.filter(F.col("seg").isNotNull())
        .groupBy("seg")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("seg", F.lit(1).alias("_hot"))
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    keep = F.col("_hot").isNull() & F.col("seg").isNotNull()
    return (
        base.join(hot, "seg", "left")
        .groupBy(id_col, "n_segments")
        .agg(
            F.count(F.when(keep, F.lit(1))).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
                join_sep,
            ).alias("cleaned_text"),
        )
        .select(id_col, "n_segments", "n_kept", "cleaned_text")
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per document, the fraction of its
    distinct word ``n``-grams that appear anywhere in ``benchmark``
    (the standard n-gram-overlap test run before training to drop
    eval-set leaks; n=8..13 typical).

    Scale shape: the benchmark gram set is small (eval suites are MBs,
    not TBs) — built distinct and BROADCAST; document grams explode to
    one row per distinct (id, gram), left-join the broadcast set
    map-side, then ONE groupBy(id) computes total and hit counts
    together. No shuffle touches the corpus except the final per-id
    aggregation."""
    t = F.col(text_col)
    bench_grams = (
        benchmark.select(F.explode(_word_ngrams(t, n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_word_ngrams(t, n))).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*"), 4
            ).alias("contaminated_frac"),
        )
    )


def text_profile(df: DataFrame, text_col: str = "text", fingerprint_hash_fn=None) -> DataFrame:
    """One call adding all curation columns. ``fingerprint_hash_fn``
    is forwarded to :func:`fingerprint`."""
    t = F.col(text_col)
    feats = quality_features(t)
    return df.select(
        "*",
        feats["n_tokens"].alias("n_tokens"),
        bpe_token_estimate(t).alias("bpe_tokens_est"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t, hash_fn=fingerprint_hash_fn).alias("fingerprint"),
    )


# -- PII redaction -----------------------------------------------------------
#
# Patterns are restricted to the regex subset whose semantics agree
# between Java regex (Spark executors) and RE2 (DuckDB oracle, and the
# pyarrow fast paths elsewhere in this package): explicit character
# classes, bounded repetition, \b word boundaries. No shorthand classes
# (\d, \w) — Java's are ASCII-only by default but the explicit classes
# make the contract visible; no backreferences or lookaround (RE2 has
# neither).

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4 literals, international
    phone numbers) from a text column and report per-category match
    counts — the pre-training privacy pass every large corpus gets
    before tokenization.

    Scale shape: map-only native ``regexp_replace`` / ``regexp_count``
    over the scan — zero Python, zero shuffle, whole-stage codegen
    end-to-end. Counts are taken on the ORIGINAL text (order-
    independent); replacements run email → ip → phone, so a category's
    replacement token is never re-matched by a later pattern (tokens
    contain no digits or ``@``).
    """
    t = F.col(text_col)
    red = t
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    # n_pii sums the already-computed per-category columns in a second
    # projection — the full-text regex scans (the dominant per-row
    # cost) run exactly once per pattern
    out = df.select(F.col(id_col), red.alias("redacted"), *counts)
    total = None
    for name, _pat, _repl in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Repeated n-gram fraction per document — the Gopher/C4
    "repetitious text" quality gate (templated spam and boilerplate
    repeat the same n-grams; natural prose doesn't). Output per doc:
    ``total_ngrams``, ``distinct_ngrams`` (exact integers) and
    ``dup_fraction`` = (total - distinct) / total — one IEEE division
    of exact ints, so the score is bit-identical cross-engine.

    Entirely native higher-order functions, map-only, zero shuffles;
    grams materialize through a projection ONCE (HOFs are interpreted —
    no codegen CSE, so expression reuse is on us, same discipline as
    minhash_signature). Gram spelling matches dedupe.shingles minus
    the distinct (repetition needs multiplicity)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    total = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), total - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    staged = df.select(*id_cols, grams.alias("_g"))
    return staged.select(
        *id_cols,
        F.size("_g").alias("total_ngrams"),
        F.size(F.array_distinct("_g")).alias("distinct_ngrams"),
        (
            (F.size("_g") - F.size(F.array_distinct("_g"))).cast("double")
            / F.size("_g").cast("double")
        ).alias("dup_fraction"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Benchmark decontamination for training corpora: flag documents
    sharing >= ``min_hits`` distinct word n-grams with an evaluation
    benchmark — the standard n-gram-overlap test (GPT-3 appendix C /
    PaLM style) run as a JOIN, not a per-doc scan of the benchmark.

    Scale shape: the benchmark's distinct shingle set is SMALL by
    definition (eval sets are thousands of documents, not billions) —
    it BROADCASTS; the corpus side explodes its distinct shingles
    map-side and semi-joins the broadcast, so only HIT rows (rare)
    reach the per-doc count shuffle, and the final left join back to
    the doc ids is the only corpus-keyed exchange. Long n (default 8
    words) keeps incidental collisions ~zero, per the published
    practice.

    Output: ``id_cols`` + ``n_hits`` (distinct overlapping shingles)
    + ``contaminated`` (n_hits >= min_hits)."""
    from filters_spark.operators.dedupe import shingles

    bench_sh = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("_s")
    ).distinct()
    doc_sh = docs.select(
        *id_cols, F.explode(shingles(F.col(text_col), n)).alias("_s")
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "_s")
        .groupBy(*id_cols)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(*id_cols)
        .join(hits, list(id_cols), "left")
        .select(
            *id_cols,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
