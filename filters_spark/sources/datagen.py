"""Deterministic, distributed synthetic data for the CDC engine.

Input shape per BASELINE.json ``input_hint``: an Iceberg-style table of
source-code repositories ``(repo, path, commit, lang, content)`` keyed on
``(repo, path)``, plus a binlog/WAL-style change-event stream over it.

Everything is generated **executor-side** from ``spark.range`` with
hash-derived pseudo-randomness (xxhash64 of the row id + a seed literal):
no driver loops, no RNG state, bit-identical across runs and across
parallelism levels — which is what makes the two-cluster-size replay
equality check meaningful.

The event stream is totally ordered by ``(commit, event_seq)``:
``commit`` is a zero-padded monotonic hex string (a WAL offset stand-in;
real binlogs provide exactly this monotonicity) and ``event_seq``
numbers events within a commit.

Dirty events (``dirty_frac``) get planted defects — null path, bad lang,
whitespace/control-char padding that normalization must fix, oversized
paths — exercising every dead-letter route and making the final-state
sha256 equality semantically non-trivial.

Skew: ``hot_frac`` of events hit repo 0 (the "monorepo"), producing the
hot-key distribution the salted merge path exists for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "go", "rs", "js", "java", "c", "cpp", "rb"]

_WORDS = [
    "import", "def", "class", "return", "match", "merge", "commit", "table",
    "stream", "event", "batch", "shuffle", "partition", "filter", "chain",
    "kernel", "schema", "upsert", "offset", "checkpoint",
]


def _h(seed: int, *cols) -> "F.Column":
    """Deterministic 64-bit hash of (seed, *cols)."""
    return F.xxhash64(F.lit(seed), *cols)


def _pick(arr: list[str], h) -> "F.Column":
    return F.element_at(F.array(*[F.lit(w) for w in arr]), (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def _content_expr(key_h, rev: "F.Column") -> "F.Column":
    """Deterministic pseudo-code content derived from a key hash and a
    revision number; length varies 1..~40 lines via the hash."""
    n_lines = (F.pmod(key_h, F.lit(40)) + 1).cast("int")
    line = F.concat_ws(
        " ",
        _pick(_WORDS, key_h),
        _pick(_WORDS, key_h + F.lit(7)),
        _pick(_WORDS, key_h + F.lit(13)),
        F.conv(F.pmod(key_h, F.lit(2**31)).cast("string"), 10, 16),
        rev.cast("string"),
    )
    # line repeated n times joined by \n, built as one string repeat
    # (no array allocation per row; byte-identical to
    # array_join(array_repeat(line, n), "\n") for n >= 1)
    return F.concat(line, F.repeat(F.concat(F.lit("\n"), line), n_lines - 1))


def gen_repos(
    spark: SparkSession,
    n_rows: int,
    n_repos: int = 100,
    n_paths: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Seed snapshot of the repo lake table: one row per (repo, path),
    unique by construction (``n_rows`` must not exceed
    ``n_repos * n_paths``).

    Keys come from the SAME (repo_id, path_id) → key-hash → path/lang
    formula :func:`gen_events` uses, so a seeded table and an event
    stream generated with matching ``(n_repos, n_paths, seed)`` share a
    key space — events genuinely update and delete seeded rows, which
    is what makes a seed-then-replay test exercise the merge paths
    against pre-existing state (ids-only paths would make every event
    an insert of a fresh key)."""
    if n_rows > n_repos * n_paths:
        raise ValueError(
            f"n_rows={n_rows} exceeds the {n_repos}x{n_paths} key space"
        )
    df = spark.range(n_rows)
    repo_id = F.pmod(F.col("id"), F.lit(n_repos))
    path_id = (F.col("id") / n_repos).cast("long")
    key_h = _h(seed + 1, repo_id, path_id)
    lang = _pick(LANGS, key_h + F.lit(3))
    return df.select(
        F.concat(F.lit("repo-"), F.lpad(repo_id.cast("string"), 5, "0")).alias("repo"),
        F.concat(
            F.lit("src/"), _pick(_WORDS, key_h), F.lit("/"),
            path_id.cast("string"), F.lit("."), lang,
        ).alias("path"),
        F.format_string("%012x", F.lit(0)).alias("commit"),
        lang.alias("lang"),
        _content_expr(key_h, F.lit(0)).alias("content"),
    )


def gen_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    n_paths: int = 1000,
    events_per_commit: int = 100,
    hot_frac: float = 0.0,
    dirty_frac: float = 0.0,
    delete_frac: float = 0.1,
    seed: int = 42,
    schema_version: int = 1,
    start_commit: int = 1,
    unicode_hazards: bool = False,
) -> DataFrame:
    """Change-event stream: (commit, event_seq, op, repo, path, lang,
    content, schema_version).

    - op: I/U/D with ``delete_frac`` deletes (I vs U is informational;
      the merge is upsert-semantics either way).
    - ``hot_frac`` of events target repo-00000 (skew).
    - ``dirty_frac`` of events carry planted validation defects.
    """
    df = spark.range(n_events)
    u = lambda s: F.pmod(_h(s, "id"), F.lit(1_000_000)) / 1_000_000.0  # noqa: E731

    commit_idx = (F.col("id") / events_per_commit).cast("long") + start_commit
    event_seq = F.pmod(F.col("id"), F.lit(events_per_commit))

    hot = u(seed + 10) < hot_frac
    repo_id = F.when(hot, F.lit(0)).otherwise(F.pmod(_h(seed, "id"), F.lit(n_repos)))
    path_id = F.pmod(_h(seed + 2, "id"), F.lit(n_paths))
    key_h = _h(seed + 1, repo_id, path_id)

    op = F.when(u(seed + 20) < delete_frac, F.lit("D")).otherwise(
        F.when(u(seed + 21) < 0.5, F.lit("I")).otherwise(F.lit("U"))
    )

    lang = _pick(LANGS, key_h + F.lit(3))
    path = F.concat(
        F.lit("src/"), _pick(_WORDS, key_h), F.lit("/"),
        path_id.cast("string"), F.lit("."), lang,
    )
    # the (expensive) content expression is projected ONCE as a named
    # intermediate column; the defect/messy CASE wrappers below
    # reference the attribute. Inlined, each wrapper re-evaluates the
    # whole string-build tree per reference (conditional branches sit
    # outside codegen subexpression elimination) — measured 16s vs 1.4s
    # for the messy wrap alone at 6M rows. The alias is non-cheap and
    # multiply-referenced, so CollapseProject keeps the projections
    # apart. Output is byte-identical (same expressions, same order).
    df = df.select(
        F.col("id"), _content_expr(key_h + commit_idx, commit_idx).alias("_c0")
    )
    content = F.col("_c0")

    # planted defects (each dirty event gets exactly one defect class)
    dirty = u(seed + 30) < dirty_frac
    defect = F.pmod(_h(seed + 31, "id"), F.lit(4))
    path = F.when(dirty & (defect == 0), F.lit(None).cast("string")).otherwise(path)
    lang = F.when(dirty & (defect == 1), F.lit("klingon")).otherwise(lang)
    content = F.when(dirty & (defect == 2), F.lit(None).cast("string")).otherwise(content)
    path = F.when(dirty & (defect == 3), F.concat(F.lit("x"), F.repeat(F.lit("y"), 600))).otherwise(path)

    # benign mess that normalization must clean (exercises Unicode/Strip;
    # hazard classes from FIXTURES.md / reference string_test.py:1474-1552):
    # CRLF line endings, a control char, an NFD sequence ('Ame' +
    # combining acute U+0301) and an em-space — all must normalize
    # identically to the oracle for per-row sha256 equality to hold.
    messy = F.pmod(_h(seed + 32, "id"), F.lit(5)) == 0
    content = F.when(
        messy & content.isNotNull(),
        F.concat(
            F.lit("  \t// Ame\u0301lie\u2003was here\r\n"),
            # literal replace, not regexp_replace: no regex machinery
            # per row for a fixed single-char pattern
            F.replace(content, F.lit("\n"), F.lit("\r\n")),
            F.lit("\u0000  "),
        ),
    ).otherwise(content)

    # opt-in second hazard class: the codepoints where the THREE regex
    # dialects (Java, RE2, Python regex) historically diverge -- NBSP
    # (U+00A0), ideographic space (U+3000), ZWSP (U+200B), NEL
    # (U+0085), VT (U+000B), unassigned (Cn) BMP (U+0378) and astral
    # (U+18DF3). Off by default so bench/scaling inputs stay
    # bit-identical across rounds; engine E2E sha-equality under these
    # is pinned in tests/test_cdc_engine.py.
    if unicode_hazards:
        hz = F.pmod(_h(seed + 33, "id"), F.lit(4)) == 0
        content = F.when(
            hz & content.isNotNull(),
            F.concat(
                F.lit(
                    "\u00a0\u3000lead\u200bmid\u000bnel\u0085"
                    "\u0378bmp\U00018df3astral "
                ),
                content,
            ),
        ).otherwise(content)
        path = F.when(
            hz & path.isNotNull(),
            F.concat(F.lit("\u00a0"), path, F.lit("\u3000")),
        ).otherwise(path)

    return df.select(
        F.format_string("%012x", commit_idx).alias("commit"),
        event_seq.alias("event_seq"),
        op.alias("op"),
        F.concat(F.lit("repo-"), F.lpad(repo_id.cast("string"), 5, "0")).alias("repo"),
        path.alias("path"),
        lang.alias("lang"),
        content.alias("content"),
        F.lit(schema_version).alias("schema_version"),
    )
