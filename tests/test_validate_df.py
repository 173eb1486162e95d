"""DataFrame-level validation: native vs kernel parity, clean/dead
split, error channel shape."""

import pyspark.sql.functions as F
import pytest

from filters_spark.operators.validate import (
    FieldSpec,
    split_errors,
    validate,
    validation_strategies,
)

SPECS = {
    "commit": {"chain": ["required", ("regex_match", {"pattern": "^[0-9a-f]{7,40}$"})]},
    "event_seq": {"chain": ["required", "int", ("min", {"min_value": 0})], "dtype": "long"},
    "path": {"chain": ["required", "strip", ("max_length", {"max_length": 64})]},
    "lang": {"chain": ["strip", "lower", ("choice", {"choices": ["py", "go", "rs"]})]},
    "content": {"chain": ["required", "unicode"]},
}

ROWS = [
    # clean
    ("deadbeefcafe", "7", "  src/main.py ", " PY\t", "a\r\nb\x00c"),
    # bad commit + negative seq
    ("NOT-A-SHA", "-1", "x", "py", "ok"),
    # null path + bad lang
    ("abcdef0123", "0", None, "java", "ok"),
    # empty content
    ("abcdef0123", "1", "y", "go", ""),
]
SCHEMA = "commit string, event_seq string, path string, lang string, content string"


@pytest.fixture(scope="module")
def validated(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return validate(df, SPECS).cache()


def test_strategy_selection():
    strategies = validation_strategies(SPECS)
    # commit/event_seq/path/lang chains are fully native; content needs
    # the unicode kernel (NFC) -> pandas path
    assert strategies["commit"] == "native"
    assert strategies["event_seq"] == "native"
    assert strategies["path"] == "native"
    assert strategies["lang"] == "native"
    assert strategies["content"] == "kernel"


def test_clean_row_normalized(validated):
    row = validated.filter(F.col("commit") == "deadbeefcafe").first()
    assert row.event_seq == 7
    assert row.path == "src/main.py"
    assert row.lang == "py"
    assert row.content == "a\nbc"
    assert row._errors == []


def test_error_channel(validated):
    rows = {r.commit or r._raw_commit: r for r in validated.collect()}
    bad = rows["NOT-A-SHA"]
    codes = {(e.key, e.code) for e in bad._errors}
    assert ("commit", "malformed") in codes
    assert ("event_seq", "too_small") in codes

    nullpath = [r for r in validated.collect() if r._raw_path is None][0]
    codes = {(e.key, e.code) for e in nullpath._errors}
    assert ("path", "empty") in codes
    assert ("lang", "not_valid_choice") in codes


def test_invalid_values_become_null(validated):
    bad = validated.filter(F.col("_raw_commit") == "NOT-A-SHA").first()
    assert bad.commit is None and bad.event_seq is None


def test_split(validated):
    clean, dead = split_errors(validated)
    assert clean.count() == 1
    assert dead.count() == 3
    # dead-letter restores raw payloads
    dead_rows = {r.commit: r for r in dead.collect()}
    assert "NOT-A-SHA" in dead_rows
    assert dead_rows["NOT-A-SHA"].event_seq == "-1"  # raw string, not long
    # clean frame carries validated dtypes, no plumbing columns
    assert dict(clean.dtypes)["event_seq"] == "bigint"
    assert not [c for c in clean.columns if c.startswith("_")]


def test_native_kernel_parity(spark):
    """The same chain must produce identical results via both paths."""
    chain = ["required", "strip", ("max_length", {"max_length": 10}),
             ("choice", {"choices": ["alpha", "beta"]})]
    df = spark.createDataFrame(
        [(" alpha ",), ("beta",), ("  gamma",), (None,), ("",), ("x" * 20,)], "v string"
    )
    a = validate(df, {"v": FieldSpec(chain, mode="native")}).collect()
    b = validate(df, {"v": FieldSpec(chain, mode="kernel")}).collect()
    for ra, rb in zip(a, b):
        assert ra.v == rb.v, (ra, rb)
        assert [(e.key, e.code) for e in ra._errors] == [(e.key, e.code) for e in rb._errors]


def test_native_kernel_parity_unicode_edges(spark):
    """Native (Java regex) and kernel (pyarrow/Python regex) paths must
    agree on the Unicode edges where the THREE regex dialects diverge —
    NBSP/ideographic space/ZWSP (Java+RE2 \\s is ASCII-only), vertical
    tab and NEL (in Python regex's \\s but RE2's Cc), unassigned
    codepoints (missing from RE2's \\p{C}), combining chars and astral
    text — plus a seeded random soup of those alphabets."""
    import random

    edges = [
        "\xa0x\xa0", "　y　", "​q", "\x0bv\x0b", "\x85n\x85",
        "͸u", "x\U00018df3", "écombining", "a\r\nb\rc",
        " mixed\xa0 \t", "\U0001f600emoji ", "", None, "plain",
    ]
    rng = random.Random(11)
    pool = " \t\xa0　​\x0b\x85͸abé\U00018df3\r\n"
    soup = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 12))) for _ in range(60)]
    df = spark.createDataFrame([(s,) for s in edges + soup], "v string")
    chain = ["strip", ("max_length", {"max_length": 8})]
    a = validate(df, {"v": FieldSpec(chain, mode="native")}).collect()
    b = validate(df, {"v": FieldSpec(chain, mode="kernel")}).collect()
    for ra, rb in zip(a, b):
        assert ra.v == rb.v, (repr(ra.v), repr(rb.v))
        assert [(e.key, e.code) for e in ra._errors] == [(e.key, e.code) for e in rb._errors]


def test_kernel_int_parity(spark):
    chain = ["int", ("max", {"max_value": 100})]
    df = spark.createDataFrame(
        [("42",), ("42.000",), ("2.6E4",), ("2.5",), ("abc",), (None,), ("NaN",)], "v string"
    )
    a = validate(df, {"v": FieldSpec(chain, dtype="long", mode="native")}).collect()
    b = validate(df, {"v": FieldSpec(chain, dtype="long", mode="kernel")}).collect()
    for ra, rb in zip(a, b):
        assert ra.v == rb.v, (ra, rb)
        assert [(e.key, e.code) for e in ra._errors] == [(e.key, e.code) for e in rb._errors], (ra, rb)


def test_regex_dialect_guard_routes_shorthand_classes_to_kernel():
    """Java's \\s/\\w/\\b/\\d are ASCII-only while the reference's are
    Unicode (regex module): shorthand-class and inline-flag patterns
    must compile kernel-side only; explicit classes stay native."""
    from filters_spark.functions.native import _dialect_safe

    for p in (r"^[0-9a-f]{7,40}$", "abc", "(?:x)+", "(?=y)x"):
        assert _dialect_safe(p), p
    for p in (r"\w+", r"\d{3}", r"a\sb", r"x\b", "(?i)abc", r"\p{L}+"):
        assert not _dialect_safe(p), p


def test_strip_custom_pattern_dialect_guard():
    """Custom strip patterns carry the same dialect hazards as Regex:
    Python-only syntax would throw PatternSyntaxException at EXECUTOR
    runtime on the native path, and shorthand classes silently diverge.
    Non-default patterns compile native only when _dialect_safe admits
    them; the verified default stays native."""
    from filters_spark.functions.native import _STRIP_DEFAULT, _b_strip

    assert _b_strip() is not None  # verified default -> native
    assert _b_strip(leading=_STRIP_DEFAULT, trailing=None) is not None
    assert _b_strip(leading="[ \t]+", trailing="[xy]+") is not None  # explicit classes
    # Python-only / dialect-divergent spellings -> decline native
    assert _b_strip(leading="[[:space:]]+") is None
    assert _b_strip(trailing=r"\s+") is None
    assert _b_strip(leading=r"\p{Greek}+") is None
    assert _b_strip(trailing="(?i)abc") is None


def test_plan_has_no_python_for_native_fields(spark):
    df = spark.createDataFrame([("x",)], "v string")
    out = validate(df, {"v": ["required", "strip"]}, keep_raw=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
