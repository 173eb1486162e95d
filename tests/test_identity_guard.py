"""Kernel identity guard: the JVM-side fast path that skips the Python
boundary for rows a chain provably leaves unchanged must be
value-and-error identical to the raw kernel path on every edge class
(guard boundary chars, nulls, empties, non-ASCII, control chars)."""

import pyspark.sql.functions as F
import pytest

from filters_spark.functions.native import compile_identity_guard
from filters_spark.operators.validate import FieldSpec, _kernel_udf, compile_field

# hostile values straddling the guard boundary: printable ASCII (guard
# passes), every excluded char class (guard must route to the kernel),
# and values where the chain errors or rewrites
EDGE_VALUES = [
    None, "", " ", "x", "hello world", "tab\there", "line\nline",
    "crlf\r\nend", "cr\rend", "del\x7fchar", "vt\x0bchar", "bell\x07",
    "nul\x00end", "Amélie", "Amélie", "em space",
    "nbsp ", "zwsp​", "nelx", "ideo　sp",
    "astral\U00018df3", "unassigned͸", "  pad  ", "\t\n", "ok\n",
    "\rstart", "mixed é\r\n\x00", "x" * 600, ("y\r\n" * 50),
    "~tilde", "\x1f", "\x20", "\x7e",
]


@pytest.mark.parametrize("chain", [["required", "unicode"], ["unicode"]])
def test_guard_matches_kernel(spark, chain):
    df = spark.createDataFrame([(v,) for v in EDGE_VALUES], "content string")
    spec = FieldSpec.of({"chain": chain})
    assert compile_identity_guard(chain) is not None
    _, fn = compile_field("content", spec, input_type="string")
    v_g, e_g = fn(F.col("content"))
    res = _kernel_udf("content", spec)(F.col("content"))
    rows = df.select(
        "content",
        v_g.alias("vg"), res["value"].alias("vr"),
        F.to_json(e_g).alias("eg"), F.to_json(res["errors"]).alias("er"),
    ).collect()
    for r in rows:
        assert r["vg"] == r["vr"], (repr(r["content"]), r["vg"], r["vr"])
        assert r["eg"] == r["er"], (repr(r["content"]), r["eg"], r["er"])


def test_guard_declines_unguardable_chains():
    # steps without an identity guard must disable the fast path
    assert compile_identity_guard(["required", "case_fold"]) is None
    assert compile_identity_guard([("regex", {"pattern": "x"})]) is None


def test_guarded_rows_skip_python(spark):
    # all-clean batch: the skip path must still return exact results
    df = spark.createDataFrame([(f"clean {i}\n",) for i in range(100)], "content string")
    spec = FieldSpec.of({"chain": ["required", "unicode"]})
    _, fn = compile_field("content", spec, input_type="string")
    v, e = fn(F.col("content"))
    out = df.select(v.alias("v"), F.size(e).alias("n")).collect()
    assert all(r["v"] == f"clean {i}\n" for i, r in enumerate(out))
    assert all(r["n"] == 0 for r in out)
