"""Partial-image (patch) merge semantics — lake/table.py:patch_merge.

Pins the binlog_row_image=minimal contract: NULL patch cells inherit,
full images are authoritative for every column (their NULLs reset),
deletes fence inheritance, and the whole resolve is ONE exchange on the
key. Cross-engine value equality is pinned by the oracled
``cdc_patch_merge`` query (tests/test_oracle_parity.py).
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from filters_spark.lake.table import patch_merge
from filters_spark.plans.audit import exchange_count, has_python_eval

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("o", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.DoubleType()),
    ]
)


def _merge(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["k"]: (r["a"], r["b"], r["o"])
        for r in patch_merge(
            df, key_cols=["k"], payload_cols=["a", "b"], order_cols=["o"]
        ).collect()
    }


class TestPatchMergeSemantics:
    def test_patch_inherits_only_missing_cells(self, spark):
        out = _merge(
            spark,
            [
                (1, 1, "I", "x", None),
                (1, 2, "P", None, 5.0),  # a inherited from the insert
                (1, 3, "P", "y", None),  # b inherited from the patch
            ],
        )
        assert out == {1: ("y", 5.0, 3)}

    def test_delete_fences_inheritance(self, spark):
        out = _merge(
            spark,
            [
                (2, 1, "I", "p", 1.0),
                (2, 2, "D", None, None),
                (2, 3, "P", None, 7.0),  # post-delete patch starts empty
            ],
        )
        assert out == {2: (None, 7.0, 3)}

    def test_full_image_nulls_reset(self, spark):
        out = _merge(
            spark,
            [
                (5, 1, "P", "a", 2.0),
                (5, 2, "I", None, 3.0),  # authoritative NULL for a
                (5, 3, "P", None, None),
            ],
        )
        assert out == {5: (None, 3.0, 3)}

    def test_trailing_delete_removes_key(self, spark):
        out = _merge(spark, [(4, 1, "I", "z", 9.0), (4, 2, "D", None, None)])
        assert out == {}

    def test_patch_without_prior_insert_is_a_sparse_row(self, spark):
        out = _merge(spark, [(3, 1, "P", "q", None)])
        assert out == {3: ("q", None, 1)}

    def test_payload_overlap_rejected(self, spark):
        df = spark.createDataFrame([], SCHEMA)
        with pytest.raises(ValueError):
            patch_merge(df, ["k"], ["o"], ["o"])

    def test_single_exchange_no_python(self, spark):
        df = spark.createDataFrame(
            [(i % 7, i, "P" if i % 3 else "I", str(i), float(i)) for i in range(200)],
            SCHEMA,
        )
        out = patch_merge(df, ["k"], ["a", "b"], ["o"])
        out.collect()
        assert exchange_count(out) == 1
        assert not has_python_eval(out)
