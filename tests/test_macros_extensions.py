"""Macro + extension-registry parity (reference filters/macros.py,
filters/extensions.py): macros are plain functions returning specs;
extensions register kernel factories by name."""

import pandas as pd
import pytest

from filters_spark.functions.kernels import Kernel, _none_series
from filters_spark.functions.spec import (
    FilterSpecError,
    compile_chain,
    register_kernel,
    run_one,
)


def iso_date_macro(max_year: int = 2100):
    """A 'filter macro' (reference macros.py:39-85): a function
    returning a chain spec — composition is ordinary code."""
    return [
        "required",
        "strip",
        ("regex_match", {"pattern": r"^\d{4}-\d{2}-\d{2}$"}),
        "date",
        # partial-application flavor: parameters preset at macro level
    ]


class TestMacros:
    def test_macro_chains_compose(self):
        r = run_one(iso_date_macro(), "  2020-05-11 ")
        import datetime

        assert r.is_valid and r.cleaned_data == datetime.date(2020, 5, 11)

    def test_macro_partial_params(self):
        # macro with preset params == filter_macro(f.Datetime, timezone=12)
        def dt_at_offset(tz):
            return [("datetime", {"timezone": tz})]

        r = run_one(dt_at_offset(12), "2015-10-13 15:22:18")
        assert r.cleaned_data.hour == 3  # 15:22 at UTC+12 -> 03:22 UTC


class RegexMatchScalar(Kernel):
    """Extension kernel: validation-only regex (keeps the string)."""

    name = "regex_match"
    templates = {"malformed": "Value does not match regular expression {pattern}."}

    def __init__(self, pattern: str):
        import regex as rx

        self.pattern = pattern
        self.rx = rx.compile(pattern)

    def _apply(self, sub):
        return self._map(
            sub,
            lambda v: (v, None)
            if isinstance(v, str) and self.rx.search(v)
            else (None, self.err("malformed", pattern=self.pattern)),
        )


class TestExtensions:
    def test_register_and_use(self):
        register_kernel("regex_match", RegexMatchScalar)
        r = run_one([("regex_match", {"pattern": "^[a-f0-9]+$"})], "deadbeef")
        assert r.is_valid and r.cleaned_data == "deadbeef"
        r = run_one([("regex_match", {"pattern": "^[a-f0-9]+$"})], "XYZ")
        assert r.errors == {"": ["malformed"]}

    def test_unknown_name_lists_registry(self):
        with pytest.raises(FilterSpecError) as e:
            compile_chain(["no_such_filter"])
        assert "registered" in str(e.value)
