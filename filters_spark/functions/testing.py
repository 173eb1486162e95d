"""Filter test harness — the BaseFilterTestCase analog.

Reference parity (filters/test.py:41-202): the reference ships a
unittest mixin whose ``assertFilterPasses`` / ``assertFilterErrors``
make operator-port tests one-liners. This module provides the same
assertions as plain functions (pytest-idiomatic) plus a mixin class for
ported unittest suites.
"""

from __future__ import annotations

from typing import Any

from filters_spark.functions.handlers import FilterRunner


class _AnyValue:
    """Sentinel: assertFilterPasses(..., ANY) skips the value check
    (reference test.py:33-38)."""

    def __eq__(self, other: Any) -> bool:  # pragma: no cover - trivial
        return True

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "<ANY>"


ANY = _AnyValue()


def assert_filter_passes(spec: Any, value: Any, expected: Any = ANY) -> Any:
    """Run ``value`` through the chain; assert no errors and (optionally)
    the cleaned value. Returns the cleaned value for further checks."""
    runner = FilterRunner(spec, value)
    assert runner.is_valid, (
        f"expected {value!r} to pass, got errors {runner.error_messages!r}"
    )
    if not isinstance(expected, _AnyValue):
        assert runner.cleaned_data == expected, (
            f"cleaned {runner.cleaned_data!r} != expected {expected!r}"
        )
    return runner.cleaned_data


def assert_filter_errors(spec: Any, value: Any, expected_codes: dict | list) -> dict:
    """Assert the chain records exactly the expected error codes.

    ``expected_codes``: either ``{dotted_key: [codes]}`` (exact match,
    reference test.py:128-156) or a flat ``[codes]`` for the root key.
    Returns the full errors dict. The replacement value contract
    (invalid -> None, except MaxBytes) is asserted by the caller via
    the returned runner state when needed."""
    runner = FilterRunner(spec, value)
    assert not runner.is_valid, f"expected {value!r} to fail, but it passed"
    got = {key: [m["code"] for m in msgs] for key, msgs in runner.errors.items()}
    want = expected_codes if isinstance(expected_codes, dict) else {"": list(expected_codes)}
    assert got == want, f"error codes {got!r} != expected {want!r}"
    return runner.errors


class FilterTestCaseMixin:
    """unittest mixin with the reference's camelCase assertion names —
    drop-in for suites ported from the reference (test.py:41-202)."""

    filter_type: Any = None  # chain spec or factory, like the reference

    def _spec(self, spec: Any = None) -> Any:
        if spec is not None:
            return spec
        ft = self.filter_type
        return ft() if callable(ft) and not isinstance(ft, (list, tuple, str, dict)) else ft

    def assertFilterPasses(self, value: Any, expected: Any = ANY, spec: Any = None) -> Any:
        return assert_filter_passes(self._spec(spec), value, expected)

    def assertFilterErrors(self, value: Any, expected_codes: dict | list, spec: Any = None) -> dict:
        return assert_filter_errors(self._spec(spec), value, expected_codes)
