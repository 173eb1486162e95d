"""Numeric kernel parity tests, ported from reference test/number_test.py.

Contract under test (reference filters/test.py:72-146): the triple
(cleaned value, error-code map keyed by dotted path, no-crash).
"""

from decimal import Decimal, ROUND_HALF_DOWN

import pytest

from filters_spark.functions.spec import run_one


def passes(spec, value, expected):
    r = run_one(spec, value)
    assert r.is_valid, r.errors
    assert r.cleaned_data == expected, (r.cleaned_data, expected)
    assert type(r.cleaned_data) is type(expected) or expected is None
    return r


def errors(spec, value, expected_codes, expected_value=None):
    r = run_one(spec, value)
    assert not r.is_valid, f"expected errors, got {r.cleaned_data!r}"
    assert r.errors == {"": expected_codes}, r.errors
    assert r.cleaned_data == expected_value
    return r


class TestDecimal:
    def test_pass_none(self):
        passes(["decimal"], None, None)

    def test_pass_valid_decimal(self):
        passes(["decimal"], "3.1415926", Decimal("3.1415926"))

    def test_max_precision_quantized(self):
        # int max_precision n => quantize to 10^-n (number.py:59-63)
        passes([("decimal", {"max_precision": 3})], "3.1415926", Decimal("3.142"))

    def test_max_precision_decimal(self):
        passes([("decimal", {"max_precision": Decimal("0.01")})], "3.1415926", Decimal("3.14"))

    def test_pass_zero(self):
        passes(["decimal"], "0", Decimal("0"))

    def test_pass_scientific_notation(self):
        passes(["decimal"], "2.8E6", Decimal("2.8E6"))

    def test_pass_boolean(self):
        # bool is a subclass of int (number_test.py:68-74)
        passes(["decimal"], True, Decimal("1"))

    def test_pass_float(self):
        r = run_one(["decimal"], 3.5)
        assert r.is_valid and r.cleaned_data == Decimal("3.5")

    def test_fail_invalid_value(self):
        errors(["decimal"], "this is not a decimal", ["not_numeric"])

    def test_fail_non_finite(self):
        errors(["decimal"], "NaN", ["not_finite"])
        errors(["decimal"], "+Inf", ["not_finite"])
        errors(["decimal"], "-Inf", ["not_finite"])
        errors(["decimal"], float("nan"), ["not_finite"])

    def test_pass_tuple(self):
        passes(["decimal"], (0, (4, 2), -1), Decimal("4.2"))

    def test_fail_tuple_invalid(self):
        errors(["decimal"], ("1", "2", "3"), ["not_numeric"])

    def test_fail_tuple_disallowed(self):
        errors([("decimal", {"allow_tuples": False})], (0, (4, 2), -1), ["wrong_type"])

    def test_fail_bytes(self):
        errors(["decimal"], b"-12", ["wrong_type"])


class TestInt:
    def test_pass_none(self):
        passes(["int"], None, None)

    def test_pass_valid_int(self):
        passes(["int"], "42", 42)

    def test_pass_zero(self):
        passes(["int"], "0", 0)

    def test_pass_negative(self):
        passes(["int"], "-314", -314)

    def test_pass_boolean(self):
        passes(["int"], True, 1)

    def test_fail_invalid_value(self):
        errors(["int"], "not an int, even in base 2", ["not_numeric"])

    def test_fail_bytes(self):
        errors(["int"], b"-12", ["wrong_type"])

    def test_fail_float_value(self):
        errors(["int"], "42.01", ["not_int"])

    def test_pass_int_point_zero(self):
        passes(["int"], "42.0000000000000", 42)

    def test_pass_scientific_notation(self):
        passes(["int"], "2.6E4", 26000)

    def test_fail_non_finite(self):
        errors(["int"], "NaN", ["not_finite"])

    def test_unbounded_precision(self):
        # reference ints are arbitrary precision (number.py:113-118);
        # the engine documents LongType overflow divergence at the
        # DataFrame boundary, but the kernel itself is exact.
        big = "123456789012345678901234567890"
        passes(["int"], big, int(big))


class TestMaxMin:
    def test_max_pass_lesser(self):
        passes([("max", {"max_value": 5})], 4, 4)

    def test_max_pass_equal(self):
        passes([("max", {"max_value": 5})], 5, 5)

    def test_max_fail_equal_exclusive(self):
        errors([("max", {"max_value": 5, "exclusive": True})], 5, ["too_big"])

    def test_max_fail_greater(self):
        # replacement stays None, not max_value (number.py:197-200)
        errors([("max", {"max_value": 5})], 6, ["too_big"])

    def test_min_pass_greater(self):
        passes([("min", {"min_value": 5})], 6, 6)

    def test_min_pass_equal(self):
        passes([("min", {"min_value": 5})], 5, 5)

    def test_min_fail_equal_exclusive(self):
        errors([("min", {"min_value": 5, "exclusive": True})], 5, ["too_small"])

    def test_min_fail_lesser(self):
        errors([("min", {"min_value": 5})], 4, ["too_small"])

    def test_none_passes(self):
        passes([("max", {"max_value": 5})], None, None)
        passes([("min", {"min_value": 5})], None, None)


class TestRound:
    def test_round_int_to_nearest_float(self):
        passes([("round", {"to_nearest": "5.5"})], 42, Decimal("44.0"))

    def test_round_float_to_nearest_integer(self):
        # ROUND_HALF_UP: 3.5 -> 4
        passes([("round", {"to_nearest": "1"})], 3.5, Decimal("4.0"))

    def test_round_float_artifacts(self):
        # would produce FP artifacts with float math (number_test.py:425-428)
        passes([("round", {"to_nearest": "0.05"})], 1.368161685161, Decimal("1.35"))

    def test_round_string_float(self):
        # '2.775' -> 2.8, not 2.77 (number_test.py:430-439)
        passes([("round", {"to_nearest": "0.1"})], "2.775", Decimal("2.8"))

    def test_round_to_big_value(self):
        passes([("round", {"to_nearest": "10"})], 42, Decimal("40"))

    def test_rounding_mode(self):
        passes([("round", {"to_nearest": "1", "rounding": ROUND_HALF_DOWN})], "3.5", Decimal("3"))

    def test_result_type(self):
        r = run_one([("round", {"to_nearest": "1", "result_type": int})], "3.6")
        assert r.cleaned_data == 4 and isinstance(r.cleaned_data, int)

    def test_invalid_input(self):
        errors(["round"], "nope", ["not_numeric"])

    def test_negative_to_nearest_rejected(self):
        with pytest.raises(ValueError):
            run_one([("round", {"to_nearest": "-5"})], 1)
