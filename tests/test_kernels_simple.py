"""Presence/type/temporal kernel parity tests, ported from reference
test/simple_test.py."""

from datetime import date, datetime, timezone as dt_timezone

from filters_spark.functions.spec import run_one

from tests.test_kernels_number import errors, passes


class TestRequiredNotEmptyOptional:
    def test_required_rejects_none(self):
        errors(["required"], None, ["empty"])

    def test_required_rejects_empty_string(self):
        errors(["required"], "", ["empty"])

    def test_required_rejects_empty_list(self):
        errors(["required"], [], ["empty"])

    def test_required_passes_value(self):
        passes(["required"], "foo", "foo")

    def test_required_passes_zero_and_false(self):
        # 0/False are NOT empty (simple_test.py:980-991)
        passes(["required"], 0, 0)
        passes(["required"], False, False)

    def test_not_empty_none_passes_by_default(self):
        passes(["not_empty"], None, None)

    def test_not_empty_allow_none_false(self):
        errors([("not_empty", {"allow_none": False})], None, ["empty"])

    def test_not_empty_rejects_empty(self):
        errors(["not_empty"], "", ["empty"])
        errors(["not_empty"], {}, ["empty"])

    def test_empty_accepts_zero_length(self):
        passes(["empty"], "", "")
        passes(["empty"], [], [])

    def test_empty_rejects_nonempty(self):
        errors(["empty"], "x", ["not_empty"])

    def test_empty_no_len_is_not_empty(self):
        # objects without len() are non-empty (simple.py:309-319)
        errors(["empty"], 0, ["not_empty"])

    def test_optional_replaces_none(self):
        passes([("optional", {"default": 42})], None, 42)

    def test_optional_replaces_empty(self):
        passes([("optional", {"default": "d"})], "", "d")

    def test_optional_keeps_value(self):
        passes([("optional", {"default": "d"})], "x", "x")
        passes([("optional", {"default": "d"})], 0, 0)


class TestChoiceArrayLength:
    def test_choice_pass(self):
        passes([("choice", {"choices": ["a", "b"]})], "a", "a")

    def test_choice_fail_case_sensitive(self):
        errors([("choice", {"choices": ["a"]})], "A", ["not_valid_choice"])

    def test_choice_none_passes(self):
        passes([("choice", {"choices": ["a"]})], None, None)

    def test_array_pass_list(self):
        passes(["array"], [1, 2], [1, 2])

    def test_array_fail_string(self):
        errors(["array"], "abc", ["wrong_type"])

    def test_array_fail_dict(self):
        # dict/set rejected (simple_test.py:100-110)
        errors(["array"], {"a": 1}, ["wrong_type"])

    def test_length_exact(self):
        passes([("length", {"length": 3})], "abc", "abc")
        errors([("length", {"length": 3})], "abcd", ["too_long"])
        errors([("length", {"length": 3})], "ab", ["too_short"])

    def test_max_length(self):
        passes([("max_length", {"max_length": 3})], "abc", "abc")
        errors([("max_length", {"max_length": 3})], "abcd", ["too_long"])

    def test_min_length(self):
        passes([("min_length", {"min_length": 3})], "abc", "abc")
        errors([("min_length", {"min_length": 3})], "ab", ["too_short"])

    def test_length_bytes_counts_bytes(self):
        # str counts code points, bytes counts bytes (simple_test.py:746-765)
        errors([("max_length", {"max_length": 3})], "è".encode("utf-8") * 2, ["too_long"])
        passes([("max_length", {"max_length": 4})], "è" * 4, "è" * 4)

    def test_noop(self):
        passes(["noop"], "anything", "anything")


class TestDatetime:
    def test_naive_assumed_utc(self):
        passes(
            ["datetime"],
            "2015-05-11 14:56:58",
            datetime(2015, 5, 11, 14, 56, 58, tzinfo=dt_timezone.utc),
        )

    def test_aware_converted_to_utc(self):
        passes(
            ["datetime"],
            "2015-05-11 14:56:58+0500",
            datetime(2015, 5, 11, 9, 56, 58, tzinfo=dt_timezone.utc),
        )

    def test_timezone_offset_param(self):
        # int timezone = hours offset from UTC (simple.py:211-219)
        passes(
            [("datetime", {"timezone": 5})],
            "2015-05-11 14:56:58",
            datetime(2015, 5, 11, 9, 56, 58, tzinfo=dt_timezone.utc),
        )

    def test_naive_output(self):
        passes(
            [("datetime", {"naive": True})],
            "2015-05-11 14:56:58+0500",
            datetime(2015, 5, 11, 9, 56, 58),
        )

    def test_datetime_object_passthrough(self):
        v = datetime(2015, 5, 11, 14, 56, 58, tzinfo=dt_timezone.utc)
        passes(["datetime"], v, v)

    def test_date_object_becomes_midnight(self):
        passes(
            ["datetime"],
            date(2015, 5, 11),
            datetime(2015, 5, 11, 0, 0, 0, tzinfo=dt_timezone.utc),
        )

    def test_invalid(self):
        errors(["datetime"], "this is not a datetime", ["not_datetime"])

    def test_none_passes(self):
        passes(["datetime"], None, None)


class TestDate:
    def test_date_from_string(self):
        passes(["date"], "2015-05-11 00:00:00", date(2015, 5, 11))

    def test_date_object_passthrough(self):
        passes(["date"], date(2015, 5, 11), date(2015, 5, 11))

    def test_tz_conversion_can_shift_day(self):
        # 2015-05-12 03:20 at UTC+8 is 2015-05-11 UTC (simple_test.py:354-365)
        passes([("date", {"timezone": 8})], "2015-05-12 03:20:00", date(2015, 5, 11))

    def test_invalid(self):
        errors(["date"], "not a date", ["not_date"])


class TestByteArray:
    def test_bytes_in(self):
        passes(["byte_array"], b"abc", bytearray(b"abc"))

    def test_str_encoded(self):
        passes(["byte_array"], "abc", bytearray(b"abc"))

    def test_int_list(self):
        passes(["byte_array"], [104, 105], bytearray(b"hi"))

    def test_int_list_out_of_range(self):
        r = run_one(["byte_array"], [104, 300])
        assert not r.is_valid
        assert r.errors == {"1": ["too_big"]}, r.errors

    def test_bad_encoding(self):
        errors([("byte_array", {"encoding": "ascii"})], "héllo", ["bad_encoding"])
