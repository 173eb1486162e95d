"""Handler modes (raise/log/accumulate) + FilterRunner facade + the
test-harness helpers — reference filters/handlers.py and filters/test.py
semantics. Pure Python: no Spark session needed."""

import logging

import pytest

from filters_spark.functions.handlers import (
    ExceptionHandler,
    FilterError,
    FilterMessage,
    FilterRunner,
    LogHandler,
    MemoryHandler,
)
from filters_spark.functions.testing import (
    ANY,
    FilterTestCaseMixin,
    assert_filter_errors,
    assert_filter_passes,
)

CHAIN = ["required", "strip", ("max_length", {"max_length": 5})]


class TestFilterRunner:
    def test_valid_value(self):
        r = FilterRunner(CHAIN, "  abc  ")
        assert r.is_valid
        assert r.cleaned_data == "abc"
        assert r.errors == {}

    def test_invalid_value_accumulates(self):
        r = FilterRunner(CHAIN, "  toolongvalue  ")
        assert not r.is_valid
        assert r.cleaned_data is None
        assert r.errors == {"": [{"code": "too_long",
                                  "message": "Value is too long (length must be < 5)."}]}
        assert r.error_messages[""] == ["Value is too long (length must be < 5)."]

    def test_dotted_keys_from_nested_chains(self):
        spec = [{"filter": "mapper", "filter_map": {"k": ["required"]},
                 "allow_missing_keys": False}]
        r = FilterRunner(spec, {})
        assert list(r.errors) == ["k"]
        assert r.errors["k"][0]["code"] == "missing"

    def test_reapply(self):
        r = FilterRunner(CHAIN)
        assert r.apply("ok").is_valid
        assert not r.apply("definitely too long").is_valid
        assert r.apply("fine").is_valid  # state resets per apply


class TestHandlerModes:
    def test_exception_handler_raises_with_context(self):
        with pytest.raises(FilterError) as exc:
            FilterRunner(CHAIN, None, handler=ExceptionHandler())
        assert "required" in str(exc.value).lower()
        assert exc.value.context["code"] == "empty"

    def test_exception_handler_silent_on_valid(self):
        r = FilterRunner(CHAIN, "ok", handler=ExceptionHandler())
        assert r.is_valid

    def test_log_handler_logs(self, caplog):
        logger = logging.getLogger("filters_spark.test")
        with caplog.at_level(logging.ERROR, logger="filters_spark.test"):
            r = FilterRunner(CHAIN, "waaaay too long", handler=LogHandler(logger))
        assert not r.is_valid
        assert any("too long" in rec.message for rec in caplog.records)
        assert caplog.records[0].context["code"] == "too_long"

    def test_memory_handler_keyed_messages(self):
        mh = MemoryHandler()
        FilterRunner(CHAIN, "too long for sure", handler=mh)
        assert list(mh.messages) == [""]
        msg = mh.messages[""][0]
        assert isinstance(msg, FilterMessage)
        assert msg.code == "too_long"
        assert msg.as_dict() == {"code": "too_long",
                                 "message": "Value is too long (length must be < 5)."}
        assert "context" in msg.as_dict(with_debug_info=True)


class TestHarnessHelpers:
    def test_assert_filter_passes(self):
        assert assert_filter_passes(CHAIN, " abc ", "abc") == "abc"
        assert_filter_passes(CHAIN, " abc ", ANY)

    def test_assert_filter_passes_raises_on_error(self):
        with pytest.raises(AssertionError, match="expected"):
            assert_filter_passes(CHAIN, None)

    def test_assert_filter_errors_flat_and_keyed(self):
        assert_filter_errors(CHAIN, None, ["empty"])
        assert_filter_errors(
            [{"filter": "mapper", "filter_map": {"k": ["required"]},
              "allow_missing_keys": False}],
            {},
            {"k": ["missing"]},
        )

    def test_assert_filter_errors_raises_on_pass(self):
        with pytest.raises(AssertionError, match="passed"):
            assert_filter_errors(CHAIN, "ok", ["empty"])


class TestMixin(FilterTestCaseMixin):
    filter_type = CHAIN

    def test_mixin_camelcase_api(self):
        self.assertFilterPasses("  hi  ", "hi")
        self.assertFilterErrors(None, ["empty"])
        self.assertFilterPasses("x", "x", spec=["noop"])
