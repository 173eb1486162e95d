"""Chain/repeater/mapper composition semantics, ported from reference
test/complex_test.py — the load-bearing error model (SURVEY.md §1.3)."""

import pandas as pd

from filters_spark.functions.spec import (
    compile_chain,
    compile_mapper,
    run_one,
)


def S(*values):
    return pd.Series(list(values), dtype=object)


class TestChainShortCircuit:
    def test_stops_at_first_error(self):
        # 'foobar' | MaxLength(3) | MinLength(8) | Required
        # -> only 'too_long' (complex_test.py:46-59)
        r = run_one(
            [("max_length", {"max_length": 3}), ("min_length", {"min_length": 8}), "required"],
            "foobar",
        )
        assert r.errors == {"": ["too_long"]}
        assert r.cleaned_data is None

    def test_error_mask_is_per_row(self):
        chain = compile_chain([("max_length", {"max_length": 3}), "int"])
        out, errs = chain.apply(S("12", "123456", "xx"))
        assert out.tolist() == [12, None, None]
        assert errs[0] is None
        assert errs[1][0][1] == "too_long"
        assert errs[2][0][1] == "not_numeric"

    def test_none_flows_through_whole_chain(self):
        r = run_one(["unicode", "strip", ("max_length", {"max_length": 3})], None)
        assert r.is_valid and r.cleaned_data is None


class TestRepeater:
    def test_list_invalid_elements_become_none_in_place(self):
        # (complex_test.py:84-161)
        r = run_one([{"filter": "repeater", "steps": ["int"]}], ["1", "x", "3"])
        assert r.cleaned_data == [1, None, 3]
        assert r.errors == {"1": ["not_numeric"]}

    def test_mapping_values_filtered(self):
        r = run_one([{"filter": "repeater", "steps": ["int"]}], {"a": "1", "b": "x"})
        assert dict(r.cleaned_data) == {"a": 1, "b": None}
        assert r.errors == {"b": ["not_numeric"]}

    def test_restrict_keys_mapping_drops_key(self):
        # keys not in restrict_keys dropped + unexpected (complex.py:101-145)
        r = run_one(
            [{"filter": "repeater", "steps": ["int"], "restrict_keys": ["a"]}],
            {"a": "1", "z": "2"},
        )
        assert dict(r.cleaned_data) == {"a": 1}
        assert r.errors == {"z": ["unexpected"]}

    def test_restrict_keys_list_nulls_position(self):
        r = run_one(
            [{"filter": "repeater", "steps": ["int"], "restrict_keys": [0, 1]}],
            ["1", "2", "3"],
        )
        assert r.cleaned_data == [1, 2, None]
        assert r.errors == {"2": ["unexpected"]}

    def test_non_iterable_wrong_type(self):
        r = run_one([{"filter": "repeater", "steps": ["int"]}], 42)
        assert r.errors == {"": ["wrong_type"]}
        assert r.cleaned_data is None

    def test_chained_repeaters_stop_at_first_failing_stage(self):
        # a failing element in repeater 1 propagates has-error, so
        # repeater 2 never runs (complex_test.py:250-310)
        r = run_one(
            [
                {"filter": "repeater", "steps": ["int"]},
                {"filter": "repeater", "steps": [("min", {"min_value": 0})]},
            ],
            ["1", "x"],
        )
        assert r.cleaned_data == [1, None]
        assert r.errors == {"1": ["not_numeric"]}

    def test_repeater_then_scalar_filter(self):
        # repeater | scalar composition (complex_test.py:312-332)
        r = run_one(
            [{"filter": "repeater", "steps": ["int"]}, ("max_length", {"max_length": 2})],
            ["1", "2", "3"],
        )
        assert r.errors == {"": ["too_long"]}

    def test_nested_repeaters_dotted_numeric_keys(self):
        # list-in-list error key '1.2' (complex_test.py:408-411)
        r = run_one(
            [{"filter": "repeater", "steps": [{"filter": "repeater", "steps": ["int"]}]}],
            [["1", "2"], ["3", "4", "x"]],
        )
        assert r.cleaned_data == [[1, 2], [3, 4, None]]
        assert r.errors == {"1.2": ["not_numeric"]}

    def test_none_passes(self):
        r = run_one([{"filter": "repeater", "steps": ["int"]}], None)
        assert r.is_valid and r.cleaned_data is None


class TestMapper:
    SPEC = {
        "id": ["required", "int", ("min", {"min_value": 1})],
        "subject": ["not_empty", ("max_length", {"max_length": 16})],
    }

    def test_happy_path_and_key_order(self):
        r = run_one([{"filter": "mapper", "filter_map": self.SPEC}], {"subject": "test", "id": "42"})
        assert list(r.cleaned_data.keys()) == ["id", "subject"]
        assert dict(r.cleaned_data) == {"id": 42, "subject": "test"}

    def test_sibling_isolation(self):
        # failing key poisons only its slot (complex_test.py:84-104,496-521)
        r = run_one([{"filter": "mapper", "filter_map": self.SPEC}], {"id": "x", "subject": "ok"})
        assert dict(r.cleaned_data) == {"id": None, "subject": "ok"}
        assert r.errors == {"id": ["not_numeric"]}

    def test_missing_key_allowed_filtered_as_none(self):
        # missing + allowed -> chain applied to None (complex.py:293-296);
        # 'id' has Required so it errors with 'empty', 'subject' passes.
        r = run_one([{"filter": "mapper", "filter_map": self.SPEC}], {"subject": "hi"})
        assert r.errors == {"id": ["empty"]}
        assert dict(r.cleaned_data) == {"id": None, "subject": "hi"}

    def test_missing_key_disallowed(self):
        r = run_one(
            [{"filter": "mapper", "filter_map": {"a": None, "b": None}, "allow_missing_keys": False}],
            {"a": 1},
        )
        assert r.errors == {"b": ["missing"]}
        assert dict(r.cleaned_data) == {"a": 1, "b": None}

    def test_missing_keys_allowlist(self):
        r = run_one(
            [{"filter": "mapper", "filter_map": {"a": None, "b": None}, "allow_missing_keys": ["b"]}],
            {},
        )
        assert r.errors == {"a": ["missing"]}

    def test_extra_keys_passthrough_sorted_last(self):
        r = run_one(
            [{"filter": "mapper", "filter_map": self.SPEC}],
            {"zz": 1, "id": "2", "aa": 2, "subject": "s"},
        )
        assert list(r.cleaned_data.keys()) == ["id", "subject", "aa", "zz"]
        assert r.is_valid

    def test_extra_keys_rejected_and_omitted(self):
        r = run_one(
            [{"filter": "mapper", "filter_map": self.SPEC, "allow_extra_keys": False}],
            {"id": "2", "subject": "s", "rogue": 1},
        )
        assert r.errors == {"rogue": ["unexpected"]}
        assert "rogue" not in r.cleaned_data

    def test_extra_keys_allowlist(self):
        r = run_one(
            [{"filter": "mapper", "filter_map": self.SPEC, "allow_extra_keys": ["ok"]}],
            {"id": "2", "subject": "s", "ok": 1, "bad": 2},
        )
        assert r.errors == {"bad": ["unexpected"]}
        assert "ok" in r.cleaned_data

    def test_non_mapping_wrong_type(self):
        r = run_one([{"filter": "mapper", "filter_map": self.SPEC}], "not a dict")
        assert r.errors == {"": ["wrong_type"]}
        assert r.cleaned_data is None

    def test_nested_mapper_dotted_keys(self):
        # 'attachment.type' (complex_test.py:1023-1031)
        spec = {
            "filter": "mapper",
            "filter_map": {
                "attachment": [
                    {
                        "filter": "mapper",
                        "filter_map": {"type": [("choice", {"choices": ["image/jpeg"]})]},
                    }
                ]
            },
        }
        r = run_one([spec], {"attachment": {"type": "text/plain"}})
        assert r.errors == {"attachment.type": ["not_valid_choice"]}

    def test_mapper_chained_with_mapper(self):
        # mapper | mapper composes (complex_test.py:845-908)
        m1 = {"filter": "mapper", "filter_map": {"a": ["int"]}}
        m2 = {"filter": "mapper", "filter_map": {"a": [("min", {"min_value": 10})]}}
        r = run_one([m1, m2], {"a": "42"})
        assert r.is_valid and dict(r.cleaned_data) == {"a": 42}
        r = run_one([m1, m2], {"a": "5"})
        assert r.errors == {"a": ["too_small"]}

    def test_none_chain_passthrough(self):
        # filter_map value None = presence-only (complex.py:243-253)
        r = run_one([{"filter": "mapper", "filter_map": {"x": None}}], {"x": "raw"})
        assert r.is_valid and r.cleaned_data["x"] == "raw"

    def test_batch_vectorized_consistency(self):
        mapper = compile_mapper(self.SPEC)
        batch = S(
            {"id": "1", "subject": "a"},
            {"id": "0", "subject": "b"},
            "garbage",
            None,
            {"id": "7"},
        )
        out, errs = mapper.apply(batch)
        assert dict(out[0]) == {"id": 1, "subject": "a"}
        assert errs[1][0][:2] == ("id", "too_small")
        assert errs[2][0][:2] == ("", "wrong_type")
        assert out[3] is None and errs[3] is None
        assert dict(out[4]) == {"id": 7, "subject": None}
