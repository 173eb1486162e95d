"""Declarative filter specs -> fused vectorized kernels.

The reference composes filters at runtime with ``|`` into a
``FilterChain`` (reference filters/base.py:463-535); the "plan" is just
the ordered filter list. Here the plan is *data*: a JSON-able spec
(list of ``{"filter": name, ...params}`` steps, or a mapper spec keyed by
field) compiled into a fused batch kernel. Specs-as-data is what makes
mid-stream schema evolution shippable: a new schema version is a new
spec, not new code (mirrors FilterMapper's declarative filter_map,
reference filters/complex.py:194-262, and the extension registry,
filters/extensions.py:54-117).

Chain semantics (reference base.py:521-532 + complex.py):
- left-to-right, short-circuit at the first step that records an error;
- invalid value -> the step's replacement (None except MaxBytes);
- nested repeater/mapper errors carry dotted keys ('attachment.type',
  '1.2') and poison only their slot, but propagate has-error to the
  outer chain so later steps are skipped.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterable, Mapping
from types import SimpleNamespace
from typing import Any, Callable

import pandas as pd

from filters_spark.functions import kernels as K
from filters_spark.functions.kernels import Err, Kernel, _none_series, _obj


class FilterSpecError(ValueError):
    """Raised when a spec cannot be compiled (bad name / params)."""


# --- registry ---------------------------------------------------------------
# name -> kernel factory. Extensions register via register_kernel(), the
# Spark-era analog of the reference's entry-point plugin registry
# (filters/extensions.py:54-117).

_REGISTRY: dict[str, Callable[..., Kernel]] = {}


def register_kernel(name: str, factory: Callable[..., Kernel]) -> None:
    _REGISTRY[name] = factory


for _cls in (
    K.TypeK, K.ArrayK, K.RequiredK, K.NotEmptyK, K.EmptyK, K.OptionalK,
    K.ChoiceK, K.LengthK, K.MaxLengthK, K.MinLengthK, K.NoOpK,
    K.DecimalK, K.IntK, K.MaxK, K.MinK, K.RoundK,
    K.UnicodeK, K.ByteStringK, K.CaseFoldK, K.LowerK, K.AsciiLowerK,
    K.StripK, K.RegexK, K.RegexMatchK, K.SplitK,
    K.Base64DecodeK, K.MaxBytesK, K.UuidK, K.IpAddressK, K.JsonDecodeK,
    K.ByteArrayK, K.DatetimeK, K.DateK,
):
    register_kernel(_cls.name, _cls)


def _prefix_errs(errs: list[Err] | None, key: str) -> list[Err] | None:
    if errs is None:
        return None
    return [((f"{key}.{k}" if k else key), c, m) for (k, c, m) in errs]


class ChainKernel(Kernel):
    """Fused left-to-right chain with error-mask short-circuiting.

    One Python-boundary crossing per batch regardless of chain length —
    the vectorized analog of the reference's per-value loop
    (base.py:521-532)."""

    name = "chain"

    def __init__(self, steps: list[Kernel]):
        self.steps = list(steps)

    def apply(self, vals: pd.Series) -> tuple[pd.Series, pd.Series]:
        if vals.dtype != object:
            vals = vals.astype(object)
        out = vals.copy()
        errs = _none_series(vals.index)
        mask = pd.Series(True, index=vals.index)
        for step in self.steps:
            if not mask.any():
                break
            sub_out, sub_err = step.apply(out[mask])
            out[mask] = sub_out
            hit = sub_err.notna()
            if hit.any():
                errs[hit[hit].index] = sub_err[hit]
                mask = mask & errs.isna()
        return out, errs

    def apply_scalar(self, value: Any) -> tuple[Any, list[Err] | None]:
        out, errs = self.apply(_obj([value], [0]))
        return out.iloc[0], errs.iloc[0]


class RepeaterKernel(Kernel):
    """Apply one chain to every element of a list / every value of a
    mapping (reference filters/complex.py:21-170).

    Vectorized as explode -> one batched chain apply -> regroup, the
    pandas analog of ``posexplode -> kernel -> collect_list``.
    Invalid elements become None in place; list output coerced to list,
    mapping output to OrderedDict; keys outside ``restrict_keys`` are
    dropped (mapping, +unexpected error) or nulled (list)."""

    name = "repeater"
    CODE_EXTRA_KEY = "unexpected"
    templates = {
        "unexpected": 'Unexpected key "{key}".',
        "wrong_type": "{incoming} is not valid (allowed types: {allowed}).",
    }

    def __init__(self, chain: Kernel, restrict_keys: Iterable | None = None):
        self.chain = chain
        self.restrict_keys = None if restrict_keys is None else set(restrict_keys)

    def _apply(self, sub: pd.Series) -> tuple[pd.Series, pd.Series]:
        out = _none_series(sub.index)
        errs = _none_series(sub.index)
        # slot bookkeeping: (slot_index, element_key, is_mapping)
        flat_vals: list[Any] = []
        flat_meta: list[tuple[Any, Any, bool]] = []
        slot_errs: dict[Any, list[Err]] = {}
        slot_shape: dict[Any, tuple[bool, list]] = {}

        for idx, v in sub.items():
            if isinstance(v, Mapping):
                keys = []
                for k in v.keys():
                    if self.restrict_keys is None or k in self.restrict_keys:
                        keys.append(k)
                        flat_vals.append(v[k])
                        flat_meta.append((idx, k, True))
                    else:
                        slot_errs.setdefault(idx, []).append(
                            (str(k), "unexpected", self.msg("unexpected", key=k))
                        )
                slot_shape[idx] = (True, keys)
            elif isinstance(v, Iterable):
                # NB: strings are Iterable and iterate per-character,
                # exactly like the reference's Type(Iterable) gate
                # (complex.py:88).
                items = list(v)
                keys = []
                for i, item in enumerate(items):
                    if self.restrict_keys is None or i in self.restrict_keys:
                        keys.append((i, False))
                        flat_vals.append(item)
                        flat_meta.append((idx, i, False))
                    else:
                        # position must still exist in the output -> None
                        keys.append((i, True))
                        slot_errs.setdefault(idx, []).append(
                            (str(i), "unexpected", self.msg("unexpected", key=i))
                        )
                slot_shape[idx] = (False, keys)
            else:
                errs[idx] = [("", "wrong_type", self.msg(
                    "wrong_type", incoming=K._type_name(type(v)), allowed="Array"))]
                out[idx] = None

        if flat_vals:
            f_out, f_err = self.chain.apply(_obj(flat_vals, range(len(flat_vals))))
        else:
            f_out = f_err = _obj([], [])

        # regroup
        results: dict[Any, dict] = {}
        for pos, (idx, key, _is_map) in enumerate(flat_meta):
            val = f_out.iloc[pos]
            e = f_err.iloc[pos]
            if e is not None:
                slot_errs.setdefault(idx, []).extend(_prefix_errs(e, str(key)))
            results.setdefault(idx, {})[key] = val

        for idx, (is_map, keys) in slot_shape.items():
            got = results.get(idx, {})
            if is_map:
                out[idx] = OrderedDict((k, got[k]) for k in keys)
            else:
                seq = []
                for k in keys:
                    i, rejected = k
                    seq.append(None if rejected else got.get(i))
                out[idx] = seq
            if idx in slot_errs:
                errs[idx] = slot_errs[idx]
        return out, errs


class MapperKernel(Kernel):
    """Dict-shaped record spec: per-key chains over a Mapping
    (reference filters/complex.py:174-383).

    Vectorized per declared field: each field's chain runs ONCE over the
    whole batch column of that field, then records are reassembled —
    spec keys first (spec order), extra keys sorted last
    (complex.py:289-315)."""

    name = "mapper"
    CODE_EXTRA_KEY = "unexpected"
    CODE_MISSING_KEY = "missing"
    templates = {
        "unexpected": 'Unexpected key "{actual_key}".',
        "missing": "{key} is required.",
        "wrong_type": "{incoming} is not valid (allowed types: {allowed}).",
    }

    _MISSING = object()

    def __init__(
        self,
        filter_map: Mapping[str, Kernel | None],
        allow_missing_keys: bool | Iterable = True,
        allow_extra_keys: bool | Iterable = True,
    ):
        self.filter_map = OrderedDict(filter_map)
        self.allow_missing_keys = (
            set(allow_missing_keys) if isinstance(allow_missing_keys, Iterable) else bool(allow_missing_keys)
        )
        self.allow_extra_keys = (
            set(allow_extra_keys) if isinstance(allow_extra_keys, Iterable) else bool(allow_extra_keys)
        )

    def _missing_ok(self, key) -> bool:
        if self.allow_missing_keys is True:
            return True
        if isinstance(self.allow_missing_keys, set):
            return key in self.allow_missing_keys
        return False

    def _extra_ok(self, key) -> bool:
        if self.allow_extra_keys is True:
            return True
        if isinstance(self.allow_extra_keys, set):
            return key in self.allow_extra_keys
        return False

    def _apply(self, sub: pd.Series) -> tuple[pd.Series, pd.Series]:
        out = _none_series(sub.index)
        errs = _none_series(sub.index)
        valid_idx = []
        for idx, v in sub.items():
            if isinstance(v, Mapping):
                valid_idx.append(idx)
            else:
                errs[idx] = [("", "wrong_type", self.msg(
                    "wrong_type", incoming=K._type_name(type(v)), allowed="Object"))]
        if not valid_idx:
            return out, errs

        slot_errs: dict[Any, list[Err]] = {}
        field_results: dict[str, dict[Any, Any]] = {}

        for key, chain in self.filter_map.items():
            col_vals, col_idx = [], []
            res: dict[Any, Any] = {}
            for idx in valid_idx:
                rec = sub[idx]
                if key in rec:
                    col_vals.append(rec[key])
                    col_idx.append(idx)
                elif self._missing_ok(key):
                    col_vals.append(None)
                    col_idx.append(idx)
                else:
                    res[idx] = None
                    slot_errs.setdefault(idx, []).append(
                        (str(key), "missing", self.msg("missing", key=key))
                    )
            if col_idx:
                if chain is None:
                    for idx, v in zip(col_idx, col_vals):
                        res[idx] = v
                else:
                    c_out, c_err = chain.apply(_obj(col_vals, range(len(col_vals))))
                    for pos, idx in enumerate(col_idx):
                        res[idx] = c_out.iloc[pos]
                        e = c_err.iloc[pos]
                        if e is not None:
                            slot_errs.setdefault(idx, []).extend(_prefix_errs(e, str(key)))
            field_results[key] = res

        declared = set(self.filter_map.keys())
        for idx in valid_idx:
            rec = sub[idx]
            result = OrderedDict()
            for key in self.filter_map:
                if idx in field_results[key]:
                    result[key] = field_results[key][idx]
                else:  # missing + disallowed -> key present with None
                    result[key] = None
            for key in sorted(set(rec.keys()) - declared, key=str):
                if self._extra_ok(key):
                    result[key] = rec[key]
                else:
                    slot_errs.setdefault(idx, []).append(
                        (str(key), "unexpected", self.msg("unexpected", actual_key=key))
                    )
            out[idx] = result
            if idx in slot_errs:
                errs[idx] = slot_errs[idx]
        return out, errs


# --- spec compilation --------------------------------------------------------


def _compile_step(step: Any) -> Kernel:
    if isinstance(step, Kernel):
        return step
    if isinstance(step, str):
        step = {"filter": step}
    if isinstance(step, (list, tuple)) and len(step) == 2 and isinstance(step[0], str):
        step = {"filter": step[0], **(step[1] or {})}
    if not isinstance(step, Mapping):
        raise FilterSpecError(f"unrecognized spec step: {step!r}")
    step = dict(step)
    name = step.pop("filter", None)
    if name is None:
        raise FilterSpecError(f"spec step missing 'filter': {step!r}")
    params = dict(step.pop("params", {}))
    params.update(step)
    if name == "chain":
        return compile_chain(params.pop("steps"))
    if name == "repeater":
        chain = compile_chain(params.pop("steps"))
        return RepeaterKernel(chain, **params)
    if name == "mapper":
        return compile_mapper(params.pop("filter_map"), **params)
    factory = _REGISTRY.get(name)
    if factory is None:
        raise FilterSpecError(f"unknown filter {name!r}; registered: {sorted(_REGISTRY)}")
    try:
        return factory(**params)
    except TypeError as exc:
        raise FilterSpecError(f"bad params for {name!r}: {exc}") from exc


def compile_chain(spec: Any) -> ChainKernel:
    """Compile a chain spec (list of steps / single step) into a fused
    ChainKernel."""
    if isinstance(spec, ChainKernel):
        return spec
    if isinstance(spec, Kernel):
        return ChainKernel([spec])
    if isinstance(spec, (str, Mapping)):
        return ChainKernel([_compile_step(spec)])
    return ChainKernel([_compile_step(s) for s in spec])


def compile_mapper(
    filter_map: Mapping[str, Any],
    allow_missing_keys: bool | Iterable = True,
    allow_extra_keys: bool | Iterable = True,
) -> MapperKernel:
    """Compile a ``{field: chain_spec}`` mapper spec; ``None`` chain =
    presence-only field (reference complex.py:243-253)."""
    compiled = OrderedDict(
        (k, None if v is None else compile_chain(v)) for k, v in filter_map.items()
    )
    return MapperKernel(compiled, allow_missing_keys, allow_extra_keys)


def run_one(spec: Any, value: Any) -> SimpleNamespace:
    """One-shot validation façade, the FilterRunner analog
    (reference filters/handlers.py:140-296): returns
    ``(cleaned_data, errors: {dotted_key: [codes]}, error_messages,
    is_valid)``."""
    chain = spec if isinstance(spec, Kernel) else compile_chain(spec)
    if not isinstance(chain, ChainKernel):
        chain = ChainKernel([chain])
    cleaned, errs = chain.apply_scalar(value)
    errors: dict[str, list[str]] = OrderedDict()
    messages: dict[str, list[str]] = OrderedDict()
    for (k, code, message) in errs or []:
        errors.setdefault(k, []).append(code)
        messages.setdefault(k, []).append(message)
    return SimpleNamespace(
        cleaned_data=cleaned,
        errors=errors,
        error_messages=messages,
        is_valid=not errors,
    )
