"""Native ``Column``-expression fast paths for filter chains.

When every step of a field's chain has a bit-identical JVM expression,
the whole chain compiles to pure Catalyst expressions — whole-stage
codegen, no Python boundary at all. Steps without an exact native
equivalent (e.g. ``unicode`` NFC normalization, ``case_fold``) return
None from the builder, and the validate operator falls back to the
Arrow-batched pandas kernel for that field.

Parity notes (validated against this Spark build):
- Java regex supports ``\\p{C}`` / ``\\P{C}``, so Strip's default
  pattern (reference string.py:603) translates verbatim.
- ``try_cast(decimal(38,18))`` accepts scientific notation and rejects
  NaN/Inf/garbage as NULL — matching Decimal/Int semantics
  (reference number.py:74-140) within 38 digits.
- ``case_fold`` has NO native equivalent (``lower()`` diverges: 'ß'
  stays 'ß'); a separate ``lower`` filter is provided for engine specs
  that want the native path and plain lowercase semantics.

Error model: same as the kernels — short-circuit at the first failing
step, invalid value -> NULL, error struct (key, code, message).
"""

from __future__ import annotations

from typing import Callable, Optional

import pyspark.sql.functions as F
from pyspark.sql import Column

ERROR_ELEM_DDL = "struct<key:string,code:string,message:string>"
ERRORS_DDL = f"array<{ERROR_ELEM_DDL}>"


class NativeStep:
    """One chain step as Column algebra.

    ``conds``: ordered (condition_builder, code, message) triples —
    condition evaluated only on non-null values unless
    ``applies_to_null``; first true condition wins.
    ``transform``: value rewrite applied when no error fired.
    """

    def __init__(
        self,
        conds: list[tuple[Callable[[Column], Column], str, str]] | None = None,
        transform: Callable[[Column], Column] | None = None,
        applies_to_null: bool = False,
        null_cond: tuple[str, str] | None = None,
    ):
        self.conds = conds or []
        self.transform = transform
        self.applies_to_null = applies_to_null
        self.null_cond = null_cond  # (code, message) fired when value IS NULL


def _err_struct(key: str, code: str, message: str) -> Column:
    return F.struct(
        F.lit(key).alias("key"), F.lit(code).alias("code"), F.lit(message).alias("message")
    )


# --- builders: spec params -> NativeStep (or None = not native-able) --------


def _b_required(**kw) -> NativeStep:
    return NativeStep(
        conds=[(lambda c: F.length(c.cast("string")) == 0, "empty", "This value is required.")],
        null_cond=("empty", "This value is required."),
    )


def _b_not_empty(allow_none: bool = True, **kw) -> NativeStep:
    step = NativeStep(
        conds=[(lambda c: F.length(c.cast("string")) == 0, "empty", "Non-empty value expected.")]
    )
    if not allow_none:
        step.null_cond = ("empty", "Non-empty value expected.")
    return step


def _b_optional(default=None, **kw) -> NativeStep:
    def tr(c: Column) -> Column:
        repl = F.lit(default)
        return F.when(c.isNull() | (F.length(c.cast("string")) == 0), repl).otherwise(c)

    return NativeStep(transform=tr, applies_to_null=True)


_STRIP_DEFAULT = r"[\p{C}\s]+"


def _b_strip(leading: str | None = _STRIP_DEFAULT, trailing: str | None = _STRIP_DEFAULT,
             **kw) -> Optional[NativeStep]:
    # (?U) = Java UNICODE_CHARACTER_CLASS: without it Java's \s is
    # ASCII-only, so the native strip kept U+00A0/U+3000/... that the
    # reference (Python `regex` with re.UNICODE) removes — a
    # hypothesis-found kernel/native divergence. With (?U), Java
    # matches the reference on NBSP, Unicode spaces, ZWSP and
    # unassigned (Cn) codepoints (verified case-by-case); the
    # reference compiles its patterns with regex.UNICODE, so Unicode
    # classes are the contract for custom patterns too.
    #
    # CUSTOM patterns carry the same Java-vs-Python dialect hazards as
    # Regex (Python-only syntax throws PatternSyntaxException at
    # EXECUTOR runtime; \s-style shorthands silently diverge on
    # dialect-edge codepoints), so a non-default pattern compiles on
    # the native path only when _dialect_safe admits it — otherwise
    # decline and let the kernel/reference path run it. Only the
    # DEFAULT pattern is exempt: it is the one spelling whose (?U)
    # behavior was verified against the reference case-by-case.
    for pat in (leading, trailing):
        if pat and pat != _STRIP_DEFAULT and not _dialect_safe(pat):
            return None

    def tr(c: Column) -> Column:
        if leading:
            c = F.regexp_replace(c, f"(?U)^{leading}", "")
        if trailing:
            c = F.regexp_replace(c, f"(?U){trailing}$", "")
        return c

    return NativeStep(transform=tr)


def _b_lower(**kw) -> NativeStep:
    return NativeStep(transform=F.lower)


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _b_ascii_lower(**kw) -> NativeStep:
    # translate() is pure JVM byte mapping — no ICU case-mapping lock
    # (F.lower serializes all executor threads under concurrency in
    # this Spark build; see kernels.AsciiLowerK)
    return NativeStep(transform=lambda c: F.translate(c, _UPPER, _UPPER.lower()))


def _b_choice(choices, **kw) -> NativeStep:
    import json

    msg = f"Valid options are: {json.dumps(sorted(choices))}"
    return NativeStep(conds=[(lambda c: ~c.isin(list(choices)), "not_valid_choice", msg)])


def _b_max_length(max_length: int, **kw) -> NativeStep:
    return NativeStep(
        conds=[(lambda c: F.length(c) > max_length, "too_long",
                f"Value is too long (length must be < {max_length}).")]
    )


def _b_min_length(min_length: int, **kw) -> NativeStep:
    return NativeStep(
        conds=[(lambda c: F.length(c) < min_length, "too_short",
                f"Value is too short (length must be > {min_length}).")]
    )


def _b_length(length: int, **kw) -> NativeStep:
    return NativeStep(
        conds=[
            (lambda c: F.length(c) > length, "too_long",
             f"Value is too long (length must be exactly {length})."),
            (lambda c: F.length(c) < length, "too_short",
             f"Value is too short (length must be exactly {length})."),
        ]
    )


def _b_max(max_value, exclusive: bool = False, **kw) -> NativeStep:
    op = "<" if exclusive else "<="
    msg = f"Value is too large (must be {op} {max_value})."
    if exclusive:
        return NativeStep(conds=[(lambda c: c >= F.lit(max_value), "too_big", msg)])
    return NativeStep(conds=[(lambda c: c > F.lit(max_value), "too_big", msg)])


def _b_min(min_value, exclusive: bool = False, **kw) -> NativeStep:
    op = ">" if exclusive else ">="
    msg = f"Value is too small (must be {op} {min_value})."
    if exclusive:
        return NativeStep(conds=[(lambda c: c <= F.lit(min_value), "too_small", msg)])
    return NativeStep(conds=[(lambda c: c < F.lit(min_value), "too_small", msg)])


def _b_int(**kw) -> NativeStep:
    # Decimal-parse then reject fractional remainder (number.py:126-140).
    # Divergence vs reference (documented): >38-digit ints overflow.
    def tr(c: Column) -> Column:
        d = c.cast("string").try_cast("decimal(38,18)")
        return F.when(d % 1 != 0, F.lit(None)).otherwise(d.cast("long"))

    # Decimal's parser accepts NaN/Inf spellings which the filter rejects
    # with a distinct code (number.py:94-99); try_cast folds them into
    # NULL, so detect them first to keep code parity with the kernel.
    nonfinite = r"(?i)^[+-]?(s?nan|inf(inity)?)$"
    return NativeStep(
        conds=[
            (lambda c: c.cast("string").rlike(nonfinite),
             "not_finite", "Numeric value expected."),
            (lambda c: c.cast("string").try_cast("decimal(38,18)").isNull(),
             "not_numeric", "Numeric value expected."),
            (lambda c: c.cast("string").try_cast("decimal(38,18)") % 1 != 0,
             "not_int", "Integer value expected."),
        ],
        transform=tr,
    )


# Constructs whose semantics (or validity) differ between Java regex
# (rlike / regexp_extract_all) and the Python 'regex' module the kernel
# fallback compiles with: unicode property classes (\p{Alpha} vs POSIX
# spellings), lookbehind width rules ((?<...), named groups ((?P< py-only),
# \g/\k group refs, numeric backrefs, \A/\Z/\z end anchors (py \Z == java
# \z), \uXXXX escapes, conditionals ((?(, and POSIX [[:alpha:]] classes.
# ALSO the class shorthands \s \S \w \W \b \B \d \D: Java's are
# ASCII-only by default while the reference's (regex module, str
# patterns) are Unicode — 'é' matches \w in the reference but not in
# Java (the same divergence family the hypothesis suite caught in
# strip). And inline flag groups (?i...: Java's case folding is
# ASCII-only without UNICODE_CASE, Python's is Unicode. A pattern
# using any of these compiles ONLY on the kernel path, so both
# strategies always agree; explicit classes ([0-9a-f], [ \t]) keep the
# native fast path.
import re as _stdre

_DIALECT_UNSAFE = _stdre.compile(
    r"\\[pPgkAZzuNsSwWbBdD]|\(\?[a-zA-Z]|\(\?<|\(\?\(|\\[1-9]|\[\[:"
)


def _dialect_safe(pattern: str) -> bool:
    if _DIALECT_UNSAFE.search(pattern):
        return False
    try:  # stdlib re ~ the common subset; rejects java-only syntax too
        _stdre.compile(pattern)
    except _stdre.error:
        return False
    return True


def _b_regex_match(pattern: str, **kw) -> Optional[NativeStep]:
    # Validation-only Regex variant (engine extension): keeps the string
    # instead of returning the match list, so it composes in typed
    # column chains. The reference Regex's list-of-matches behavior is
    # available via the kernel path / 'regex' name.
    if not _dialect_safe(pattern):
        return None
    return NativeStep(
        conds=[(lambda c: ~c.rlike(pattern), "malformed",
                f"Value does not match regular expression {pattern}.")]
    )


def _b_regex(pattern: str, **kw) -> Optional[NativeStep]:
    if not _dialect_safe(pattern):
        return None
    return NativeStep(
        conds=[(lambda c: F.size(F.regexp_extract_all(c, F.lit(pattern), 0)) == 0,
                "malformed", f"Value does not match regular expression {pattern}.")],
        transform=lambda c: F.regexp_extract_all(c, F.lit(pattern), 0),
    )


def _b_noop(**kw) -> NativeStep:
    return NativeStep()


NATIVE_BUILDERS: dict[str, Callable[..., NativeStep]] = {
    "required": _b_required,
    "not_empty": _b_not_empty,
    "optional": _b_optional,
    "strip": _b_strip,
    "lower": _b_lower,
    "ascii_lower": _b_ascii_lower,
    "choice": _b_choice,
    "max_length": _b_max_length,
    "min_length": _b_min_length,
    "length": _b_length,
    "max": _b_max,
    "min": _b_min,
    "int": _b_int,
    "regex_match": _b_regex_match,
    "regex": _b_regex,
    "noop": _b_noop,
}


# --- kernel identity guards --------------------------------------------------
# For chains that must run on the KERNEL (Arrow/Python) path, a guard is
# a Column predicate proving the whole chain is IDENTITY for a row:
# value unchanged AND no error recorded. Rows satisfying the guard can
# skip the Python boundary entirely (the validate operator ships NULL in
# their place — an Arrow null bit instead of the payload bytes — and
# restores the original column JVM-side). Guards are deliberately
# conservative: any row a guard cannot PROVE identity for (NULL guard
# result included) takes the kernel path and gets the reference
# semantics, so false negatives cost only bytes, never correctness.

# printable ASCII + \t + \n: within this set the Unicode kernel is
# provably identity — no \p{C}-not-\s codepoint to strip (\t/\n are
# whitespace, \x20-\x7e are non-control), no \r to rewrite, and ASCII
# is NFC by construction. \x7f (DEL, stripped), \x0b (the RE2/Python
# divergence char) and \r all fall outside the class, so they route to
# the kernel. rlike with a single negated char class measured as cheap
# as length() on ~1KB payloads (translate-delete was 3-4x slower).
_UNICODE_IDENTITY_SAFE = "[^\\x20-\\x7e\\t\\n]"


def _g_required(**kw) -> Callable[[Column], Column]:
    # non-empty string: passes unchanged (NULL length -> NULL -> guard
    # fails -> kernel path fires the reference 'empty' error)
    return lambda c: F.length(c) > 0


def _g_not_empty(allow_none: bool = True, **kw) -> Callable[[Column], Column]:
    return lambda c: F.length(c) > 0


def _g_unicode(encoding: str = "utf-8", normalize: bool = True, **kw):
    if not normalize:
        # str input decodes to itself; nothing else to do
        return lambda c: c.isNotNull()
    return lambda c: ~c.rlike(_UNICODE_IDENTITY_SAFE)


def _g_noop(**kw) -> Callable[[Column], Column]:
    return lambda c: F.lit(True)


IDENTITY_GUARD_BUILDERS: dict[str, Callable[..., Callable[[Column], Column]]] = {
    "required": _g_required,
    "not_empty": _g_not_empty,
    "unicode": _g_unicode,
    "noop": _g_noop,
}


def compile_identity_guard(chain_spec) -> Optional[Callable[[Column], Column]]:
    """Compile a chain spec into a ``col -> Column`` boolean guard that
    is True only when EVERY step of the chain is identity-no-error for
    the value, or None when any step lacks a guard builder. Only valid
    for string-typed input/output chains (the caller checks types)."""
    steps = _normalize_steps(chain_spec)
    if steps is None or not steps:
        return None
    builders = []
    for name, params in steps:
        b = IDENTITY_GUARD_BUILDERS.get(name)
        if b is None:
            return None
        try:
            builders.append(b(**params))
        except TypeError:
            return None

    def guard(col: Column) -> Column:
        g = None
        for b in builders:
            # each step is identity under its own guard, so every
            # step's guard evaluates over the UNCHANGED input column
            gi = b(col)
            g = gi if g is None else (g & gi)
        return F.coalesce(g, F.lit(False))

    return guard


def _normalize_steps(chain_spec) -> list[tuple[str, dict]]:
    steps = []
    for step in chain_spec if isinstance(chain_spec, (list, tuple)) else [chain_spec]:
        if isinstance(step, str):
            steps.append((step, {}))
        elif isinstance(step, (list, tuple)) and len(step) == 2:
            steps.append((step[0], dict(step[1] or {})))
        elif isinstance(step, dict):
            d = dict(step)
            name = d.pop("filter")
            d.update(d.pop("params", {}))
            steps.append((name, d))
        else:
            return None
    return steps


def compile_native_chain(
    field: str, chain_spec, input_type: str | None = None, parts: bool = False
) -> Optional[Callable[[Column], tuple[Column, Column]]]:
    """Compile a chain spec to a ``col -> (value, errors_array)`` Column
    function, or None if any step is not native-able. With
    ``parts=True`` the function instead returns ``(raw_value,
    err_struct)`` — the ungated final transform and the nullable
    first-error struct — for callers that stitch the gated value and
    error channel themselves from named intermediates (see
    ``apply_parts`` below).

    ``input_type``: the Spark simpleString of the input column when
    known. The native builders assume string semantics (e.g. required's
    emptiness test is ``length(cast(string)) == 0``, which an empty
    ARRAY — cast to ``"[]"`` — would never fire); non-string inputs
    route to the kernel path, whose Python ``len()`` matches the
    reference for every container type."""
    if input_type is not None and input_type != "string":
        return None
    steps = _normalize_steps(chain_spec)
    if steps is None:
        return None
    native_steps: list[NativeStep] = []
    for name, params in steps:
        builder = NATIVE_BUILDERS.get(name)
        if builder is None:
            return None
        try:
            built = builder(**params)
        except TypeError:
            return None
        if built is None:  # builder declined (e.g. dialect-unsafe regex)
            return None
        native_steps.append(built)

    def apply_parts(col: Column) -> tuple[Column, Column]:
        # LINEAR composition: one flat CASE over all step conditions.
        #
        # Chains short-circuit at the first failing step (reference
        # base.py:527-531); a flat first-match CASE gives exactly that
        # ordering without nesting the growing value expression inside
        # every later step (which blows up the Catalyst tree
        # exponentially and stalls codegen). Transforms are evaluated
        # unconditionally on the running value — all native transforms
        # are total functions (never throw, null-safe), so evaluating
        # them past an error is harmless: the consumer gates on the err
        # struct and ignores their result.
        #
        # Returns PARTS: (final transformed value NOT err-gated, the
        # nullable first-error struct). Callers that project the parts
        # as named intermediate columns evaluate the chain ONCE even
        # when both the gated value and the error channel are consumed
        # (inlining both into one projection duplicates the whole chain
        # tree — codegen subexpression elimination does not reach
        # across the two CASE trees; measured ~2x the native cost).
        stage_vals = [col]  # value entering step i
        candidates: list[tuple[Column, Column]] = []
        for step in native_steps:
            val_in = stage_vals[-1]
            if step.null_cond is not None:
                code, msg = step.null_cond
                candidates.append((val_in.isNull(), _err_struct(field, code, msg)))
            for cond_fn, code, msg in step.conds:
                guard = cond_fn(val_in) if step.applies_to_null else (val_in.isNotNull() & cond_fn(val_in))
                candidates.append((guard, _err_struct(field, code, msg)))
            stage_vals.append(step.transform(val_in) if step.transform is not None else val_in)

        if candidates:
            err = F.when(candidates[0][0], candidates[0][1])
            for cond, es in candidates[1:]:
                err = err.when(cond, es)
            err = err.otherwise(F.lit(None).cast(ERROR_ELEM_DDL))
        else:
            err = F.lit(None).cast(ERROR_ELEM_DDL)
        return stage_vals[-1], err

    if parts:
        return apply_parts

    def apply(col: Column) -> tuple[Column, Column]:
        raw_val, err = apply_parts(col)
        val = F.when(err.isNull(), raw_val).otherwise(F.lit(None))
        errors = F.when(err.isNotNull(), F.array(err)).otherwise(F.array().cast(ERRORS_DDL))
        return val, errors

    return apply
