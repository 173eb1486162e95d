"""Default validation specs for the source-code-repo CDC payload.

The flagship chain set (SURVEY.md §7.0): commit/event_seq guards are
pure native; path/lang normalize natively; content goes through the
Unicode kernel (NFC + non-printable strip + LF normalization) — the
semantics that make final-state sha256 equality non-trivial.

v1 is the canonical schema. v2 demonstrates evolution: the incoming
column ``language`` renames to ``lang``. v0 lacks ``lang`` entirely
(old producers): it arrives NULL and the chain's None-passthrough keeps
it NULL (reference rule §1.3.1).
"""

from __future__ import annotations

from filters_spark.engine.evolution import SpecRegistry, VersionSpec
from filters_spark.sources.datagen import LANGS

CANONICAL_COLUMNS = ["repo", "path", "lang", "content"]

FIELD_SPECS_V1 = {
    "repo": {"chain": ["required", "strip", ("max_length", {"max_length": 256})]},
    "path": {"chain": ["required", "strip", ("max_length", {"max_length": 512})]},
    # ascii_lower: outcome-identical to lower() ahead of an ASCII choice
    # set, and avoids the ICU case-mapping lock (kernels.AsciiLowerK)
    "lang": {"chain": ["strip", "ascii_lower", ("choice", {"choices": LANGS})]},
    "content": {"chain": ["required", "unicode"]},
}


def default_registry() -> SpecRegistry:
    reg = SpecRegistry(CANONICAL_COLUMNS)
    reg.register(VersionSpec(0, {**FIELD_SPECS_V1, "lang": {"chain": ["strip", "ascii_lower"]}}))
    reg.register(VersionSpec(1, FIELD_SPECS_V1))
    reg.register(VersionSpec(2, FIELD_SPECS_V1, renames={"language": "lang"}))
    return reg
