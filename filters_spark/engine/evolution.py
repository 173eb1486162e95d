"""Mid-stream schema evolution via versioned declarative specs.

An added or renamed column is a new ``VersionSpec`` — data, not code —
mirroring how the reference's FilterMapper takes its schema as a dict
(reference filters/complex.py:194-262) and resolves filter names through
a registry (filters/extensions.py:54-117).

Per event batch, each schema_version slice is normalized to the
canonical column set (renames applied, missing columns filled with
NULL so the field chain's None-handling decides: ``required`` fields
dead-letter, ``optional`` fields take defaults) and validated with the
version's own chains.
"""

from __future__ import annotations

import json
from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class VersionSpec:
    """One schema version: validation chains + rename map to canonical."""

    def __init__(
        self,
        version: int,
        field_specs: Mapping[str, dict],
        renames: Mapping[str, str] | None = None,
    ):
        self.version = version
        self.field_specs = dict(field_specs)
        self.renames = dict(renames or {})  # incoming name -> canonical name

    def to_json(self) -> str:
        return json.dumps(
            {"version": self.version, "field_specs": self.field_specs, "renames": self.renames},
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "VersionSpec":
        d = json.loads(s)
        return cls(d["version"], d["field_specs"], d.get("renames"))


class SpecRegistry:
    """version -> VersionSpec; knows the canonical payload columns."""

    def __init__(self, canonical_columns: list[str]):
        self.canonical_columns = list(canonical_columns)
        self.versions: dict[int, VersionSpec] = {}

    # names owned by the engine/table row layout PLUS the derived output
    # columns of dead_letters() (errors, errors_json, first_code,
    # first_key) and changes() (snapshot_id) — a field spec may not
    # claim any of them (ev_cols / read DDLs / derived selects would
    # emit duplicate or ambiguous columns and fail far from the
    # register() call that caused it)
    RESERVED = frozenset(
        {
            "commit", "event_seq", "op", "schema_version", "content_sha",
            "errors", "errors_json", "first_code", "first_key", "snapshot_id",
        }
    )

    def register(self, spec: VersionSpec) -> "SpecRegistry":
        # schema evolution, column ADD: a version validating a field
        # outside the current canonical set WIDENS the set (appended in
        # spec order, so existing column positions never move). Earlier
        # versions simply have no chain for it -> NULL through
        # validation; table files written before the widening read the
        # column as NULL (lake/table.py read schemas).
        for field in spec.field_specs:
            if field in self.RESERVED or field.startswith("_"):
                raise ValueError(
                    f"field name {field!r} is reserved by the engine row "
                    "layout and cannot be a canonical payload column"
                )
        self.versions[spec.version] = spec
        for field in spec.field_specs:
            if field not in self.canonical_columns:
                self.canonical_columns.append(field)
        return self

    @property
    def latest(self) -> int:
        return max(self.versions)

    def get(self, version: int) -> VersionSpec:
        if version not in self.versions:
            raise KeyError(f"no spec registered for schema_version={version}")
        return self.versions[version]

    def normalize(self, events: DataFrame, version: int, passthrough: list[str]) -> DataFrame:
        """Map a version slice onto the canonical column set: apply
        renames, fill absent canonical columns with NULL."""
        spec = self.get(version)
        df = events
        for old, new in spec.renames.items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        cols = []
        for c in passthrough:
            cols.append(F.col(c))
        for c in self.canonical_columns:
            if c in df.columns:
                cols.append(F.col(c))
            else:
                cols.append(F.lit(None).cast("string").alias(c))
        return df.select(*cols)
