"""Iceberg-semantics copy-on-write lake table (no Iceberg jar needed)."""

from filters_spark.lake.table import LakeTable  # noqa: F401
