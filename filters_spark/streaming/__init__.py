"""Structured Streaming front-end for the CDC engine."""

from filters_spark.streaming.stream import start_cdc_stream, tail_directory  # noqa: F401
