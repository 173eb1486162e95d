"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract inner loop is library-dependent (PIL,
torchaudio, decord are NOT in this container), so the media codecs are
stubbed: ``decode_stub=True`` (default here) produces deterministic
fake features with the real schema, batch shape, and partitioning, and
the UDF signatures are exactly what a real decoder drops into.
Everything Spark-side — schema, Arrow batching via ``mapInPandas``,
binary-column handling, partition sizing — is real and tested.

Scale notes: media rows are wide (MBs); ``mapInPandas`` with a small
``maxRecordsPerBatch`` keeps Arrow batches bounded, and the decode
stage should run after a ``repartition`` sized so one partition's
binaries fit in executor memory (see ``suggest_partitions``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms long, payload binary"
)

IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, n_bytes long, "
    "phash long, mean_luma double"
)

FRAME_SAMPLE_DDL = "media_id long, frame_idx int, ts_ms long, frame binary"


def _real_decode_guard():
    raise NotImplementedError(
        "media codecs (PIL/libav) are not available in this environment; "
        "plug a real decoder into decode_images(decode_fn=...) / "
        "sample_frames(frame_fn=...)"
    )


def decode_images(df: DataFrame, decode_stub: bool = True, decode_fn=None) -> DataFrame:
    """binary payload -> image features. Stub path derives
    deterministic pseudo-features from the payload bytes (same schema
    and batch shape as a real decoder).

    ``decode_fn(payload: bytes | None) -> (width, height, phash,
    mean_luma)``: the REAL-codec injection seam. A PIL drop-in is
    ``lambda b: _features(Image.open(io.BytesIO(b)))`` — the callable
    is shipped to executors inside the Arrow UDF and called once per
    row; everything around it (schema, batching, partitioning) is
    unchanged. When given, it takes precedence over ``decode_stub``;
    ``decode_stub=False`` without a ``decode_fn`` raises (no codecs in
    this container)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            if decode_fn is not None:
                decoded = payloads.map(decode_fn)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": decoded.map(lambda t: t[0]).astype("int32"),
                        "height": decoded.map(lambda t: t[1]).astype("int32"),
                        "n_bytes": n_bytes,
                        "phash": decoded.map(lambda t: t[2]).astype("int64"),
                        "mean_luma": decoded.map(lambda t: float(t[3])),
                    }
                )
                continue
            if not decode_stub:
                _real_decode_guard()
            # deterministic fake decode: hash-derived phash + luma
            phash = payloads.map(
                lambda b: int.from_bytes(
                    __import__("hashlib").sha256(b or b"").digest()[:8], "big", signed=True
                )
            )
            luma = (phash.astype("float64").abs() % 255) / 255.0
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": n_bytes,
                    "phash": phash,
                    "mean_luma": luma.round(6),
                }
            )

    return df.mapInPandas(gen, IMAGE_FEATURES_DDL)


def sample_frames(df: DataFrame, every_ms: int = 1000, decode_stub: bool = True,
                  frame_fn=None) -> DataFrame:
    """video payload -> sampled frames (one row per frame). Stub emits
    hash-derived 16-byte pseudo-frames at the real cadence.

    ``frame_fn(payload: bytes, frame_idx: int, ts_ms: int) -> bytes``:
    the REAL-codec injection seam (a decord/PyAV drop-in extracts the
    frame at ``ts_ms`` from the container bytes; cache the opened
    container keyed on the payload object to decode it once per media
    — frames arrive contiguous and in order). Takes precedence over
    ``decode_stub``; ``decode_stub=False`` without it raises.

    The cadence expansion (one row per sampled timestamp) is NATIVE —
    ``explode(sequence(...))`` on the Spark side, so row multiplication
    happens JVM-side with codegen and only the per-frame codec decode
    crosses into Python (a real decoder is inherently per-frame; the
    stub mirrors that shape).

    Arrow-transfer shape: the video payload is shipped into Python
    ONCE per media, not once per frame — a naive explode would
    replicate a 50 MB payload across every cadence row (600 frames ->
    ~30 GB over the Arrow boundary). The same whole-stage projection
    that explodes the cadence nulls the payload on every row but
    ``frame_idx == 0``; explode output is partition-local and ordered,
    so the decoder carries the current payload across a media's
    contiguous frame rows (Arrow batch boundaries included — one
    generator instance streams a whole partition in order)."""
    n = F.greatest(
        F.floor(F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(every_ms)).cast("int"),
        F.lit(1),
    )
    cadence = df.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n - F.lit(1))).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx").cast("long") * F.lit(every_ms)).alias("ts_ms"),
        F.when(F.col("frame_idx") == 0, F.col("payload")).alias("payload"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cur = b""  # current media's payload (frames arrive contiguous, in order)
        for pdf in batches:
            if frame_fn is None and not decode_stub:
                _real_decode_guard()
            frames = []
            for i, t, p in zip(pdf["frame_idx"], pdf["ts_ms"], pdf["payload"]):
                if int(i) == 0:
                    cur = p or b""  # frame 0 CARRIES the payload (may be null media)
                if frame_fn is not None:
                    frames.append(frame_fn(cur, int(i), int(t)))
                else:
                    frames.append(
                        hashlib.sha256(cur + int(i).to_bytes(4, "big")).digest()[:16]
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "frame": frames,
                }
            )

    return cadence.mapInPandas(gen, FRAME_SAMPLE_DDL)


def gen_media(spark, n_rows: int, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table (binary payloads derived from
    row ids; sizes 1-64 KiB)."""
    df = spark.range(n_rows)
    h = F.xxhash64(F.lit(seed), "id")
    payload = F.encode(
        F.repeat(F.conv(F.pmod(h, F.lit(2**31)).cast("string"), 10, 16), (F.pmod(h, 512) + 16).cast("int")),
        "utf-8",
    )
    return df.select(
        F.col("id").alias("media_id"),
        F.when(F.pmod(h, 3) == 0, "image").when(F.pmod(h, 3) == 1, "audio").otherwise("video").alias("kind"),
        F.when(F.pmod(h, 3) == 0, "image/png").when(F.pmod(h, 3) == 1, "audio/wav").otherwise("video/mp4").alias("mime"),
        (F.pmod(h, 1920) + 1).cast("int").alias("width"),
        (F.pmod(h, 1080) + 1).cast("int").alias("height"),
        (F.pmod(h, 60_000) + 1000).alias("duration_ms"),
        payload.alias("payload"),
    )


def suggest_partitions(total_bytes: int, target_partition_bytes: int = 128 << 20) -> int:
    """Partition count so one partition's media payloads fit memory."""
    return max(1, int(total_bytes / target_partition_bytes))
