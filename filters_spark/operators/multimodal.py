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
        "plug a real decoder into decode_images(decode_stub=False)"
    )


def decode_images(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """binary payload -> image features. Stub path derives
    deterministic pseudo-features from the payload bytes (same schema
    and batch shape as a real decoder)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                _real_decode_guard()
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
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


def sample_frames(df: DataFrame, every_ms: int = 1000, decode_stub: bool = True) -> DataFrame:
    """video payload -> sampled frames (one row per frame). Stub emits
    hash-derived 16-byte pseudo-frames at the real cadence."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                _real_decode_guard()
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"], pdf["payload"]):
                n = max(int((dur or 0) // every_ms), 1)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(hashlib.sha256((payload or b"") + i.to_bytes(4, "big")).digest()[:16])
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, FRAME_SAMPLE_DDL)


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
