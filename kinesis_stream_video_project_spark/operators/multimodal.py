"""Multimodal column plumbing (north-star: image/audio/video at 100 TB).

Media is modeled as opaque ``binary`` payload columns + a typed metadata
struct, processed through Arrow-batched ``mapInPandas`` so each task streams
record batches without materializing a partition in memory — the shape a real
decode/resize/frame-sample pipeline needs on a cluster.

The container has no image/audio codecs (by design), so the decode step is a
clearly-marked deterministic STUB (`_fake_decode`): it derives pseudo-features
from the payload bytes. The Spark-side plumbing — schema, batch iteration,
partitioning, UDF signature — is real and tested; swapping `_fake_decode`
for a PIL/ffmpeg call is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema of the decoded-feature output rows produced by decode_features().
FEATURE_SCHEMA = (
    "media_id bigint, media_type string, payload_bytes bigint, "
    "width int, height int, byte_mean double, byte_entropy double"
)


def media_manifest(docs: DataFrame) -> DataFrame:
    """Synthesize a media manifest from the documents fixture: payload =
    utf-8 bytes of the text (stand-in for image bytes), metadata derived
    deterministically from doc_id."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[float, float]:
    """STUB decode: real deployments replace this with PIL/libav decode.

    Returns deterministic pseudo-features (mean byte value, byte entropy)
    so tests can assert exact values.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    return float(arr.mean()), entropy


def decode_features(manifest: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    mapInPandas streams batches: constant memory per task regardless of
    partition size — the property that matters when payloads are megabytes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].str.len().astype("int64"),
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "byte_mean": np.round([f[0] for f in feats], 4),
                    "byte_entropy": np.round([f[1] for f in feats], 4),
                }
            )

    return manifest.mapInPandas(extract, FEATURE_SCHEMA)
