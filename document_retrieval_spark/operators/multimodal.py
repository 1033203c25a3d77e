"""Multimodal column handling: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video next to text. The
Spark-side plumbing here is real and tested — schema, partition-friendly
layout, Arrow batch shape through `mapInPandas` — while the actual media
decode is STUBBED (this container has no image/audio libraries): the default
`decoder` is a deterministic fake (seeded by the payload bytes) and
`decode_media(..., decoder=None, strict=True)` raises NotImplementedError at
the exact point a real libjpeg/ffmpeg call would go.

Schema convention:
  media(media_id string, doc_id string, kind string,   -- image|audio|video
        payload binary, mime string, width int, height int,
        duration_ms int, ts timestamp)

Feature extraction yields fixed-width float arrays (same shape a CLIP-style
encoder would emit) so the similarity operators (operators/similarity.py)
compose downstream unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 32


def fake_decoder(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode+encode: sha256-seeded
    pseudo-features. Replace with a real decoder in production."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = fake_decoder,
    batch_limit: int = 256,
) -> DataFrame:
    """media -> (media_id, kind, n_bytes, features array<float>).

    Arrow-batched mapInPandas: payloads stream through in bounded batches
    (never materialize a partition of binaries at once). With decoder=None
    this raises NotImplementedError where the real media library belongs.
    """
    if decoder is None:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this environment; pass decoder=fake_decoder for the plumbing "
            "path or install a decoder and wrap it here"
        )

    out_schema = (
        "media_id string, kind string, n_bytes long, features array<float>"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo : lo + batch_limit]
                feats = [decoder(bytes(p)).tolist() for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "kind": chunk["kind"].to_numpy(),
                        "n_bytes": chunk["payload"].map(len).to_numpy(),
                        "features": feats,
                    }
                )

    return media.mapInPandas(extract, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_idx, offset_ms) rows
    for each sampled frame — the real frame grab is the stubbed decode step.
    Pure built-ins (sequence + explode): demonstrates the fan-out shape that
    keeps per-task memory bounded regardless of video length."""
    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "offset_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .withColumn("frame_idx", (F.col("offset_ms") / every_ms).cast("int"))
        .select("media_id", "frame_idx", "offset_ms")
    )
