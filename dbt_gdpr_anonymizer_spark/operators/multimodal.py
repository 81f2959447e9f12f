"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No reference equivalent — LLM-pipeline extension surface. Media payloads are
``binary`` columns with a typed metadata struct; decode/feature-extract run
as Arrow-batched ``mapInPandas`` (the only sane shape for per-item Python
work at scale: one Python roundtrip per batch, not per row, and the
partitioning of the input is preserved — no shuffle).

The actual codec step is STUBBED: image/audio libraries are not available in
this environment. ``decode_features`` takes a ``decoder`` callable; the
default ``fake_decoder`` is deterministic (md5-seeded) so the distributed
plumbing — schema, batching, partition behavior — is fully real and tested.
Swap in a Pillow/ffmpeg-backed decoder in production; ``real_decoder``
documents the expected signature and raises ``NotImplementedError`` here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "fake_decoder",
    "real_decoder",
    "decode_features",
    "sample_frames",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

Decoder = Callable[[bytes], list[float]]


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real codec: FEATURE_DIM floats in [0,1)
    derived from md5 of the payload. Keeps tests/benchmarks reproducible."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def real_decoder(payload: bytes) -> list[float]:  # pragma: no cover - stub
    """Production decoder slot (Pillow/torchvision/ffmpeg): decode the
    payload, resize/normalize, return a feature vector. Not available in
    this environment."""
    raise NotImplementedError(
        "media codecs are not installed here; pass decode_features(df, "
        "decoder=your_fn) with a Pillow/ffmpeg-backed callable"
    )


def decode_features(
    df: DataFrame, decoder: Decoder = fake_decoder, batch_hint: int | None = None
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    Python cost is per Arrow batch, not per row; input partitioning is
    preserved (narrow transformation — no shuffle). ``batch_hint`` tunes
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` upstream if needed.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(decoder),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    frames: DataFrame,
    every_n: int = 10,
    *,
    media_col: str = "media_id",
    index_col: str = "frame_idx",
) -> DataFrame:
    """Deterministic frame sampling over an exploded frames table
    (media_id, frame_idx, payload): keep every ``every_n``-th frame.
    A pure filter — pushed to the scan, no shuffle, no Python."""
    return frames.filter((F.col(index_col) % every_n) == 0)
