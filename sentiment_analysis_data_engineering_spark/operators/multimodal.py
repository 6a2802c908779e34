"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Extension layer (no reference counterpart). The container has no
image/audio codecs, so the DECODE step is stubbed (deterministic fake
or NotImplementedError), while everything Spark-side is real and
tested: the schema contract, Arrow-batched ``mapInPandas`` plumbing,
batch shapes, and partition behavior. Swapping the stub for Pillow/
librosa/pyav is a one-function change inside the batch iterator.

Design for 100 TB of media:
- binary payloads never pass through Python row-at-a-time — only
  Arrow record batches (``mapInPandas``);
- metadata (width/height/codec/duration) lives in a sibling struct so
  filters on it prune BEFORE any decode;
- feature extraction yields fixed-width vectors → downstream joins and
  ANN run on columnar data, payload column dropped as early as
  possible (column pruning does this for free when callers select).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image",
    "extract_features",
    "resize_image",
    "sample_frames",
]

#: The engine's media-table contract: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
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


def attach_media_metadata(df: DataFrame, kind: str, mime: str) -> DataFrame:
    """Wrap a (media_id, content binary) frame into the media contract
    with constant kind/mime and size-derived placeholder metadata."""
    return df.select(
        "media_id",
        F.lit(kind).alias("kind"),
        "content",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: a seeded 8x8
    'pixel' grid derived from the payload's sha256. Replace with
    Pillow's ``Image.open`` when codecs are available."""
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer(digest * 2, dtype=np.uint8)[: 8 * 8]
    return rng.reshape(8, 8).astype(np.float32) / 255.0


DECODE_IS_STUBBED = True  # flip when real codecs are installed


def decode_image(df: DataFrame, *, strict: bool = False) -> DataFrame:
    """Decode the binary payload into (media_id, height, width, mean_px).

    ``strict=True`` raises NotImplementedError from inside the executor
    batch (the honest behavior when a real decode is required);
    ``strict=False`` runs the deterministic fake so the full plumbing —
    Arrow batches in, Arrow batches out — is exercised end to end.
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("mean_px", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "image decode requires Pillow; container has no codecs "
                    "(engine stub — plumbing is real, decode is not)"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                px = _fake_decode(bytes(payload))
                rows.append(
                    (int(mid), px.shape[0], px.shape[1], float(px.mean()))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "mean_px"]
            )

    return df.select("media_id", "content").mapInPandas(batches, out_schema)


def extract_features(df: DataFrame, *, dim: int = 16) -> DataFrame:
    """Fixed-width feature vector per media item (deterministic fake:
    sha256-seeded), Arrow-batched. Output (media_id, features
    array<float>) feeds directly into similarity.cosine_topk."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint8)
                vec = (raw.reshape(dim, 4).sum(axis=1).astype(np.float32) / 1020.0)
                ids.append(int(mid))
                feats.append(vec.tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select("media_id", "content").mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling STUB: emits the (media_id, frame_ts_ms)
    schedule from metadata alone — no decode touched. The real frame
    grab (pyav) plugs into the same mapInPandas seam as decode_image."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_image(
    df: DataFrame, *, height: int = 4, width: int = 4, strict: bool = False
) -> DataFrame:
    """Resize STUB on the same mapInPandas seam as decode_image —
    (media_id, height, width, pixels array<float>), row-major.

    The fake path decodes (8x8 deterministic grid) then nearest-
    neighbor samples to (height, width) — the real implementation
    swaps in Pillow's ``Image.resize`` inside the same batch loop;
    schema, Arrow batching, and partition behavior are identical.
    ``strict=True`` raises NotImplementedError from the executor, the
    honest no-codec behavior."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "image resize requires Pillow; container has no codecs "
                    "(engine stub — plumbing is real, resize is not)"
                )
            ids, pixels = [], []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                px = _fake_decode(bytes(payload))
                ys = np.linspace(0, px.shape[0] - 1, height).round().astype(int)
                xs = np.linspace(0, px.shape[1] - 1, width).round().astype(int)
                ids.append(int(mid))
                pixels.append(px[np.ix_(ys, xs)].ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "height": height,
                    "width": width,
                    "pixels": pixels,
                }
            )

    return df.select("media_id", "content").mapInPandas(batches, out_schema)
