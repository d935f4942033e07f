"""Multimodal columns — images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/resize/frame-sample stages.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the *codec* step is stubbed because this
environment has no image/audio libraries:

- ``decode_image`` raises ``NotImplementedError`` unless
  ``fake=True``, in which case a clearly-marked deterministic fake
  produces a (h, w, 3) uint8 array from the bytes' hash — enough to
  exercise every downstream stage with reproducible values.

At 100 TB the pattern is: binary column stays in parquet (never
collected), mapInPandas streams Arrow batches through the decoder,
and feature vectors (small) are what shuffles.  Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for video workloads where one row is megabytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table with the canonical schema."""
    i = F.col("id")
    return spark.range(n).select(
        i.alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), i.cast("string")), "UTF-8").alias(
            "payload"
        ),
        (i % 64 + 16).cast("int").alias("width"),
        (i % 48 + 16).cast("int").alias("height"),
        (i * 33 % 10000).cast("int").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """DETERMINISTIC FAKE — stands in for a real image codec.  Pixels
    are a keyed hash stream of the payload, so every stage downstream
    sees stable, content-dependent values."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
    out_col: str = "pixels",
) -> DataFrame:
    """binary -> flattened pixel array + shape columns.

    Real decode is NOT implemented in this environment (no PIL/ffmpeg);
    pass ``fake=True`` for the deterministic stand-in, otherwise this
    raises immediately on the driver."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    cols = df.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema += f", {out_col} array<int>"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                _fake_decode(bytes(p), int(h), int(w)).ravel()
                for p, h, w in zip(pdf[payload_col], pdf["height"], pdf["width"])
            ]
            yield pdf.assign(**{out_col: pixels})

    return df.mapInPandas(_op, schema=schema)


def image_features(
    df: DataFrame, pixels_col: str = "pixels", out_col: str = "features"
) -> DataFrame:
    """Per-image feature vector (channel means/stds + 8-bin luma
    histogram = 14 floats) — vectorized numpy per Arrow batch."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema += f", {out_col} array<double>"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for px, h, w in zip(pdf[pixels_col], pdf["height"], pdf["width"]):
                img = np.asarray(px, dtype=np.float64).reshape(int(h), int(w), 3)
                luma = img.mean(axis=2)
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                f1 = img.mean(axis=(0, 1))
                f2 = img.std(axis=(0, 1))
                feats.append(
                    np.concatenate([f1, f2, hist / luma.size]).tolist()
                )
            yield pdf.assign(**{out_col: feats})

    return df.mapInPandas(_op, schema=schema)


def resize_image(
    df: DataFrame, out_h: int, out_w: int, pixels_col: str = "pixels"
) -> DataFrame:
    """Nearest-neighbor resize (pure numpy indexing — no codec needed).
    Output pixel arrays all have shape (out_h*out_w*3,)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
        if f.name not in ("width", "height")
    )
    schema += f", width int, height int"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for px, h, w in zip(pdf[pixels_col], pdf["height"], pdf["width"]):
                img = np.asarray(px, dtype=np.uint8).reshape(int(h), int(w), 3)
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out_px.append(img[yi][:, xi].ravel().astype(np.int32))
            res = pdf.drop(columns=["width", "height"]).assign(
                **{pixels_col: out_px}
            )
            res["width"] = out_w
            res["height"] = out_h
            yield res

    return df.mapInPandas(_op, schema=schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video -> frame rows: (media_id, frame_idx, ts_ms).  Pure
    expressions; the frame *decode* would attach via decode_image."""
    n_frames = F.greatest(
        (F.col(duration_col) / every_ms).cast("int"), F.lit(1)
    )
    return df.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )
