"""Multimodal payload stages: resize / frame-sample / feature-extract.

The image/audio/video payload rides as an opaque `binary` column with
typed metadata (schema.IMAGE_SCHEMA, per BASELINE.json input_hint). The
Spark-side plumbing here — schemas, Arrow batch shapes, partitioning,
pure-Column index math — is real and oracled; the pixel/codec kernels
are deterministic fakes (codec libraries are absent in this container;
`sources/images.decode_real` documents the swap-in point). Production
drops PIL/libvips/ffmpeg into the SAME mapInPandas bodies.

Scale shape: every stage is embarrassingly parallel over the fact table
(no shuffle at all); frame sampling is pure Column math (sequence +
posexplode inside whole-stage codegen, zero Python)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_MOD_A = 1009
FEATURE_MOD_B = 997


def resize_dims(w: Column, h: Column, max_side: int) -> tuple[Column, Column]:
    """Aspect-preserving integer target dimensions: the longer side is
    clamped to `max_side`, the shorter scales by the same integer ratio
    (floor), minimum 1px. Pure Column math — identical in the SQL oracle."""
    long_side = F.greatest(w, h)
    scale_w = F.greatest(F.floor(w * max_side / long_side).cast("int"), F.lit(1))
    scale_h = F.greatest(F.floor(h * max_side / long_side).cast("int"), F.lit(1))
    keep = long_side <= max_side
    return (
        F.when(keep, w).otherwise(scale_w),
        F.when(keep, h).otherwise(scale_h),
    )


def resize_images(images: DataFrame, max_side: int) -> DataFrame:
    """Resize stage: Arrow-batched mapInPandas over the binary payload.

    Dimension math is real (resize_dims); the pixel resample is a
    deterministic fake — output bytes are the input truncated
    proportionally to the pixel-count ratio — so byte counts behave like
    a real resampler's buffers while staying codec-free. Output schema:
    (image_id, w, h, fmt, caption, phash, bytes) with the new dims."""
    out_w, out_h = resize_dims(F.col("w"), F.col("h"), max_side)
    staged = images.select(
        "image_id", "bytes", "fmt", "caption", "phash",
        F.col("w").alias("__w0"), F.col("h").alias("__h0"),
        out_w.alias("w"), out_h.alias("h"),
    )

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def clip(row):
                b = row["bytes"]
                if b is None:
                    return None
                denom = max(int(row["__w0"]) * int(row["__h0"]), 1)
                n = max(1, (len(b) * int(row["w"]) * int(row["h"])) // denom)
                return b[:n]

            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "w": pdf["w"].astype("int32"),
                    "h": pdf["h"].astype("int32"),
                    "fmt": pdf["fmt"],
                    "caption": pdf["caption"],
                    "phash": pdf["phash"],
                    "bytes": pdf.apply(clip, axis=1),
                }
            )

    schema = (
        "image_id string, w int, h int, fmt string, caption string, "
        "phash long, bytes binary"
    )
    return staged.mapInPandas(fake_resize, schema=schema)


def sample_frames(videos: DataFrame, every_n: int, max_frames: int = 240) -> DataFrame:
    """Frame-sampling stage — PURE Column math, zero Python.

    Treats the binary payload as a frame container: frame count derives
    deterministically from the payload hash (1 + phash % max_frames — a
    real container would read it from the header), every `every_n`-th
    frame index is emitted via sequence + posexplode (whole-stage
    codegen), each with its byte offset into the payload. The per-frame
    DECODE that would follow is the pandas_udf stage of
    `sources/images.decode_stub_meta` / `decode_real`.
    Returns (image_id, frame_idx, n_frames, byte_off)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    n_frames = (F.lit(1) + F.pmod(F.col("phash"), F.lit(max_frames))).cast("int")
    staged = videos.select(
        "image_id",
        n_frames.alias("n_frames"),
        F.length("bytes").cast("long").alias("n_bytes"),
    )
    idxs = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return staged.select(
        "image_id",
        "n_frames",
        "n_bytes",
        F.explode(idxs).alias("frame_idx"),
    ).select(
        "image_id",
        "frame_idx",
        "n_frames",
        (F.col("frame_idx") * F.floor(F.col("n_bytes") / F.col("n_frames")).cast("long")).alias("byte_off"),
    )


def extract_features(images: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-extraction stage: Arrow-batched mapInPandas producing an
    `array<float>` embedding column (the input shape for the ANN / near-
    dup operators). The embedding is a deterministic fake derived from
    phash (a real encoder runs a vision model over the decoded pixels in
    this exact batch shape); values are portable integer math so the gate
    oracle reproduces them. Returns (image_id, embedding)."""

    def fake_encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # +1 keeps the vector nonzero (cosine downstream divides by norm)
            base = pdf["phash"].to_numpy("int64") % FEATURE_MOD_A + 1  # (n,)
            i = np.arange(1, dim + 1, dtype="int64")  # (dim,)
            vals = (base[:, None] * i[None, :]) % FEATURE_MOD_B / float(FEATURE_MOD_B)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "embedding": list(vals.astype("float64")),
                }
            )

    return images.select("image_id", "phash", "bytes").mapInPandas(
        fake_encode, schema="image_id string, embedding array<double>"
    )
