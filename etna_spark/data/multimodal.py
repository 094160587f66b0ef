"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

The media codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
DECODE step is stubbed: ``decode_stub='fake'`` produces a deterministic fake
decode derived from the payload bytes (shape-correct, reproducible), and
``decode_stub='raise'`` raises NotImplementedError where a real codec would
run. Everything around the stub — schema, partitioning, batch shapes, UDF
signatures, metadata propagation — is real Spark plumbing and is tested.

Scale notes: binary payloads ride the normal columnar path (parquet keeps
them out of row-group stats); mapInPandas streams Arrow batches so a 10 MB
image never materializes more than batch-size rows per worker; per-modality
repartitioning keeps decode workers homogeneous.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def synth_media_table(spark: SparkSession, n_rows: int) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""
    mods = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        m = mods[i % 3]
        payload = hashlib.sha256(f"media_{i}".encode()).digest() * 4
        rows.append(
            (
                f"media_{i:08d}",
                m,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[m],
                64 if m != "audio" else None,
                48 if m != "audio" else None,
                1000 * (i % 30 + 1) if m != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: tile payload bytes into HxWx1 floats."""
    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
    need = width * height
    tiled = np.resize(raw, need).astype(np.float32) / 255.0
    return tiled.reshape(height, width)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("feat_mean", FloatType(), True),
        StructField("feat_std", FloatType(), True),
        StructField("feature_vec", ArrayType(FloatType()), True),
    ]
)


def extract_features(
    df: DataFrame, decode_stub: str = "fake", feat_dim: int = 16
) -> DataFrame:
    """Decode → feature-extract via mapInPandas (Arrow batch streaming).

    With a real codec, only ``_decode`` changes; the plan, batch shape, and
    output schema stay identical.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "modality": [], "feat_mean": [],
                "feat_std": [], "feature_vec": [],
            }
            for _, row in pdf.iterrows():
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "media codecs unavailable in this environment; "
                        "install PIL/ffmpeg and replace the decode stub"
                    )
                # Arrow gives null metadata as NaN (truthy!) — isna-guard it
                w = 32 if pd.isna(row["width"]) else int(row["width"])
                h = 32 if pd.isna(row["height"]) else int(row["height"])
                px = _fake_pixels(row["payload"], w, h)
                vec = np.resize(px.mean(axis=0), feat_dim).astype(np.float32)
                out["media_id"].append(row["media_id"])
                out["modality"].append(row["modality"])
                out["feat_mean"].append(float(px.mean()))
                out["feat_std"].append(float(px.std()))
                out["feature_vec"].append(vec.tolist())
            yield pd.DataFrame(out)

    # keep decode workers modality-homogeneous (real codecs have very
    # different cost profiles per modality)
    return df.repartition("modality").mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, every_ms: int = 1000, decode_stub: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (UDTF-like
    1→N explode inside mapInPandas)."""
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame_checksum", LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [],
                   "frame_checksum": []}
            for _, row in pdf.iterrows():
                if decode_stub == "raise":
                    raise NotImplementedError("video codec unavailable")
                dur = 0 if pd.isna(row["duration_ms"]) else int(row["duration_ms"])
                for j, ts in enumerate(range(0, dur, every_ms)):
                    chk = int.from_bytes(
                        hashlib.sha256(
                            bytes(row["payload"]) + ts.to_bytes(8, "little")
                        ).digest()[:8],
                        "little",
                        signed=False,
                    ) >> 1
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(j)
                    out["frame_ts_ms"].append(ts)
                    out["frame_checksum"].append(chk)
            yield pd.DataFrame(out)

    return df.filter(F.col("modality") == "video").mapInPandas(kernel, schema)
