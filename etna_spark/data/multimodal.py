"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

Binary PPM (P6) images are decoded FOR REAL by a self-contained numpy
parser (:func:`decode_ppm` — the format is a tiny ASCII header plus raw
RGB bytes, so no external codec is needed), and the decode dispatch
recognizes the ``P6`` magic regardless of the stub mode.

Every other format's codec (PIL/ffmpeg/librosa) is NOT in this container,
so their DECODE step is stubbed: ``decode_stub='fake'`` produces a
deterministic fake decode derived from the payload bytes (shape-correct,
reproducible), and ``decode_stub='raise'`` raises NotImplementedError
where a real codec would run. Everything around the stub — schema,
partitioning, batch shapes, UDF signatures, metadata propagation — is
real Spark plumbing and is tested.

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


def encode_ppm(px: np.ndarray, comment: str | None = None) -> bytes:
    """Serialize an H×W×3 uint8 array as binary PPM (P6, maxval 255)."""
    px = np.asarray(px)
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_ppm expects an H×W×3 uint8 array")
    h, w = px.shape[:2]
    head = f"P6\n"
    if comment:
        head += f"# {comment}\n"
    head += f"{w} {h}\n255\n"
    return head.encode("ascii") + px.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Pure-numpy binary PPM (P6) decoder — returns H×W×3 uint8.

    Handles the full header grammar (netpbm spec): any whitespace between
    tokens, ``#``-to-end-of-line comments anywhere in the header, and
    exactly ONE whitespace byte between the maxval token and the raster.
    Raises ValueError on malformed input; 2-byte samples (maxval > 255)
    are rejected as unsupported rather than mis-parsed."""
    buf = bytes(data)
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        ch = buf[pos]
        if ch in b" \t\r\n":
            pos += 1
        elif ch == ord("#"):
            nl = buf.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
        elif ord("0") <= ch <= ord("9"):
            end = pos
            while end < len(buf) and ord("0") <= buf[end] <= ord("9"):
                end += 1
            tokens.append(int(buf[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad PPM header byte {ch!r} at {pos}")
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM samples are not supported")
    if maxval <= 0 or w <= 0 or h <= 0:
        raise ValueError("bad PPM dimensions/maxval")
    # exactly one whitespace byte separates maxval from the raster
    if pos >= len(buf) or buf[pos] not in b" \t\r\n":
        raise ValueError("missing raster separator")
    pos += 1
    need = w * h * 3
    raster = buf[pos:pos + need]
    if len(raster) != need:
        raise ValueError(
            f"truncated PPM raster: need {need} bytes, got {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


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
                payload = bytes(row["payload"])
                if payload[:2] == b"P6":
                    # self-contained format → REAL decode, any stub mode
                    px = decode_ppm(payload).astype(np.float32) / 255.0
                elif decode_stub == "raise":
                    raise NotImplementedError(
                        "media codecs unavailable in this environment; "
                        "install PIL/ffmpeg and replace the decode stub "
                        "(binary PPM decodes for real — see decode_ppm)"
                    )
                else:
                    # Arrow gives null metadata as NaN (truthy!) — isna-guard
                    w = 32 if pd.isna(row["width"]) else int(row["width"])
                    h = 32 if pd.isna(row["height"]) else int(row["height"])
                    px = _fake_pixels(payload, w, h)
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
