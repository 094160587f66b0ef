"""Gorilla codec: delta-of-delta timestamps + XOR-compressed float values.

Implements the compression scheme of the Gorilla TSDB paper (Pelkonen et
al., VLDB 2015) as the storage codec for rolled-up series chunks (north-rule
requirement). The reference repo has no codec; this is engine-specific
(FIXTURES.md §B5: round-trip golden tests).

Format (bit-packed, MSB first):
- header: n_points (32 bits). n==0 → empty blob.
- timestamps (int64 seconds): t0 raw 64 bits; delta0 = t1-t0 zigzagged as
  varint-ish classes; then delta-of-delta D with classes
  '0' (D==0), '10'+7b (−63..64), '110'+9b (−255..256), '1110'+12b
  (−2047..2048), '1111'+64b raw (zigzag).
- values (float64): v0 raw 64 bits; then XOR with previous:
  '0' (same), '10' + bits inside the previous meaningful window,
  '11' + 5b leading-zero count + 6b meaningful length + bits.

Lossless for any float64 incl. NaN/±inf (bit-pattern identity) and any
monotone or non-monotone int64 timestamps.

Execution model: encode/decode run inside ``applyInPandas`` over
(series, chunk) groups, each group sorted by time (``sortWithinPartitions``
before encoding — the codec requires time order). The per-chunk Python/numpy
kernel is Arrow-batched; XOR/leading-zero analysis is vectorized in numpy,
bit emission is a tight per-point loop over precomputed arrays (at cluster
scale this kernel is the natural candidate for a native build — the
surrounding plan is unchanged).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            out = bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        else:
            out = bytes(self.buf)
        return out


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _zigzag(x: int) -> int:
    return (x << 1) ^ (x >> 63) if x < 0 else (x << 1)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


_U64 = np.uint64


def encode_chunk(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one sorted chunk: int64 seconds + float64 values."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()

    # -- timestamps: delta-of-delta --
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    deltas = np.diff(ts)
    if n > 1:
        w.write(_zigzag(int(deltas[0])), 64)  # first delta raw (zigzag)
        dod_list = np.diff(deltas) if n > 2 else np.array([], dtype=np.int64)
        for dod in dod_list:
            dod = int(dod)
            if dod == 0:
                w.write(0, 1)
            elif -63 <= dod <= 64:
                w.write(0b10, 2)
                w.write(dod + 63, 7)
            elif -255 <= dod <= 256:
                w.write(0b110, 3)
                w.write(dod + 255, 9)
            elif -2047 <= dod <= 2048:
                w.write(0b1110, 4)
                w.write(dod + 2047, 12)
            else:
                w.write(0b1111, 4)
                w.write(_zigzag(dod), 64)

    # -- values: XOR --
    bits = vals.view(_U64)
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_len = -1, 0  # no previous window
    if n > 1:
        xors = np.bitwise_xor(bits[1:], bits[:-1])
        for x in xors:
            x = int(x)
            if x == 0:
                w.write(0, 1)
                continue
            lead = 64 - x.bit_length()
            trail = (x & -x).bit_length() - 1
            if lead > 31:
                lead = 31  # 5-bit field
            mlen = 64 - lead - trail
            if (
                prev_lead >= 0
                and lead >= prev_lead
                and trail >= 64 - prev_lead - prev_len
            ):
                # fits in previous window: '10' + prev_len bits
                w.write(0b10, 2)
                w.write(x >> (64 - prev_lead - prev_len), prev_len)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mlen - 1, 6)  # 1..64 stored as 0..63
                w.write(x >> trail, mlen)
                prev_lead, prev_len = lead, mlen
            prev ^= x
    return w.bytes()


def decode_chunk(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    r = _BitReader(blob)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals

    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    if n > 1:
        delta = _unzigzag(r.read(64))
        ts[1] = ts[0] + delta
        for i in range(2, n):
            if r.read(1) == 0:
                dod = 0
            elif r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                dod = _unzigzag(r.read(64))
            delta += dod
            ts[i] = ts[i - 1] + delta

    bits = np.empty(n, dtype=np.uint64)
    prev = r.read(64)
    bits[0] = prev
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        if r.read(1) == 0:
            bits[i] = prev
            continue
        if r.read(1) == 0:
            # previous window
            payload = r.read(prev_len)
            x = payload << (64 - prev_lead - prev_len)
        else:
            lead = r.read(5)
            mlen = r.read(6) + 1
            payload = r.read(mlen)
            trail = 64 - lead - mlen
            x = payload << trail
            prev_lead, prev_len = lead, mlen
        prev ^= x
        bits[i] = prev
    vals[:] = bits.view(np.float64)
    return ts, vals


# ---------------------------------------------------------------------------
# DataFrame-level encode/decode
# ---------------------------------------------------------------------------


def encode_series(
    df: DataFrame,
    series_cols=("source",),
    ts_col: str = "bucket_ts",
    value_col: str = "value_sum",
    chunk: str = "day",
) -> DataFrame:
    """(series..., chunk_start, codec_blob, n_points, checksum) — one Gorilla
    blob per series per chunk, rows time-sorted inside each blob."""
    series_cols = list(series_cols)
    out_schema = StructType(
        [df.schema[c] for c in series_cols]
        + [
            StructField("chunk_start", LongType()),
            StructField("codec_blob", BinaryType()),
            StructField("n_points", IntegerType()),
            StructField("checksum", LongType()),
        ]
    )
    chunked = df.withColumn(
        "_chunk", F.date_trunc(chunk, ts_col).cast("long")
    ).select(*series_cols, "_chunk", F.col(ts_col).cast("long").alias("_ts"),
             F.col(value_col).cast("double").alias("_v"))

    # one Spark group per SERIES (not per chunk): per-group applyInPandas
    # dispatch costs dominate the numpy kernel at tier sizes, so the chunk
    # loop lives inside the kernel
    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((pdf["_ts"].to_numpy(),))
        ts_all = pdf["_ts"].to_numpy(np.int64)[order]
        v_all = pdf["_v"].to_numpy(np.float64)[order]
        c_all = pdf["_chunk"].to_numpy(np.int64)[order]
        starts = np.flatnonzero(np.r_[True, c_all[1:] != c_all[:-1]])
        ends = np.r_[starts[1:], len(c_all)]
        out = {
            "chunk_start": [], "codec_blob": [], "n_points": [], "checksum": [],
        }
        for s, e in zip(starts, ends):
            ts, vals = ts_all[s:e], v_all[s:e]
            out["chunk_start"].append(int(c_all[s]))
            out["codec_blob"].append(encode_chunk(ts, vals))
            out["n_points"].append(e - s)
            out["checksum"].append(
                int(
                    (ts.astype(np.uint64).sum() + vals.view(np.uint64).sum())
                    % np.uint64(1 << 63)
                )
            )
        res = pd.DataFrame(out)
        for c in series_cols:
            res[c] = pdf[c].iloc[0]
        return res[series_cols + ["chunk_start", "codec_blob", "n_points", "checksum"]]

    return chunked.groupBy(*series_cols).applyInPandas(enc, out_schema)


def decode_series(
    encoded: DataFrame,
    series_cols=("source",),
    ts_col: str = "bucket_ts",
    value_col: str = "value",
) -> DataFrame:
    series_cols = list(series_cols)
    out_schema = StructType(
        [encoded.schema[c] for c in series_cols]
        + [
            StructField(ts_col, LongType()),
            StructField(value_col, DoubleType(), True),
        ]
    )

    def dec(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, row in pdf.iterrows():
            ts, vals = decode_chunk(bytes(row["codec_blob"]))
            f = pd.DataFrame({ts_col: ts, value_col: vals})
            for c in series_cols:
                f[c] = row[c]
            frames.append(f[series_cols + [ts_col, value_col]])
        if not frames:
            return pd.DataFrame(columns=series_cols + [ts_col, value_col])
        return pd.concat(frames, ignore_index=True)

    return encoded.groupBy(*series_cols).applyInPandas(dec, out_schema)
