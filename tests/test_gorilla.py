"""Gorilla codec round-trip tests (FIXTURES.md §B5): constant runs,
alternating signs, NaN/inf bit-patterns, irregular timestamps, hypothesis
property round-trip, and the DataFrame-level encode/decode over tier rows."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etna_spark.codec.gorilla import (
    decode_chunk,
    decode_series,
    encode_chunk,
    encode_series,
)


def _roundtrip(ts, vals):
    blob = encode_chunk(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, vals2 = decode_chunk(blob)
    np.testing.assert_array_equal(np.asarray(ts, np.int64), ts2)
    # bit-pattern identity (covers NaN)
    np.testing.assert_array_equal(
        np.asarray(vals, np.float64).view(np.uint64), vals2.view(np.uint64)
    )
    return blob


def test_empty_and_single():
    _roundtrip([], [])
    _roundtrip([1700000000], [3.14])


def test_constant_run_compresses():
    n = 1000
    ts = 1700000000 + 60 * np.arange(n)
    vals = np.full(n, 42.5)
    blob = _roundtrip(ts, vals)
    # regular grid + constant values → ~1 bit/point for values, 1 for ts
    assert len(blob) < n  # way below 16 bytes/point raw
    assert len(blob) < 300


def test_alternating_and_negative():
    n = 500
    ts = 1700000000 + 60 * np.arange(n)
    vals = np.where(np.arange(n) % 2 == 0, 1.5, -2.25)
    _roundtrip(ts, vals)


def test_nan_inf_bitpatterns():
    ts = 1700000000 + np.arange(6)
    vals = np.array([1.0, np.nan, np.inf, -np.inf, 0.0, -0.0])
    _roundtrip(ts, vals)


def test_irregular_and_backward_timestamps():
    ts = np.array([100, 160, 161, 500000, 500060, 400000], dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    _roundtrip(ts, vals)


def test_large_dod_and_values():
    ts = np.array([0, 10**15, 10**15 + 1, 2 * 10**15], dtype=np.int64)
    vals = np.array([1e300, -1e-300, 5e-324, 1.7976931348623157e308])
    _roundtrip(ts, vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=120,
    )
)
def test_roundtrip_property(pairs):
    ts = [p[0] for p in pairs]
    vals = [p[1] for p in pairs]
    _roundtrip(ts, vals)


def test_dataframe_encode_decode(spark):
    from etna_spark.operators.rollup import rollup
    from etna_spark.synth import token_table

    tt = token_table(spark, 3000, with_tokens=False)
    tier = rollup(tt, "1m")
    enc = encode_series(
        tier, series_cols=("source",), ts_col="bucket_ts", value_col="value_sum"
    )
    enc_rows = enc.collect()
    assert all(r["n_points"] > 0 for r in enc_rows)
    # blobs beat raw 16B/point on the regular-ish tier data
    total_points = sum(r["n_points"] for r in enc_rows)
    total_bytes = sum(len(r["codec_blob"]) for r in enc_rows)
    assert total_bytes < 16 * total_points

    dec = decode_series(enc, series_cols=("source",), ts_col="bucket_ts",
                        value_col="value")
    orig = {
        (r["source"], r["bucket_ts"].timestamp()): float(r["value_sum"])
        for r in tier.collect()
    }
    got = {(r["source"], float(r["bucket_ts"])): r["value"] for r in dec.collect()}
    assert len(orig) == len(got)
    for k, v in orig.items():
        assert got[k] == v, k


def test_vectorized_encoder_bit_identical_to_reference():
    """The vectorized encoder must emit the exact bitstream of the scalar
    reference implementation (format pin, incl. zero-run merges and the
    window-change fast path)."""
    import numpy as np

    from etna_spark.codec.gorilla import encode_chunk, encode_chunk_ref

    rng = np.random.default_rng(42)
    for trial in range(25):
        n = int(rng.integers(0, 400))
        ts = np.cumsum(
            rng.choice([0, 1, 60, 60, 3600, 86400 * 400, 2**34], size=n)
        ).astype(np.int64)
        kind = trial % 4
        if kind == 0:
            vals = rng.choice([1.0, 2.0, 2.0, np.nan, np.inf, -0.0], size=n)
        elif kind == 1:
            vals = np.round(rng.normal(100, 5, n), 2)
        elif kind == 2:
            vals = np.resize(np.repeat(rng.normal(0, 1, max(n // 5, 1)), 5), n)
        else:  # adversarial: forces window changes every point (fallback path)
            vals = np.where(
                np.arange(n) % 2 == 0, rng.normal(0, 1, n), rng.normal(0, 1e300, n)
            )
        assert encode_chunk(ts, vals) == encode_chunk_ref(ts, vals), (
            f"trial {trial} kind {kind} n {n}"
        )
