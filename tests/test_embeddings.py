"""Embedding transforms (reference transforms/embeddings/
embedding_window.py:17-110, embedding_segment.py:17-120) with the
ROCKET-style random-convolution encoder."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.embeddings import (
    EmbeddingSegmentTransform,
    EmbeddingWindowTransform,
    RandomConvEmbeddingModel,
)

START = dt.datetime(2021, 1, 1)


def test_encoder_deterministic_and_exact():
    m1 = RandomConvEmbeddingModel(output_dims=3, window=5, seed=7)
    m2 = RandomConvEmbeddingModel(output_dims=3, window=5, seed=7)
    v = np.arange(20.0) * 3
    np.testing.assert_array_equal(m1.encode_window(v), m2.encode_window(v))
    # dyadic weights on integer input → exact left-to-right chain
    emb = m1.encode_window(v)
    assert np.isnan(emb[: 4]).all()
    expect = np.zeros(3)
    for lag in range(5):
        expect += m1.weights[:, lag] * v[10 - lag]
    np.testing.assert_array_equal(emb[10], expect)
    # segment embedding = mean of valid rows
    np.testing.assert_array_equal(
        m1.encode_segment(v), emb[4:].sum(axis=0) / 16
    )


def test_encoder_validations():
    with pytest.raises(ValueError, match="positive"):
        RandomConvEmbeddingModel(output_dims=0)
    m = RandomConvEmbeddingModel(output_dims=2, window=4)
    short = m.encode_segment(np.arange(2.0))
    assert np.isnan(short).all()  # no valid window


@pytest.fixture()
def series_df(spark):
    rows = []
    for s, scale in (("a", 1.0), ("b", -2.0)):
        for i in range(30):
            rows.append((s, START + dt.timedelta(hours=i), float(i * scale)))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_window_transform_matches_numpy(spark, series_df):
    model = RandomConvEmbeddingModel(output_dims=2, window=4, seed=0)
    out = EmbeddingWindowTransform(
        in_col="value", embedding_model=model, series_cols=("series",),
        ts_col="ts",
    ).fit_transform(series_df).toPandas()
    assert {"embedding_window_0", "embedding_window_1"} <= set(out.columns)
    for s, scale in (("a", 1.0), ("b", -2.0)):
        sub = out[out["series"] == s].sort_values("ts")
        expect = model.encode_window(np.arange(30.0) * scale)
        np.testing.assert_array_equal(
            sub[["embedding_window_0", "embedding_window_1"]].to_numpy(),
            expect,
        )


def test_segment_transform_constant_per_series(spark, series_df):
    model = RandomConvEmbeddingModel(output_dims=2, window=4, seed=1)
    out = EmbeddingSegmentTransform(
        in_col="value", embedding_model=model, series_cols=("series",),
        ts_col="ts",
    ).fit_transform(series_df).toPandas()
    assert len(out) == 60  # every input row kept
    for s, scale in (("a", 1.0), ("b", -2.0)):
        sub = out[out["series"] == s]
        expect = model.encode_segment(np.arange(30.0) * scale)
        got = sub[["embedding_segment_0", "embedding_segment_1"]]
        assert (got.nunique() == 1).all()  # constant within series
        np.testing.assert_array_equal(got.iloc[0].to_numpy(), expect)


def test_custom_encoder_plugs_in(spark, series_df):
    class MeanEncoder:
        output_dims = 1

        def fit(self, series):
            return self

        def encode_window(self, v):
            return v[:, None]

        def encode_segment(self, v):
            return np.array([np.nanmean(v)])

    out = EmbeddingSegmentTransform(
        in_col="value", embedding_model=MeanEncoder(),
        series_cols=("series",), ts_col="ts",
    ).fit_transform(series_df)
    got = {
        r["series"]: r["embedding_segment_0"]
        for r in out.select("series", "embedding_segment_0").distinct().collect()
    }
    np.testing.assert_allclose(got["a"], np.mean(np.arange(30.0)))
