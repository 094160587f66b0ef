"""Differencing round-trip and semantics tests, mirroring the reference's
inference suite for DifferencingTransform
(/root/reference/etna/transforms/math/differencing.py:21-493)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.differencing import Differencing


def _panel(spark, n=30, leading_nulls=0):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    rng = np.random.RandomState(7)
    for seg, scale in (("s1", 1.0), ("s2", 10.0)):
        vals = np.cumsum(rng.randn(n)) * scale
        for i in range(n):
            v = None if i < leading_nulls and seg == "s1" else float(vals[i])
            rows.append((seg, t0 + dt.timedelta(days=i), v))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def _vals(df, seg):
    rows = df.filter(f"series='{seg}'").orderBy("ts").select("value").collect()
    return np.array([np.nan if r[0] is None else r[0] for r in rows])


@pytest.mark.parametrize("period,order", [(1, 1), (3, 1), (1, 2), (2, 2)])
def test_diff_forward_matches_numpy(spark, period, order):
    df = _panel(spark)
    d = Differencing(in_col="value", period=period, order=order,
                     series_cols=("series",), ts_col="ts").fit(df)
    out = _vals(d.transform(df), "s1")
    expected = _vals(df, "s1")
    for _ in range(order):
        shifted = np.concatenate([np.full(period, np.nan), expected[:-period]])
        expected = expected - shifted
    np.testing.assert_allclose(out, expected, rtol=1e-12, equal_nan=True)


@pytest.mark.parametrize("period,order", [(1, 1), (3, 1), (1, 2), (2, 2), (3, 2)])
def test_train_round_trip(spark, period, order):
    df = _panel(spark)
    d = Differencing(in_col="value", period=period, order=order,
                     series_cols=("series",), ts_col="ts").fit(df)
    rt = d.inverse_transform(d.transform(df))
    for seg in ("s1", "s2"):
        np.testing.assert_allclose(_vals(rt, seg), _vals(df, seg), rtol=1e-9)


@pytest.mark.parametrize("period,order", [(1, 1), (2, 1), (2, 2)])
def test_test_range_reconstruction(spark, period, order):
    """Differenced future values + saved train tail reconstruct the future —
    the forecast inverse path (differencing.py:196-220)."""
    full = _panel(spark, n=40)
    t_split = dt.datetime(2020, 1, 31)
    train = full.filter(F.col("ts") < F.lit(t_split))
    test = full.filter(F.col("ts") >= F.lit(t_split))
    d = Differencing(in_col="value", period=period, order=order,
                     series_cols=("series",), ts_col="ts").fit(train)
    # what the "model" would emit: true differenced values on the test range
    diffed_full = d.transform(full)
    diffed_test = diffed_full.filter(F.col("ts") >= F.lit(t_split))
    rec = d.inverse_transform(diffed_test)
    for seg in ("s1", "s2"):
        np.testing.assert_allclose(_vals(rec, seg), _vals(test, seg), rtol=1e-9)


def test_leading_nulls_tolerated_interior_raise(spark):
    df = _panel(spark, leading_nulls=3)
    Differencing(in_col="value", series_cols=("series",), ts_col="ts").fit(df)  # ok
    poked = df.withColumn(
        "value",
        F.when(
            (F.col("series") == "s2") & (F.dayofmonth("ts") == 15), F.lit(None)
        ).otherwise(F.col("value")),
    )
    with pytest.raises(ValueError, match="no NaNs inside"):
        Differencing(in_col="value", series_cols=("series",), ts_col="ts").fit(poked)


def test_invalid_params():
    with pytest.raises(ValueError):
        Differencing(period=0)
    with pytest.raises(ValueError):
        Differencing(order=0)
