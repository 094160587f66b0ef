"""STLTransform tests — ported from the reference's tolerance-based suite
(/root/reference/tests/test_transforms/test_decomposition/test_stl_transform.py):
transform removes trend+seasonality (atol 0.3), inverse round-trips, leading
NaNs are preserved, middle NaNs raise, future timestamps get model forecast +
seasonal-naive season (the STLForecast.get_prediction analog)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.stl import STLTransform, stl_decompose

START = dt.datetime(2020, 1, 1)


def _one_segment(seg: str, coef: float, period: int, magnitude: float, n: int = 61):
    i = np.arange(n)
    y = np.sin(2 * np.pi * i / period) * magnitude + coef * i
    return pd.DataFrame(
        {
            "series": seg,
            "ts": [START + dt.timedelta(days=int(k)) for k in i],
            "value": y,
        }
    )


@pytest.fixture(scope="module")
def ts_df(spark):
    pdf = pd.concat(
        [
            _one_segment("segment_1", 0.1, 7, 1.0),
            _one_segment("segment_2", 0.05, 7, 2.0),
        ]
    )
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def ts_df_nan_head(spark, ts_df):
    return ts_df.withColumn(
        "value",
        F.when(
            (F.col("series") == "segment_1")
            & (F.col("ts") < F.lit(START + dt.timedelta(days=2))),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    ).cache()


@pytest.mark.parametrize("model", ["arima", "holt"])
def test_transform_removes_trend_and_season(spark, ts_df, model):
    t = STLTransform(period=7, model=model)
    out = t.fit_transform(ts_df).toPandas()
    assert len(out) == 122
    np.testing.assert_allclose(out["value"], 0.0, atol=0.3)


@pytest.mark.parametrize("model", ["arima", "holt"])
def test_transform_with_nan_head(spark, ts_df_nan_head, model):
    t = STLTransform(period=7, model=model)
    out = t.fit_transform(ts_df_nan_head).toPandas()
    # the two leading NaNs stay NaN; everything else ≈ 0
    assert out["value"].isna().sum() == 2
    np.testing.assert_allclose(out["value"].dropna(), 0.0, atol=0.3)


@pytest.mark.parametrize("model", ["arima", "holt"])
def test_transform_with_nan_tails(spark, ts_df, model):
    df = ts_df.withColumn(
        "value",
        F.when(
            (F.col("series") == "segment_1")
            & (
                (F.col("ts") < F.lit(START + dt.timedelta(days=2)))
                | (F.col("ts") > F.lit(START + dt.timedelta(days=58)))
            ),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    t = STLTransform(period=7, model=model)
    out = t.fit_transform(df).toPandas()
    assert out["value"].isna().sum() == 4
    np.testing.assert_allclose(out["value"].dropna(), 0.0, atol=0.3)


@pytest.mark.parametrize("model", ["arima", "holt"])
@pytest.mark.parametrize("robust", [False, True])
def test_inverse_round_trip(spark, ts_df_nan_head, model, robust):
    t = STLTransform(period=7, model=model, robust=robust)
    transformed = t.fit_transform(ts_df_nan_head)
    back = t.inverse_transform(transformed).toPandas()
    orig = ts_df_nan_head.toPandas()
    m = back.set_index(["series", "ts"])["value"]
    o = orig.set_index(["series", "ts"])["value"]
    m, o = m.sort_index(), o.sort_index()
    assert m.isna().equals(o.isna())
    np.testing.assert_allclose(m.dropna(), o.dropna(), atol=1e-9)


@pytest.mark.parametrize("model", ["arima", "holt"])
def test_future_prediction(spark, ts_df, model):
    """Train on all but the last 3 points; transform of the future rows must
    remove trend+season there too (STLForecast.get_prediction out-of-sample)."""
    cutoff = START + dt.timedelta(days=57)
    train = ts_df.filter(F.col("ts") <= F.lit(cutoff))
    future = ts_df.filter(F.col("ts") > F.lit(cutoff))
    t = STLTransform(period=7, model=model)
    t.fit(train)
    out = t.transform(future).toPandas()
    assert len(out) == 6
    np.testing.assert_allclose(out["value"], 0.0, atol=0.2)


def test_nan_in_middle_raises(spark, ts_df):
    df = ts_df.withColumn(
        "value",
        F.when(
            F.col("ts") == F.lit(START + dt.timedelta(days=30)),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    t = STLTransform(period=7)
    with pytest.raises(Exception, match="NaNs in the middle"):
        t.fit_transform(df).collect()


def test_not_fitted_raises(spark, ts_df):
    t = STLTransform(period=7)
    with pytest.raises(ValueError, match="Transform is not fitted!"):
        t.transform(ts_df)
    with pytest.raises(ValueError, match="Transform is not fitted!"):
        t.inverse_transform(ts_df)


def test_invalid_model_raises():
    with pytest.raises(ValueError, match="Model should be"):
        STLTransform(period=7, model="10")


def test_stl_decompose_reconstruction_exact():
    """season + trend + resid == y bit-for-bit (definition of resid)."""
    rng = np.random.default_rng(7)
    y = np.sin(2 * np.pi * np.arange(200) / 12) * 3 + 0.02 * np.arange(200) + rng.normal(0, 0.1, 200)
    s, t, r = stl_decompose(y, 12)
    np.testing.assert_allclose(s + t + r, y, rtol=0, atol=1e-12)
    # the decomposition actually explains the series: residual ≈ the injected
    # noise (σ=0.1), season ≈ the injected sin
    assert r.std() < 0.15
    assert np.abs(s - np.sin(2 * np.pi * np.arange(200) / 12) * 3).max() < 0.3


def test_stl_robust_downweights_outliers():
    rng = np.random.default_rng(3)
    i = np.arange(140)
    y = np.sin(2 * np.pi * i / 7) + 0.05 * i + rng.normal(0, 0.1, 140)
    y_dirty = y.copy()
    y_dirty[40] += 25.0  # single spike
    s_r, t_r, r_r = stl_decompose(y_dirty, 7, robust=True)
    s_n, t_n, _ = stl_decompose(y_dirty, 7, robust=False)
    # robust mode pushes the spike into the residual and keeps the fit close
    # to the clean series; non-robust smears it into season/trend
    assert r_r[40] > 20.0
    fit_err_r = np.abs(np.delete(s_r + t_r - y, 40)).max()
    fit_err_n = np.abs(np.delete(s_n + t_n - y, 40)).max()
    assert fit_err_r < fit_err_n
    assert fit_err_r < 0.75


def test_short_series_raises_clear_error():
    # a series with fewer than 2 full periods used to die with an obscure
    # numpy broadcast error inside the applyInPandas kernel
    with pytest.raises(ValueError, match="too short for STL"):
        stl_decompose(np.arange(10.0), period=24)
