"""Density / prediction-interval / isolation-forest outlier detectors.

Density golden cases are ported verbatim from the reference
(/root/reference/tests/test_analysis/test_outliers/test_density_outliers.py:
simple_window fixture + 5 parameter combos)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.outliers import (
    PointOutliersTransform,
    _density_outlier_indices,
    _iforest_scores,
    _norm_ppf,
    detect_outliers_density,
    detect_outliers_isolation_forest,
    detect_outliers_prediction_interval,
)

START = dt.datetime(2021, 1, 1)


@pytest.mark.parametrize(
    "window_size,n_neighbors,distance_threshold,expected",
    (
        (5, 2, 2.5, [4, 5, 6]),
        (6, 3, 10, [4, 5]),
        (2, 1, 1.8, [3, 4, 5, 6]),
        (3, 1, 120, []),
        (100, 2, 1.5, [2, 4, 5, 6]),
    ),
)
def test_density_indices_golden(window_size, n_neighbors, distance_threshold, expected):
    y = np.array([4, 5, 6, 4, 100, 200, 2], dtype=float)
    got = _density_outlier_indices(y, window_size, distance_threshold, n_neighbors)
    np.testing.assert_array_equal(got, expected)


def _outliers_df(spark):
    """The reference's outliers_tsds fixture flattened: sin series with
    injected anomalies at known timestamps."""
    t1 = np.arange(31)
    y1 = np.sin(t1).astype(float)
    y1[10] += 10
    t2 = np.arange(40)
    y2 = np.sin(t2).astype(float)
    y2[8] += 8
    y2[15] = 2
    y2[26] -= 12
    rows = []
    for s, (tt, yy) in {"1": (t1, y1), "2": (t2, y2)}.items():
        for k, v in zip(tt, yy):
            rows.append(("seg" + s, START + dt.timedelta(days=int(k)), float(v)))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_density_spark_finds_injected_anomalies(spark):
    df = _outliers_df(spark)
    out = detect_outliers_density(
        df, window_size=7, distance_coef=2, n_neighbors=3
    ).collect()
    found = {(r["series"], (r["ts"] - START).days) for r in out}
    assert ("seg1", 10) in found
    assert ("seg2", 8) in found and ("seg2", 26) in found
    # no false positives on the clean sin points beyond the injected ones
    assert len(found) <= 5


def test_density_constant_series_no_outliers(spark):
    rows = [("c", START + dt.timedelta(days=i), 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    assert detect_outliers_density(df).count() == 0


def test_norm_ppf():
    assert abs(_norm_ppf(0.975) - 1.959964) < 1e-5
    assert abs(_norm_ppf(0.5)) < 1e-9
    assert abs(_norm_ppf(0.025) + 1.959964) < 1e-5


def test_prediction_interval_spark(spark):
    df = _outliers_df(spark)
    out = detect_outliers_prediction_interval(
        df, period=7, interval_width=0.95, step_seconds=86400
    ).collect()
    found = {(r["series"], (r["ts"] - START).days) for r in out}
    assert ("seg1", 10) in found
    assert ("seg2", 8) in found and ("seg2", 26) in found


def test_iforest_scores_isolate_extreme_point():
    rng = np.random.default_rng(1)
    X = np.concatenate([rng.normal(0, 1, 200), [30.0]])[:, None]
    s = _iforest_scores(X, n_estimators=100, max_samples=256, seed=0)
    assert np.argmax(s) == 200
    assert s[200] > 0.6


def test_isolation_forest_spark(spark):
    df = _outliers_df(spark)
    out = detect_outliers_isolation_forest(
        df, contamination=0.08, seed=7
    ).collect()
    found = {(r["series"], (r["ts"] - START).days) for r in out}
    assert ("seg1", 10) in found
    assert ("seg2", 8) in found and ("seg2", 26) in found


@pytest.mark.parametrize("method,params", [
    ("density", dict(window_size=7, distance_coef=2, n_neighbors=3)),
    ("isolation_forest", dict(contamination=0.08, seed=7)),
    ("prediction_interval", dict(period=7, step_seconds=86400)),
])
def test_transform_nulls_and_restores(spark, method, params):
    df = _outliers_df(spark)
    t = PointOutliersTransform(
        method=method, in_col="value", series_cols=("series",), ts_col="ts",
        **params,
    ).fit(df)
    nulled = t.transform(df)
    n_out = nulled.filter(F.col("value").isNull()).count()
    assert n_out >= 3
    back = t.inverse_transform(nulled)
    assert back.filter(F.col("value").isNull()).count() == 0
    orig = {(r["series"], r["ts"]): r["value"] for r in df.collect()}
    rest = {(r["series"], r["ts"]): r["value"] for r in back.collect()}
    assert orig == rest


def test_iqr_with_stl_adjust_finds_seasonal_outlier(spark):
    """STL-adjusted IQR (reference rolling_statistics.py:159-280): on a
    strongly seasonal series a +4σ spike hides inside the seasonal range —
    only the trend/seasonality-adjusted detector isolates it."""
    from etna_spark.operators.outliers import detect_outliers_iqr

    rng = np.random.default_rng(4)
    i = np.arange(140)
    y = np.sin(2 * np.pi * i / 7) * 10 + 0.05 * i + rng.normal(0, 0.5, 140)
    y[70] += 6.0  # small vs the ±10 seasonal swing
    rows = [("s", START + dt.timedelta(days=int(k)), float(v))
            for k, v in zip(i, y)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    plain = detect_outliers_iqr(df, window_size=30, iqr_scale=1.5)
    adjusted = detect_outliers_iqr(
        df, window_size=30, iqr_scale=1.5, trend=True, seasonality=True,
        period=7,
    )
    adj_days = {(r["ts"] - START).days for r in adjusted.collect()}
    plain_days = {(r["ts"] - START).days for r in plain.collect()}
    assert 70 in adj_days and len(adj_days) < 20
    assert 70 not in plain_days  # masked by the seasonal swing


def test_iqr_scale_validation(spark):
    from etna_spark.operators.outliers import detect_outliers_iqr

    df = _outliers_df(spark)
    with pytest.raises(ValueError, match="positive"):
        detect_outliers_iqr(df, iqr_scale=0.0)
