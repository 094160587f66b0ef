"""Golden tests for the window-statistics family, porting the reference's
hand-computed expectations verbatim (they pin current-row-inclusive windows,
seasonality stride, min_periods, fillna):
/root/reference/tests/test_transforms/test_math/test_statistics_transform.py:110-330.

Two fixtures from the reference (:22-52):
- simple: target = [0..9]
- agg:    target = [-1,1,3,2,4,9,8,5,6,0]
- agg_nan: same with target[3] = NaN
Each duplicated across two segments to exercise the partitioned path.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from etna_spark.operators.lags import lag_transform
from etna_spark.operators.window_stats import window_stat


def _panel(spark, values):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for seg in ("segment_1", "segment_2"):
        for i, v in enumerate(values):
            rows.append(
                (seg, t0 + dt.timedelta(days=i), None if v is None else float(v))
            )
    return spark.createDataFrame(rows, "series string, ts timestamp, target double")


def _result(df, col="result", seg="segment_1"):
    rows = (
        df.filter(f"series = '{seg}'").orderBy("ts").select(col).collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


SIMPLE = list(range(10))
AGG = [-1, 1, 3, 2, 4, 9, 8, 5, 6, 0]
AGG_NAN = [-1, 1, 3, None, 4, 9, 8, 5, 6, 0]


MEAN_CASES = [
    (10, 1, 1, 1, 0, [0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5]),
    (-1, 1, 1, 1, 0, [0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5]),
    (-1, 2, 1, 1, 0, [0, 1, 1, 2, 2, 3, 3, 4, 4, 5]),
    (3, 1, 1, 1, -17, [0, 0.5, 1, 2, 3, 4, 5, 6, 7, 8]),
    (3, 1, 0.5, 1, -17,
     [0, 0.5, 2.5 / 3, 4.25 / 3, 2, 7.75 / 3, 9.5 / 3, 11.25 / 3, 13 / 3, 14.75 / 3]),
    (3, 1, 0.5, 3, -12,
     [-12, -12, 2.5 / 3, 4.25 / 3, 2, 7.75 / 3, 9.5 / 3, 11.25 / 3, 13 / 3, 14.75 / 3]),
    (3, 2, 1, 1, -17, [0, 1, 1, 2, 2, 3, 4, 5, 6, 7]),
]


@pytest.mark.parametrize("window,seasonality,alpha,periods,fillna,expected", MEAN_CASES)
def test_mean(spark, window, seasonality, alpha, periods, fillna, expected):
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "mean", window,
        seasonality=seasonality, min_periods=periods, fillna=fillna, alpha=alpha,
    )
    for seg in ("segment_1", "segment_2"):
        np.testing.assert_allclose(_result(out, seg=seg), expected, rtol=1e-12)


MIN_CASES = [
    (10, 1, 1, 0, [0] * 10),
    (-1, 1, 1, 0, [0] * 10),
    (3, 1, 1, -17, [0, 0, 0, 1, 2, 3, 4, 5, 6, 7]),
    (3, 2, 1, -17, [0, 1, 0, 1, 0, 1, 2, 3, 4, 5]),
]


@pytest.mark.parametrize("window,seasonality,periods,fillna,expected", MIN_CASES)
def test_min(spark, window, seasonality, periods, fillna, expected):
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "min", window,
        seasonality=seasonality, min_periods=periods, fillna=fillna,
    )
    np.testing.assert_allclose(_result(out), expected)


MAX_CASES = [
    (10, 1, 0, list(range(10))),
    (-1, 1, 0, list(range(10))),
    (3, 2, -17, [-17, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
]


@pytest.mark.parametrize("window,periods,fillna,expected", MAX_CASES)
def test_max(spark, window, periods, fillna, expected):
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "max", window, min_periods=periods, fillna=fillna
    )
    np.testing.assert_allclose(_result(out), expected)


MEDIAN_CASES = [
    (3, 3, -17, [-17, -17, 1, 2, 3, 4, 5, 6, 7, 8]),
    (-1, 1, -17, [0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5]),
]


@pytest.mark.parametrize("window,periods,fillna,expected", MEDIAN_CASES)
def test_median(spark, window, periods, fillna, expected):
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "median", window, min_periods=periods, fillna=fillna
    )
    np.testing.assert_allclose(_result(out), expected)


STD_CASES = [
    (3, 3, -17, [-17, -17, 1, 1, 1, 1, 1, 1, 1, 1]),
    (3, 1, -17, [-17, 0.5**0.5, 1, 1, 1, 1, 1, 1, 1, 1]),
]


@pytest.mark.parametrize("window,periods,fillna,expected", STD_CASES)
def test_std(spark, window, periods, fillna, expected):
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "std", window, min_periods=periods, fillna=fillna
    )
    np.testing.assert_allclose(_result(out), expected, rtol=1e-12)


MAD_CASES = [
    (3, 3, -17, [-17, -17, 4 / 3, 2 / 3, 2 / 3, 8 / 3, 2, 14 / 9, 10 / 9, 22 / 9]),
    (4, 1, -17, [0, 1, 4 / 3, 1.25, 1, 2.25, 2.75, 2, 1.5, 9.5 / 4]),
    (-1, 1, 0, [0, 1, 4 / 3, 1.25, 1.44, 7 / 3, 138 / 49, 2.625, 208 / 81, 27 / 10]),
]


@pytest.mark.parametrize("window,periods,fillna,expected", MAD_CASES)
def test_mad(spark, window, periods, fillna, expected):
    df = _panel(spark, AGG)
    out = window_stat(
        df, "target", "result", "mad", window, min_periods=periods, fillna=fillna
    )
    np.testing.assert_allclose(_result(out), expected, rtol=1e-9)


def test_mad_with_nans(spark):
    df = _panel(spark, AGG_NAN)
    out = window_stat(df, "target", "result", "mad", 3, min_periods=3, fillna=-17)
    np.testing.assert_allclose(
        _result(out), [-17, -17, 4 / 3, -17, -17, -17, 2, 14 / 9, 10 / 9, 22 / 9],
        rtol=1e-9,
    )


MMD_CASES = [
    (10, 1, 0, list(range(10))),
    (-1, 1, 0, list(range(10))),
    (3, 2, -17, [-17, 1, 2, 2, 2, 2, 2, 2, 2, 2]),
]


@pytest.mark.parametrize("window,periods,fillna,expected", MMD_CASES)
def test_minmaxdiff(spark, window, periods, fillna, expected):
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "minmaxdiff", window,
        min_periods=periods, fillna=fillna,
    )
    np.testing.assert_allclose(_result(out), expected)


def test_sum_with_nan(spark):
    df = _panel(spark, AGG_NAN)
    out = window_stat(df, "target", "result", "sum", 10, min_periods=1, fillna=0)
    np.testing.assert_allclose(_result(out), [-1, 0, 3, 3, 7, 16, 24, 29, 35, 35])


def test_quantile(spark):
    # q=0.5 over full history ≡ expanding median (pins nanquantile path)
    df = _panel(spark, SIMPLE)
    out = window_stat(
        df, "target", "result", "quantile", -1, min_periods=1, fillna=0, quantile=0.5
    )
    np.testing.assert_allclose(
        _result(out), [0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5]
    )


def test_native_equals_kernel(spark):
    """Native SQL path and numpy kernel must agree on s=1 aggregates
    (including null handling) — run both on data with a gap."""
    df = _panel(spark, AGG_NAN)
    for agg in ("mean", "sum", "min", "max", "std", "minmaxdiff"):
        native = window_stat(df, "target", "r", agg, 4, min_periods=2, fillna=-5)
        # force the kernel path via seasonality=1 pUDF by using quantile-less
        # call with alpha≠1 trick only valid for mean; instead call the
        # kernel directly through a strided window of seasonality 1 via
        # median? Simpler: compare native to kernel by invoking the module
        # internals.
        from etna_spark.operators.window_stats import _kernel
        import numpy as np

        x = np.array([v if v is not None else np.nan for v in AGG_NAN], float)
        expected = _kernel(x, agg, 4, 1, 2, -5.0, 1.0, None, 1)
        np.testing.assert_allclose(_result(native, col="r"), expected, rtol=1e-12)


def test_lag_transform(spark):
    df = _panel(spark, SIMPLE)
    out = lag_transform(df, "target", [1, 3], series_cols=("series",), ts_col="ts")
    l1 = _result(out, col="target_lag_1")
    l3 = _result(out, col="target_lag_3")
    np.testing.assert_allclose(l1[1:], np.arange(9))
    assert np.isnan(l1[0])
    np.testing.assert_allclose(l3[3:], np.arange(7))
    assert np.isnan(l3[:3]).all()


def test_lag_int_means_range(spark):
    df = _panel(spark, SIMPLE)
    out = lag_transform(df, "target", 3)
    assert {"target_lag_1", "target_lag_2", "target_lag_3"} <= set(out.columns)


def test_lag_rejects_nonpositive(spark):
    df = _panel(spark, SIMPLE)
    with pytest.raises(ValueError):
        lag_transform(df, "target", [0])
