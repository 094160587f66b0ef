"""Imputer golden tests, porting the reference's expectations:
/root/reference/tests/test_transforms/test_missing_values/test_impute_transform.py:189-260
(fixture: 11 daily points, seg1 target=-1..9, seg2 target=0,10..100,
NaNs at 2020-01-{01,03,08,09}) plus strategy/invariant cases from the same
suite (:75-186)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from etna_spark.operators.imputation import TimeSeriesImputer

NAN_POS = (0, 2, 7, 8)


def _ts_to_fill(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for seg, targets in (
        ("segment_1", np.arange(-1, 10.0)),
        ("segment_2", np.arange(0, 110.0, 10)),
    ):
        for i, v in enumerate(targets):
            rows.append(
                (seg, t0 + dt.timedelta(days=i), None if i in NAN_POS else float(v))
            )
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def _values(df, seg):
    rows = df.filter(f"series = '{seg}'").orderBy("ts").select("value").collect()
    return np.array([np.nan if r[0] is None else r[0] for r in rows])


SEASONAL_CASES = [
    (1, 3,
     [np.nan, 0, np.nan, 2, 3, 4, 5, 3, 4, 8, 9],
     [np.nan, 10, np.nan, 30, 40, 50, 60, 40, 50, 90, 100]),
    (3, 1,
     [np.nan, 0, 0, 2, 3, 4, 5, 4, 13 / 3, 8, 9],
     [np.nan, 10, 10, 30, 40, 50, 60, 50, 160 / 3, 90, 100]),
    (3, 3,
     [np.nan, 0, np.nan, 2, 3, 4, 5, 3 / 2, 4, 8, 9],
     [np.nan, 10, np.nan, 30, 40, 50, 60, 25, 50, 90, 100]),
    (-1, 3,
     [np.nan, 0, np.nan, 2, 3, 4, 5, 3 / 2, 4, 8, 9],
     [np.nan, 10, np.nan, 30, 40, 50, 60, 25, 50, 90, 100]),
]


@pytest.mark.parametrize("window,seasonality,exp1,exp2", SEASONAL_CASES)
def test_seasonal_golden(spark, window, seasonality, exp1, exp2):
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="seasonal", window=window, seasonality=seasonality,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = imp.transform(df)
    np.testing.assert_allclose(_values(out, "segment_1"), exp1, rtol=1e-12)
    np.testing.assert_allclose(_values(out, "segment_2"), exp2, rtol=1e-12)


def test_running_mean_is_autoregressive(spark):
    # window=3 s=1 case: position 8 uses the value imputed at position 7
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="running_mean", window=3, in_col="value",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = imp.transform(df)
    v = _values(out, "segment_1")
    assert v[7] == 4.0 and v[8] == pytest.approx(13 / 3)


def test_constant_and_leading_nan(spark):
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="constant", constant_value=-99, in_col="value",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    v = _values(imp.transform(df), "segment_1")
    assert np.isnan(v[0])  # leading NaN never imputed
    assert v[2] == -99 and v[7] == -99 and v[8] == -99


def test_forward_fill(spark):
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="forward_fill", in_col="value",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    v = _values(imp.transform(df), "segment_1")
    expected = [np.nan, 0, 0, 2, 3, 4, 5, 5, 5, 8, 9]
    np.testing.assert_allclose(v, expected)


def test_mean_is_train_global(spark):
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="mean", in_col="value", series_cols=("series",), ts_col="ts"
    ).fit(df)
    v = _values(imp.transform(df), "segment_1")
    train_mean = np.nanmean([0, 2, 3, 4, 5, 8, 9])
    assert v[2] == pytest.approx(train_mean)
    assert np.isnan(v[0])


def test_all_null_series_raises(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = [("s1", t0 + dt.timedelta(days=i), None) for i in range(5)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    with pytest.raises(ValueError, match="empty"):
        TimeSeriesImputer(in_col="value", series_cols=("series",), ts_col="ts").fit(df)


def test_new_nulls_stay_null(spark):
    """Nulls introduced after fit are NOT imputed (imputation.py:199-207)."""
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="constant", constant_value=0, in_col="value",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    from pyspark.sql import functions as F

    poked = df.withColumn(
        "value",
        F.when(F.dayofmonth("ts") == 5, F.lit(None)).otherwise(F.col("value")),
    )
    v = _values(imp.transform(poked), "segment_1")
    assert np.isnan(v[4])  # new null at day 5 not in the fit mask
    assert v[2] == 0  # fit-mask position still imputed


def test_inverse_restores_fit_nulls(spark):
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="forward_fill", in_col="value",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    round_trip = imp.inverse_transform(imp.transform(df))
    v = _values(round_trip, "segment_1")
    orig = _values(df, "segment_1")
    np.testing.assert_array_equal(np.isnan(v), np.isnan(orig))
    np.testing.assert_allclose(v[~np.isnan(v)], orig[~np.isnan(orig)])


def test_default_value_fills_unfillable(spark):
    # window=1 s=3: position 2 has no complete season before it → default
    df = _ts_to_fill(spark)
    imp = TimeSeriesImputer(
        strategy="seasonal", window=1, seasonality=3, default_value=-1.5,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    v = _values(imp.transform(df), "segment_1")
    assert v[2] == -1.5
    assert np.isnan(v[0])  # leading NaN still preserved
