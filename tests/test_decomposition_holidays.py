"""Detrend / deseasonality / special days / holiday features."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from etna_spark.functions.holidays import (
    country_holiday_calendar,
    easter_date,
    holiday_transform,
    weekly_holiday_calendar,
)
from etna_spark.operators.decomposition import (
    Deseasonality,
    LinearTrend,
    SpecialDays,
    TheilSenTrend,
)


def _panel(spark, fn, n=30):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for seg, scale in (("s1", 1.0), ("s2", -2.0)):
        for i in range(n):
            rows.append((seg, t0 + dt.timedelta(days=i), float(fn(i) * scale)))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def _vals(df, seg):
    rows = df.filter(f"series='{seg}'").orderBy("ts").select("value").collect()
    return np.array([r[0] for r in rows])


def test_linear_trend_removes_and_restores(spark):
    df = _panel(spark, lambda i: 3.0 * i + 7.0)
    tr = LinearTrend(in_col="value", series_cols=("series",), ts_col="ts").fit(df)
    out = tr.transform(df)
    for seg in ("s1", "s2"):
        np.testing.assert_allclose(_vals(out, seg), np.zeros(30), atol=1e-8)
    back = tr.inverse_transform(out)
    for seg in ("s1", "s2"):
        np.testing.assert_allclose(_vals(back, seg), _vals(df, seg), rtol=1e-12)


def test_theil_sen_robust_to_outlier(spark):
    df = _panel(spark, lambda i: 2.0 * i)
    poked = df.withColumn(
        "value",
        F.when(
            (F.col("series") == "s1") & (F.dayofmonth("ts") == 15), 1000.0
        ).otherwise(F.col("value")),
    )
    tr = TheilSenTrend(in_col="value", series_cols=("series",), ts_col="ts").fit(poked)
    params = {r["series"]: r["slope"] for r in tr._fit_params.collect()}
    assert params["s1"] == pytest_approx(2.0)  # outlier ignored by median slope
    assert params["s2"] == pytest_approx(-4.0)


def pytest_approx(v, rel=1e-6):
    import pytest

    return pytest.approx(v, rel=rel)


def test_deseasonality_round_trip(spark):
    df = _panel(spark, lambda i: [10, 0, 5][i % 3], n=30)
    tr = Deseasonality(period=3, in_col="value", series_cols=("series",),
                       ts_col="ts").fit(df)
    out = tr.transform(df)
    for seg in ("s1", "s2"):
        np.testing.assert_allclose(_vals(out, seg), np.zeros(30), atol=1e-9)
    back = tr.inverse_transform(out)
    np.testing.assert_allclose(_vals(back, "s1"), _vals(df, "s1"), rtol=1e-12)


def test_special_days(spark):
    # Mondays have 100x target → anomalous weekday (positive series only:
    # the detector thresholds on the upper quantile of per-day means)
    t0 = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [("s1", t0 + dt.timedelta(days=i),
          100.0 if (i % 7) == 5 else 1.0) for i in range(28)],
        "series string, ts timestamp, value double",
    )
    # 2020-01-01 is Wednesday; i%7==5 → Monday
    sd = SpecialDays(in_col="value", ts_col="ts").fit(df)
    assert sd.anomaly_weekdays == (0,)
    out = sd.transform(df)
    flagged = out.filter("anomaly_weekdays = 1").select("ts").distinct().collect()
    assert all(r["ts"].weekday() == 0 for r in flagged)


def test_holiday_transform_modes(spark):
    t0 = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [("s", t0 + dt.timedelta(days=i), 1.0) for i in range(14)],
        "series string, ts timestamp, value double",
    )
    cal = weekly_holiday_calendar(spark, "2020-01-01", "2020-01-31", weekday=6)
    b = holiday_transform(df, cal, ts_col="ts", mode="binary")
    flagged = [r["ts"].weekday() for r in b.filter("holiday = 1").collect()]
    assert flagged and all(w == 6 for w in flagged)

    c = holiday_transform(df, cal, ts_col="ts", mode="category")
    names = {r["holiday"] for r in c.collect()}
    assert names == {"sunday", "NO_HOLIDAY"}

    d = holiday_transform(df, cal, ts_col="ts", mode="days_count", period="week")
    shares = {r["ts"].date(): r["holiday"] for r in d.collect()}
    assert all(abs(v - 1 / 7) < 1e-9 for v in shares.values())


def test_easter_computus_known_dates():
    # public record: Gregorian Easter Sundays
    known = {1992: (4, 19), 2000: (4, 23), 2008: (3, 23), 2011: (4, 24),
             2016: (3, 27), 2024: (3, 31), 2038: (4, 25), 1818: (3, 22)}
    for y, (m, day) in known.items():
        assert easter_date(y) == dt.date(y, m, day)


def test_country_holiday_calendar(spark):
    de = {(r["date"], r["holiday_name"])
          for r in country_holiday_calendar(spark, "DE", 2024, 2024).collect()}
    assert (dt.date(2024, 3, 29), "Karfreitag") in de      # Easter−2
    assert (dt.date(2024, 5, 9), "Christi Himmelfahrt") in de  # Easter+39
    assert (dt.date(2024, 10, 3), "Tag der Deutschen Einheit") in de
    us = {(r["date"], r["holiday_name"])
          for r in country_holiday_calendar(spark, "US", 2024, 2024).collect()}
    assert (dt.date(2024, 11, 28), "Thanksgiving") in us   # 4th Thursday
    assert (dt.date(2024, 5, 27), "Memorial Day") in us    # last Monday
    assert (dt.date(2024, 1, 15), "Martin Luther King Jr. Day") in us
    binary = holiday_transform(
        spark.createDataFrame(
            [(dt.datetime(2024, 7, 4),), (dt.datetime(2024, 7, 5),)],
            "ts timestamp"),
        country_holiday_calendar(spark, "US", 2024, 2024), ts_col="ts",
        mode="binary")
    got = {r["ts"].day: r["holiday"] for r in binary.collect()}
    assert got == {4: 1, 5: 0}
