"""Calendar features vs a pandas oracle + ResampleWithDistribution golden
tests (reference fixtures:
/root/reference/tests/test_transforms/test_missing_values/conftest.py:104-237)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from etna_spark.functions.calendar import (
    DATE_FLAGS,
    TIME_FLAGS,
    add_date_flags,
    add_fourier_features,
    add_time_flags,
    fourier_mods,
)
from etna_spark.operators.resample import ResampleWithDistribution


# ---------------------------------------------------------------------------
# date / time flags
# ---------------------------------------------------------------------------

def _pandas_date_flags(ts: pd.Timestamp) -> dict:
    first = ts.replace(day=1)
    doy = ts.dayofyear
    return {
        "day_number_in_week": ts.weekday(),
        "day_number_in_month": ts.day,
        "day_number_in_year": doy + 1 if (not ts.is_leap_year and ts.month >= 3) else doy,
        "week_number_in_month": int(math.ceil((ts.day + first.weekday()) / 7.0)),
        "week_number_in_year": ts.weekofyear,
        "month_number_in_year": ts.month,
        "season_number": ts.month % 12 // 3 + 1,
        "year_number": ts.year,
        "is_weekend": ts.weekday() in (5, 6),
    }


def test_date_flags_vs_pandas(spark):
    # spans leap/non-leap Februaries, year/month boundaries
    stamps = pd.date_range("2019-12-25", "2020-03-10", freq="D").append(
        pd.date_range("2021-02-20", "2021-03-05", freq="D")
    )
    df = spark.createDataFrame([(t.to_pydatetime(),) for t in stamps], "ts timestamp")
    out = add_date_flags(df, "ts").orderBy("ts").collect()
    for row, t in zip(out, stamps):
        exp = _pandas_date_flags(t)
        for flag in DATE_FLAGS:
            assert row[flag] == exp[flag], f"{flag} @ {t}: {row[flag]} != {exp[flag]}"


def test_time_flags_vs_pandas(spark):
    stamps = pd.date_range("2020-01-01", periods=300, freq="17min")
    df = spark.createDataFrame([(t.to_pydatetime(),) for t in stamps], "ts timestamp")
    out = add_time_flags(df, "ts").orderBy("ts").collect()
    for row, t in zip(out, stamps):
        assert row["minute_in_hour_number"] == t.minute
        assert row["fifteen_minutes_in_hour_number"] == t.minute // 15
        assert row["half_hour_number"] == t.minute // 30
        assert row["hour_number"] == t.hour
        assert row["half_day_number"] == t.hour // 12
        assert row["one_third_day_number"] == t.hour // 8


# ---------------------------------------------------------------------------
# fourier
# ---------------------------------------------------------------------------

def test_fourier_mods_rules():
    assert fourier_mods(7, 2, None) == [1, 2, 3, 4]
    assert fourier_mods(3, 2, None) == [1, 2]  # mods capped below period
    with pytest.raises(ValueError):
        fourier_mods(1.5, 1, None)
    with pytest.raises(ValueError):
        fourier_mods(7, None, [0])
    with pytest.raises(ValueError):
        fourier_mods(7, 1, [1])


def test_fourier_values(spark):
    t0 = dt.datetime(2020, 1, 1)
    stamps = [t0 + dt.timedelta(days=i) for i in range(21)]
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    out = (
        add_fourier_features(df, period=7, order=2, ts_col="ts", step_seconds=86400)
        .orderBy("ts")
        .collect()
    )
    for i, row in enumerate(out):
        elapsed = i / 7
        assert row["fourier_1"] == pytest.approx(np.sin(2 * np.pi * 1 * elapsed), abs=1e-12)
        assert row["fourier_2"] == pytest.approx(np.sin(2 * np.pi * 1 * elapsed + np.pi / 2), abs=1e-12)
        assert row["fourier_3"] == pytest.approx(np.sin(2 * np.pi * 2 * elapsed), abs=1e-12)
        assert row["fourier_4"] == pytest.approx(np.sin(2 * np.pi * 2 * elapsed + np.pi / 2), abs=1e-12)


# ---------------------------------------------------------------------------
# resample with distribution
# ---------------------------------------------------------------------------

def _daily_exog_panel(spark):
    """48 hourly points from 2020-01-05; seg1 target≡1, seg2 target=[1]+23·[0];
    daily exog 2 (day 1) and 40 (day 2) at midnight — the reference's
    ``daily_exog_ts`` fixture."""
    t0 = dt.datetime(2020, 1, 5)
    rows = []
    for seg, pattern in (("segment_1", None), ("segment_2", 24)):
        for i in range(48):
            ts = t0 + dt.timedelta(hours=i)
            target = 1.0 if pattern is None else (1.0 if i % 24 == 0 else 0.0)
            exog = float([2, 40][i // 24]) if i % 24 == 0 else None
            rows.append((seg, ts, target, exog))
    return spark.createDataFrame(
        rows, "series string, ts timestamp, target double, regressor_exog double"
    )


def _col(df, seg, col):
    rows = df.filter(f"series='{seg}'").orderBy("ts").select(col).collect()
    return np.array([np.nan if r[0] is None else r[0] for r in rows])


def test_resample_distribution_golden(spark):
    df = _daily_exog_panel(spark)
    r = ResampleWithDistribution(
        in_col="regressor_exog", distribution_col="target", inplace=True,
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = r.transform(df)
    # seg1: uniform distribution 1/24 → 2/24 on day 1, 40/24 on day 2
    v1 = _col(out, "segment_1", "regressor_exog")
    np.testing.assert_allclose(v1[:24], np.full(24, 2 / 24), rtol=1e-12)
    np.testing.assert_allclose(v1[24:], np.full(24, 40 / 24), rtol=1e-12)
    # seg2: all mass at fold 0 → full value at midnight, 0 elsewhere
    v2 = _col(out, "segment_2", "regressor_exog")
    exp2 = np.zeros(48)
    exp2[0], exp2[24] = 2, 40
    np.testing.assert_allclose(v2, exp2, rtol=1e-12)


def test_resample_non_inplace(spark):
    df = _daily_exog_panel(spark)
    r = ResampleWithDistribution(
        in_col="regressor_exog", distribution_col="target", inplace=False,
        out_col="exog_res", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = r.transform(df)
    assert "exog_res" in out.columns
    v = _col(out, "segment_1", "regressor_exog")  # original untouched
    assert np.isnan(v[1]) and v[0] == 2


def test_resample_anchor_offset(spark):
    """in_column starting later than the grid: pre-anchor rows fold backwards
    (reference folds_for_left_tie, resample.py:58-69)."""
    t0 = dt.datetime(2020, 1, 6)
    rows = []
    for i in range(21):  # daily grid, 3 weeks
        ts = t0 + dt.timedelta(days=i)
        exog = float(7 * (1 + (i - 2) // 7)) if (i - 2) % 7 == 0 and i >= 2 else None
        rows.append(("s", ts, 1.0, exog))
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, target double, exog double"
    )
    r = ResampleWithDistribution(
        in_col="exog", distribution_col="target", inplace=True,
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = _col(r.transform(df), "s", "exog")
    # uniform target → share 1/7; pre-anchor rows have no value to ffill → NaN
    assert np.isnan(out[0]) and np.isnan(out[1])
    np.testing.assert_allclose(out[2:9], np.full(7, 7 / 7 / 7 * 7), rtol=1e-12)  # 7·(1/7)=1
    np.testing.assert_allclose(out[9:16], np.full(7, 2.0), rtol=1e-12)  # 14·(1/7)


def test_resample_incompatible_freq_raises(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for i in range(30):
        ts = t0 + dt.timedelta(minutes=7 * i)  # 7-minute grid
        exog = 1.0 if i in (0, 9) else None  # 63-min spacing: not a multiple? 63%7==0 → pick 10
        rows.append(("s", ts, 1.0, exog))
    # use an in_col spacing that is NOT a multiple of the grid: single point
    rows2 = [("s", t0 + dt.timedelta(minutes=7 * i), 1.0, 1.0 if i == 0 else None) for i in range(30)]
    df2 = spark.createDataFrame(rows2, "series string, ts timestamp, target double, exog double")
    with pytest.raises(ValueError, match="Can not infer"):
        ResampleWithDistribution(
            in_col="exog", distribution_col="target",
            series_cols=("series",), ts_col="ts",
        ).fit(df2)
