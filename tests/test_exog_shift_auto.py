"""ExogShiftTransform auto mode + regressor coverage validation
(reference lags.py:112-313, tsdataset.py:549-577)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etna_spark.operators.lags import ExogShiftAuto, check_regressors

START = dt.datetime(2021, 1, 1)


@pytest.fixture()
def exog_df(spark):
    """2 series × 48 hourly points; exog_a covers everything, exog_b ends 3
    steps early, exog_c ends 1 step LATE (negative delta)."""
    rows = []
    for s in ("s1", "s2"):
        for i in range(48):
            ts = START + dt.timedelta(hours=i)
            rows.append((
                s, ts, float(i),
                float(i * 2),
                float(i * 3) if i < 45 else None,
                float(i * 5),
            ))
        # exog_c has one extra future point per series
        rows.append((s, START + dt.timedelta(hours=48), None, None, None, 5.0))
    df = spark.createDataFrame(
        rows,
        "series string, ts timestamp, target double, exog_a double, "
        "exog_b double, exog_c double",
    )
    return df


def test_auto_shift_estimation(spark, exog_df):
    t = ExogShiftAuto(
        cols=["exog_a", "exog_b", "exog_c"], horizon=5,
        step_seconds=3600, series_cols=("series",), ts_col="ts",
    ).fit(exog_df)
    # last dataset ts = i=48 (exog_c's extra point). exog_a ends at 47 →
    # delta 1 → shift 6; exog_b ends at 44 → delta 4 → shift 9; exog_c ends
    # at 48 → delta 0 → shift 5
    assert t.shifts == {"exog_a": 6, "exog_b": 9, "exog_c": 5}
    assert sorted(t.get_regressors_info()) == [
        "exog_a_shift_6", "exog_b_shift_9", "exog_c_shift_5"
    ]


def test_auto_shift_transform_values(spark, exog_df):
    t = ExogShiftAuto(
        cols=["exog_b"], horizon=3, step_seconds=3600,
        series_cols=("series",), ts_col="ts",
    )
    out = t.fit_transform(exog_df)
    # delta=4, horizon=3 → shift 7
    assert "exog_b_shift_7" in out.columns and "exog_b" not in out.columns
    got = {
        (r["series"], r["ts"]): r["exog_b_shift_7"]
        for r in out.collect()
    }
    # value at hour 10 = exog_b at hour 3 = 9.0
    assert got[("s1", START + dt.timedelta(hours=10))] == 9.0
    # first 7 rows per series are null
    assert got[("s2", START + dt.timedelta(hours=6))] is None


def test_auto_requires_positive_horizon():
    with pytest.raises(ValueError, match="positive horizon"):
        ExogShiftAuto(cols=["x"], horizon=0)


def test_not_fitted_raises(spark, exog_df):
    t = ExogShiftAuto(cols=["exog_a"], horizon=2)
    with pytest.raises(ValueError, match="not fitted"):
        t.transform(exog_df)
    with pytest.raises(ValueError, match="Fit the transform"):
        t.get_regressors_info()


def test_check_regressors_passes_when_covered(spark, exog_df):
    # exog_c covers beyond the target end → valid regressor
    check_regressors(
        exog_df, ["exog_c"], target_col="target",
        series_cols=("series",), ts_col="ts",
    )


def test_check_regressors_rejects_short_history(spark, exog_df):
    # exog_b ends before the target end → not a valid regressor
    with pytest.raises(ValueError, match="not enough history"):
        check_regressors(
            exog_df, ["exog_b"], target_col="target",
            series_cols=("series",), ts_col="ts",
        )


def test_check_regressors_rejects_late_start(spark, exog_df):
    df = exog_df.withColumn(
        "exog_late",
        F.when(F.col("ts") > F.lit(START + dt.timedelta(hours=2)),
               F.col("exog_c")),
    )
    with pytest.raises(ValueError, match="not enough history"):
        check_regressors(
            df, ["exog_late"], target_col="target",
            series_cols=("series",), ts_col="ts",
        )


def test_auto_shift_against_target_end(spark, exog_df):
    # Reference _estimate_shift measures delta against the TARGET's last
    # timestamp (hour 47 here — the hour-48 row has target NULL). exog_c's
    # last known point is hour 48 → delta = -1 → with horizon=1 the shift
    # is max(0, -1+1) = 0: the column already covers the horizon and is
    # used as-is. exog_a ends with the target → delta 0 → shift 1.
    t = ExogShiftAuto(
        cols=["exog_a", "exog_c"], horizon=1, step_seconds=3600,
        series_cols=("series",), ts_col="ts", target_col="target",
    ).fit(exog_df)
    assert t.shifts == {"exog_a": 1, "exog_c": 0}
    out = t.transform(exog_df)
    assert "exog_c" in out.columns and "exog_c_shift_0" not in out.columns
    assert "exog_a_shift_1" in out.columns and "exog_a" not in out.columns
    assert t.get_regressors_info() == ["exog_a_shift_1"]
