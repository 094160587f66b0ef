"""Change-point transforms (reference change_points_based/*): binseg
recovers injected step/slope breakpoints; trend/level removal flattens the
series; inverse round-trips; segmentation labels intervals; future rows use
the last interval's model."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.change_points import (
    ChangePointsLevel,
    ChangePointsSegmentation,
    ChangePointsTrend,
    binseg,
)

START = dt.datetime(2021, 1, 1)


def test_binseg_recovers_level_shifts():
    y = np.concatenate([np.zeros(50), np.full(50, 10.0), np.full(50, -5.0)])
    assert binseg(y, n_bkps=2) == [50, 100]


def test_binseg_recovers_slope_change():
    i = np.arange(120, dtype=float)
    y = np.where(i < 60, i, 60 + 5 * (i - 60))
    bkps = binseg(y, n_bkps=1)
    assert len(bkps) == 1 and abs(bkps[0] - 60) <= 3


def test_binseg_noise_robust():
    rng = np.random.default_rng(0)
    y = np.concatenate([np.zeros(80), np.full(80, 6.0)]) + rng.normal(0, 0.5, 160)
    bkps = binseg(y, n_bkps=1)
    assert abs(bkps[0] - 80) <= 2


def test_binseg_caps_at_possible_splits():
    assert binseg(np.array([1.0, 1.0, 5.0, 5.0]), n_bkps=5, min_size=2) == [2]


def _pw_df(spark, n_series=3):
    rows = []
    for s in range(n_series):
        for i in range(150):
            if i < 50:
                v = 1.0 * i + s
            elif i < 100:
                v = 50.0 + s - 2.0 * (i - 50)
            else:
                v = -50.0 + s + 0.5 * (i - 100)
            rows.append((f"s{s}", START + dt.timedelta(days=i), v))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_trend_transform_flattens_piecewise_linear(spark):
    df = _pw_df(spark)
    t = ChangePointsTrend(n_bkps=5, series_cols=("series",), ts_col="ts",
                          min_size=5)
    out = t.fit_transform(df).toPandas()
    assert len(out) == 450
    np.testing.assert_allclose(out["value"], 0.0, atol=1.5)


def test_trend_inverse_round_trip(spark):
    df = _pw_df(spark)
    t = ChangePointsTrend(n_bkps=3, series_cols=("series",), ts_col="ts")
    back = t.inverse_transform(t.fit_transform(df)).toPandas()
    orig = df.toPandas()
    m = back.set_index(["series", "ts"])["value"].sort_index()
    o = orig.set_index(["series", "ts"])["value"].sort_index()
    np.testing.assert_allclose(m, o, atol=1e-9)


def test_level_transform_removes_steps(spark):
    rows = []
    for i in range(150):
        v = 0.0 if i < 50 else (10.0 if i < 100 else -5.0)
        rows.append(("a", START + dt.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    t = ChangePointsLevel(n_bkps=2, series_cols=("series",), ts_col="ts")
    out = t.fit_transform(df).toPandas()
    np.testing.assert_allclose(out["value"], 0.0, atol=1e-9)


def test_segmentation_labels_and_future(spark):
    df = _pw_df(spark, n_series=1)
    t = ChangePointsSegmentation(
        n_bkps=2, out_col="interval", series_cols=("series",), ts_col="ts",
        min_size=5,
    ).fit(df)
    out = {r["ts"]: r["interval"] for r in t.transform(df).collect()}
    assert out[START] == 0
    assert out[START + dt.timedelta(days=149)] == 2
    assert sorted(set(out.values())) == [0, 1, 2]
    # future rows take the LAST interval
    fut = spark.createDataFrame(
        [("s0", START + dt.timedelta(days=200), None)],
        "series string, ts timestamp, value double",
    )
    assert t.transform(fut).collect()[0]["interval"] == 2


def test_trend_future_extrapolates_last_interval(spark):
    df = _pw_df(spark, n_series=1)
    t = ChangePointsTrend(n_bkps=2, series_cols=("series",), ts_col="ts",
                          min_size=5).fit(df)
    # future value on the last interval's line → residual ≈ 0
    fut_val = -50.0 + 0.5 * (200 - 100)
    fut = spark.createDataFrame(
        [("s0", START + dt.timedelta(days=200), fut_val)],
        "series string, ts timestamp, value double",
    )
    got = t.transform(fut).collect()[0]["value"]
    assert abs(got) < 2.0


def test_not_fitted_raises(spark):
    df = _pw_df(spark, n_series=1)
    with pytest.raises(ValueError, match="not fitted"):
        ChangePointsTrend(series_cols=("series",)).transform(df)


def test_trend_transform_adds_feature_column(spark):
    from etna_spark.operators.change_points import TrendTransform

    df = _pw_df(spark, n_series=1)
    t = TrendTransform(n_bkps=5, out_col="trend", series_cols=("series",),
                       ts_col="ts", min_size=5).fit(df)
    out = t.transform(df).toPandas()
    assert "trend" in out.columns and "value" in out.columns
    # trend tracks the piecewise-linear signal closely
    np.testing.assert_allclose(out["trend"], out["value"], atol=2.0)
    # irreversible: inverse is a no-op
    assert t.inverse_transform(df) is df


def test_find_change_points_returns_break_timestamps(spark):
    import datetime as dt

    from etna_spark.operators.change_points import find_change_points

    start = dt.datetime(2021, 1, 1)
    rows = []
    for i in range(60):
        level = 0.0 if i < 30 else 100.0  # one obvious level break at i=30
        rows.append(("a", start + dt.timedelta(hours=i), level))
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = find_change_points(
        df, in_col="value", n_bkps=1, min_size=5, model="l2",
        series_cols=("series",), ts_col="ts",
    ).collect()
    assert len(out) == 1
    assert out[0]["change_point_ts"] == start + dt.timedelta(hours=30)


def test_binseg_tie_break_start_matches_order():
    """On non-degenerate data (no exact float gain ties) the stateless
    'start' tie-break must pick the same breakpoints as the classic
    insertion-order walk — it exists so an SQL twin can replay the greedy."""
    import numpy as np

    from etna_spark.operators.change_points import binseg

    rng = np.random.default_rng(3)
    for _ in range(10):
        y = np.round(np.cumsum(rng.normal(0, 10, 300)))
        for model in ("l2", "linear"):
            assert binseg(y, 4, 12, model=model) == binseg(
                y, 4, 12, model=model, tie_break="start"
            )


def test_trend_cramer_solver_matches_cov(spark):
    """solver='cramer' (integer-stat closed form on the scaled local
    index, the oracle-replayable path) fits the SAME line as the numpy
    covariance solver on integer-valued step-aligned input, and keeps
    the inverse round-trip."""
    # ×2 makes the 0.5-slope branch integer-valued on the daily grid
    df = _pw_df(spark).withColumn("value", F.col("value") * 2)
    kw = dict(n_bkps=5, min_size=5, series_cols=("series",), ts_col="ts")
    base = ChangePointsTrend(tie_break="start", **kw).fit_transform(df)
    ex = ChangePointsTrend(tie_break="start", solver="cramer",
                           step_seconds=86400, **kw)
    out = ex.fit_transform(df)
    j = (
        base.withColumnRenamed("value", "v_cov")
        .join(out.withColumnRenamed("value", "v_cr"), on=["series", "ts"])
        .toPandas()
    )
    assert len(j) == 450
    np.testing.assert_allclose(j["v_cr"], j["v_cov"], atol=1e-6)
    back = ex.inverse_transform(out).toPandas().set_index(["series", "ts"])
    orig = df.toPandas().set_index(["series", "ts"])
    np.testing.assert_allclose(
        back["value"], orig.loc[back.index, "value"], atol=1e-9
    )


def test_trend_cramer_rejects_noninteger_input(spark):
    df = _pw_df(spark).withColumn("value", F.col("value") + 0.5)
    t = ChangePointsTrend(n_bkps=2, min_size=5, series_cols=("series",),
                          ts_col="ts", solver="cramer", step_seconds=86400)
    with pytest.raises(Exception, match="integer-valued"):
        t.fit(df)._state.collect()
