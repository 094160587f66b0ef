"""Target-component / prediction-interval column machinery + Pipeline
intervals (reference datasets/utils.py:272-281, tsdataset.py:1457-1565,
pipeline/base.py:447-497, models/seasonal_ma.py:96-128)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.components import (
    add_prediction_intervals,
    add_target_components,
    drop_prediction_intervals,
    drop_target_components,
    get_prediction_intervals,
    get_target_components,
    match_target_components,
    match_target_quantiles,
)
from etna_spark.plans.pipeline import (
    Pipeline,
    SeasonalMovingAverageModel,
    naive_model,
)

START = dt.datetime(2021, 1, 1)


def test_match_helpers():
    feats = [
        "target", "target_0.025", "target_0.975", "target_component_lag_1",
        "target_component_lag_7", "exog", "target_shift_3", "target_1",
    ]
    assert match_target_quantiles(feats) == {"target_0.025", "target_0.975"}
    assert match_target_components(feats) == {
        "target_component_lag_1", "target_component_lag_7"
    }


@pytest.fixture()
def base_df(spark):
    rows = [
        ("a", START + dt.timedelta(days=i), float(10 + i)) for i in range(4)
    ] + [
        ("b", START + dt.timedelta(days=i), float(20 + 2 * i)) for i in range(4)
    ]
    return spark.createDataFrame(rows, "series string, ts timestamp, target double")


def _components_df(spark, base_rows, split=0.25):
    rows = [
        (s, ts, v * split, v * (1 - split)) for s, ts, v in base_rows
    ]
    return spark.createDataFrame(
        rows,
        "series string, ts timestamp, target_component_a double, "
        "target_component_b double",
    )


def test_add_get_drop_target_components(spark, base_df):
    comp = _components_df(
        spark, [(r["series"], r["ts"], r["target"]) for r in base_df.collect()]
    )
    out = add_target_components(base_df, comp)
    assert set(out.columns) >= {"target_component_a", "target_component_b"}
    got = get_target_components(out)
    assert got.count() == 8
    dropped = drop_target_components(out)
    assert match_target_components(dropped.columns) == set()
    assert get_target_components(dropped) is None
    # duplicate add raises
    with pytest.raises(ValueError, match="already contains target components"):
        add_target_components(out, comp)


def test_components_must_sum_to_target(spark, base_df):
    rows = [(r["series"], r["ts"], r["target"]) for r in base_df.collect()]
    bad = _components_df(spark, rows).withColumn(
        "target_component_a", F.col("target_component_a") + 0.5
    )
    with pytest.raises(ValueError, match="don't sum up to target"):
        add_target_components(base_df, bad)


def test_missing_component_rows_are_violations(spark, base_df):
    rows = [(r["series"], r["ts"], r["target"]) for r in base_df.collect()]
    partial = _components_df(spark, rows[:-1])  # one row missing
    with pytest.raises(ValueError, match="don't sum up to target"):
        add_target_components(base_df, partial)


def test_add_get_drop_prediction_intervals(spark, base_df):
    iv = base_df.select(
        "series", "ts",
        (F.col("target") - 1).alias("target_0.025"),
        (F.col("target") + 1).alias("target_0.975"),
    )
    out = add_prediction_intervals(base_df, iv)
    assert get_prediction_intervals(out).count() == 8
    with pytest.raises(ValueError, match="already contains prediction"):
        add_prediction_intervals(out, iv)
    dropped = drop_prediction_intervals(out)
    assert match_target_quantiles(dropped.columns) == set()
    assert get_prediction_intervals(dropped) is None


@pytest.fixture()
def daily_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for s, base in (("a", 100.0), ("b", 50.0)):
        for i in range(60):
            v = base + 10 * np.sin(2 * np.pi * i / 7) + rng.normal(0, 1)
            rows.append((s, START + dt.timedelta(days=i), float(round(v))))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_forecast_prediction_interval(spark, daily_df):
    p = Pipeline(
        model=naive_model(7), horizon=7, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(daily_df)
    out = p.forecast(prediction_interval=True, n_folds=3).toPandas()
    assert {"value_0.025", "value_0.975"} <= set(out.columns)
    assert len(out) == 14  # 2 series × 7 steps
    assert (out["value_0.025"] <= out["value"]).all()
    assert (out["value"] <= out["value_0.975"]).all()
    # symmetric normal borders around the point forecast
    np.testing.assert_allclose(
        out["value"] - out["value_0.025"],
        out["value_0.975"] - out["value"],
        rtol=1e-9,
    )
    # sigma strictly positive on noisy data
    assert (out["value_0.975"] > out["value"]).all()


def test_forecast_interval_sigma_matches_numpy(spark, daily_df):
    p = Pipeline(
        model=naive_model(7), horizon=7, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(daily_df)
    hist = p.get_historical_forecasts(daily_df, n_folds=3).toPandas()
    out = p.forecast(prediction_interval=True, n_folds=3).toPandas()
    from etna_spark.operators.outliers import _norm_ppf

    for s in ("a", "b"):
        r = hist.loc[hist["series"] == s]
        sigma = float(np.std(r["prediction"] - r["value"]))
        o = out.loc[out["series"] == s]
        np.testing.assert_allclose(
            o["value_0.975"] - o["value"], _norm_ppf(0.975) * sigma, rtol=1e-9
        )


def test_forecast_components_sum_to_forecast(spark, daily_df):
    p = Pipeline(
        model=SeasonalMovingAverageModel(window=2, seasonality=7),
        horizon=7, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(daily_df)
    out = p.forecast(return_components=True).toPandas()
    comp_cols = ["value_component_lag_7", "value_component_lag_14"]
    assert set(comp_cols) <= set(out.columns)
    np.testing.assert_allclose(
        out[comp_cols].sum(axis=1), out["value"], rtol=1e-9
    )


def test_interval_requires_history(spark):
    # series 'b' has no actuals over the whole backtest span (last 21 days)
    # → all residuals NULL → the per-segment validation must raise, like
    # the reference's non_nan_counts < 2 check (base.py:458-474)
    rows = [
        ("a", START + dt.timedelta(days=i), float(i)) for i in range(40)
    ] + [
        ("b", START + dt.timedelta(days=i), float(i) if i < 19 else None)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    p = Pipeline(
        model=naive_model(1), horizon=7, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    with pytest.raises(ValueError, match="aren't enough target values"):
        p.forecast(prediction_interval=True, n_folds=3)


def test_deadline_ma_calendar_offsets(spark):
    from etna_spark.plans.pipeline import DeadlineMovingAverageModel

    # daily series over 2021-01-01..2021-05-30; value = running day index
    rows = [
        ("a", START + dt.timedelta(days=i), float(i)) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    p = Pipeline(
        model=DeadlineMovingAverageModel(window=1, seasonality="month"),
        horizon=3, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = p.forecast().toPandas().set_index("ts")["value"]
    # 2021-05-31 − 1 month = 2021-04-30 (day 119): the month-end CLAMP
    assert out[dt.datetime(2021, 5, 31)] == 119.0
    # 2021-06-01 − 1 month = 2021-05-01 (day 120)
    assert out[dt.datetime(2021, 6, 1)] == 120.0
    assert out[dt.datetime(2021, 6, 2)] == 121.0


def test_deadline_ma_components_and_window(spark):
    from etna_spark.plans.pipeline import DeadlineMovingAverageModel

    rows = [
        ("a", START + dt.timedelta(days=i), float(i * i % 97)) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    p = Pipeline(
        model=DeadlineMovingAverageModel(window=2, seasonality="month"),
        horizon=4, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = p.forecast(return_components=True).toPandas()
    comp_cols = ["value_component_lag_1", "value_component_lag_2"]
    assert set(comp_cols) <= set(out.columns)
    np.testing.assert_allclose(
        out[comp_cols].sum(axis=1), out["value"], rtol=1e-12
    )


def test_deadline_ma_validations(spark):
    from etna_spark.plans.pipeline import DeadlineMovingAverageModel

    with pytest.raises(NotImplementedError, match="not a valid"):
        DeadlineMovingAverageModel(seasonality="week")
    rows = [("a", START + dt.timedelta(days=i), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    with pytest.raises(ValueError, match="not supported"):
        Pipeline(
            model=DeadlineMovingAverageModel(window=1), horizon=2,
            step_seconds=60, in_col="value", series_cols=("series",),
            ts_col="ts",
        ).fit(df)
    p = Pipeline(
        model=DeadlineMovingAverageModel(window=3, seasonality="year"),
        horizon=2, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    with pytest.raises(Exception, match="context isn't big enough"):
        p.forecast().collect()


def test_interval_metrics_coverage_and_width(spark):
    from etna_spark.functions.metrics import interval_metrics

    rows = []
    for s in ("a", "b"):
        for i in range(10):
            y = float(i)
            lo = y - (1.0 if i % 2 == 0 else -0.5)  # odd rows: y < lo → miss
            hi = y + 2.0
            rows.append((s, START + dt.timedelta(hours=i), y, lo, hi))
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, value double, lower double, "
        "upper double",
    )
    out = interval_metrics(df).toPandas().set_index("series")
    np.testing.assert_allclose(out.loc["a", "coverage"], 0.5)
    # width alternates |2+1|=3 and |2-0.5|=1.5 → mean 2.25
    np.testing.assert_allclose(out.loc["a", "width"], 2.25)
    macro = interval_metrics(df, mode="macro").collect()[0]
    np.testing.assert_allclose(macro["coverage"], 0.5)


def test_interval_metrics_missing_modes(spark):
    from etna_spark.functions.metrics import interval_metrics

    rows = [
        ("a", START, 1.0, 0.0, 2.0),
        ("a", START + dt.timedelta(hours=1), None, 0.0, 2.0),
        ("a", START + dt.timedelta(hours=2), 5.0, 0.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, value double, lower double, "
        "upper double",
    )
    with pytest.raises(ValueError, match="NaNs in y_true"):
        interval_metrics(df)
    out = interval_metrics(df, missing_mode="ignore").collect()[0]
    np.testing.assert_allclose(out["coverage"], 0.5)  # 1 hit of 2 valid
    with pytest.raises(ValueError, match="unknown interval metric"):
        interval_metrics(df, metrics=("iou",), missing_mode="ignore")


def test_interval_metrics_null_bounds_count_as_misses(spark):
    from etna_spark.functions.metrics import interval_metrics

    rows = [
        ("a", START, 1.0, 0.0, 2.0),                               # hit
        ("a", START + dt.timedelta(hours=1), 1.0, None, 2.0),      # miss
        ("a", START + dt.timedelta(hours=2), 1.0, 0.0, None),      # miss
        ("a", START + dt.timedelta(hours=3), 9.0, 0.0, 2.0),       # miss
    ]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, value double, lower double, "
        "upper double",
    )
    out = interval_metrics(df).collect()[0]
    np.testing.assert_allclose(out["coverage"], 0.25)  # 1 of 4, not 1 of 2


def test_interval_forecast_with_transform_brackets_in_original_units(spark):
    # borders must be added AFTER the inverse transforms (reference adds
    # them to inverse-transformed predictions), and the fold refits must
    # not clobber this pipeline's fitted transform state
    from etna_spark.functions.math_ops import add_const, add_const_inverse

    class AddConst:
        def __init__(self):
            self.fit_calls = 0

        def fit(self, d):
            self.fit_calls += 1
            return self

        def transform(self, d):
            return add_const(d, "value", 1000.0)

        def inverse_transform(self, d):
            return add_const_inverse(d, "value", 1000.0)

    rng = np.random.default_rng(5)
    rows = [
        ("a", START + dt.timedelta(days=i),
         float(round(50 + 10 * np.sin(2 * np.pi * i / 7) + rng.normal(0, 2))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    t = AddConst()
    p = Pipeline(
        model=naive_model(7), transforms=[t], horizon=7, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = p.forecast(prediction_interval=True, n_folds=3).toPandas()
    # original units: the seasonal pattern lives around 50, not 1050
    assert out["value"].between(20, 90).all()
    assert (out["value_0.025"] <= out["value"]).all()
    assert (out["value"] <= out["value_0.975"]).all()
    assert (out["value_0.975"] > out["value"]).all()  # noisy → sigma > 0
    # THIS pipeline's transform was fitted exactly once (fold refits used
    # copies)
    assert t.fit_calls == 1


def test_components_short_series_yield_nan_not_wraparound(spark):
    # a series shorter than the largest lag must produce NaN components,
    # never values wrapped from the prediction end of the array
    rows = [
        ("long", START + dt.timedelta(hours=i), float(i % 24)) for i in range(60)
    ] + [
        ("short", START + dt.timedelta(hours=i + 30), float(i)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    p = Pipeline(
        model=SeasonalMovingAverageModel(window=2, seasonality=24),
        horizon=6, step_seconds=3600,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = p.forecast(return_components=True).toPandas()
    short = out[out["series"] == "short"]
    # 30 history rows < lag 48 → the lag-48 component must be all-NaN/NULL
    assert short["value_component_lag_48"].isna().all()


def test_get_residuals(spark, base_df):
    from etna_spark.operators.components import get_residuals

    fc = base_df.select(
        "series", "ts",
        (F.col("target") - 2.0).alias("target"),
        (F.col("target") * 0.5).alias("target_component_half"),
    )
    out = get_residuals(fc, base_df).toPandas()
    assert (out["target"] == 2.0).all()  # actual − (actual − 2)
    assert "target_component_half" not in out.columns
    with pytest.raises(KeyError, match="should be the same"):
        get_residuals(fc.filter(F.col("series") == "a"), base_df)


def test_get_residuals_rejects_missing_timestamps(spark, base_df):
    from etna_spark.operators.components import get_residuals

    fc = base_df.select("series", "ts", "target")  # full span forecast
    # both series keep days 1-2, so the series-set check passes and only
    # the timestamp-coverage check can fire
    short_actual = base_df.filter(F.dayofmonth("ts") <= 2)
    with pytest.raises(KeyError, match="missing timestamps"):
        get_residuals(fc, short_actual)


def test_interval_width_nan_poisons_on_null_bound(spark):
    from etna_spark.functions.metrics import interval_metrics

    rows = [
        ("a", START, 1.0, 0.0, 2.0),
        ("a", START + dt.timedelta(hours=1), 1.0, 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, value double, lower double, "
        "upper double",
    )
    out = interval_metrics(df).collect()[0]
    assert out["width"] != out["width"]  # NaN, like reference propagation
    np.testing.assert_allclose(out["coverage"], 0.5)
