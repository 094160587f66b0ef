"""Outlier transforms, event proximity, and temporal set ops."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.events import event_transform
from etna_spark.operators.outliers import PointOutliersTransform
from etna_spark.operators.splits import (
    apply_fold,
    generate_folds,
    make_future,
    train_test_split,
)


def _panel(spark, values, seg="s1"):
    t0 = dt.datetime(2020, 1, 1)
    rows = [
        (seg, t0 + dt.timedelta(days=i), None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def _col(df, col, seg="s1"):
    rows = df.filter(f"series='{seg}'").orderBy("ts").select(col).collect()
    return np.array([np.nan if r[0] is None else float(r[0]) for r in rows])


# ---------------------------------------------------------------------------
# outliers
# ---------------------------------------------------------------------------

def test_median_outliers_tumbling_blocks(spark):
    vals = [1, 1, 1, 1, 100, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2]  # 100 is an outlier
    df = _panel(spark, vals)
    tr = PointOutliersTransform(
        method="median", in_col="value", series_cols=("series",), ts_col="ts",
        window_size=10, alpha=2.0,
    ).fit(df)
    out = _col(tr.transform(df), "value")
    assert np.isnan(out[4])
    assert np.count_nonzero(np.isnan(out)) == 1
    restored = _col(tr.inverse_transform(tr.transform(df)), "value")
    np.testing.assert_allclose(restored, np.array(vals, float))


def test_iqr_and_mad_outliers_flag_spike(spark):
    rng = np.random.RandomState(0)
    vals = list(rng.normal(10, 0.5, 40))
    vals[25] = 50.0
    df = _panel(spark, vals)
    for method, kw in (("iqr", {"iqr_scale": 3.0}), ("mad", {"mad_scale": 5.0})):
        tr = PointOutliersTransform(
            method=method, in_col="value", series_cols=("series",), ts_col="ts",
            window_size=10, **kw,
        ).fit(df)
        out = _col(tr.transform(df), "value")
        assert np.isnan(out[25]), method


# ---------------------------------------------------------------------------
# event transform (doctest golden from event.py:46-73)
# ---------------------------------------------------------------------------

def test_event_binary_golden(spark):
    holiday = [0, 0, 1, 0, 0]
    df = _panel(spark, holiday)
    out = event_transform(
        df, "value", "holiday", n_pre=1, n_post=1, mode="binary",
        series_cols=("series",), ts_col="ts",
    )
    np.testing.assert_allclose(_col(out, "holiday_pre"), [0, 1, 0, 0, 0])
    np.testing.assert_allclose(_col(out, "holiday_post"), [0, 0, 0, 1, 0])


def test_event_distance_golden(spark):
    holiday = [0, 0, 1, 0, 0]
    df = _panel(spark, holiday)
    out = event_transform(
        df, "value", "holiday", n_pre=2, n_post=2, mode="distance",
        series_cols=("series",), ts_col="ts",
    )
    np.testing.assert_allclose(_col(out, "holiday_pre"), [0.5, 1, 0, 0, 0])
    np.testing.assert_allclose(_col(out, "holiday_post"), [0, 0, 0, 1, 0.5])


def test_event_validation(spark):
    df = _panel(spark, [0, 1, 0])
    with pytest.raises(ValueError):
        event_transform(df, "value", "h", n_pre=0, n_post=1,
                        series_cols=("series",), ts_col="ts")
    with pytest.raises(NotImplementedError):
        event_transform(df, "value", "h", n_pre=1, n_post=1, mode="nope",
                        series_cols=("series",), ts_col="ts")


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------

def test_train_test_split_by_test_size(spark):
    df = _panel(spark, range(10))
    train, test = train_test_split(df, ts_col="ts", test_size=3,
                                   step_seconds=86400)
    assert train.count() == 7 and test.count() == 3
    assert test.agg(F.min("ts")).collect()[0][0] == dt.datetime(2020, 1, 8)


def test_train_test_split_by_border(spark):
    df = _panel(spark, range(10))
    train, test = train_test_split(
        df, ts_col="ts", train_end=dt.datetime(2020, 1, 4), step_seconds=86400
    )
    assert train.count() == 4 and test.count() == 6


def test_train_test_split_requires_border(spark):
    df = _panel(spark, range(5))
    with pytest.raises(ValueError):
        train_test_split(df, ts_col="ts")


def test_make_future(spark):
    df = _panel(spark, range(5))
    fut = make_future(df, future_steps=3, step_seconds=86400,
                      series_cols=("series",), ts_col="ts",
                      target_cols=("value",))
    rows = fut.orderBy("ts").collect()
    assert len(rows) == 3
    assert rows[0]["ts"] == dt.datetime(2020, 1, 6)
    assert all(r["value"] is None for r in rows)

    with_tail = make_future(df, future_steps=3, step_seconds=86400,
                            series_cols=("series",), ts_col="ts",
                            target_cols=("value",), tail_steps=2)
    assert with_tail.count() == 5


def test_make_future_carries_exog(spark):
    df = _panel(spark, range(5))
    t0 = dt.datetime(2020, 1, 6)
    exog = spark.createDataFrame(
        [("s1", t0 + dt.timedelta(days=i), float(100 + i)) for i in range(3)],
        "series string, ts timestamp, exog double",
    )
    fut = make_future(df.withColumn("exog", F.lit(None).cast("double")),
                      future_steps=3, step_seconds=86400,
                      series_cols=("series",), ts_col="ts", exog=exog)
    got = [r["exog"] for r in fut.orderBy("ts").collect()]
    assert got == [100.0, 101.0, 102.0]


def test_backtest_folds(spark):
    df = _panel(spark, range(20))
    last = dt.datetime(2020, 1, 20)
    folds = generate_folds(last, n_folds=3, horizon=4, step_seconds=86400,
                           stride=4, first_ts=dt.datetime(2020, 1, 1))
    assert len(folds) == 3
    # newest fold tests the last 4 days
    tr, te = apply_fold(df, folds[-1], ts_col="ts")
    assert te.count() == 4 and tr.count() == 16
    # oldest fold shifted back by 2 strides
    tr0, te0 = apply_fold(df, folds[0], ts_col="ts")
    assert te0.count() == 4 and tr0.count() == 8
    # folds do not overlap in test ranges
    all_test = [apply_fold(df, f, ts_col="ts")[1] for f in folds]
    total = sum(t.count() for t in all_test)
    assert total == 12


def test_per_series_spine_spans_own_range_only(spark):
    """calendar_spine(per_series=True): short-lived series don't inherit the
    global range (the Σ-spans scale fix for wildly varying lifetimes)."""
    import datetime as dt

    from etna_spark.operators.spine import calendar_spine, regularize

    t0 = dt.datetime(2021, 1, 1)
    rows = [
        ("long", t0, 1.0), ("long", t0 + dt.timedelta(days=99), 2.0),
        ("short", t0 + dt.timedelta(days=40), 3.0),
        ("short", t0 + dt.timedelta(days=49), 4.0),
    ]
    df = spark.createDataFrame(rows, "source string, bucket_ts timestamp, v double")
    g = calendar_spine(df, "1d")
    p = calendar_spine(df, "1d", per_series=True)
    assert g.count() == 200      # 2 series × global 100 days
    assert p.count() == 110      # 100 + 10
    reg = regularize(df, "1d", per_series=True)
    assert reg.count() == 110
    assert reg.filter("source = 'short' and v is null").count() == 8


def test_estimate_max_n_folds(spark):
    import datetime as dt

    from etna_spark.operators.splits import estimate_max_n_folds

    start = dt.datetime(2021, 1, 1)
    rows = [("a", start + dt.timedelta(days=i), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    # (30 − 7 + 7 − 7) // 7 = 3
    assert estimate_max_n_folds(df, horizon=7, context_size=7) == 3
    # stride 1: (30 − 7 + 1 − 7) // 1 = 17
    assert estimate_max_n_folds(df, horizon=7, context_size=7, stride=1) == 17
    with pytest.raises(ValueError, match="positive integer"):
        estimate_max_n_folds(df, horizon=7, context_size=0)
    with pytest.raises(ValueError, match="Not enough data"):
        estimate_max_n_folds(df, horizon=28, context_size=7)
