"""Pipeline fit/forecast/backtest with baseline models, mirroring the
reference's seasonal-MA forecast semantics (seasonal_ma.py:13-50)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from etna_spark.functions.math_ops import add_const, add_const_inverse
from etna_spark.plans.pipeline import (
    Pipeline,
    SeasonalMovingAverageModel,
    moving_average_model,
    naive_model,
)


def _panel(spark, n=28):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for seg, base in (("s1", 0.0), ("s2", 100.0)):
        for i in range(n):
            rows.append((seg, t0 + dt.timedelta(days=i), base + (i % 7)))
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def _fc(df, seg):
    rows = df.filter(f"series='{seg}'").orderBy("ts").select("value").collect()
    return np.array([r[0] for r in rows])


def test_naive_forecast(spark):
    df = _panel(spark)
    p = Pipeline(model=naive_model(lag=7), horizon=7,
                 in_col="value", series_cols=("series",), ts_col="ts").fit(df)
    out = p.forecast()
    # weekly periodic data + naive(7) → forecast repeats the pattern exactly
    np.testing.assert_allclose(_fc(out, "s1"), [0, 1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(_fc(out, "s2"), [100, 101, 102, 103, 104, 105, 106])
    assert out.count() == 14


def test_seasonal_ma_matches_reference_kernel(spark):
    df = _panel(spark)
    model = SeasonalMovingAverageModel(window=2, seasonality=7)
    p = Pipeline(model=model, horizon=5, in_col="value",
                 series_cols=("series",), ts_col="ts").fit(df)
    out = p.forecast()
    hist = np.array([i % 7 for i in range(28)], float)
    expected = model.kernel(hist, 5)
    np.testing.assert_allclose(_fc(out, "s1"), expected)


def test_moving_average_is_autoregressive(spark):
    t0 = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [("s", t0 + dt.timedelta(days=i), float(v))
         for i, v in enumerate([1, 2, 3, 4])],
        "series string, ts timestamp, value double",
    )
    p = Pipeline(model=moving_average_model(window=2), horizon=3,
                 in_col="value", series_cols=("series",), ts_col="ts").fit(df)
    out = _fc(p.forecast(), "s")
    # step1: (3+4)/2=3.5; step2: (4+3.5)/2=3.75; step3: (3.5+3.75)/2=3.625
    np.testing.assert_allclose(out, [3.5, 3.75, 3.625])


def test_pipeline_with_reversible_transform(spark):
    df = _panel(spark)

    class AddConst:
        def fit(self, d):
            return self

        def transform(self, d):
            return add_const(d, "value", 50.0)

        def inverse_transform(self, d):
            return add_const_inverse(d, "value", 50.0)

    p = Pipeline(model=naive_model(lag=7), transforms=[AddConst()], horizon=7,
                 in_col="value", series_cols=("series",), ts_col="ts").fit(df)
    out = p.forecast()
    np.testing.assert_allclose(_fc(out, "s1"), [0, 1, 2, 3, 4, 5, 6])


def test_backtest_metrics(spark):
    df = _panel(spark, n=42)
    p = Pipeline(model=naive_model(lag=7), horizon=7,
                 in_col="value", series_cols=("series",), ts_col="ts")
    m = p.backtest(df, metrics=("mae", "mse"), n_folds=3)
    rows = m.collect()
    assert len(rows) == 6  # 3 folds × 2 series
    # periodic data + naive(7): perfect forecast
    assert all(r["mae"] == 0.0 and r["mse"] == 0.0 for r in rows)
    assert sorted({r["fold"] for r in rows}) == [0, 1, 2]


def test_predict_insample_true_context(spark):
    """Pipeline.predict = strided mean of ACTUAL lags (seasonal_ma.py:
    187-203), unlike forecast's autoregressive recursion."""
    df = _panel(spark)  # 28 days, weekly pattern, values i % 7 (+ base)
    model = SeasonalMovingAverageModel(window=2, seasonality=7)
    p = Pipeline(model=model, horizon=5, in_col="value",
                 series_cols=("series",), ts_col="ts").fit(df)
    out = p.predict()
    got = _fc(out, "s1")
    # default start = first full-context row (position 15 of 28, 0-based 14)
    assert len(got) == 28 - 14
    hist = np.array([i % 7 for i in range(28)], float)
    expected = [(hist[i - 7] + hist[i - 14]) / 2 for i in range(14, 28)]
    np.testing.assert_allclose(got, expected)
    # s2 rides 100 higher
    np.testing.assert_allclose(_fc(out, "s2"), np.array(expected) + 100.0)


def test_predict_insample_validations(spark):
    import datetime as dt

    import pytest

    df = _panel(spark)
    p = Pipeline(model=naive_model(7), horizon=5, in_col="value",
                 series_cols=("series",), ts_col="ts").fit(df)
    t0 = dt.datetime(2020, 1, 1)
    with pytest.raises(ValueError, match="end_timestamp is more"):
        p.predict(end_ts=t0 + dt.timedelta(days=60))
    with pytest.raises(ValueError, match="less than start"):
        p.predict(start_ts=t0 + dt.timedelta(days=20),
                  end_ts=t0 + dt.timedelta(days=10))
    with pytest.raises(ValueError, match="NaNs in a target"):
        p.predict(start_ts=t0 + dt.timedelta(days=2))
    # explicit range inside the full-context span works
    out = p.predict(start_ts=t0 + dt.timedelta(days=10),
                    end_ts=t0 + dt.timedelta(days=12))
    assert out.count() == 6  # 3 days x 2 series
    vals = _fc(out, "s1")
    np.testing.assert_allclose(vals, [(10 - 7) % 7, (11 - 7) % 7, (12 - 7) % 7])


def test_predict_insample_midtrain_nan_raises(spark):
    """A NULL target in the MIDDLE of the train span nulls the context of a
    selected row — must raise the reference's NaN-context error even under
    the default start_ts, not silently return a NULL prediction."""
    import pytest
    from pyspark.sql import functions as F

    df = _panel(spark).withColumn(
        "value",
        F.when(F.col("ts") == dt.datetime(2020, 1, 16), None).otherwise(
            F.col("value")
        ),
    )
    p = Pipeline(model=naive_model(7), horizon=5, in_col="value",
                 series_cols=("series",), ts_col="ts").fit(df)
    with pytest.raises(ValueError, match="NaNs in a target"):
        p.predict()


def test_predict_insample_deadline_calendar(spark):
    """DeadlineMA in-sample predict (reference deadline_ma.py:320-350):
    true-context calendar-offset means, month-end clamping included."""
    import datetime as dt

    import pytest

    from etna_spark.plans.pipeline import DeadlineMovingAverageModel

    # daily series over 4 months, value = day-of-span index
    t0 = dt.datetime(2020, 1, 1)
    n = 121  # 2020-01-01 .. 2020-04-30 (leap year)
    df = spark.createDataFrame(
        [("s", t0 + dt.timedelta(days=i), float(i)) for i in range(n)],
        "series string, ts timestamp, value double",
    )
    p = Pipeline(
        model=DeadlineMovingAverageModel(window=2, seasonality="month"),
        horizon=5, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = {r["ts"]: r["value"] for r in p.predict().collect()}
    # reference semantics via pandas on the same series
    import pandas as pd

    ser = pd.Series(
        [float(i) for i in range(n)],
        index=pd.date_range(t0, periods=n, freq="D"),
    )
    off = pd.DateOffset(months=1)
    expected = {}
    for t in ser.index:
        prevs = [t - off, t - off * 2]
        if all(pv in ser.index for pv in prevs):
            expected[t.to_pydatetime()] = float(
                (ser.loc[prevs[0]] + ser.loc[prevs[1]]) / 2
            )
    assert out == expected
    # the clamped case is inside the span: Mar 31 reads Feb 29 (leap clamp)
    mar31 = dt.datetime(2020, 3, 31)
    assert mar31 in out
    feb29, jan31 = dt.datetime(2020, 2, 29), dt.datetime(2020, 1, 31)
    assert out[mar31] == (ser.loc[feb29] + ser.loc[jan31]) / 2
    # explicit too-early start raises the reference's NaN-context error
    with pytest.raises(ValueError, match="NaNs in a target"):
        p.predict(start_ts=t0 + dt.timedelta(days=3))


def test_assemble_pipelines_broadcasting(spark):
    """Reference assemble_pipelines semantics: scalars broadcast, listed
    transform slots distribute per pipeline, None slots are skipped, and
    mismatched lengths raise."""
    import pytest

    from etna_spark.operators.lags import LagTransform
    from etna_spark.plans.pipeline import assemble_pipelines

    shared = LagTransform(in_col="value", lags=[1])
    per = [LagTransform(in_col="value", lags=[2]), None,
           LagTransform(in_col="value", lags=[3])]
    pipes = assemble_pipelines(
        naive_model(7), [shared, per], [1, 2, 3],
        in_col="value", series_cols=("series",), ts_col="ts",
    )
    assert [p.horizon for p in pipes] == [1, 2, 3]
    assert [len(p.transforms) for p in pipes] == [2, 1, 2]
    # deep copies: fitting one pipeline must not alias another's model
    assert pipes[0].model is not pipes[1].model
    assert pipes[0].transforms[0] is not pipes[2].transforms[0]
    # models sequence broadcasting with scalar horizon
    pipes2 = assemble_pipelines(
        [naive_model(1), naive_model(7)], [shared], 5,
        in_col="value", series_cols=("series",), ts_col="ts",
    )
    assert len(pipes2) == 2 and all(p.horizon == 5 for p in pipes2)
    # length-1 LISTS broadcast like scalars (not silently zip-truncated)
    pipes3 = assemble_pipelines(
        [naive_model(7)], [[shared]], [1, 2, 3],
        in_col="value", series_cols=("series",), ts_col="ts",
    )
    assert [p.horizon for p in pipes3] == [1, 2, 3]
    assert [len(p.transforms) for p in pipes3] == [1, 1, 1]
    assert pipes3[0].model is not pipes3[1].model
    # one of them runs end-to-end
    out = pipes[0].fit(_panel(spark)).forecast()
    assert out.count() == 2  # horizon 1 x 2 series
    with pytest.raises(ValueError, match="broadcastable|same length"):
        assemble_pipelines(
            [naive_model(1), naive_model(7)], [shared], [1, 2, 3],
            in_col="value", series_cols=("series",), ts_col="ts",
        )


def test_auto_select_picks_known_winner(spark):
    """AutoSelect (plans/auto.py — reference Auto.fit grid reduction): on
    a 24h-periodic integer series, naive(24) beats naive(23) and the
    leaderboard ranks deterministically with exact integer numerators."""
    import datetime as dt

    from etna_spark.plans.auto import AutoSelect
    from etna_spark.plans.pipeline import assemble_pipelines

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(hours=i), float(100 + (i % 24)))
        for i in range(24 * 10)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, v double")
    pool = assemble_pipelines(
        models=[naive_model(23), naive_model(24)], transforms=[],
        horizons=6, in_col="v", series_cols=("series",), ts_col="ts",
        step_seconds=3600,
    )
    sel = AutoSelect(pool, names=["naive_23", "naive_24"], n_folds=2).fit(df)
    assert sel.best_index_ == 1
    lb = {r["name"]: r for r in sel.leaderboard(spark).collect()}
    assert lb["naive_24"]["rank"] == 1 and lb["naive_24"]["sum_abs_err"] == 0
    assert lb["naive_23"]["sum_abs_err"] > 0
    # tie-break by pool index: two identical candidates rank by position
    pool2 = assemble_pipelines(
        models=[naive_model(24), naive_model(24)], transforms=[],
        horizons=6, in_col="v", series_cols=("series",), ts_col="ts",
        step_seconds=3600,
    )
    sel2 = AutoSelect(pool2, names=["first", "second"], n_folds=2).fit(df)
    assert sel2.best_index_ == 0


def test_holt_winters_tracks_trend_plus_seasonality(spark):
    """HoltWintersModel (from-scratch additive triple smoothing, reference
    holt_winters.py:466 semantics): on linear-trend + periodic data the
    grid-fitted forecast lands within a tight band of the true
    continuation, and the fixed-parameter Pipeline path runs end-to-end
    per series with state riding in the group kernel."""
    import datetime as dt

    from etna_spark.plans.pipeline import HoltWintersModel, Pipeline

    t0 = dt.datetime(2024, 1, 1)
    season = [5.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    rows = [
        (s, t0 + dt.timedelta(days=i),
         base + 2.0 * i + season[i % 7])
        for s, base in (("a", 0.0), ("b", 100.0))
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, v double")
    p = Pipeline(
        model=HoltWintersModel(seasonality=7, fit_grid=[0.25, 0.5, 0.75]),
        horizon=7, step_seconds=86400,
        in_col="v", series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = p.forecast().collect()
    assert len(out) == 14
    for r in out:
        i = (r["ts"] - t0).days
        base = 0.0 if r["series"] == "a" else 100.0
        truth = base + 2.0 * i + season[i % 7]
        assert abs(r["v"] - truth) < 0.05, (r, truth)


def test_holt_winters_validations(spark):
    import pytest

    from etna_spark.plans.pipeline import HoltWintersModel, Pipeline

    with pytest.raises(ValueError, match="alpha"):
        HoltWintersModel(seasonality=7, alpha=1.5)
    with pytest.raises(ValueError, match="seasonality"):
        HoltWintersModel(seasonality=1)
    m = HoltWintersModel(seasonality=7)
    with pytest.raises(ValueError, match="two seasons"):
        m.kernel(np.arange(10, dtype=float), 3)
    with pytest.raises(ValueError, match="gap-filled"):
        m.kernel(np.array([np.nan] * 20), 3)
    # components are honestly unsupported (the reference's HW has none)
    df = _panel(spark, n=28)
    p = Pipeline(model=HoltWintersModel(seasonality=7, alpha=0.5),
                 horizon=3, in_col="value", series_cols=("series",),
                 ts_col="ts").fit(df)
    with pytest.raises(NotImplementedError, match="components"):
        p.forecast(return_components=True)


def test_linear_ar_recovers_process(spark):
    """LinearARModel (from-scratch per-segment linear AR core of the
    reference's linear.py adapters): coefficients recover a noiseless
    AR(2) process exactly, and the Pipeline forecast continues it."""
    import datetime as dt

    from etna_spark.plans.pipeline import LinearARModel, Pipeline

    c, p1, p2 = 40.0, 0.5, 0.25
    y = [400.0, 480.0]
    for _ in range(60):
        y.append(c + p1 * y[-1] + p2 * y[-2])
    y = [round(v) for v in y]  # integer cents; process is near fixed point
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("s", t0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(y)],
        "series string, ts timestamp, v double",
    )
    m = LinearARModel()
    p = Pipeline(model=m, horizon=4, step_seconds=3600, in_col="v",
                 series_cols=("series",), ts_col="ts").fit(df)
    out = sorted(p.forecast().collect(), key=lambda r: r["ts"])
    # continue the recursion by hand from the tail
    prev1, prev2 = float(y[-1]), float(y[-2])
    c0, q1, q2 = m.fit_coeffs(np.array(y, dtype=float))
    for r in out:
        nxt = c0 + q1 * prev1 + q2 * prev2
        assert abs(r["v"] - nxt) < 1e-9
        prev1, prev2 = nxt, prev1


def test_linear_ar_validations():
    import pytest

    from etna_spark.plans.pipeline import LinearARModel

    m = LinearARModel()
    with pytest.raises(ValueError, match="integer-valued"):
        m.fit_coeffs(np.array([1.5, 2.5, 3.5, 4.5, 5.5, 6.5]))
    with pytest.raises(NotImplementedError, match="singular"):
        m.fit_coeffs(np.array([7.0] * 20))
    with pytest.raises(ValueError, match=">= 5 points"):
        m.fit_coeffs(np.array([1.0, 2.0, 3.0, 4.0]))


def test_holt_and_ses_kernels_handcomputed():
    """Exact recursion checks against hand-unrolled arithmetic."""
    import numpy as np

    from etna_spark.plans.pipeline import HoltModel, SESModel

    # Holt, alpha=0.5 beta=0.5 on y=[2, 4, 6]: init l=2, b=2.
    # t=0: lnew=.5*2+.5*(2+2)=3;  b=.5*(3-2)+.5*2=1.5; l=3
    # t=1: lnew=.5*4+.5*(3+1.5)=4.25; b=.5*1.25+.5*1.5=1.375
    # t=2: lnew=.5*6+.5*(4.25+1.375)=5.8125; b=.5*1.5625+.5*1.375=1.46875
    out = HoltModel(alpha=0.5, beta=0.5).kernel(np.array([2.0, 4.0, 6.0]), 3)
    assert out.tolist() == [
        5.8125 + 1.46875, 5.8125 + 2 * 1.46875, 5.8125 + 3 * 1.46875]

    # a perfectly linear series with alpha=beta=1 forecasts the exact line
    y = np.arange(10, dtype=float) * 3.0 + 7.0
    out = HoltModel(alpha=1.0, beta=1.0).kernel(y, 4)
    assert out.tolist() == [(10 + h) * 3.0 + 7.0 for h in range(4)]

    # SES alpha=0.25 on [8, 4]: l=8 -> .25*4+.75*8=7 flat
    out = SESModel(alpha=0.25).kernel(np.array([8.0, 4.0]), 3)
    assert out.tolist() == [7.0, 7.0, 7.0]

    import pytest as _pt
    with _pt.raises(ValueError, match="alpha"):
        HoltModel(alpha=2.0)
    with _pt.raises(ValueError, match="alpha"):
        SESModel(alpha=-0.1)
    with _pt.raises(ValueError, match="gap-filled"):
        SESModel().kernel(np.array([1.0, np.nan]), 1)
    with _pt.raises(ValueError, match=">= 2 points"):
        HoltModel().kernel(np.array([1.0]), 1)


def test_piecewise_trend_kernel_exact_ols():
    """fit_trend matches numpy lstsq on the (1, t, ramp) design; the
    forecast extrapolates trend + seasonal-phase mean."""
    import numpy as np

    from etna_spark.plans.pipeline import PiecewiseTrendModel

    rng = np.random.RandomState(3)
    n = 96
    t = np.arange(n)
    y = np.round(
        50 + 3 * t + 4 * np.maximum(0, t - 48) + rng.randint(-4, 5, n)
    ).astype(float)
    m = PiecewiseTrendModel(seasonality=24)
    b0, b1, b2 = m.fit_trend(y, 48)
    X = np.column_stack([np.ones(n), t, np.maximum(0, t - 48)])
    ref = np.linalg.lstsq(X, y, rcond=None)[0]
    assert np.allclose([b0, b1, b2], ref, atol=1e-8)

    # zero-noise two-piece line with m=1 (no seasonal phases): the
    # forecast continues the second piece exactly up to seasonal centring
    y2 = (10 + 2 * t + 3 * np.maximum(0, t - 48)).astype(float)
    m1 = PiecewiseTrendModel(seasonality=1)
    out = m1.kernel(y2, 3)
    # seas[0] = mean(y) - mean(y) = 0 for m=1, so pure trend
    expect = [10 + 2 * (n - 1 + h) + 3 * (n - 1 + h - 48) for h in (1, 2, 3)]
    assert np.allclose(out, expect, atol=1e-6)

    import pytest as _pt
    with _pt.raises(ValueError, match="integer-valued"):
        m.fit_trend(np.array([1.5] * 30), 15)
    with _pt.raises(ValueError, match="knot\\+3"):
        m.fit_trend(np.array([1.0, 2.0, 3.0, 4.0]), 4)
    with _pt.raises(ValueError, match="gap-filled"):
        m.kernel(np.array([1.0, np.nan] * 30), 1)


def test_theta_kernel_matches_two_line_recursion():
    """ThetaModel ≡ hand-composed OLS line + SES over 2y − line."""
    import numpy as np

    from etna_spark.plans.pipeline import SESModel, ThetaModel

    rng = np.random.RandomState(7)
    n = 60
    t = np.arange(n)
    y = np.round(100 + 5 * t + rng.randint(-6, 7, n)).astype(float)
    # reference composition
    b = (n * (t * y).sum() - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    z = 2.0 * y - (a + b * t)
    l = z[0]
    for v in z[1:]:
        l = 0.5 * v + 0.5 * l
    out = ThetaModel(alpha=0.5).kernel(y, 4)
    expect = [0.5 * l + 0.5 * (a + b * (n - 1 + h)) for h in (1, 2, 3, 4)]
    assert np.allclose(out, expect, atol=1e-9)

    # on an exact line the theta forecast IS the line (z == line, SES
    # over the line converges to recent values; with alpha=1 exactly)
    y2 = (7.0 + 3.0 * t).astype(float)
    out2 = ThetaModel(alpha=1.0).kernel(y2, 2)
    # l = z_{n-1} = 2*y_{n-1} - line(n-1) = line(n-1)
    e = [0.5 * (7 + 3 * (n - 1)) + 0.5 * (7 + 3 * (n - 1 + h)) for h in (1, 2)]
    assert np.allclose(out2, e, atol=1e-9)

    import pytest as _pt
    with _pt.raises(ValueError, match="integer-valued"):
        ThetaModel().kernel(np.array([1.5, 2.5, 3.5]), 1)
    with _pt.raises(ValueError, match=">= 3 points"):
        ThetaModel().kernel(np.array([1.0, 2.0]), 1)


def test_croston_kernel_handcomputed():
    """Conditional two-state recursion against hand-unrolled arithmetic."""
    import numpy as np
    import pytest as _pt

    from etna_spark.plans.pipeline import CrostonModel

    y = np.array([0, 0, 4, 0, 0, 0, 6, 0, 2, 0, 0, 0], dtype=float)
    # first demand t=2: z=4, p=3, q=1; zeros → q=4 by t=5
    # t=6 (y=6): z=.5·6+.5·4=5, p=.5·4+.5·3=3.5, q=1
    # t=8 (y=2, q=2): z=.5·2+.5·5=3.5, p=.5·2+.5·3.5=2.75
    out = CrostonModel(alpha=0.5).kernel(y, 3)
    assert out.tolist() == [3.5 / 2.75] * 3

    # all-demand series degenerates to SES with p=1
    y2 = np.array([4.0, 8.0, 6.0])
    out2 = CrostonModel(alpha=0.5).kernel(y2, 1)
    assert out2[0] == (0.5 * 6 + 0.5 * (0.5 * 8 + 0.5 * 4)) / 1.0

    with _pt.raises(ValueError, match="at least one demand"):
        CrostonModel().kernel(np.zeros(5), 1)
    with _pt.raises(ValueError, match="non-negative"):
        CrostonModel().kernel(np.array([1.0, -2.0]), 1)
    with _pt.raises(ValueError, match="gap-filled"):
        CrostonModel().kernel(np.array([1.0, np.nan]), 1)
    with _pt.raises(ValueError, match="alpha"):
        CrostonModel(alpha=1.5)


def test_holt_damped_trend_handcomputed():
    """phi=0.5 damped Holt against hand-unrolled arithmetic; phi=1 is
    bit-identical to the classic branch."""
    import numpy as np
    import pytest as _pt

    from etna_spark.plans.pipeline import HoltModel

    # y=[2,4,6], alpha=beta=0.5, phi=0.5: init l=2, b=2.
    # t=0: lnew=.5·2+.5·(2+.5·2)=2.5; b=.5·(2.5−2)+.5·(.5·2)=0.75
    # t=1: lnew=.5·4+.5·(2.5+.375)=3.4375; b=.5·.9375+.5·.375=0.65625
    # t=2: lnew=.5·6+.5·(3.4375+.328125)=4.8828125;
    #      b=.5·1.4453125+.5·.328125=0.88671875
    out = HoltModel(alpha=0.5, beta=0.5, phi=0.5).kernel(
        np.array([2.0, 4.0, 6.0]), 3
    )
    l, b = 4.8828125, 0.88671875
    # damp sums: .5, .75, .875
    assert out.tolist() == [l + 0.5 * b, l + 0.75 * b, l + 0.875 * b]

    y = np.arange(30, dtype=float) * 2 + 5
    a = HoltModel(alpha=0.5, beta=0.25).kernel(y, 4)
    b2 = HoltModel(alpha=0.5, beta=0.25, phi=1.0).kernel(y, 4)
    assert a.tolist() == b2.tolist()

    with _pt.raises(ValueError, match="phi"):
        HoltModel(phi=0.0)
    with _pt.raises(ValueError, match="phi"):
        HoltModel(phi=1.5)
