"""Voting + direct ensembles (reference ensembles/voting_ensemble.py:22-238,
direct_ensemble.py:20-150)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from etna_spark.plans.ensembles import DirectEnsemble, VotingEnsemble
from etna_spark.plans.pipeline import (
    Pipeline,
    SeasonalMovingAverageModel,
    naive_model,
)

START = dt.datetime(2021, 1, 1)


def _pipe(model, horizon=7):
    return Pipeline(
        model=model, horizon=horizon, step_seconds=86400,
        in_col="value", series_cols=("series",), ts_col="ts",
    )


@pytest.fixture()
def weekly_df(spark):
    # exact period-7 pattern: naive(7) forecasts it perfectly, naive(1)
    # badly
    rows = []
    for s, base in (("a", 10.0), ("b", 100.0)):
        for i in range(70):
            rows.append(
                (s, START + dt.timedelta(days=i), float(base + (i % 7)))
            )
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_voting_uniform_is_mean(spark, weekly_df):
    ens = VotingEnsemble([_pipe(naive_model(7)), _pipe(naive_model(1))]).fit(
        weekly_df
    )
    out = ens.forecast().toPandas().set_index(["series", "ts"])["value"]
    f1 = _pipe(naive_model(7)).fit(weekly_df).forecast().toPandas().set_index(
        ["series", "ts"]
    )["value"]
    f2 = _pipe(naive_model(1)).fit(weekly_df).forecast().toPandas().set_index(
        ["series", "ts"]
    )["value"]
    np.testing.assert_allclose(
        out.sort_index(), (0.5 * f1 + 0.5 * f2).sort_index(), rtol=1e-12
    )


def test_voting_explicit_weights_normalized(spark, weekly_df):
    ens = VotingEnsemble(
        [_pipe(naive_model(7)), _pipe(naive_model(1))], weights=[3.0, 1.0]
    ).fit(weekly_df)
    assert ens.processed_weights == [0.75, 0.25]
    out = ens.forecast().toPandas().set_index(["series", "ts"])["value"]
    f1 = _pipe(naive_model(7)).fit(weekly_df).forecast().toPandas().set_index(
        ["series", "ts"]
    )["value"]
    f2 = _pipe(naive_model(1)).fit(weekly_df).forecast().toPandas().set_index(
        ["series", "ts"]
    )["value"]
    np.testing.assert_allclose(
        out.sort_index(), (0.75 * f1 + 0.25 * f2).sort_index(), rtol=1e-12
    )


@pytest.mark.parametrize("backend", ["mllib", "inprocess"])
def test_voting_auto_weights_favor_better_pipeline(spark, weekly_df, backend):
    ens = VotingEnsemble(
        [_pipe(naive_model(7)), _pipe(naive_model(1))], weights="auto",
        n_folds=3, auto_backend=backend,
    ).fit(weekly_df)
    w = ens.processed_weights
    assert abs(sum(w) - 1.0) < 1e-12
    # the perfect seasonal-naive predictor must dominate under either
    # importance backend (distributed MLlib forest / in-process numpy ET)
    assert w[0] > w[1]


def test_voting_validations(spark, weekly_df):
    with pytest.raises(ValueError, match="At least two"):
        VotingEnsemble([_pipe(naive_model(1))])
    with pytest.raises(ValueError, match="same horizon"):
        VotingEnsemble([_pipe(naive_model(1), 3), _pipe(naive_model(1), 5)])
    with pytest.raises(ValueError, match="Weights size"):
        VotingEnsemble(
            [_pipe(naive_model(1)), _pipe(naive_model(7))], weights=[1.0]
        )
    with pytest.raises(ValueError, match="Invalid format"):
        VotingEnsemble(
            [_pipe(naive_model(1)), _pipe(naive_model(7))], weights="magic"
        )
    with pytest.raises(ValueError, match="not fitted"):
        VotingEnsemble(
            [_pipe(naive_model(1)), _pipe(naive_model(7))]
        ).forecast()


def test_direct_merges_by_smallest_covering_horizon(spark, weekly_df):
    p3 = _pipe(naive_model(7), horizon=3)
    p6 = _pipe(SeasonalMovingAverageModel(window=2, seasonality=7), horizon=6)
    ens = DirectEnsemble([p3, p6]).fit(weekly_df)
    assert ens.horizon == 6
    out = ens.forecast().toPandas().set_index(["series", "ts"])["value"]
    f3 = _pipe(naive_model(7), 3).fit(weekly_df).forecast().toPandas()
    f6 = (
        _pipe(SeasonalMovingAverageModel(window=2, seasonality=7), 6)
        .fit(weekly_df).forecast().toPandas()
    )
    assert len(out) == 12  # 2 series × 6 steps
    for r in f3.itertuples(index=False):
        np.testing.assert_allclose(out[(r.series, r.ts)], r.value, rtol=1e-12)
    tail = f6[f6["ts"] > f3["ts"].max()]
    assert len(tail) == 6
    for r in tail.itertuples(index=False):
        np.testing.assert_allclose(out[(r.series, r.ts)], r.value, rtol=1e-12)


def test_direct_validations(spark, weekly_df):
    with pytest.raises(ValueError, match="pairwise different"):
        DirectEnsemble([_pipe(naive_model(1), 3), _pipe(naive_model(7), 3)])
    with pytest.raises(ValueError, match="not fitted"):
        DirectEnsemble(
            [_pipe(naive_model(1), 3), _pipe(naive_model(7), 6)]
        ).forecast()


def test_autoregressive_matches_pipeline_recursion(spark, weekly_df):
    from etna_spark.plans.pipeline import AutoRegressivePipeline

    model = SeasonalMovingAverageModel(window=2, seasonality=3)
    direct = _pipe(model, horizon=6).fit(weekly_df).forecast().toPandas()
    for step in (1, 2, 4):
        ar = AutoRegressivePipeline(
            model=SeasonalMovingAverageModel(window=2, seasonality=3),
            horizon=6, step=step, step_seconds=86400,
            in_col="value", series_cols=("series",), ts_col="ts",
        ).fit(weekly_df)
        got = ar.forecast().toPandas()
        d = direct.set_index(["series", "ts"])["value"].sort_index()
        g = got.set_index(["series", "ts"])["value"].sort_index()
        np.testing.assert_allclose(g.to_numpy(), d.to_numpy(), rtol=1e-12)


def test_autoregressive_with_reversible_transform(spark, weekly_df):
    from etna_spark.functions.math_ops import add_const, add_const_inverse
    from etna_spark.plans.pipeline import AutoRegressivePipeline

    class AddConst:
        def fit(self, d):
            return self

        def transform(self, d):
            return add_const(d, "value", 100.0)

        def inverse_transform(self, d):
            return add_const_inverse(d, "value", 100.0)

    ar = AutoRegressivePipeline(
        model=naive_model(7), horizon=7, step=3, step_seconds=86400,
        transforms=[AddConst()],
        in_col="value", series_cols=("series",), ts_col="ts",
    ).fit(weekly_df)
    out = ar.forecast().toPandas().set_index(["series", "ts"])["value"]
    plain = (
        _pipe(naive_model(7), 7).fit(weekly_df).forecast()
        .toPandas().set_index(["series", "ts"])["value"]
    )
    np.testing.assert_allclose(
        out.sort_index().to_numpy(), plain.sort_index().to_numpy(), rtol=1e-12
    )


def test_autoregressive_validations(spark, weekly_df):
    from etna_spark.plans.pipeline import AutoRegressivePipeline

    with pytest.raises(ValueError, match="positive"):
        AutoRegressivePipeline(model=naive_model(1), horizon=3, step=0)
    with pytest.raises(ValueError, match="not fitted"):
        AutoRegressivePipeline(model=naive_model(1), horizon=3).forecast()


def test_stacking_matches_numpy_ols(spark, weekly_df):
    from etna_spark.plans.ensembles import StackingEnsemble

    pipes = [_pipe(naive_model(7)), _pipe(naive_model(1))]
    ens = StackingEnsemble(pipes, n_folds=3).fit(weekly_df)
    # reproduce the meta-fit with numpy over the same design matrix
    ref_pipes = [_pipe(naive_model(7)).fit(weekly_df),
                 _pipe(naive_model(1)).fit(weekly_df)]
    hists = [
        p.get_historical_forecasts(weekly_df, n_folds=3)
        .toPandas().set_index(["series", "ts"])["prediction"]
        for p in ref_pipes
    ]
    actual = (
        ref_pipes[0].get_historical_forecasts(weekly_df, n_folds=3)
        .toPandas().set_index(["series", "ts"])["value"]
    )
    idx = hists[0].sort_index().index
    X = np.column_stack(
        [np.ones(len(idx))] + [h.loc[idx].to_numpy() for h in hists]
    )
    y = actual.loc[idx].to_numpy()
    sol = np.linalg.lstsq(X.T @ X, X.T @ y, rcond=None)[0]
    np.testing.assert_allclose(ens.intercept_, sol[0], atol=1e-8)
    np.testing.assert_allclose(ens.coef_, sol[1:], atol=1e-8)
    # the perfect seasonal-naive base should dominate the meta-weights
    assert abs(ens.coef_[0]) > abs(ens.coef_[1])
    out = ens.forecast().toPandas()
    f = [p.forecast().toPandas().set_index(["series", "ts"])["value"]
         for p in ref_pipes]
    expect = (
        ens.intercept_ + ens.coef_[0] * f[0] + ens.coef_[1] * f[1]
    ).sort_index()
    got = out.set_index(["series", "ts"])["value"].sort_index()
    np.testing.assert_allclose(got.to_numpy(), expect.to_numpy(), rtol=1e-9)


def test_stacking_cramer_matches_lstsq(spark, weekly_df):
    """The deterministic integer-stat Cramer solver must agree with the
    lstsq path on a well-conditioned integer-valued design."""
    from etna_spark.plans.ensembles import StackingEnsemble

    def pipes():
        return [_pipe(naive_model(7)),
                _pipe(SeasonalMovingAverageModel(window=2, seasonality=7))]

    # weekly pattern + a non-affine deterministic term: on the pure weekly
    # fixture the two bases coincide (singular design), and with a linear
    # trend they differ only by a constant (still collinear w/ intercept) —
    # the quadratic-residue term breaks both degeneracies, values stay
    # integral for the integer-stat solver
    rows = [
        (s, START + dt.timedelta(days=i), float(base + (i % 7) + (i * i % 11)))
        for s, base in (("a", 10.0), ("b", 100.0)) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    ls = StackingEnsemble(pipes(), n_folds=3).fit(df)
    cr = StackingEnsemble(pipes(), n_folds=3, solver="cramer").fit(df)
    np.testing.assert_allclose(cr.intercept_, ls.intercept_, atol=1e-7)
    np.testing.assert_allclose(cr.coef_, ls.coef_, atol=1e-7)
    with pytest.raises(ValueError, match="solver"):
        StackingEnsemble(pipes(), solver="qr")
    with pytest.raises(NotImplementedError, match="2 bases"):
        StackingEnsemble(
            [_pipe(naive_model(7)), _pipe(naive_model(1)),
             _pipe(naive_model(14))],
            solver="cramer",
        ).fit(weekly_df)


def test_stacking_cramer_rejects_non_half_integer(spark):
    """Non-half-integer base forecasts would be silently perturbed by the
    ×2 rounding — the solver must detect the deviation and point the caller
    at lstsq instead of returning wrong coefficients."""
    from etna_spark.plans.ensembles import StackingEnsemble

    # window=4 SMA produces quarter-integer means (sum of 4 ints / 4):
    # ×2-scaled values are not integral
    rows = [
        (s, START + dt.timedelta(days=i), float((i % 7) + (i * i % 11)))
        for s in ("a", "b") for i in range(70)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    ens = StackingEnsemble(
        [_pipe(naive_model(7)),
         _pipe(SeasonalMovingAverageModel(window=4, seasonality=7))],
        n_folds=3, solver="cramer",
    )
    with pytest.raises(ValueError, match="lstsq"):
        ens.fit(df)


def test_stacking_validations(spark, weekly_df):
    from etna_spark.plans.ensembles import StackingEnsemble

    with pytest.raises(ValueError, match="At least two"):
        StackingEnsemble([_pipe(naive_model(1))])
    with pytest.raises(ValueError, match="same horizon"):
        StackingEnsemble([_pipe(naive_model(1), 3), _pipe(naive_model(1), 5)])
    with pytest.raises(ValueError, match="not fitted"):
        StackingEnsemble(
            [_pipe(naive_model(1)), _pipe(naive_model(7))]
        ).forecast()
