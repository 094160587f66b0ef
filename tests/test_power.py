"""Power transform tests (reference math/power.py:26,95 — sklearn
PowerTransformer semantics): MLE λ recovery, transform/inverse round-trip,
standardize, per-segment vs macro, Box-Cox positivity guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.power import PowerTransform, _mle_lambda


def _df(spark, series_to_values: dict[str, np.ndarray]):
    frames = [
        pd.DataFrame({"series": s, "idx": np.arange(len(v)), "value": v})
        for s, v in series_to_values.items()
    ]
    return spark.createDataFrame(pd.concat(frames))


@pytest.fixture(scope="module")
def skewed_df(spark):
    rng = np.random.default_rng(11)
    return _df(
        spark,
        {
            "a": np.exp(rng.normal(0.0, 1.0, 400)),          # lognormal: BC λ≈0
            "b": np.exp(rng.normal(1.0, 0.5, 400)) + 2.0,
        },
    ).cache()


def test_mle_lambda_recovers_known_shapes():
    rng = np.random.default_rng(5)
    z = rng.normal(0, 1, 4000)
    # already-normal data: Yeo-Johnson λ ≈ 1 (identity-ish)
    assert abs(_mle_lambda(z, "yeo-johnson") - 1.0) < 0.15
    # lognormal: Box-Cox λ ≈ 0 (log)
    assert abs(_mle_lambda(np.exp(z), "box-cox") - 0.0) < 0.05


def test_boxcox_requires_positive():
    with pytest.raises(Exception, match="strictly positive"):
        _mle_lambda(np.array([1.0, -2.0, 3.0]), "box-cox")


@pytest.mark.parametrize("method", ["yeo-johnson", "box-cox"])
@pytest.mark.parametrize("standardize", [True, False])
def test_round_trip_per_segment(spark, skewed_df, method, standardize):
    t = PowerTransform(method=method, standardize=standardize)
    out = t.fit_transform(skewed_df)
    back = t.inverse_transform(out).toPandas().set_index(["series", "idx"])
    orig = skewed_df.toPandas().set_index(["series", "idx"])
    np.testing.assert_allclose(
        back["value"].sort_index(), orig["value"].sort_index(), rtol=1e-7
    )


def test_standardize_yields_unit_stats(spark, skewed_df):
    t = PowerTransform(method="box-cox", standardize=True)
    out = t.fit_transform(skewed_df).toPandas()
    for s, g in out.groupby("series"):
        assert abs(g["value"].mean()) < 1e-6
        assert abs(g["value"].std(ddof=0) - 1.0) < 1e-6


def test_transform_normalizes_skew(spark, skewed_df):
    t = PowerTransform(method="yeo-johnson", standardize=False)
    out = t.fit_transform(skewed_df).toPandas()
    raw = skewed_df.toPandas()

    def skew(v):
        v = np.asarray(v, dtype=float)
        return abs(((v - v.mean()) ** 3).mean() / (v.std() ** 3 + 1e-12))

    for s in ("a", "b"):
        assert skew(out.loc[out.series == s, "value"]) < skew(
            raw.loc[raw.series == s, "value"]
        )


def test_macro_grid_mle_matches_numpy(spark, skewed_df):
    """The distributed 3-pass grid MLE lands within grid resolution of the
    exact golden-section optimum on the pooled data."""
    t = PowerTransform(method="yeo-johnson", mode="macro", standardize=False)
    t.fit(skewed_df)
    lam_spark = t._stats.collect()[0]["_lam"]
    pooled = skewed_df.toPandas()["value"].to_numpy()
    lam_np = _mle_lambda(pooled, "yeo-johnson")
    assert abs(lam_spark - lam_np) < 2e-3


def test_macro_round_trip(spark, skewed_df):
    t = PowerTransform(method="yeo-johnson", mode="macro", standardize=True)
    out = t.fit_transform(skewed_df)
    back = t.inverse_transform(out).toPandas().set_index(["series", "idx"])
    orig = skewed_df.toPandas().set_index(["series", "idx"])
    np.testing.assert_allclose(
        back["value"].sort_index(), orig["value"].sort_index(), rtol=1e-7
    )


def test_yeo_johnson_handles_negatives(spark):
    rng = np.random.default_rng(3)
    df = _df(spark, {"m": rng.normal(-5.0, 3.0, 500)})
    t = PowerTransform(method="yeo-johnson")
    out = t.fit_transform(df)
    back = t.inverse_transform(out).toPandas().sort_values("idx")
    np.testing.assert_allclose(
        back["value"].to_numpy(),
        df.toPandas().sort_values("idx")["value"].to_numpy(),
        rtol=1e-7, atol=1e-9,
    )


def test_not_fitted_raises(spark, skewed_df):
    t = PowerTransform()
    with pytest.raises(ValueError, match="isn't fitted"):
        t.transform(skewed_df)


def test_macro_boxcox_rejects_nonpositive(spark):
    # macro mode must fail loudly like the per-segment path — under ANSI,
    # log(x<=0) is NULL and would silently mis-fit lambda otherwise
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([1.0, 2.0, 0.0, 3.0])],
        "series string, idx int, value double",
    )
    with pytest.raises(ValueError, match="strictly positive"):
        PowerTransform(method="box-cox", mode="macro").fit(df)
