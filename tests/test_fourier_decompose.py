"""FourierDecomposeTransform (reference dft_based.py:11-210): components +
residuals sum to the series, NaN head/tails preserved, middle NaNs raise,
k validation — mirroring the reference's test_dft_based.py assertions."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.fourier_decompose import (
    _num_pos_freqs,
    fourier_decompose,
)

START = dt.datetime(2021, 1, 1)


@pytest.fixture(scope="module")
def wave_df(spark):
    rng = np.random.default_rng(2)
    frames = []
    for s, (p1, p2) in {"a": (7, 30), "b": (14, 5)}.items():
        i = np.arange(120)
        y = (np.sin(2 * np.pi * i / p1) * 3 + np.cos(2 * np.pi * i / p2) * 2
             + 0.05 * i + rng.normal(0, 0.2, 120))
        frames.append(pd.DataFrame({
            "series": s,
            "ts": [START + dt.timedelta(days=int(j)) for j in i],
            "value": y,
        }))
    return spark.createDataFrame(pd.concat(frames)).cache()


@pytest.mark.parametrize("n,answ", [(10, 6), (11, 6), (12, 7), (1, 1)])
def test_num_pos_freqs(n, answ):
    assert _num_pos_freqs(n) == answ


def test_invalid_k(spark, wave_df):
    with pytest.raises(ValueError, match="must be positive"):
        fourier_decompose(wave_df, k=0)


def test_components_plus_residuals_sum_to_series(spark, wave_df):
    out = fourier_decompose(
        wave_df, k=5, in_col="value", residuals=True,
        series_cols=("series",), ts_col="ts",
    ).toPandas()
    comp_cols = [f"dft_{i}" for i in range(5)] + ["dft_residuals"]
    np.testing.assert_allclose(
        out[comp_cols].sum(axis=1), out["value"], rtol=1e-9
    )


def test_nan_tails_preserved(spark, wave_df):
    df = wave_df.withColumn(
        "value",
        F.when(
            (F.col("series") == "a")
            & (F.col("ts") < F.lit(START + dt.timedelta(days=2))),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    out = fourier_decompose(df, k=3, series_cols=("series",)).toPandas()
    head = out[(out.series == "a")
               & (out.ts < START + dt.timedelta(days=2))]
    assert head["dft_0"].isna().all()
    rest = out[~out["value"].isna()]
    assert not rest["dft_0"].isna().any()


def test_middle_nan_raises(spark, wave_df):
    df = wave_df.withColumn(
        "value",
        F.when(F.col("ts") == F.lit(START + dt.timedelta(days=50)),
               F.lit(None).cast("double")).otherwise(F.col("value")),
    )
    with pytest.raises(Exception, match="missing values"):
        fourier_decompose(df, k=3, series_cols=("series",)).collect()


def test_k_too_large_raises(spark, wave_df):
    with pytest.raises(Exception, match="must not be greater"):
        fourier_decompose(wave_df, k=70, series_cols=("series",)).collect()


def test_top_frequency_captures_dominant_wave(spark, wave_df):
    out = fourier_decompose(
        wave_df.filter("series = 'a'"), k=2, residuals=True,
        series_cols=("series",),
    ).toPandas().sort_values("ts")
    # components reduce residual variance (note: like the reference, each
    # component is the ifft of a single positive-frequency row WITHOUT its
    # conjugate, so non-DC amplitudes are halved — components explain
    # energy but don't fully reconstruct their wave)
    resid = out["dft_residuals"].to_numpy()
    assert np.var(resid) < np.var(out["value"].to_numpy())


@pytest.mark.parametrize("model,comp_cols", [
    ("stl", ["target_seasonality", "target_trend"]),
    ("holt", ["target_level"]),
    ("sma", ["target_prediction"]),
])
def test_model_decompose_components_sum(spark, wave_df, model, comp_cols):
    from etna_spark.operators.fourier_decompose import model_decompose

    out = model_decompose(
        wave_df, model=model, in_col="value", residuals=True, period=7,
        series_cols=("series",), ts_col="ts",
    ).toPandas()
    for c in comp_cols + ["target_residuals"]:
        assert c in out.columns
    got = out[comp_cols + ["target_residuals"]].sum(axis=1, min_count=1)
    mask = ~got.isna()
    np.testing.assert_allclose(got[mask], out.loc[mask, "value"], rtol=1e-9)
    # the model explains signal: residual var < series var
    assert np.nanvar(out["target_residuals"]) < np.nanvar(out["value"])


def test_model_decompose_rejects_unknown_model(spark, wave_df):
    from etna_spark.operators.fourier_decompose import model_decompose

    with pytest.raises(ValueError, match="not supported"):
        model_decompose(wave_df, model="prophet")


def test_direct_mode_matches_fft():
    """The exact direct-DFT mode must reproduce the FFT decomposition: the
    same top-k frequency SET, so component SUMS agree to numerical noise
    (per-column order differs by design: direct = amplitude-desc)."""
    import numpy as np

    from etna_spark.operators.fourier_decompose import (
        _dft_components,
        _dft_components_direct,
    )

    rng = np.random.default_rng(5)
    for n in (16, 30, 101):
        y = np.round(rng.normal(1000, 100, n))
        for k in (1, 3, 5):
            a = _dft_components(y, k, residuals=True)
            b = _dft_components_direct(y, k, residuals=True)
            np.testing.assert_allclose(
                a[:k].sum(axis=0), b[:k].sum(axis=0), atol=1e-6
            )
            np.testing.assert_allclose(a[k], b[k], atol=1e-6)
            # components + residual reconstruct the series in both modes
            np.testing.assert_allclose(b.sum(axis=0), y, atol=1e-6)
