"""Save/load of fitted transforms and pipelines (reference SaveMixin /
Pipeline.save — mixins.py:240-320): loaded objects must produce identical
outputs without refitting."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from etna_spark.operators.scalers import Scaler
from etna_spark.plans.pipeline import Pipeline, SeasonalMovingAverageModel
from etna_spark.plans.serialization import (
    load_object,
    load_pipeline,
    save_object,
    save_pipeline,
)

START = dt.datetime(2021, 1, 1)


@pytest.fixture()
def series_df(spark):
    rng = np.random.default_rng(8)
    frames = []
    for s in ("a", "b"):
        y = np.cumsum(rng.normal(0, 1, 60)) + 50
        frames.append(pd.DataFrame({
            "series": s,
            "ts": [START + dt.timedelta(days=i) for i in range(60)],
            "value": y,
        }))
    return spark.createDataFrame(pd.concat(frames)).cache()


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_transform_save_load_round_trip(spark, series_df, tmp_path):
    t = Scaler(in_col="value", kind="robust", series_cols=("series",)).fit(
        series_df
    )
    expected = _sorted_rows(t.transform(series_df))
    save_object(t, str(tmp_path / "scaler"))
    t2 = load_object(str(tmp_path / "scaler"), spark)
    assert isinstance(t2, Scaler)
    got = _sorted_rows(t2.transform(series_df))
    assert got == expected
    # inverse works on the loaded object too
    inv = _sorted_rows(t2.inverse_transform(t2.transform(series_df)))
    orig = _sorted_rows(series_df.select("series", "ts", "value"))
    for g, o in zip(inv, orig):
        assert g[0] == o[0] and g[1] == o[1]
        assert abs(g[2] - o[2]) < 1e-9


def test_pipeline_save_load_forecast_identical(spark, series_df, tmp_path):
    p = Pipeline(
        model=SeasonalMovingAverageModel(window=3, seasonality=7),
        transforms=[Scaler(in_col="value", series_cols=("series",))],
        horizon=5,
        step_seconds=86400,
        in_col="value",
        series_cols=("series",),
        ts_col="ts",
    ).fit(series_df)
    expected = _sorted_rows(p.forecast().select("series", "ts", "value"))
    save_pipeline(p, str(tmp_path / "pipe"))
    p2 = load_pipeline(str(tmp_path / "pipe"), spark)
    assert p2.horizon == 5 and p2.model.window == 3
    got = _sorted_rows(p2.forecast().select("series", "ts", "value"))
    assert [g[:2] for g in got] == [e[:2] for e in expected]
    np.testing.assert_allclose(
        [g[2] for g in got], [e[2] for e in expected], rtol=1e-12
    )
