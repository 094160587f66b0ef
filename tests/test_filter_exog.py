"""FilterFeatures + exog_shift."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from etna_spark.operators.filter_features import FilterFeatures
from etna_spark.operators.lags import exog_shift


def _df(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = [
        ("s", t0 + dt.timedelta(days=i), float(i), float(10 * i), float(100 * i))
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "series string, ts timestamp, target double, exog_a double, exog_b double"
    )


def test_filter_include_exclude_and_restore(spark):
    df = _df(spark)
    inc = FilterFeatures(include=["target"], series_cols=("series",), ts_col="ts").fit(df)
    assert set(inc.transform(df).columns) == {"series", "ts", "target"}

    exc = FilterFeatures(
        exclude=["exog_a"], return_features=True,
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = exc.transform(df)
    assert "exog_a" not in out.columns and "exog_b" in out.columns
    restored = exc.inverse_transform(out)
    assert set(restored.columns) == set(df.columns)
    assert restored.orderBy("ts").select("exog_a").collect()[3][0] == 30.0

    with pytest.raises(ValueError, match="exactly one option"):
        FilterFeatures(include=["a"], exclude=["b"])
    with pytest.raises(ValueError, match="not present"):
        FilterFeatures(include=["nope"], series_cols=("series",), ts_col="ts").fit(df)


def test_exog_shift(spark):
    df = _df(spark)
    out = exog_shift(df, ["exog_a"], horizon=2, series_cols=("series",), ts_col="ts")
    assert "exog_a" not in out.columns and "exog_a_shift_2" in out.columns
    vals = [r[0] for r in out.orderBy("ts").select("exog_a_shift_2").collect()]
    assert vals[:2] == [None, None]
    np.testing.assert_allclose(vals[2:], [0.0, 10.0, 20.0, 30.0])
