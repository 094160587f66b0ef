"""Correlation matrix + model relevance table (reference
analysis/eda/utils.py:14-54, analysis/feature_relevance/relevance.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from etna_spark.operators.relevance import (
    correlation_matrix,
    model_relevance_table,
)

START = dt.datetime(2021, 1, 1)


@pytest.fixture()
def corr_df(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, 50)
    rows = []
    for i in range(50):
        ts = START + dt.timedelta(hours=i)
        rows.append(("a", ts, float(base[i])))
        rows.append(("b", ts, float(2 * base[i] + 1)))       # corr +1 with a
        rows.append(("c", ts, float(-base[i])))              # corr −1 with a
        rows.append(("d", ts, float(rng.normal(0, 1))))      # ~independent
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_correlation_matrix_matches_numpy(spark, corr_df):
    got = {
        (r.s1, r.s2): r.corr for r in correlation_matrix(corr_df).collect()
    }
    assert len(got) == 6
    pdf = corr_df.toPandas().pivot(index="ts", columns="series", values="value")
    for (s1, s2), v in got.items():
        np.testing.assert_allclose(
            v, np.corrcoef(pdf[s1], pdf[s2])[0, 1], rtol=1e-9
        )
    np.testing.assert_allclose(got[("a", "b")], 1.0, rtol=1e-12)
    np.testing.assert_allclose(got[("a", "c")], -1.0, rtol=1e-12)


def test_correlation_constant_series_is_null(spark):
    rows = [
        (s, START + dt.timedelta(hours=i), v)
        for i in range(10)
        for s, v in (("flat", 5.0), ("var", float(i)))
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = correlation_matrix(df).collect()
    assert len(out) == 1 and out[0]["corr"] is None  # zero variance → null


def test_model_relevance_table_finds_signal(spark):
    rng = np.random.default_rng(3)
    rows = []
    for s in ("a", "b"):
        for i in range(400):
            x1 = float(rng.normal(0, 1))
            x2 = float(rng.normal(0, 1))
            noise = float(rng.normal(0, 0.01))
            rows.append((s, i, 3.0 * x1 + noise, x1, x2))
    df = spark.createDataFrame(
        rows, "series string, idx int, target double, x1 double, x2 double"
    )
    out = model_relevance_table(
        df, ["x1", "x2"], target_col="target", series_cols=("series",)
    ).toPandas()
    assert len(out) == 4  # 2 series × 2 features
    for s in ("a", "b"):
        sub = out[out["series"] == s].set_index("feature")["relevance"]
        assert sub["x1"] > 0.8 > sub["x2"]
        np.testing.assert_allclose(sub.sum(), 1.0, rtol=1e-9)
