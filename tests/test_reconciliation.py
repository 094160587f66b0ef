"""Bottom-up / top-down reconciliation (reference reconciliation/
bottom_up.py:5-60, top_down.py:25-139)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.reconciliation import (
    BottomUpReconciliator,
    TopDownReconciliator,
)

START = dt.datetime(2021, 1, 1)


@pytest.fixture()
def mapping(spark):
    return spark.createDataFrame(
        [("c1", "p1"), ("c2", "p1"), ("c3", "p2")],
        "child string, parent string",
    )


@pytest.fixture()
def child_df(spark):
    # c1 : c2 keeps a 1 : 3 split inside p1; c3 alone makes up p2
    rows = []
    for i in range(10):
        ts = START + dt.timedelta(days=i)
        rows.append(("c1", ts, float(10 + i)))
        rows.append(("c2", ts, float(3 * (10 + i))))
        rows.append(("c3", ts, float(5 + 2 * i)))
    return spark.createDataFrame(rows, "child string, ts timestamp, value double")


def test_bottom_up_is_rollup(spark, mapping, child_df):
    rec = BottomUpReconciliator(
        mapping, "child", "parent", value_col="value", ts_col="ts"
    ).fit(child_df)
    out = rec.reconcile(child_df).toPandas()
    got = {
        (r.parent, r.ts): r.value for r in out.itertuples(index=False)
    }
    assert got[("p1", START)] == 10.0 + 30.0
    assert got[("p2", START)] == 5.0
    assert len(out) == 20  # 2 parents × 10 days


@pytest.mark.parametrize("method", ["AHP", "PHA"])
def test_topdown_constant_split_recovers_exact_shares(
    spark, mapping, child_df, method
):
    rec = TopDownReconciliator(
        mapping, "child", "parent", period=5, method=method,
        value_col="value", ts_col="ts",
    ).fit(child_df)
    props = rec._proportions.toPandas().set_index("child")["_w"].to_dict()
    np.testing.assert_allclose(props["c1"], 0.25, rtol=1e-12)
    np.testing.assert_allclose(props["c2"], 0.75, rtol=1e-12)
    np.testing.assert_allclose(props["c3"], 1.0, rtol=1e-12)
    fc = spark.createDataFrame(
        [("p1", START + dt.timedelta(days=10), 100.0),
         ("p2", START + dt.timedelta(days=10), 40.0)],
        "parent string, ts timestamp, value double",
    )
    out = rec.reconcile(fc).toPandas().set_index("child")["value"]
    np.testing.assert_allclose(out["c1"], 25.0, rtol=1e-12)
    np.testing.assert_allclose(out["c2"], 75.0, rtol=1e-12)
    np.testing.assert_allclose(out["c3"], 40.0, rtol=1e-12)


def test_topdown_ahp_matches_numpy_on_drifting_shares(spark, mapping):
    # c1's share of p1 drifts: AHP averages the per-day ratios,
    # PHA takes the ratio of the averages — they must differ here and each
    # must match its numpy definition (reference top_down.py:129-139)
    rows = []
    c1 = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    c2 = np.array([9.0, 8.0, 7.0, 6.0, 5.0])
    for i in range(5):
        ts = START + dt.timedelta(days=i)
        rows.append(("c1", ts, float(c1[i])))
        rows.append(("c2", ts, float(c2[i])))
        rows.append(("c3", ts, 1.0))
    df = spark.createDataFrame(rows, "child string, ts timestamp, value double")
    p = c1 + c2  # constant 10
    ahp = TopDownReconciliator(
        mapping, "child", "parent", period=5, method="AHP",
        value_col="value", ts_col="ts",
    ).fit(df)
    pha = TopDownReconciliator(
        mapping, "child", "parent", period=5, method="PHA",
        value_col="value", ts_col="ts",
    ).fit(df)
    w_ahp = ahp._proportions.toPandas().set_index("child")["_w"].to_dict()
    w_pha = pha._proportions.toPandas().set_index("child")["_w"].to_dict()
    np.testing.assert_allclose(w_ahp["c1"], np.mean(c1 / p), rtol=1e-12)
    np.testing.assert_allclose(w_pha["c1"], np.mean(c1) / np.mean(p), rtol=1e-12)


def test_topdown_period_slices_last_timestamps(spark, mapping, child_df):
    # period=1 → proportions from the final day only: c1 share = 19/76
    rec = TopDownReconciliator(
        mapping, "child", "parent", period=1, method="PHA",
        value_col="value", ts_col="ts",
    ).fit(child_df)
    props = rec._proportions.toPandas().set_index("child")["_w"].to_dict()
    np.testing.assert_allclose(props["c1"], 19.0 / 76.0, rtol=1e-12)


def test_topdown_rejects_negative_and_bad_args(spark, mapping, child_df):
    neg = child_df.withColumn(
        "value", F.when(F.col("child") == "c1", -1.0).otherwise(F.col("value"))
    )
    rec = TopDownReconciliator(
        mapping, "child", "parent", period=3, method="AHP",
        value_col="value", ts_col="ts",
    )
    with pytest.raises(ValueError, match="negative"):
        rec.fit(neg)
    with pytest.raises(ValueError, match="Unable to recognize"):
        TopDownReconciliator(mapping, "child", "parent", period=3, method="XX")
    with pytest.raises(ValueError, match="must be positive"):
        TopDownReconciliator(mapping, "child", "parent", period=0)
    with pytest.raises(ValueError, match="not fitted"):
        rec.reconcile(child_df)


def test_hierarchical_pipeline_topdown(spark, mapping, child_df):
    from etna_spark.operators.reconciliation import HierarchicalPipeline
    from etna_spark.plans.pipeline import Pipeline, naive_model

    rec = TopDownReconciliator(
        mapping, "child", "parent", period=5, method="PHA",
        value_col="value", ts_col="ts",
    )
    pipe = Pipeline(
        model=naive_model(1), horizon=3, step_seconds=86400,
        in_col="value", series_cols=("parent",), ts_col="ts",
    )
    hp = HierarchicalPipeline(pipe, rec).fit(child_df)
    raw = hp.raw_forecast().toPandas().set_index(["parent", "ts"])["value"]
    out = hp.forecast().toPandas()
    assert len(raw) == 6 and len(out) == 9  # 2 parents×3 / 3 children×3
    # PHA proportions sum to 1 per parent on a fully-covered history, so
    # the reconciled children sum back to the parent forecast
    summed = out.groupby(["parent", "ts"])["value"].sum()
    np.testing.assert_allclose(
        summed.sort_index().to_numpy(), raw.sort_index().to_numpy(),
        rtol=1e-9,
    )
    # constant shares inside p1: c1 gets a quarter
    c1 = out[out["child"] == "c1"].set_index("ts")["value"]
    p1 = raw.loc["p1"]
    np.testing.assert_allclose(c1.sort_index(), 0.25 * p1.sort_index(), rtol=1e-9)


def test_hierarchical_pipeline_bottomup(spark, mapping, child_df):
    from etna_spark.operators.reconciliation import HierarchicalPipeline
    from etna_spark.plans.pipeline import Pipeline, naive_model

    rec = BottomUpReconciliator(
        mapping, "child", "parent", value_col="value", ts_col="ts"
    )
    pipe = Pipeline(
        model=naive_model(1), horizon=3, step_seconds=86400,
        in_col="value", series_cols=("child",), ts_col="ts",
    )
    hp = HierarchicalPipeline(pipe, rec).fit(child_df)
    raw = hp.raw_forecast().toPandas()
    out = hp.forecast().toPandas().set_index(["parent", "ts"])["value"]
    expect = (
        raw.merge(mapping.toPandas(), on="child")
        .groupby(["parent", "ts"])["value"].sum()
    )
    np.testing.assert_allclose(
        out.sort_index().to_numpy(), expect.sort_index().to_numpy(), rtol=1e-12
    )


def test_topdown_reconciles_interval_columns(spark, mapping, child_df):
    from etna_spark.operators.reconciliation import HierarchicalPipeline
    from etna_spark.plans.pipeline import Pipeline, naive_model
    from pyspark.sql import functions as F2

    # make the parent series noisy so sigma > 0
    noisy = child_df.withColumn(
        "value", F.col("value") + (F.dayofmonth("ts") % 3).cast("double")
    )
    rec = TopDownReconciliator(
        mapping, "child", "parent", period=5, method="PHA",
        value_col="value", ts_col="ts",
    )
    pipe = Pipeline(
        model=naive_model(1), horizon=3, step_seconds=86400,
        in_col="value", series_cols=("parent",), ts_col="ts",
    )
    hp = HierarchicalPipeline(pipe, rec).fit(noisy)
    out = hp.forecast(prediction_interval=True, n_folds=3).toPandas()
    assert {"value_0.025", "value_0.975"} <= set(out.columns)
    # child-scale bounds bracket the child-scale forecast
    assert (out["value_0.025"] <= out["value"] + 1e-9).all()
    assert (out["value"] <= out["value_0.975"] + 1e-9).all()


def test_bottomup_rejects_interval_columns(spark, mapping, child_df):
    rec = BottomUpReconciliator(
        mapping, "child", "parent", value_col="value", ts_col="ts"
    ).fit(child_df)
    with_iv = child_df.withColumn("value_0.975", F.col("value") + 1)
    with pytest.raises(ValueError, match="not summable"):
        rec.reconcile(with_iv)
