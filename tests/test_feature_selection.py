"""Feature selection (reference feature_importance.py:36,160,
mrmr_selection.py:33): MRMR picks relevant non-redundant features, tree
importance ranks the dominant predictor first — seeded fixtures mirroring
the reference's useful/useless-regressor tests."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from etna_spark.operators.feature_selection import (
    _extra_trees_importance,
    mrmr_select,
    relevance_table,
    tree_importance_select,
)

START = dt.datetime(2020, 1, 1)


@pytest.fixture(scope="module")
def regressors_df(spark):
    """3 segments × 300 points: target is a random walk; 'useful_0/1' are
    target + small noise, 'useless_0..3' independent walks, 'dup' copies
    useful_0 (pure redundancy)."""
    rng = np.random.default_rng(0)
    frames = []
    for s in range(3):
        target = np.cumsum(rng.normal(0, 1, 300))
        frame = pd.DataFrame({
            "series": f"seg{s}",
            "ts": [START + dt.timedelta(days=i) for i in range(300)],
            "target": target,
            "useful_0": target + rng.normal(0, 0.3, 300),
            "useful_1": target + rng.normal(0, 0.5, 300),
            "dup": np.nan,
            "useless_0": np.cumsum(rng.normal(0, 1, 300)),
            "useless_1": np.cumsum(rng.normal(0, 1, 300)),
            "useless_2": rng.normal(0, 1, 300),
        })
        frame["dup"] = frame["useful_0"] + 1e-6 * rng.normal(0, 1, 300)
        frames.append(frame)
    return spark.createDataFrame(pd.concat(frames)).cache()


FEATURES = ["useful_0", "useful_1", "dup", "useless_0", "useless_1", "useless_2"]


def test_relevance_table_ranks_useful_first(spark, regressors_df):
    rel = (
        relevance_table(regressors_df, FEATURES, "target", ("series",))
        .groupBy("feature").agg({"relevance": "avg"})
        .collect()
    )
    r = {x["feature"]: x["avg(relevance)"] for x in rel}
    assert r["useful_0"] > 0.9 and r["useful_1"] > 0.9
    assert r["useful_0"] > r["useless_2"] and r["useful_1"] > r["useless_2"]


def test_mrmr_picks_relevant_not_redundant(spark, regressors_df):
    sel = mrmr_select(regressors_df, FEATURES, "target", top_k=2,
                      series_cols=("series",))
    # first pick: highest relevance (useful_0 or its dup); second pick must
    # NOT be the near-copy of the first
    assert sel[0] in ("useful_0", "dup")
    assert sel[1] != ("dup" if sel[0] == "useful_0" else "useful_0")


def test_mrmr_top_k_all(spark, regressors_df):
    sel = mrmr_select(regressors_df, FEATURES, "target", top_k=10,
                      series_cols=("series",))
    assert sel == FEATURES  # not enough features → all, original order


def test_mrmr_deterministic(spark, regressors_df):
    a = mrmr_select(regressors_df, FEATURES, "target", top_k=3,
                    series_cols=("series",))
    b = mrmr_select(regressors_df, FEATURES, "target", top_k=3,
                    series_cols=("series",))
    assert a == b


def test_mrmr_exact_matches_float_semantics(spark, regressors_df):
    """The integer-stat exact variant must make the same picks as the float
    version on integer-valued input (identical greedy semantics)."""
    from pyspark.sql import functions as F

    from etna_spark.operators.feature_selection import mrmr_select_exact

    ints = regressors_df.select(
        "series",
        *[
            F.round(F.col(c) * 100, 0).cast("long").alias(c)
            for c in ["target", *FEATURES]
        ],
    ).cache()
    exact = mrmr_select_exact(ints, FEATURES, "target", top_k=3,
                              series_cols=("series",))
    flt = mrmr_select(ints, FEATURES, "target", top_k=3,
                      series_cols=("series",))
    assert exact == flt
    assert exact[0] in ("useful_0", "dup")
    # exact top_k >= n_features passthrough
    assert mrmr_select_exact(ints, FEATURES, "target", top_k=10,
                             series_cols=("series",)) == FEATURES


def test_extra_trees_importance_numpy():
    rng = np.random.default_rng(1)
    n = 3000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    x3 = rng.normal(0, 1, n)
    y = 5.0 * x1 + 0.3 * x2 + rng.normal(0, 0.2, n)
    imp = _extra_trees_importance(np.column_stack([x1, x2, x3]), y, seed=0)
    assert np.argmax(imp) == 0
    assert imp[0] > imp[1] > imp[2]


def test_tree_importance_select_spark(spark, regressors_df):
    sel = tree_importance_select(
        regressors_df, FEATURES, "target", top_k=2, n_estimators=30, seed=0,
    )
    assert set(sel) <= {"useful_0", "useful_1", "dup"}


def test_tree_importance_numpy_fallback(spark, regressors_df):
    sel = tree_importance_select(
        regressors_df, FEATURES, "target", top_k=2, n_estimators=30, seed=0,
        backend="numpy",
    )
    assert set(sel) <= {"useful_0", "useful_1", "dup"}


def test_gale_shapley_select(spark, regressors_df):
    from etna_spark.operators.feature_selection import gale_shapley_select

    sel = gale_shapley_select(
        regressors_df, FEATURES, "target", top_k=3, series_cols=("series",)
    )
    assert len(sel) == 3 and len(set(sel)) == 3
    # the highly relevant family dominates the selection
    assert len(set(sel) & {"useful_0", "useful_1", "dup"}) >= 2
    # deterministic
    sel2 = gale_shapley_select(
        regressors_df, FEATURES, "target", top_k=3, series_cols=("series",)
    )
    assert sel == sel2


def test_gale_shapley_top_k_ge_features(spark, regressors_df):
    from etna_spark.operators.feature_selection import gale_shapley_select

    sel = gale_shapley_select(
        regressors_df, FEATURES, "target", top_k=10, series_cols=("series",)
    )
    assert sel == FEATURES
