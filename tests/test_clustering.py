"""Series clustering (reference clustering/distances/*.py,
clustering/hierarchical/base.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.clustering import (
    HierarchicalClustering,
    _dtw_kernel,
    agglomerate,
    dtw_distance_matrix,
    euclidean_distance_matrix,
)

START = dt.datetime(2021, 1, 1)


def _dtw_bruteforce(x1, x2):
    # the reference's numba DP, verbatim semantics (dtw_distance.py:55-71)
    n, m = len(x1), len(x2)
    mat = np.empty((n, m))
    mat[0][0] = abs(x1[0] - x2[0])
    for i in range(1, n):
        mat[i][0] = abs(x1[i] - x2[0]) + mat[i - 1][0]
    for j in range(1, m):
        mat[0][j] = abs(x1[0] - x2[j]) + mat[0][j - 1]
    for i in range(1, n):
        for j in range(1, m):
            mat[i][j] = abs(x1[i] - x2[j]) + min(
                mat[i - 1][j], mat[i][j - 1], mat[i - 1][j - 1]
            )
    return mat[-1][-1]


def test_dtw_kernel_matches_reference_dp():
    rng = np.random.default_rng(3)
    for _ in range(60):
        n, m = rng.integers(1, 40, size=2)
        x1 = rng.normal(0, 5, n)
        x2 = rng.normal(1, 3, m)
        np.testing.assert_allclose(
            _dtw_kernel(x1, x2), _dtw_bruteforce(x1, x2), rtol=1e-12
        )
    # identical series → 0; warping beats euclidean on shifted series
    x = rng.normal(0, 1, 30)
    assert _dtw_kernel(x, x) == 0.0
    shifted = np.concatenate([[x[0]], x[:-1]])
    assert _dtw_kernel(x, shifted) <= np.linalg.norm(x - shifted)


@pytest.fixture()
def series_df(spark):
    rows = []
    base = np.sin(np.arange(24) / 3.0)
    for name, scale, offset in (
        ("a1", 1.0, 0.0), ("a2", 1.05, 0.02), ("b1", -1.0, 5.0), ("b2", -0.95, 5.1),
    ):
        for i in range(24):
            rows.append(
                (name, START + dt.timedelta(hours=i),
                 float(scale * base[i] + offset))
            )
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_euclidean_matrix_matches_numpy_with_trim(spark, series_df):
    # knock two timestamps out of a1 — trim_series compares the overlap
    gappy = series_df.filter(
        ~((F.col("series") == "a1") & (F.hour("ts") < 2))
    )
    got = {
        (r.s1, r.s2): r.dist
        for r in euclidean_distance_matrix(gappy).collect()
    }
    pdf = gappy.toPandas().pivot(index="ts", columns="series", values="value")
    for (s1, s2), v in got.items():
        both = pdf[[s1, s2]].dropna()
        np.testing.assert_allclose(
            v, np.linalg.norm(both[s1] - both[s2]), rtol=1e-12
        )
    assert len(got) == 6  # 4 choose 2


def test_dtw_matrix_end_to_end(spark, series_df):
    got = {
        (r.s1, r.s2): r.dist for r in dtw_distance_matrix(series_df).collect()
    }
    pdf = series_df.toPandas().pivot(index="ts", columns="series", values="value")
    for (s1, s2), v in got.items():
        np.testing.assert_allclose(
            v, _dtw_bruteforce(pdf[s1].to_numpy(), pdf[s2].to_numpy()),
            rtol=1e-12,
        )


@pytest.mark.parametrize("linkage", ["single", "complete", "average"])
def test_agglomerate_recovers_groups(spark, series_df, linkage):
    dist = euclidean_distance_matrix(series_df).toPandas()
    labels = agglomerate(dist, n_clusters=2, linkage=linkage)
    assert labels["a1"] == labels["a2"]
    assert labels["b1"] == labels["b2"]
    assert labels["a1"] != labels["b1"]


def test_agglomerate_rejects_ward_and_bad_k(spark, series_df):
    dist = euclidean_distance_matrix(series_df).toPandas()
    with pytest.raises(ValueError, match="ward"):
        agglomerate(dist, 2, linkage="ward")
    with pytest.raises(ValueError, match="n_clusters"):
        agglomerate(dist, 9)


@pytest.mark.parametrize("distance", ["euclidean", "dtw"])
def test_lifecycle_and_centroids(spark, series_df, distance):
    hc = HierarchicalClustering(distance=distance).build_distance_matrix(
        series_df
    )
    out = hc.fit_predict(n_clusters=2).toPandas().set_index("series")["cluster"]
    assert out["a1"] == out["a2"] != out["b1"] == out["b2"]
    cent = hc.get_centroids().toPandas()
    assert set(cent["cluster"]) == {0, 1}
    assert len(cent) == 48  # 2 clusters × 24 hours
    # centroid of the 'a' cluster is the per-ts mean of a1, a2
    pdf = series_df.toPandas().pivot(index="ts", columns="series", values="value")
    a_lab = out["a1"]
    a_cent = cent[cent["cluster"] == a_lab].set_index("ts")["value"].sort_index()
    np.testing.assert_allclose(
        a_cent.to_numpy(), ((pdf["a1"] + pdf["a2"]) / 2).to_numpy(), rtol=1e-12
    )


def test_not_fitted_raises(spark, series_df):
    hc = HierarchicalClustering()
    with pytest.raises(ValueError, match="Distance matrix is not built"):
        hc.fit_predict(2)
    with pytest.raises(ValueError, match="not fitted"):
        hc.get_centroids()


def test_isolated_series_still_gets_label(spark, series_df):
    # a series with zero timestamp overlap appears in no distance pair but
    # must still receive a cluster label (its own singleton at k=3)
    import datetime as _dt

    extra = spark.createDataFrame(
        [("lonely", _dt.datetime(2030, 1, 1, h), float(h)) for h in range(6)],
        "series string, ts timestamp, value double",
    )
    hc = HierarchicalClustering(distance="euclidean").build_distance_matrix(
        series_df.unionByName(extra)
    )
    out = hc.fit_predict(n_clusters=3).toPandas().set_index("series")["cluster"]
    assert "lonely" in out.index
    # the isolated series is never merged into a real cluster (inf distance)
    assert (out.drop("lonely") != out["lonely"]).all()


def test_agglomerate_all_inf_merges_roots_not_diagonal(spark):
    import pandas as pd

    # two disconnected groups, n_clusters=1: every cross distance is +inf —
    # the merge must combine two DISTINCT roots, never self-merge (which
    # silently dropped members)
    pairs = pd.DataFrame(
        {"s1": ["a", "c"], "s2": ["b", "d"], "dist": [1.0, 1.0]}
    )
    labels = agglomerate(pairs, n_clusters=1, nodes=["a", "b", "c", "d"])
    assert set(labels) == {"a", "b", "c", "d"}
    assert len(set(labels.values())) == 1
