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


def _dba_reference(series_list, n_iters=10):
    """Reference DBA re-derived scalar (dtw_distance.py:73-160): longest
    series seed, full-matrix DP + first-min backtrack, path-walk update."""

    def build(x1, x2):
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
        return mat

    def path(mat):
        i, j = mat.shape[0] - 1, mat.shape[1] - 1
        p = [(i, j)]
        while i and j:
            cands = [(i - 1, j), (i, j - 1), (i - 1, j - 1)]
            costs = np.array([mat[c] for c in cands])
            i, j = cands[int(np.argmin(costs))]
            p.append((i, j))
        while i:
            i -= 1
            p.append((i, j))
        while j:
            j -= 1
            p.append((i, j))
        return p

    centroid = max(series_list, key=len).copy()
    for _ in range(n_iters):
        assoc = centroid.copy()
        n_samples = np.ones(len(centroid))
        for series in series_list:
            mat = build(centroid, series)
            p = path(mat)
            i, j = len(centroid) - 1, len(series) - 1
            while i and j:
                assoc[i] += series[j]
                n_samples[i] += 1
                p.pop(0)
                i, j = p[0]
        centroid = assoc / n_samples
    return centroid


def test_dba_centroid_matches_reference():
    from etna_spark.operators.clustering import dba_centroid

    rng = np.random.default_rng(11)
    for _ in range(5):
        series_list = [
            rng.normal(0, 2, int(n)) for n in rng.integers(8, 30, size=3)
        ]
        np.testing.assert_allclose(
            dba_centroid(series_list, n_iters=4),
            _dba_reference(series_list, n_iters=4),
            rtol=1e-12,
        )
    # barycenter of two identical series is that series
    x = rng.normal(0, 1, 20)
    np.testing.assert_allclose(dba_centroid([x, x.copy()]), x, rtol=1e-12)


def test_get_centroids_dba(spark, series_df):
    hc = HierarchicalClustering(distance="dtw").build_distance_matrix(
        series_df
    )
    labels = hc.fit_predict(n_clusters=2).toPandas().set_index("series")[
        "cluster"
    ]
    cent = hc.get_centroids(method="dba", n_iters=3).toPandas()
    assert set(cent["cluster"]) == {0, 1}
    assert len(cent) == 48  # both clusters keep their longest member's grid
    # cross-check one cluster against the reference DBA on the same members
    pdf = series_df.toPandas().pivot(index="ts", columns="series", values="value")
    a_lab = labels["a1"]
    members = sorted(s for s in labels.index if labels[s] == a_lab)
    expected = _dba_reference(
        [pdf[s].to_numpy() for s in members], n_iters=3
    )
    got = cent[cent["cluster"] == a_lab].sort_values("ts")["value"].to_numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-12)
    with pytest.raises(ValueError, match="unknown centroid method"):
        hc.get_centroids(method="medoid")


def test_fit_predict_threshold_distributed(spark):
    """Distributed single-linkage over an injected sparse pair table: 10⁵
    series in 34k three-node chains — never materialized on the driver — plus the
    driver-path cardinality guard."""
    n_groups = 34_000
    nodes = spark.range(n_groups * 3).select(
        F.concat(F.lit("s"), F.format_string("%06d", "id")).alias("series"),
        F.lit(START).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    g = (F.col("id") / 3).cast("long")
    within = (
        spark.range(n_groups * 3)
        .withColumn("g", g)
        .withColumn("r", F.col("id") % 3)
        .filter(F.col("r") < 2)  # edges r0-r1, r1-r2 per triangle (a chain)
        .select(
            F.concat(F.lit("s"), F.format_string("%06d", "id")).alias("s1"),
            F.concat(
                F.lit("s"), F.format_string("%06d", F.col("id") + 1)
            ).alias("s2"),
            F.lit(0.5).alias("dist"),
        )
    )
    hc = HierarchicalClustering(series_col="series")
    hc._df = nodes
    hc._dist = within
    out = hc.fit_predict_threshold(threshold=1.0)
    agg = out.groupBy("cluster").count()
    assert agg.count() == n_groups
    assert agg.filter(F.col("count") != 3).count() == 0
    # labels are dense 0..n_groups-1
    mx = out.agg(F.max("cluster"), F.min("cluster")).collect()[0]
    assert (mx[0], mx[1]) == (n_groups - 1, 0)
    # the driver path refuses this cardinality
    hc2 = HierarchicalClustering(series_col="series")
    hc2._df = nodes
    hc2._dist = within
    hc2.MAX_DRIVER_SERIES = 1000
    with pytest.raises(ValueError, match="exceed the driver"):
        hc2.fit_predict(n_clusters=2)
