"""Series clustering: pairwise distance matrix + hierarchical clustering.

Reference parity:
- EuclideanDistance (/root/reference/etna/clustering/distances/
  euclidean_distance.py:13-50): ``trim_series=True`` compares the common-
  timestamp overlap — in Spark that's a per-timestamp self-join + one
  aggregation per pair, no arrays and no Python.
- DTWDistance (/root/reference/etna/clustering/distances/dtw_distance.py:
  35-100): the DP is per-pair — series are packed to arrays JVM-side
  (collect_list + sort_array) and a pandas UDF runs an EXACT row-vectorized
  DP: with t[j] = c[i,j] + min(m[i-1,j], m[i-1,j-1]) the serial
  m[i,j] = min(t[j], m[i,j-1] + c[i,j]) unrolls to
  S[j] + running-min(t - S) where S = cumsum(c[i]) — O(n) numpy per row
  instead of the reference's numba inner loop.
- DistanceMatrix + HierarchicalClustering (/root/reference/etna/clustering/
  distances/distance_matrix.py:19-110, hierarchical/base.py:33-160):
  sklearn's AgglomerativeClustering(metric='precomputed') becomes a
  Lance-Williams agglomeration over the collected n×n matrix — the matrix
  is #series², inherently driver-sized; only its CONSTRUCTION is
  distributed. Ward requires feature-space input and is rejected for
  precomputed matrices (sklearn does the same).

Scale note: all-pairs distance is quadratic in #series by definition.
For large fleets pre-bucket candidates (the dedup/ANN LSH machinery) and
run the matrix per bucket; the operators here take whatever pair set the
caller scopes.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LINKAGES = ("single", "complete", "average")


def euclidean_distance_matrix(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Pairs (s1 < s2, dist) over common timestamps (trim_series=True
    semantics). One shuffle on ts + one hash aggregation."""
    a = df.select(
        F.col(series_col).alias("s1"), F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v1"),
    ).filter(F.col("_v1").isNotNull())
    b = df.select(
        F.col(series_col).alias("s2"), F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v2"),
    ).filter(F.col("_v2").isNotNull())
    pairs = a.join(b, on="_ts").filter(F.col("s1") < F.col("s2"))
    d = F.col("_v1") - F.col("_v2")
    return pairs.groupBy("s1", "s2").agg(
        F.sqrt(F.sum(d * d)).alias("dist")
    )


def _pack(df: DataFrame, series_col: str, ts_col: str, value_col: str):
    # drop nulls like the reference's pre-DP NaN trim (dtw_distance.py):
    # one NULL observation must not poison every pair's DP with NaN
    df = df.filter(F.col(value_col).isNotNull())
    return df.groupBy(F.col(series_col).alias("s")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(value_col).alias("v")))
        ).alias("_pts")
    ).select("s", F.col("_pts.v").alias("vs"))


def _dtw_kernel(x1: np.ndarray, x2: np.ndarray) -> float:
    """Exact DTW with |.| point distance, row-vectorized DP."""
    c0 = np.abs(x1[0] - x2)
    m_prev = np.cumsum(c0)
    for i in range(1, len(x1)):
        c = np.abs(x1[i] - x2)
        shifted = np.empty_like(m_prev)
        shifted[0] = np.inf
        shifted[1:] = m_prev[:-1]
        t = c + np.minimum(m_prev, shifted)
        s = np.cumsum(c)
        m_prev = s + np.minimum.accumulate(t - s)
    return float(m_prev[-1])


def dtw_distance_matrix(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Pairs (s1 < s2, dist) under dynamic time warping. Arrays are packed
    JVM-side; each pair's DP runs in an Arrow-batched pandas UDF."""

    @pandas_udf("double")
    def dtw(v1: pd.Series, v2: pd.Series) -> pd.Series:
        return pd.Series([
            _dtw_kernel(
                np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
            )
            for a, b in zip(v1, v2)
        ])

    packed = _pack(df, series_col, ts_col, value_col)
    left = packed.select(F.col("s").alias("s1"), F.col("vs").alias("_v1"))
    right = packed.select(F.col("s").alias("s2"), F.col("vs").alias("_v2"))
    pairs = left.join(right, F.col("s1") < F.col("s2"))
    return pairs.select("s1", "s2", dtw("_v1", "_v2").alias("dist"))


def dtw_distance_pairs_sym(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """All pairs s1 <= s2 with the DTW kernel run in BOTH argument orders
    (columns dist, dist_rev) — the self-verification surface: dist must be
    0 on the diagonal and equal dist_rev off it."""

    @pandas_udf("dist double, dist_rev double")
    def both(v1: pd.Series, v2: pd.Series) -> pd.DataFrame:
        rows = []
        for a, b in zip(v1, v2):
            a = np.asarray(a, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            rows.append((_dtw_kernel(a, b), _dtw_kernel(b, a)))
        return pd.DataFrame(rows, columns=["dist", "dist_rev"])

    packed = _pack(df, series_col, ts_col, value_col)
    left = packed.select(F.col("s").alias("s1"), F.col("vs").alias("_v1"))
    right = packed.select(F.col("s").alias("s2"), F.col("vs").alias("_v2"))
    pairs = left.join(right, F.col("s1") <= F.col("s2"))
    return pairs.select("s1", "s2", both("_v1", "_v2").alias("_d")).select(
        "s1", "s2", "_d.dist", "_d.dist_rev"
    )


def _dtw_matrix(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """Full DTW cost matrix (reference _build_matrix, dtw_distance.py:55-71)
    with |.| point distance — row-vectorized like ``_dtw_kernel`` (the
    prefix-min unrolling is bit-equal to the serial DP), but every row is
    kept for path backtracking."""
    n1, n2 = len(x1), len(x2)
    m = np.empty((n1, n2))
    m[0] = np.cumsum(np.abs(x1[0] - x2))
    for i in range(1, n1):
        c = np.abs(x1[i] - x2)
        shifted = np.empty(n2)
        shifted[0] = np.inf
        shifted[1:] = m[i - 1, :-1]
        t = c + np.minimum(m[i - 1], shifted)
        s = np.cumsum(c)
        m[i] = s + np.minimum.accumulate(t - s)
    return m


def _dtw_path(matrix: np.ndarray) -> list[tuple[int, int]]:
    """Warping path, reference _get_path (dtw_distance.py:73-90) exactly —
    including its first-minimum tie-break over [(i-1,j), (i,j-1),
    (i-1,j-1)]."""
    i, j = matrix.shape[0] - 1, matrix.shape[1] - 1
    path = [(i, j)]
    while i and j:
        candidates = ((i - 1, j), (i, j - 1), (i - 1, j - 1))
        costs = [matrix[c] for c in candidates]
        k = costs.index(min(costs))
        i, j = candidates[k]
        path.append((i, j))
    while i:
        i -= 1
        path.append((i, j))
    while j:
        j -= 1
        path.append((i, j))
    return path


def _dba_iteration(centroid: np.ndarray, series_list) -> np.ndarray:
    """One DBA pass (reference _dba_iteration, dtw_distance.py:100-117):
    warp every series onto the centroid, average the associated values —
    reproducing the reference's walk exactly (the (0, j)/(i, 0) tail of the
    path contributes nothing, as there)."""
    assoc = centroid.copy()
    n_samples = np.ones(len(centroid))
    for series in series_list:
        mat = _dtw_matrix(centroid, series)
        path = _dtw_path(mat)
        i, j = len(centroid) - 1, len(series) - 1
        while i and j:
            assoc[i] += series[j]
            n_samples[i] += 1
            path.pop(0)
            i, j = path[0]
    return assoc / n_samples


def dba_centroid(series_list, n_iters: int = 10) -> np.ndarray:
    """DTW barycenter average (reference _get_average, dtw_distance.py:
    137-160): start from the longest series (first among ties), run
    ``n_iters`` DBA passes."""
    longest = max(series_list, key=len)
    centroid = np.asarray(longest, dtype=np.float64).copy()
    for _ in range(n_iters):
        centroid = _dba_iteration(centroid, series_list)
    return centroid


def agglomerate(
    dist_pdf: pd.DataFrame,
    n_clusters: int,
    linkage: str = "average",
    nodes: list | None = None,
) -> dict:
    """Lance-Williams agglomerative clustering over a collected pair list
    (columns s1, s2, dist). Returns {series: cluster_label} with labels
    0..n_clusters-1 in first-seen order of the sorted series list.

    ``nodes`` fixes the label universe — a series with no pair rows (no
    timestamp overlap with anyone) still gets a label; absent pairs default
    to +inf distance (never merged), not 0."""
    if linkage not in LINKAGES:
        raise ValueError(
            f"linkage must be one of {LINKAGES} for a precomputed distance "
            f"matrix (ward needs feature-space input), got '{linkage}'"
        )
    names = sorted(
        set(nodes) if nodes is not None
        else set(dist_pdf["s1"]) | set(dist_pdf["s2"])
    )
    idx = {s: i for i, s in enumerate(names)}
    n = len(names)
    if n_clusters < 1 or n_clusters > n:
        raise ValueError(f"n_clusters must be in [1, {n}], got {n_clusters}")
    d = np.full((n, n), np.inf)
    for s1, s2, v in dist_pdf[["s1", "s2", "dist"]].itertuples(index=False):
        d[idx[s1], idx[s2]] = v
        d[idx[s2], idx[s1]] = v
    members = {i: [i] for i in range(n)}
    sizes = {i: 1 for i in range(n)}
    active = set(range(n))
    while len(active) > n_clusters:
        act = sorted(active)
        sub = d[np.ix_(act, act)]
        k = np.argmin(sub)
        ai, aj = divmod(k, len(act))
        if ai == aj or not np.isfinite(sub[ai, aj]):
            # every remaining pair is +inf (disconnected groups): argmin
            # lands on the diagonal, which must never self-merge — merge
            # the two smallest-index roots deterministically instead
            ai, aj = 0, 1
        i, j = act[ai], act[aj]
        if i > j:
            i, j = j, i
        for k2 in active:
            if k2 in (i, j):
                continue
            if linkage == "single":
                nd = min(d[i, k2], d[j, k2])
            elif linkage == "complete":
                nd = max(d[i, k2], d[j, k2])
            else:
                nd = (
                    sizes[i] * d[i, k2] + sizes[j] * d[j, k2]
                ) / (sizes[i] + sizes[j])
            d[i, k2] = d[k2, i] = nd
        members[i].extend(members[j])
        sizes[i] += sizes[j]
        active.remove(j)
    out = {}
    for label, root in enumerate(sorted(active)):
        for m in members[root]:
            out[names[m]] = label
    return out


class HierarchicalClustering:
    """Reference lifecycle (hierarchical/base.py:33-160):
    build_distance_matrix → fit_predict(n_clusters, linkage) →
    get_centroids. The matrix build is distributed; the agglomeration runs
    on the driver over the collected pair list (#series² scalars)."""

    def __init__(
        self,
        distance: str = "euclidean",
        series_col: str = "series",
        ts_col: str = "ts",
        value_col: str = "value",
    ):
        if distance not in ("euclidean", "dtw"):
            raise ValueError(f"unknown distance '{distance}'")
        self.distance = distance
        self.series_col = series_col
        self.ts_col = ts_col
        self.value_col = value_col
        self._df: DataFrame | None = None
        self._dist: DataFrame | None = None
        self.segment2cluster: dict | None = None

    def build_distance_matrix(self, df: DataFrame) -> "HierarchicalClustering":
        fn = (
            euclidean_distance_matrix
            if self.distance == "euclidean"
            else dtw_distance_matrix
        )
        self._df = df
        self._dist = fn(df, self.series_col, self.ts_col, self.value_col)
        return self

    # full-linkage agglomeration collects the #series² pair list to the
    # driver — hard-capped; larger fleets go through fit_predict_threshold
    # (distributed single-linkage) or the k-means/IVF path (data/ivf.py)
    MAX_DRIVER_SERIES = 10_000

    def fit_predict(
        self, n_clusters: int, linkage: str = "average"
    ) -> DataFrame:
        """Driver-side Lance-Williams agglomeration (reference
        hierarchical/base.py:33-160). O(#series²) driver memory — guarded
        at MAX_DRIVER_SERIES; beyond that use ``fit_predict_threshold``
        (distributed, single linkage) or MLlib k-means over features."""
        if self._dist is None:
            raise ValueError(
                "Distance matrix is not built! Call build_distance_matrix "
                "before fit_predict."
            )
        nodes = [
            r[0]
            for r in self._df.select(self.series_col).distinct().collect()
        ]
        if len(nodes) > self.MAX_DRIVER_SERIES:
            raise ValueError(
                f"{len(nodes)} series exceed the driver agglomeration cap "
                f"({self.MAX_DRIVER_SERIES}); use fit_predict_threshold() "
                f"(distributed single-linkage) or a k-means/IVF path for "
                f"large fleets."
            )
        labels = agglomerate(
            self._dist.toPandas(), n_clusters, linkage, nodes=nodes
        )
        self.segment2cluster = labels
        spark = self._df.sparkSession
        self._labels_df = spark.createDataFrame(
            sorted(labels.items()), f"{self.series_col} string, cluster int"
        )
        return self._labels_df

    def fit_predict_threshold(self, threshold: float) -> DataFrame:
        """Distributed single-linkage: series within ``threshold`` distance
        are edges, clusters are connected components (min-label
        propagation, data/dedup.py machinery) — cutting the dendrogram at a
        height instead of a cluster count. Never materializes the matrix
        anywhere: the pair table stays distributed end-to-end, so fleet
        cardinality is bounded by the cluster, not the driver. Labels are
        dense ints in first-seen order of the sorted series list (same
        convention as ``agglomerate``)."""
        from etna_spark.data.dedup import connected_components

        if self._dist is None:
            raise ValueError(
                "Distance matrix is not built! Call build_distance_matrix "
                "before fit_predict."
            )
        edges = self._dist.filter(F.col("dist") <= threshold).select(
            "s1", "s2"
        )
        comp = connected_components(edges, src="s1", dst="s2").select(
            F.col("u").alias("node"), "component"
        )
        all_series = self._df.select(
            F.col(self.series_col).alias("node")
        ).distinct()
        labeled = all_series.join(comp, on="node", how="left").select(
            F.col("node").alias(self.series_col),
            # isolated series (no edge within threshold) root themselves
            F.coalesce(F.col("component"), F.col("node")).alias("_root"),
        )
        # one row per CLUSTER: the unpartitioned running window is a single
        # task over a cluster-count-bounded table (≤ n_series rows), not a
        # data-sized sort
        wroot = Window.orderBy("_root")
        roots = (
            labeled.select("_root").distinct()
            .withColumn("cluster", (F.dense_rank().over(wroot) - 1).cast("int"))
        )
        out = labeled.join(roots, on="_root").select(
            self.series_col, "cluster"
        )
        self.segment2cluster = None  # labels live distributed
        self._labels_df = out
        return out

    def get_centroids(self, method: str = "euclidean",
                      n_iters: int = 10) -> DataFrame:
        """Per-cluster centroid series.

        ``method='euclidean'``: per-(cluster, timestamp) mean (reference
        euclidean_distance.py:48-60) — one hash aggregation.
        ``method='dba'``: DTW barycenter averaging (reference
        dtw_distance.py:100-160) — per-cluster applyInPandas over the
        JVM-packed member series; returns the barycenter on the longest
        member's timestamps. State rides with the group: one kernel call
        per cluster, no driver data."""
        if getattr(self, "_labels_df", None) is None or self._df is None:
            raise ValueError(
                "HierarchicalClustering is not fitted! Fit the "
                "HierarchicalClustering before calling get_centroids!"
            )
        if method not in ("euclidean", "dba"):
            raise ValueError(f"unknown centroid method '{method}'")
        lab = self._labels_df
        if method == "euclidean":
            # no forced broadcast: lab is one row per SERIES — unbounded
            # at doc-level key cardinality; Spark's size-limited broadcast
            # machinery decides
            return (
                self._df.join(lab, on=self.series_col)
                .groupBy("cluster", self.ts_col)
                .agg(F.avg(self.value_col).alias(self.value_col))
            )
        ts_type = self._df.schema[self.ts_col].dataType.simpleString()
        packed = (
            self._df.filter(F.col(self.value_col).isNotNull())
            .join(lab, on=self.series_col)
            .groupBy("cluster", self.series_col)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(
                        F.col(self.ts_col), F.col(self.value_col).alias("v")
                    ))
                ).alias("_pts")
            )
            .select(
                "cluster",
                F.col(self.series_col).alias("_series"),
                F.col(f"_pts.{self.ts_col}").alias("_tss"),
                F.col("_pts.v").alias("_vs"),
            )
        )
        ts_col, value_col = self.ts_col, self.value_col

        def dba_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            # deterministic member order (the reference iterates segments
            # in sorted order; Arrow batch order is not deterministic)
            pdf = pdf.sort_values("_series", kind="mergesort").reset_index(
                drop=True
            )
            series_list = [
                np.asarray(v, dtype=np.float64) for v in pdf["_vs"]
            ]
            longest_i = max(
                range(len(series_list)), key=lambda i: len(series_list[i])
            )
            centroid = dba_centroid(series_list, n_iters=n_iters)
            return pd.DataFrame({
                "cluster": pdf["cluster"].iloc[0],
                ts_col: pd.Series(pdf["_tss"].iloc[longest_i]),
                value_col: centroid,
            })

        return packed.groupBy("cluster").applyInPandas(
            dba_kernel,
            f"cluster int, {ts_col} {ts_type}, {value_col} double",
        )
