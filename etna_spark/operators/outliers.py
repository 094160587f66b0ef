"""Point-outlier detection + NaN-ing transform (reversible).

Reference protocol: ``OutliersTransform`` (base
/root/reference/etna/transforms/outliers/base.py:17-213) — fit DETECTS
outlier (segment, timestamp) pairs with a detection function, transform sets
them to null, inverse_transform restores the original values.

Detection methods:
- median (/root/reference/etna/analysis/outliers/median_outliers.py:14-60):
  TUMBLING blocks of ``window_size`` points per series; flag
  |x − median(block)| > alpha · std(block) (std ddof=0). Pure SQL: block id
  from row_number, exact percentile + stddev_pop per block.
- iqr / mad (/root/reference/etna/analysis/outliers/
  rolling_statistics.py:219-385): interval estimated on a rolling window —
  here the trailing ``window_size`` points; flag points outside
  [q25 − s·IQR, q75 + s·IQR] (iqr) or |x − med| > s·MAD (mad, MAD = median
  absolute deviation). Exact rolling quantiles via the window_stats numpy
  kernel (never percentile_approx).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.operators.window_stats import window_stat
from etna_spark.plans.state import materialize


def detect_outliers_median(
    df: DataFrame,
    in_col: str = "value",
    window_size: int = 10,
    alpha: float = 3.0,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """(series..., ts) rows flagged by the tumbling-block median method."""
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    blocked = df.withColumn(
        "_block", F.floor((F.row_number().over(w) - 1) / window_size)
    )
    bw = Window.partitionBy(*series_cols, "_block")
    flagged = blocked.withColumn(
        "_med", F.percentile(in_col, F.lit(0.5)).over(bw)
    ).withColumn("_std", F.stddev_pop(in_col).over(bw))
    return (
        flagged.filter(F.abs(F.col(in_col) - F.col("_med")) > F.col("_std") * alpha)
        .select(*series_cols, ts_col)
    )


def _stl_adjust(
    df: DataFrame,
    in_col: str,
    period: int,
    trend: bool,
    seasonality: bool,
    series_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Subtract STL trend and/or seasonal components before detection
    (reference rolling_statistics.py:84-126 ``_stl_decompose``). The
    reference re-decomposes EVERY rolling window — O(n·window·STL); at
    scale we decompose each series once, which estimates the same
    components over strictly more data."""
    from etna_spark.operators.stl import stl_decompose

    keys = list(series_cols)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").copy()
        y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
        ok = ~np.isnan(y)
        if ok.sum() >= 2 * period:
            season, tr, _ = stl_decompose(y[ok], period)
            adj = y.copy()
            sub = np.zeros(int(ok.sum()))
            if trend:
                sub = sub + tr
            if seasonality:
                sub = sub + season
            adj[ok] = y[ok] - sub
            pdf[in_col] = adj
        return pdf

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.groupBy(*keys).applyInPandas(kern, fields)


def detect_outliers_iqr(
    df: DataFrame,
    in_col: str = "value",
    window_size: int = 10,
    iqr_scale: float = 1.5,
    trend: bool = False,
    seasonality: bool = False,
    period: int | None = None,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    if iqr_scale <= 0:
        raise ValueError("Scaling parameter must be positive!")
    if trend or seasonality:
        if period is None:
            raise ValueError("`period` is required with trend/seasonality")
        df = _stl_adjust(df, in_col, period, trend, seasonality,
                         series_cols, ts_col)
    q25 = window_stat(
        df, in_col, "_q25", "quantile", window_size, quantile=0.25,
        fillna=float("nan"), series_cols=series_cols, ts_col=ts_col,
    )
    both = window_stat(
        q25, in_col, "_q75", "quantile", window_size, quantile=0.75,
        fillna=float("nan"), series_cols=series_cols, ts_col=ts_col,
    )
    iqr = F.col("_q75") - F.col("_q25")
    lo = F.col("_q25") - iqr * iqr_scale
    hi = F.col("_q75") + iqr * iqr_scale
    return (
        both.filter((F.col(in_col) < lo) | (F.col(in_col) > hi))
        .select(*series_cols, ts_col)
    )


def detect_outliers_mad(
    df: DataFrame,
    in_col: str = "value",
    window_size: int = 10,
    mad_scale: float = 3.0,
    trend: bool = False,
    seasonality: bool = False,
    period: int | None = None,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    if mad_scale <= 0:
        raise ValueError("Scaling parameter must be positive!")
    if trend or seasonality:
        if period is None:
            raise ValueError("`period` is required with trend/seasonality")
        df = _stl_adjust(df, in_col, period, trend, seasonality,
                         series_cols, ts_col)
    med = window_stat(
        df, in_col, "_med", "median", window_size,
        fillna=float("nan"), series_cols=series_cols, ts_col=ts_col,
    )
    # MAD = median(|x − rolling med|) over the same window: compute deviation
    # then rolling median of it
    dev = med.withColumn("_dev", F.abs(F.col(in_col) - F.col("_med")))
    mad = window_stat(
        dev, "_dev", "_mad", "median", window_size,
        fillna=float("nan"), series_cols=series_cols, ts_col=ts_col,
    )
    return (
        mad.filter(F.abs(F.col(in_col) - F.col("_med")) > F.col("_mad") * mad_scale)
        .select(*series_cols, ts_col)
    )


def _density_outlier_indices(
    y: np.ndarray, window_size: int, distance_threshold: float, n_neighbors: int
) -> np.ndarray:
    """Vectorized density rule (reference analysis/outliers/
    density_outliers.py:53-127): point i is NOT an outlier iff some window of
    ``window_size`` consecutive points containing i holds >= n_neighbors
    points (excluding i) with |y_j - y_i| < distance_threshold. Banded
    closeness matrix + cumsum window sums: O(n·window)."""
    n = len(y)
    w = min(window_size, n)
    offs = np.arange(-(w - 1), w)                      # band offsets
    j = np.arange(n)[:, None] + offs[None, :]          # (n, 2w-1)
    valid = (j >= 0) & (j < n)
    jj = np.clip(j, 0, n - 1)
    d = np.abs(y[jj] - y[:, None])
    close = ((d < distance_threshold) & valid).astype(np.int64)
    close[:, w - 1] = 0                                # exclude self
    # window starting at offset s (relative, s in [-(w-1), 0]) covers band
    # columns [s+w-1, s+2w-2]; cumsum gives each w-wide sum along the band
    cs = np.concatenate([np.zeros((n, 1), dtype=np.int64), np.cumsum(close, axis=1)], axis=1)
    win_sums = cs[:, w:] - cs[:, :w]                   # (n, w) sums for s=-(w-1)..0
    i = np.arange(n)
    s_abs = i[:, None] + np.arange(-(w - 1), 1)[None, :]
    ok_start = (s_abs >= 0) & (s_abs + w - 1 < n)
    win_sums = np.where(ok_start, win_sums, -1)
    return np.flatnonzero(win_sums.max(axis=1) < n_neighbors)


def detect_outliers_density(
    df: DataFrame,
    in_col: str = "value",
    window_size: int = 15,
    distance_coef: float = 3.0,
    n_neighbors: int = 3,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Density rule per series; threshold = distance_coef · std(series)
    (reference get_anomalies_density, density_outliers.py:130-216). Constant
    series (std=0) yield no outliers, nulls are dropped like the reference."""
    keys = list(series_cols)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        pdf = pdf[~pdf[in_col].isna()]
        y = pdf[in_col].to_numpy(np.float64)
        if len(y) == 0:
            return pdf.iloc[:0][[*keys, ts_col]]
        std = float(y.std())
        if std <= 0:
            return pdf.iloc[:0][[*keys, ts_col]]
        idx = _density_outlier_indices(
            y, window_size, distance_coef * std, n_neighbors
        )
        return pdf.iloc[idx][[*keys, ts_col]]

    schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in [*keys, ts_col]
    )
    return df.groupBy(*keys).applyInPandas(kern, schema)


def _norm_ppf(p: float) -> float:
    """Acklam's inverse normal CDF (public rational approximation, |ε|<1e-9)
    — scipy is unavailable in this environment."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    import math

    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        return -_norm_ppf(1 - p)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )


def detect_outliers_prediction_interval(
    df: DataFrame,
    in_col: str = "value",
    period: int = 24,
    interval_width: float = 0.95,
    model: str = "arima",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
    step_seconds: int = 3600,
) -> DataFrame:
    """Model-based detection (reference analysis/outliers/
    prediction_interval_outliers.py:69-175): points outside the central
    ``interval_width`` prediction interval are outliers. The reference fits
    Prophet/SARIMAX; here the in-sample predictor is the engine's own
    STL + trend model (operators/stl.py) and the interval is
    pred ± z·std(residual), z = Φ⁻¹((1+width)/2)."""
    from etna_spark.operators.stl import STLTransform

    t = STLTransform(
        period=period, model=model, in_col=in_col,
        series_cols=series_cols, ts_col=ts_col, step_seconds=step_seconds,
    ).fit(df)
    resid = t.transform(df)
    z = _norm_ppf(0.5 + interval_width / 2.0)
    sig = resid.groupBy(*series_cols).agg(
        F.stddev_pop(in_col).alias("_sig")
    )
    return (
        resid.join(F.broadcast(sig), on=list(series_cols))
        .filter(F.abs(F.col(in_col)) > F.lit(z) * F.col("_sig"))
        .select(*series_cols, ts_col)
    )


def _iforest_scores(
    X: np.ndarray, n_estimators: int, max_samples: int, seed: int
) -> np.ndarray:
    """Isolation forest anomaly scores (Liu, Ting & Zhou 2008), numpy-only
    (sklearn is unavailable): score = 2^(−E[path]/c(ψ)); 0.5 is the
    'auto' threshold (sklearn decision_function offset −0.5)."""
    rng = np.random.RandomState(seed)
    n, n_feat = X.shape
    psi = min(max_samples, n)

    def c(m: float) -> float:
        if m <= 1:
            return 0.0
        return 2.0 * (np.log(m - 1.0) + 0.5772156649) - 2.0 * (m - 1.0) / m

    hlim = int(np.ceil(np.log2(max(psi, 2))))
    depths = np.zeros(n)

    def grow(idx_sample: np.ndarray, idx_eval: np.ndarray, depth: int):
        if depth >= hlim or len(idx_sample) <= 1:
            depths[idx_eval] += depth + c(len(idx_sample))
            return
        f = rng.randint(n_feat)
        col = X[idx_sample, f]
        lo, hi = col.min(), col.max()
        if lo == hi:
            depths[idx_eval] += depth + c(len(idx_sample))
            return
        split = rng.uniform(lo, hi)
        left_s = idx_sample[col < split]
        right_s = idx_sample[col >= split]
        ev = X[idx_eval, f] < split
        grow(left_s, idx_eval[ev], depth + 1)
        grow(right_s, idx_eval[~ev], depth + 1)

    all_idx = np.arange(n)
    for _ in range(n_estimators):
        sample = rng.choice(n, psi, replace=False)
        grow(sample, all_idx, 0)
    return np.power(2.0, -(depths / n_estimators) / max(c(psi), 1e-12))


def detect_outliers_isolation_forest(
    df: DataFrame,
    in_col: str = "value",
    feature_cols: Sequence[str] | None = None,
    n_estimators: int = 100,
    max_samples: int = 256,
    contamination: float | str = "auto",
    seed: int = 0,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Per-series isolation forest (reference analysis/outliers/
    isolation_forest_outliers.py:59-66 — sklearn IsolationForest per
    segment). 'auto' contamination flags score > 0.5; a float flags the
    top-``contamination`` quantile. Deterministic via the seed."""
    keys = list(series_cols)
    feats = list(feature_cols) if feature_cols else [in_col]

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        pdf = pdf.dropna(subset=feats)
        if len(pdf) == 0:
            return pdf.iloc[:0][[*keys, ts_col]]
        X = pdf[feats].to_numpy(np.float64)
        scores = _iforest_scores(X, n_estimators, max_samples, seed)
        if contamination == "auto":
            mask = scores > 0.5
        else:
            thr = np.quantile(scores, 1.0 - float(contamination))
            mask = scores > thr
        return pdf.loc[mask, [*keys, ts_col]]

    schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in [*keys, ts_col]
    )
    return df.groupBy(*keys).applyInPandas(kern, schema)


_METHODS = {
    "median": detect_outliers_median,
    "iqr": detect_outliers_iqr,
    "mad": detect_outliers_mad,
    "density": detect_outliers_density,
    "prediction_interval": detect_outliers_prediction_interval,
    "isolation_forest": detect_outliers_isolation_forest,
}


class PointOutliersTransform:
    """fit: detect; transform: null the outliers; inverse: restore values."""

    def __init__(
        self,
        method: str = "median",
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
        **params,
    ):
        if method not in _METHODS:
            raise ValueError(f"method must be one of {sorted(_METHODS)}")
        self.method = method
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self.params = params
        self._outliers: DataFrame | None = None  # keys + original value

    def fit(self, df: DataFrame) -> "PointOutliersTransform":
        keys = _METHODS[self.method](
            df, in_col=self.in_col, series_cols=self.series_cols,
            ts_col=self.ts_col, **self.params,
        )
        saved = keys.join(df, on=[*self.series_cols, self.ts_col]).select(
            *self.series_cols, self.ts_col,
            F.col(self.in_col).alias("_orig_value"),
        )
        self._outliers = materialize(saved)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._outliers is None:
            raise ValueError("The transform isn't fitted!")
        keys = [*self.series_cols, self.ts_col]
        marked = df.join(F.broadcast(self._outliers), on=keys, how="left")
        return marked.withColumn(
            self.in_col,
            F.when(F.col("_orig_value").isNotNull(), F.lit(None)).otherwise(
                F.col(self.in_col)
            ),
        ).drop("_orig_value")

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        if self._outliers is None:
            raise ValueError("The transform isn't fitted!")
        keys = [*self.series_cols, self.ts_col]
        marked = df.join(F.broadcast(self._outliers), on=keys, how="left")
        return marked.withColumn(
            self.in_col, F.coalesce(F.col(self.in_col), F.col("_orig_value"))
        ).drop("_orig_value")


def winsorize_exact(
    df: "DataFrame",
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    series_cols=("segment",),
):
    """Winsorization (quantile clipping) at EXACT integer-domain
    percentiles: the per-segment bounds come from the histogram method
    (groupBy value -> cumulative count over the value-sorted aggregate)
    with the pinned lower-quantile rule min{v : cum >= ceil(q*n/100)} —
    the same engine-agnostic rule as tok_length_quantiles_exact, so the
    clip bounds and clipped values replay exactly in any SQL engine.
    The histogram aggregate is value-domain-sized; the clip itself is a
    broadcast join + least/greatest projection."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    keys = list(series_cols)
    hist = df.groupBy(*keys, value_col).agg(F.count("*").alias("c"))
    wcum = W.partitionBy(*keys).orderBy(value_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wseg = W.partitionBy(*keys)
    cum = hist.select(
        *keys, F.col(value_col).alias("v"),
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wseg).alias("n"),
    )
    def bound(pct):
        thr = F.ceil(F.col("n") * pct / 100)
        return (
            cum.filter(F.col("cum") >= thr)
            .groupBy(*keys)
            .agg(F.min("v").alias(f"q{pct}"))
        )
    bounds = bound(lo_pct).join(bound(hi_pct), on=keys)
    return df.join(F.broadcast(bounds), on=keys).withColumn(
        f"{value_col}_wins",
        F.least(
            F.greatest(F.col(value_col), F.col(f"q{lo_pct}")),
            F.col(f"q{hi_pct}"),
        ),
    )
