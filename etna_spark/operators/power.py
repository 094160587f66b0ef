"""Power transforms: Yeo-Johnson and Box-Cox (reversible, λ fit by MLE).

Reference: ``YeoJohnsonTransform`` / ``BoxCoxTransform``
(/root/reference/etna/transforms/math/power.py:26,95) — thin wrappers over
``sklearn.preprocessing.PowerTransformer(method=..., standardize=...)``
driven by ``SklearnTransform`` with ``mode ∈ {per-segment, macro}``.

sklearn is unavailable here, so the MLE is implemented directly (public
formulas, Yeo & Johnson 2000 / Box & Cox 1964, identical to sklearn's
``_yeo_johnson_optimize``):

    ψ(x, λ)  — the power transform
    llf(λ) = -n/2 · ln(var_pop(ψ(x, λ))) + (λ-1) · Σ sign(x)·ln(1+|x|)
             (Box-Cox: + (λ-1) · Σ ln x;  requires x > 0)

- per-segment mode: each series fits locally inside an ``applyInPandas``
  kernel — golden-section search on λ ∈ [-5, 5] (sklearn: Brent with
  brack (-2, 2); both converge to the same unimodal optimum).
- macro mode: one λ over ALL rows. Collecting the column to the driver
  would be a 100 TB cliff, so the MLE runs distributed: the data-dependent
  term Σ sign·ln1p is one aggregate, and var_pop(ψ(x, λ)) is evaluated for
  a whole λ-GRID in a single aggregation pass (one sum/sumsq pair per grid
  point, all native expressions); three successively finer grids give
  λ to ~1e-4 in three passes over the data, independent of row count.

``standardize=True`` additionally zero-means/unit-variances the transformed
output (one more aggregate), matching sklearn. Fitted state is a tiny
per-series (or single-row) table, broadcast at transform; inverse applies
the exact algebraic inverse.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PowerTransform", "yeo_johnson_col", "box_cox_col"]

_EPS = 1e-12


# ---------------------------------------------------------------------------
# the transform as native column expressions (λ may be a column)
# ---------------------------------------------------------------------------

def yeo_johnson_col(x: Column, lam: Column) -> Column:
    """ψ_YJ(x, λ) as a native expression (handles the λ=0 / λ=2 limits)."""
    pos = (
        F.when(F.abs(lam) < _EPS, F.log1p(x))
        .otherwise((F.exp(lam * F.log1p(x)) - 1.0) / lam)
    )
    lam2 = 2.0 - lam
    neg = (
        F.when(F.abs(lam2) < _EPS, -F.log1p(-x))
        .otherwise(-(F.exp(lam2 * F.log1p(-x)) - 1.0) / lam2)
    )
    return F.when(x >= 0, pos).otherwise(neg)


def yeo_johnson_inv_col(y: Column, lam: Column) -> Column:
    """Inverse of ψ_YJ: ψ maps x≥0 → y≥0 and x<0 → y<0, so the branch is
    recoverable from the sign of y."""
    pos = (
        F.when(F.abs(lam) < _EPS, F.expm1(y))
        .otherwise(F.exp(F.log(y * lam + 1.0) / lam) - 1.0)
    )
    lam2 = 2.0 - lam
    neg = (
        F.when(F.abs(lam2) < _EPS, -F.expm1(-y))
        .otherwise(1.0 - F.exp(F.log(1.0 - lam2 * y) / lam2))
    )
    return F.when(y >= 0, pos).otherwise(neg)


def box_cox_col(x: Column, lam: Column) -> Column:
    return (
        F.when(F.abs(lam) < _EPS, F.log(x))
        .otherwise((F.exp(lam * F.log(x)) - 1.0) / lam)
    )


def box_cox_inv_col(y: Column, lam: Column) -> Column:
    return (
        F.when(F.abs(lam) < _EPS, F.exp(y))
        .otherwise(F.exp(F.log(y * lam + 1.0) / lam))
    )


# ---------------------------------------------------------------------------
# numpy MLE (per-segment kernels)
# ---------------------------------------------------------------------------

def _yj_numpy(x: np.ndarray, lam: float) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    if abs(lam) < _EPS:
        out[pos] = np.log1p(x[pos])
    else:
        out[pos] = (np.power(x[pos] + 1.0, lam) - 1.0) / lam
    if abs(lam - 2.0) < _EPS:
        out[~pos] = -np.log1p(-x[~pos])
    else:
        out[~pos] = -(np.power(1.0 - x[~pos], 2.0 - lam) - 1.0) / (2.0 - lam)
    return out


def _bc_numpy(x: np.ndarray, lam: float) -> np.ndarray:
    if abs(lam) < _EPS:
        return np.log(x)
    return (np.power(x, lam) - 1.0) / lam


def _mle_lambda(x: np.ndarray, method: str) -> float:
    """Golden-section maximization of the profile log-likelihood on [-5, 5]."""
    x = x[~np.isnan(x)]
    n = len(x)
    if n < 2:
        return 1.0
    if method == "box-cox":
        if np.any(x <= 0):
            raise ValueError("The Box-Cox transformation can only be applied "
                             "to strictly positive data")
        const = float(np.log(x).sum())
        psi = _bc_numpy
    else:
        const = float((np.sign(x) * np.log1p(np.abs(x))).sum())
        psi = _yj_numpy

    def nll(lam: float) -> float:
        v = float(np.var(psi(x, lam)))
        if not np.isfinite(v) or v <= 0:
            return np.inf
        return 0.5 * n * math.log(v) - (lam - 1.0) * const

    # coarse grid to bracket the optimum, then golden section
    grid = np.linspace(-5.0, 5.0, 101)
    vals = np.array([nll(g) for g in grid])
    k = int(np.argmin(vals))
    lo = grid[max(k - 1, 0)]
    hi = grid[min(k + 1, len(grid) - 1)]
    invphi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = nll(c), nll(d)
    for _ in range(100):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = nll(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = nll(d)
        if b - a < 1e-9:
            break
    return float((a + b) / 2.0)


# ---------------------------------------------------------------------------
# Spark transform
# ---------------------------------------------------------------------------

class PowerTransform:
    def __init__(
        self,
        method: str = "yeo-johnson",
        standardize: bool = True,
        mode: str = "per-segment",
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
    ):
        if method not in ("yeo-johnson", "box-cox"):
            raise ValueError(f"bad method {method}")
        if mode not in ("per-segment", "macro"):
            raise ValueError(f"bad mode {mode}")
        self.method = method
        self.standardize = standardize
        self.mode = mode
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self._stats: DataFrame | None = None  # keys..., _lam, _mean, _std

    # -- fit --------------------------------------------------------------

    def _keys(self) -> list[str]:
        return self.series_cols if self.mode == "per-segment" else []

    def _psi(self, x: Column, lam: Column) -> Column:
        return (
            yeo_johnson_col(x, lam)
            if self.method == "yeo-johnson"
            else box_cox_col(x, lam)
        )

    def _fit_per_segment(self, df: DataFrame) -> DataFrame:
        in_col, keys, method = self.in_col, self.series_cols, self.method
        psi = _yj_numpy if method == "yeo-johnson" else _bc_numpy

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            x = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
            lam = _mle_lambda(x, method)
            t = psi(x[~np.isnan(x)], lam)
            head = pdf.iloc[:1][keys].copy()
            head["_lam"] = lam
            head["_mean"] = float(t.mean()) if len(t) else 0.0
            head["_std"] = float(t.std()) if len(t) else 1.0
            return head

        key_schema = ", ".join(
            f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
        )
        return df.groupBy(*keys).applyInPandas(
            kern, f"{key_schema}, _lam double, _mean double, _std double"
        )

    def _fit_macro(self, df: DataFrame) -> DataFrame:
        """Distributed grid MLE: three passes, each evaluating llf(λ) for a
        41-point grid with native aggregates only (no driver data)."""
        x = F.col(self.in_col)
        base = df.filter(x.isNotNull())
        if self.method == "box-cox":
            # fail like the per-segment path/sklearn — under ANSI, log(x<=0)
            # is NULL and would silently mis-fit lambda otherwise
            if base.filter(x <= 0).limit(1).count() > 0:
                raise ValueError(
                    "The Box-Cox transformation can only be applied to "
                    "strictly positive data"
                )
            const_expr = F.sum(F.log(x))
        else:
            const_expr = F.sum(F.signum(x) * F.log1p(F.abs(x)))
        row = base.agg(
            const_expr.alias("c"), F.count(x).alias("n")
        ).collect()[0]
        const, n = float(row["c"]), int(row["n"])
        if n < 2:
            lam = 1.0
        else:
            center, half = 0.0, 5.0
            lam = 1.0
            for _ in range(3):
                grid = np.linspace(center - half, center + half, 41)
                aggs = []
                for i, g in enumerate(grid):
                    p = self._psi(x, F.lit(float(g)))
                    aggs.append(F.var_pop(p).alias(f"v{i}"))
                r = base.agg(*aggs).collect()[0]
                llf = [
                    -0.5 * n * math.log(r[f"v{i}"]) + (g - 1.0) * const
                    if r[f"v{i}"] and r[f"v{i}"] > 0
                    else -math.inf
                    for i, g in enumerate(grid)
                ]
                k = int(np.argmax(llf))
                center = float(grid[k])
                half = float(grid[1] - grid[0])  # next grid spans ±1 step
                lam = center
        p = self._psi(x, F.lit(lam))
        stats = base.agg(
            F.avg(p).alias("_mean"), F.stddev_pop(p).alias("_std")
        ).select(F.lit(lam).alias("_lam"), "_mean", "_std")
        return stats

    def fit(self, df: DataFrame) -> "PowerTransform":
        if self.mode == "per-segment":
            stats = self._fit_per_segment(df)
        else:
            stats = self._fit_macro(df)
        # guard zero variance like sklearn _handle_zeros_in_scale
        stats = stats.withColumn(
            "_std", F.when(F.col("_std") <= 0, F.lit(1.0)).otherwise(F.col("_std"))
        )
        self._stats = stats.cache()
        self._stats.count()  # materialize once; stays executor-side
        return self

    # -- apply ------------------------------------------------------------

    def _join_stats(self, df: DataFrame) -> DataFrame:
        if self._stats is None:
            raise ValueError("The transform isn't fitted!")
        keys = self._keys()
        if keys:
            return df.join(F.broadcast(self._stats), on=keys, how="left")
        return df.crossJoin(F.broadcast(self._stats))

    def transform(self, df: DataFrame) -> DataFrame:
        j = self._join_stats(df)
        y = self._psi(F.col(self.in_col), F.col("_lam"))
        if self.standardize:
            y = (y - F.col("_mean")) / F.col("_std")
        return j.withColumn(self.in_col, y).drop("_lam", "_mean", "_std")

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        j = self._join_stats(df)
        y = F.col(self.in_col)
        if self.standardize:
            y = y * F.col("_std") + F.col("_mean")
        inv = (
            yeo_johnson_inv_col(y, F.col("_lam"))
            if self.method == "yeo-johnson"
            else box_cox_inv_col(y, F.col("_lam"))
        )
        return j.withColumn(self.in_col, inv).drop("_lam", "_mean", "_std")

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)
