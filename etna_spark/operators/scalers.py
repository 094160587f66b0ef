"""Reversible scalers with per-segment or macro fitted statistics.

Reference: the sklearn-backed scaler family
(/root/reference/etna/transforms/math/scalers.py:18-269) driven by
``SklearnTransform`` (sklearn.py:30-311) with ``mode ∈ {per-segment, macro}``
(per-segment: statistics per series; macro: one set over all series).

Semantics (matching sklearn defaults, which the reference delegates to):

- standard: (x - mean) / std, std with ddof=0, optional with_mean/with_std;
  zero std → scale 1 (sklearn _handle_zeros_in_scale);
- minmax:  (x - min) / (max - min) scaled to feature_range; zero span → 1;
- maxabs:  x / max(|x|); zero → 1;
- robust:  (x - median) / (q_hi - q_lo) with linear-interpolated EXACT
  quantiles (never percentile_approx — SURVEY.md §4.3), optional
  with_centering/with_scaling.

Fit = one aggregation producing a tiny stats table (rows = series, or 1 for
macro), broadcast-joined at transform; inverse_transform applies the exact
algebraic inverse. All null-skipping, all native expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etna_spark.plans.state import materialize

KINDS = ("standard", "minmax", "maxabs", "robust")


class Scaler:
    def __init__(
        self,
        in_col: str = "value",
        kind: str = "standard",
        mode: str = "per-segment",
        with_mean: bool = True,
        with_std: bool = True,
        feature_range: tuple[float, float] = (0.0, 1.0),
        with_centering: bool = True,
        with_scaling: bool = True,
        quantile_range: tuple[float, float] = (25.0, 75.0),
        series_cols: Sequence[str] = ("series",),
    ):
        if kind not in KINDS:
            raise ValueError(f"kind must be one of {KINDS}")
        if mode not in ("per-segment", "macro"):
            raise ValueError(f"bad mode {mode}")
        self.in_col = in_col
        self.kind = kind
        self.mode = mode
        self.with_mean = with_mean
        self.with_std = with_std
        self.feature_range = feature_range
        self.with_centering = with_centering
        self.with_scaling = with_scaling
        self.quantile_range = quantile_range
        self.series_cols = list(series_cols)
        self._stats: DataFrame | None = None

    def _keys(self) -> list[str]:
        return self.series_cols if self.mode == "per-segment" else []

    def fit(self, df: DataFrame) -> "Scaler":
        c = F.col(self.in_col)
        q_lo, q_hi = (q / 100.0 for q in self.quantile_range)
        aggs = [
            F.avg(c).alias("_mean"),
            F.stddev_pop(c).alias("_std"),  # sklearn: ddof=0
            F.min(c).alias("_min"),
            F.max(c).alias("_max"),
            F.max(F.abs(c)).alias("_maxabs"),
            F.percentile(c, F.lit(0.5)).alias("_median"),
            F.percentile(c, F.lit(q_lo)).alias("_qlo"),
            F.percentile(c, F.lit(q_hi)).alias("_qhi"),
        ]
        keys = self._keys()
        stats = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
        self._stats = materialize(stats)
        return self

    def _join_stats(self, df: DataFrame) -> DataFrame:
        assert self._stats is not None
        keys = self._keys()
        if keys:
            return df.join(F.broadcast(self._stats), on=keys, how="left")
        return df.crossJoin(F.broadcast(self._stats))

    def _center_scale(self):
        """(center expression, scale expression) with sklearn zero-guarding."""
        one = F.lit(1.0)
        zero = F.lit(0.0)
        if self.kind == "standard":
            center = F.col("_mean") if self.with_mean else zero
            scale = (
                F.when(F.col("_std") == 0, one).otherwise(F.col("_std"))
                if self.with_std
                else one
            )
        elif self.kind == "minmax":
            lo, hi = self.feature_range
            span = F.col("_max") - F.col("_min")
            scale_inv = F.when(span == 0, one).otherwise(span / F.lit(hi - lo))
            # x' = lo + (x - min)/span * (hi-lo) → center=min - lo*scale_inv
            return F.col("_min") - F.lit(lo) * scale_inv, scale_inv
        elif self.kind == "maxabs":
            center = zero
            scale = F.when(F.col("_maxabs") == 0, one).otherwise(F.col("_maxabs"))
        else:  # robust
            center = F.col("_median") if self.with_centering else zero
            iqr = F.col("_qhi") - F.col("_qlo")
            scale = (
                F.when(iqr == 0, one).otherwise(iqr) if self.with_scaling else one
            )
        return center, scale

    _STAT_COLS = ("_mean", "_std", "_min", "_max", "_maxabs", "_median", "_qlo", "_qhi")

    def transform(self, df: DataFrame) -> DataFrame:
        if self._stats is None:
            raise ValueError("The transform isn't fitted!")
        joined = self._join_stats(df)
        center, scale = self._center_scale()
        out = joined.withColumn(
            self.in_col, (F.col(self.in_col) - center) / scale
        )
        return out.drop(*self._STAT_COLS)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        if self._stats is None:
            raise ValueError("The transform isn't fitted!")
        joined = self._join_stats(df)
        center, scale = self._center_scale()
        out = joined.withColumn(
            self.in_col, F.col(self.in_col) * scale + center
        )
        return out.drop(*self._STAT_COLS)
