"""Trend & seasonality decomposition transforms (reversible).

Reference:
- ``LinearTrendTransform`` (/root/reference/etna/transforms/decomposition/
  detrend.py:140): per-series linear regression on the time index, removed
  at transform, re-added at inverse. Closed-form OLS here — slope =
  cov(t, y)/var(t) from one aggregation, fully native (no sklearn, no pUDF).
- ``TheilSenTrendTransform`` (detrend.py:195): robust trend = median of
  pairwise slopes; inherently O(n²) per series → applyInPandas numpy kernel
  (exact for the series lengths a tier table produces; subsample at extreme
  lengths).
- ``DeseasonalityTransform`` (deseasonal.py:34-230): per-(series, phase)
  mean over the fitted range removed/re-added; phase = steps-since-series-
  start mod period.
- ``SpecialDaysTransform`` (timestamp/special_days.py:25-299): fit flags
  weekdays / month-days whose mean target exceeds the 0.95 quantile of the
  per-day means; transform marks them.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.plans.state import materialize


class LinearTrend:
    def __init__(
        self,
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
        step_seconds: int = 86400,
    ):
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self.step_seconds = step_seconds
        self._fit_params: DataFrame | None = None  # series, slope, intercept, t0

    def _x(self, df: DataFrame) -> F.Column:
        return F.col(self.ts_col).cast("double") / self.step_seconds

    def fit(self, df: DataFrame) -> "LinearTrend":
        c, x = F.col(self.in_col), self._x(df)
        valid = df.filter(c.isNotNull()).select(
            *self.series_cols, x.alias("_x"), c.alias("_y")
        )
        stats = valid.groupBy(*self.series_cols).agg(
            F.avg("_x").alias("mx"),
            F.avg("_y").alias("my"),
            F.covar_pop("_x", "_y").alias("cxy"),
            F.var_pop("_x").alias("vx"),
        )
        params = stats.select(
            *self.series_cols,
            F.when(F.col("vx") > 0, F.col("cxy") / F.col("vx"))
            .otherwise(F.lit(0.0))
            .alias("slope"),
            (F.col("my") - F.when(F.col("vx") > 0, F.col("cxy") / F.col("vx"))
             .otherwise(F.lit(0.0)) * F.col("mx")).alias("intercept"),
        )
        self._fit_params = materialize(params)
        return self

    def _trend(self) -> F.Column:
        return F.col("intercept") + F.col("slope") * (
            F.col(self.ts_col).cast("double") / self.step_seconds
        )

    def transform(self, df: DataFrame) -> DataFrame:
        if self._fit_params is None:
            raise ValueError("Transform is not fitted!")
        j = df.join(F.broadcast(self._fit_params), on=self.series_cols, how="left")
        return j.withColumn(self.in_col, F.col(self.in_col) - self._trend()).drop(
            "slope", "intercept"
        )

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        if self._fit_params is None:
            raise ValueError("Transform is not fitted!")
        j = df.join(F.broadcast(self._fit_params), on=self.series_cols, how="left")
        return j.withColumn(self.in_col, F.col(self.in_col) + self._trend()).drop(
            "slope", "intercept"
        )


class TheilSenTrend(LinearTrend):
    """Robust trend: median of pairwise slopes, intercept = median(y − b·x).
    Per-series numpy kernel (O(n²) pairs)."""

    def fit(self, df: DataFrame) -> "TheilSenTrend":
        in_col, ts_col, step = self.in_col, self.ts_col, self.step_seconds
        keys = self.series_cols

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
            x = pdf[ts_col].to_numpy("datetime64[s]").astype(np.int64) / step
            ok = ~np.isnan(y)
            x, y = x[ok], y[ok]
            n = len(x)
            if n < 2:
                slope, intercept = 0.0, float(y[0]) if n else 0.0
            else:
                dx = x[:, None] - x[None, :]
                dy = y[:, None] - y[None, :]
                iu = np.triu_indices(n, 1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    slopes = dy[iu] / dx[iu]
                slope = float(np.nanmedian(slopes))
                intercept = float(np.median(y - slope * x))
            head = pdf.iloc[:1][keys].copy()
            head["slope"] = slope
            head["intercept"] = intercept
            return head

        schema = ", ".join(
            [f"{k} {df.schema[k].dataType.simpleString()}" for k in keys]
            + ["slope double", "intercept double"]
        )
        params = df.groupBy(*keys).applyInPandas(kern, schema)
        self._fit_params = materialize(params)
        return self


class Deseasonality:
    """Remove per-(series, phase) means; phase anchored at the series' first
    fitted timestamp."""

    def __init__(
        self,
        period: int,
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
        step_seconds: int = 86400,
    ):
        self.period = period
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self.step_seconds = step_seconds
        self._state: DataFrame | None = None  # series, phase, seasonal_mean, anchor

    def _phase(self) -> F.Column:
        steps = (
            F.col(self.ts_col).cast("long") - F.col("_anchor").cast("long")
        ) / self.step_seconds
        return F.pmod(steps.cast("long"), F.lit(self.period))

    def fit(self, df: DataFrame) -> "Deseasonality":
        keys = self.series_cols
        anchors = df.groupBy(*keys).agg(F.min(self.ts_col).alias("_anchor"))
        j = df.join(anchors, on=keys).withColumn("_phase", self._phase())
        means = j.groupBy(*keys, "_anchor", "_phase").agg(
            F.avg(self.in_col).alias("_seasonal")
        )
        self._state = materialize(means)
        return self

    def _joined(self, df: DataFrame) -> DataFrame:
        assert self._state is not None
        keys = self.series_cols
        anchors = self._state.select(*keys, "_anchor").distinct()
        j = df.join(F.broadcast(anchors), on=keys, how="left").withColumn(
            "_phase", self._phase()
        )
        return j.join(
            F.broadcast(self._state), on=[*keys, "_anchor", "_phase"], how="left"
        )

    def transform(self, df: DataFrame) -> DataFrame:
        j = self._joined(df)
        return j.withColumn(
            self.in_col, F.col(self.in_col) - F.col("_seasonal")
        ).drop("_anchor", "_phase", "_seasonal")

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        j = self._joined(df)
        return j.withColumn(
            self.in_col, F.col(self.in_col) + F.col("_seasonal")
        ).drop("_anchor", "_phase", "_seasonal")


class SpecialDays:
    """Fit: weekdays / month-days whose mean target > 0.95-quantile of the
    per-day means; transform: flag columns."""

    def __init__(
        self,
        find_weekdays: bool = True,
        find_monthdays: bool = True,
        in_col: str = "value",
        ts_col: str = "ts",
    ):
        self.find_weekdays = find_weekdays
        self.find_monthdays = find_monthdays
        self.in_col = in_col
        self.ts_col = ts_col
        self.anomaly_weekdays: tuple[int, ...] = ()
        self.anomaly_monthdays: tuple[int, ...] = ()

    def _anomalous(self, df: DataFrame, part: F.Column) -> tuple[int, ...]:
        means = df.groupBy(part.alias("_d")).agg(F.avg(self.in_col).alias("_m"))
        rows = means.collect()
        vals = sorted(r["_m"] for r in rows)
        thresh = float(np.quantile(vals, 0.95))
        return tuple(sorted(r["_d"] for r in rows if r["_m"] > thresh))

    def fit(self, df: DataFrame) -> "SpecialDays":
        if self.find_weekdays:
            self.anomaly_weekdays = self._anomalous(df, F.weekday(self.ts_col))
        if self.find_monthdays:
            self.anomaly_monthdays = self._anomalous(df, F.dayofmonth(self.ts_col))
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        out = df
        if self.find_weekdays:
            out = out.withColumn(
                "anomaly_weekdays",
                F.weekday(self.ts_col).isin(*self.anomaly_weekdays).cast("int")
                if self.anomaly_weekdays
                else F.lit(0),
            )
        if self.find_monthdays:
            out = out.withColumn(
                "anomaly_monthdays",
                F.dayofmonth(self.ts_col).isin(*self.anomaly_monthdays).cast("int")
                if self.anomaly_monthdays
                else F.lit(0),
            )
        return out
