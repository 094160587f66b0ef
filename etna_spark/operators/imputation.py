"""Missing-value imputation over the regular time grid.

Reference: ``TimeSeriesImputerTransform``
(/root/reference/etna/transforms/missing_values/imputation.py:77-316),
semantics pinned by its test-suite
(tests/test_missing_values/test_impute_transform.py):

- strategies: constant / forward_fill / mean / running_mean / seasonal /
  seasonal_nonautoreg, plus a ``default_value`` post-fill;
- fit computes the NaN-to-impute mask = (null at fit) AND (at/after the
  series' first non-null point) — LEADING NULLS ARE NEVER IMPUTED
  (imputation.py:177-178);
- transform fills ONLY masked positions; nulls introduced after fit stay
  null (imputation.py:199-207);
- fit on an all-null series raises (imputation.py:168-169);
- ``mean`` uses the TRAIN-GLOBAL per-series mean learned at fit;
- ``running_mean``/``seasonal`` average the previous ``window`` points at
  stride ``seasonality`` EXCLUDING the current row, AUTOREGRESSIVELY
  (already-imputed points feed later ones — imputation.py:233-242);
- ``seasonal_nonautoreg`` is the strided mean of the s-lagged series
  (Lag(s) ∘ Mean(window, s), imputation.py:243-261) — existing values only;
- inverse_transform re-pokes nulls into the masked positions.

Spark mapping: fitted state is two SMALL DataFrames keyed by series —
per-series stats (first-valid ts, mean) and the fit-null mask (one row per
gap; gaps are the minority of a tier table). Fills are native expressions
(constant/ffill/mean) or an applyInPandas sequential kernel for the
autoregressive strategies (inherently order-dependent per series — SURVEY.md
§7.5). Joins against fitted state broadcast when small.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STRATEGIES = {
    "constant",
    "forward_fill",
    "mean",
    "running_mean",
    "seasonal",
    "seasonal_nonautoreg",
}

_IMP = "__impute__"


class TimeSeriesImputer:
    def __init__(
        self,
        strategy: str = "constant",
        window: int = -1,
        seasonality: int = 1,
        default_value: float | None = None,
        constant_value: float = 0.0,
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        if strategy not in STRATEGIES:
            raise ValueError(f"strategy must be one of {sorted(STRATEGIES)}")
        self.strategy = strategy
        self.window = window
        self.seasonality = seasonality
        self.default_value = default_value
        self.constant_value = constant_value
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self._mask: DataFrame | None = None
        self._stats: DataFrame | None = None

    def fit(self, df: DataFrame) -> "TimeSeriesImputer":
        c = self.in_col
        stats = df.groupBy(*self.series_cols).agg(
            F.count(c).alias("_n_valid"),
            F.min(F.when(F.col(c).isNotNull(), F.col(self.ts_col))).alias("_first_valid"),
            F.avg(c).alias("_series_mean"),
        )
        empty = stats.filter(F.col("_n_valid") == 0).limit(1).collect()
        if empty:
            raise ValueError(
                "Series hasn't non NaN values which means it is empty and can't be filled."
            )
        self._stats = stats
        self._mask = (
            df.join(F.broadcast(stats), on=self.series_cols)
            .filter(F.col(c).isNull() & (F.col(self.ts_col) >= F.col("_first_valid")))
            .select(*self.series_cols, self.ts_col)
        )
        return self

    # -- fill strategies ----------------------------------------------------

    def _filled_expression(self, df: DataFrame) -> DataFrame:
        """Return df + ``__filled__`` column for native strategies."""
        c = F.col(self.in_col)
        if self.strategy == "constant":
            return df.withColumn("__filled__", F.lit(float(self.constant_value)))
        if self.strategy == "forward_fill":
            w = (
                Window.partitionBy(*self.series_cols)
                .orderBy(self.ts_col)
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            return df.withColumn("__filled__", F.last(c, ignorenulls=True).over(w))
        if self.strategy == "mean":
            assert self._stats is not None
            return df.join(
                F.broadcast(self._stats.select(*self.series_cols, "_series_mean")),
                on=self.series_cols,
            ).withColumnRenamed("_series_mean", "__filled__")
        raise AssertionError(self.strategy)

    def _fill_sequential(self, df: DataFrame) -> DataFrame:
        """running_mean / seasonal / seasonal_nonautoreg via per-series kernel."""
        in_col, ts_col = self.in_col, self.ts_col
        window, seasonality = self.window, self.seasonality
        strategy = self.strategy
        cols = list(df.columns)
        schema = df.schema

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            x = pdf[in_col].to_numpy(dtype=np.float64, na_value=np.nan)
            imp = pdf[_IMP].to_numpy(dtype=bool)
            n = len(x)
            history = seasonality * window if window != -1 else n
            if strategy == "seasonal_nonautoreg":
                frozen = x.copy()
                for i in np.nonzero(np.isnan(x) & imp)[0]:
                    idx = np.arange(i - seasonality, i - seasonality - history, -seasonality)
                    idx = idx[idx >= 0]
                    if len(idx) and not np.all(np.isnan(frozen[idx])):
                        x[i] = np.nanmean(frozen[idx])
            else:  # running_mean / seasonal: autoregressive
                for i in np.nonzero(np.isnan(x) & imp)[0]:
                    idx = np.arange(i - seasonality, i - seasonality - history, -seasonality)
                    idx = idx[idx >= 0]
                    if len(idx) and not np.all(np.isnan(x[idx])):
                        x[i] = np.nanmean(x[idx])
            pdf[in_col] = x
            return pdf[cols]

        return df.groupBy(*self.series_cols).applyInPandas(kernel, schema=schema)

    # -- public API ----------------------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        if self._mask is None:
            raise ValueError("Transform is not fitted!")
        keys = [*self.series_cols, self.ts_col]
        marked = df.join(
            F.broadcast(self._mask.withColumn(_IMP, F.lit(True))), on=keys, how="left"
        ).withColumn(_IMP, F.coalesce(F.col(_IMP), F.lit(False)))

        if self.strategy in ("running_mean", "seasonal", "seasonal_nonautoreg"):
            filled = self._fill_sequential(marked)
            out = filled
        else:
            f = self._filled_expression(marked)
            out = f.withColumn(
                self.in_col,
                F.when(
                    F.col(self.in_col).isNull() & F.col(_IMP), F.col("__filled__")
                ).otherwise(F.col(self.in_col)),
            ).drop("__filled__")

        if self.default_value is not None:
            out = out.withColumn(
                self.in_col,
                F.when(
                    F.col(self.in_col).isNull() & F.col(_IMP),
                    F.lit(float(self.default_value)),
                ).otherwise(F.col(self.in_col)),
            )
        return out.drop(_IMP)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        """Re-poke nulls into the fit-mask positions
        (imputation.py:267-288)."""
        if self._mask is None:
            raise ValueError("Transform is not fitted!")
        keys = [*self.series_cols, self.ts_col]
        marked = df.join(
            F.broadcast(self._mask.withColumn(_IMP, F.lit(True))), on=keys, how="left"
        )
        return marked.withColumn(
            self.in_col, F.when(F.col(_IMP), F.lit(None)).otherwise(F.col(self.in_col))
        ).drop(_IMP)
