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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.operators.window_stats import window_stat


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


def detect_outliers_iqr(
    df: DataFrame,
    in_col: str = "value",
    window_size: int = 10,
    iqr_scale: float = 1.5,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
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
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
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


_METHODS = {
    "median": detect_outliers_median,
    "iqr": detect_outliers_iqr,
    "mad": detect_outliers_mad,
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
        self._outliers = df.sparkSession.createDataFrame(
            saved.collect(), saved.schema
        )
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
