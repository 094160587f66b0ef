"""Distribution-based frequency resampling (upsampling) between tiers.

Reference: ``ResampleWithDistributionTransform``
(/root/reference/etna/transforms/missing_values/resample.py:12-199), golden
fixtures in tests/test_missing_values/conftest.py:104-343. A sparse
low-frequency column (e.g. daily exog on an hourly grid) is distributed over
the fine grid according to the learned share of ``distribution_column`` at
each position of the coarse cycle:

- fold id: position within the coarse cycle, anchored at the FIRST non-null
  ``in_column`` timestamp per series; rows before the anchor count backwards
  (fold = steps-from-anchor mod k, k = coarse step / grid step);
- fit: per (series, fold) share = sum(distribution_column) / series total;
- transform: out = ffill(in_column) * share;
- raises when the coarse frequency cannot be inferred (≤1 non-null point or
  coarse step not a multiple of the grid step).

Spark mapping: fold assignment is pure timestamp arithmetic; fit is one
groupBy; transform is a broadcast join on (series, fold) + a forward-fill
window. This operator generalizes to downsample/upsample between our
retention tiers (SURVEY.md §2.9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.plans.state import materialize


class ResampleWithDistribution:
    def __init__(
        self,
        in_col: str,
        distribution_col: str,
        out_col: str | None = None,
        inplace: bool = True,
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
        grid_step_seconds: int | None = None,
    ):
        self.in_col = in_col
        self.distribution_col = distribution_col
        self.out_col = in_col if inplace else (out_col or f"{in_col}_resampled")
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self.grid_step_seconds = grid_step_seconds
        self._anchors: DataFrame | None = None  # series, anchor_ts, n_folds
        self._distribution: DataFrame | None = None  # series, fold, distribution

    def _infer_grid_step(self, df: DataFrame) -> int:
        if self.grid_step_seconds is not None:
            return self.grid_step_seconds
        w = Window.partitionBy(*self.series_cols).orderBy(self.ts_col)
        diffs = df.select(
            (
                F.col(self.ts_col).cast("long")
                - F.lag(self.ts_col).over(w).cast("long")
            ).alias("d")
        ).filter(F.col("d").isNotNull())
        row = diffs.agg(F.min("d").alias("mn")).collect()[0]
        if row["mn"] is None:
            raise ValueError("Can not infer dataset frequency!")
        return int(row["mn"])

    def _fold_expr(self, step: int) -> F.Column:
        steps = (
            F.col(self.ts_col).cast("long") - F.col("_anchor_ts").cast("long")
        ) / F.lit(step)
        return F.pmod(steps.cast("long"), F.col("_n_folds")).alias("_fold")

    def _with_folds(self, df: DataFrame) -> DataFrame:
        assert self._anchors is not None
        step = self._grid_step
        return df.join(F.broadcast(self._anchors), on=self.series_cols).withColumn(
            "_fold", self._fold_expr(step)
        )

    def fit(self, df: DataFrame) -> "ResampleWithDistribution":
        step = self._infer_grid_step(df)
        self._grid_step = step
        c, ts = self.in_col, self.ts_col
        keys = self.series_cols
        w = Window.partitionBy(*keys).orderBy(ts)

        # first two non-null in_col timestamps per series → anchor + k
        nn = df.filter(F.col(c).isNotNull()).withColumn(
            "_rn", F.row_number().over(w)
        )
        firsts = (
            nn.filter(F.col("_rn") <= 2)
            .groupBy(*keys)
            .agg(
                F.min(ts).alias("_anchor_ts"),
                F.max(ts).alias("_second_ts"),
                F.count("*").alias("_n"),
            )
        )
        # validate + derive fold counts DISTRIBUTED (a driver loop over
        # per-series rows caps the engine at driver-memory series counts)
        coarse = F.col("_second_ts").cast("long") - F.col("_anchor_ts").cast("long")
        anchors = firsts.select(
            *keys, "_anchor_ts",
            F.when(
                (F.col("_n") > 1) & (coarse > 0) & (coarse % step == 0),
                (coarse / step).cast("long"),
            ).alias("_n_folds"),
        )
        anchors = materialize(anchors)
        if anchors.filter(F.col("_n_folds").isNull()).limit(1).count() > 0:
            raise ValueError(
                "Can not infer in_column frequency! "
                "Check that in_column frequency is compatible with dataset frequency."
            )
        self._anchors = anchors

        folded = self._with_folds(df)
        dist = folded.groupBy(*keys, "_fold").agg(
            F.sum(self.distribution_col).alias("_fold_sum")
        )
        total = Window.partitionBy(*keys)
        dist = dist.withColumn(
            "_distribution", F.col("_fold_sum") / F.sum("_fold_sum").over(total)
        ).select(*keys, "_fold", "_distribution")
        self._distribution = materialize(dist)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._distribution is None:
            raise ValueError("Transform is not fitted!")
        cols = list(df.columns)
        out_cols = cols if self.out_col in cols else cols + [self.out_col]
        folded = self._with_folds(df)
        joined = folded.join(
            F.broadcast(self._distribution), on=[*self.series_cols, "_fold"], how="left"
        )
        wff = (
            Window.partitionBy(*self.series_cols)
            .orderBy(self.ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last(self.in_col, ignorenulls=True).over(wff)
        return joined.withColumn(
            self.out_col, filled * F.col("_distribution")
        ).select(*out_cols)
