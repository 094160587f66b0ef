"""Order-d, period-p differencing with exact inverse reconstruction.

Reference: ``DifferencingTransform`` / ``_SingleDifferencingTransform``
(/root/reference/etna/transforms/math/differencing.py:21-493):

- transform: ``y_t = x_t - x_{t-p}`` applied ``order`` times (leading rows
  of each level become null);
- fit walks the levels, saving per series and level the FIRST p valid values
  (train reconstruction seeds) and the LAST p values of the level's input
  (test reconstruction seeds), and validates there are no interior nulls;
- inverse on the train range: poke the seeds into the first p valid
  positions, then per-phase strided cumulative sum (``iloc[i::p].cumsum()``),
  one level at a time in reverse;
- inverse on a test range: must start right after the train; prepend the
  saved last-p rows, strided-cumsum, drop the prefix;
- anything else raises.

Spark mapping: forward differencing is a native ``col - F.lag(col, p)``
window chain (no Python). The inverse is inherently sequential per series →
cogrouped ``applyInPandas`` joining each series with its saved seed rows
(seed state is tiny: 2·order·p rows per series).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.plans.state import materialize


class Differencing:
    def __init__(
        self,
        in_col: str = "value",
        period: int = 1,
        order: int = 1,
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        if not isinstance(period, int) or period < 1:
            raise ValueError("Period should be at least 1")
        if not isinstance(order, int) or order < 1:
            raise ValueError("Order should be at least 1")
        self.in_col = in_col
        self.period = period
        self.order = order
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self._seeds: DataFrame | None = None  # series, level, pos, kind, seed_ts, seed_value
        self._bounds: DataFrame | None = None  # series, train_max_ts

    def _level_df(self, df: DataFrame, level: int) -> DataFrame:
        """df with in_col differenced ``level`` times."""
        w = Window.partitionBy(*self.series_cols).orderBy(self.ts_col)
        out = df
        for _ in range(level):
            out = out.withColumn(
                self.in_col, F.col(self.in_col) - F.lag(self.in_col, self.period).over(w)
            )
        return out

    def fit(self, df: DataFrame) -> "Differencing":
        p, in_col, ts_col = self.period, self.in_col, self.ts_col
        keys = self.series_cols
        w = Window.partitionBy(*keys).orderBy(ts_col)

        # interior-null validation (nulls allowed only before first valid)
        stats = df.groupBy(*keys).agg(
            F.min(F.when(F.col(in_col).isNotNull(), F.col(ts_col))).alias("_fv"),
            F.max(ts_col).alias("train_max_ts"),
        )
        bad = (
            df.join(stats, on=keys)
            .filter((F.col(ts_col) >= F.col("_fv")) & F.col(in_col).isNull())
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError("There should be no NaNs inside the segments")
        self._bounds = stats.select(*keys, "train_max_ts")

        seeds = []
        level_df = df
        for level in range(self.order):
            valid = level_df.filter(F.col(in_col).isNotNull())
            rn_head = F.row_number().over(w)
            head = (
                valid.withColumn("_rn", rn_head)
                .filter(F.col("_rn") <= p)
                .select(
                    *keys,
                    F.lit(level).alias("level"),
                    (F.col("_rn") - 1).alias("pos"),
                    F.lit("train").alias("kind"),
                    F.col(ts_col).alias("seed_ts"),
                    F.col(in_col).alias("seed_value"),
                )
            )
            # test seeds: last p rows of this level's INPUT (nulls included
            # conceptually, but the tail of a fitted level is non-null)
            rn_tail = F.row_number().over(
                Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
            )
            tail = (
                level_df.withColumn("_rn", rn_tail)
                .filter(F.col("_rn") <= p)
                .select(
                    *keys,
                    F.lit(level).alias("level"),
                    (p - F.col("_rn")).alias("pos"),
                    F.lit("test").alias("kind"),
                    F.col(ts_col).alias("seed_ts"),
                    F.col(in_col).alias("seed_value"),
                )
            )
            seeds.append(head.unionByName(tail))
            level_df = self._level_df(level_df, 1)
        s = seeds[0]
        for extra in seeds[1:]:
            s = s.unionByName(extra)
        # Materialize the fitted state executor-side: localCheckpoint
        # truncates lineage against the input (no ambiguous self-joins at
        # inverse time) without a driver round-trip.
        self._seeds = materialize(s)
        self._bounds = materialize(self._bounds)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        return self._level_df(df, self.order)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        """Reconstruct original values (train range or directly-following
        test range, auto-detected per series)."""
        if self._seeds is None or self._bounds is None:
            raise ValueError("Transform is not fitted!")
        in_col, ts_col, p, order = self.in_col, self.ts_col, self.period, self.order
        keys = self.series_cols
        cols = list(df.columns)
        schema = df.schema

        data = df.join(self._bounds, on=keys, how="left")
        state = self._seeds

        def kernel(pdf: pd.DataFrame, seeds: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            if pdf.empty:
                return pdf[cols]
            train_max = pdf["train_max_ts"].iloc[0]
            is_test = pd.notna(train_max) and pdf[ts_col].min() > train_max
            x = pdf[in_col].astype(float).copy()
            for level in range(order - 1, -1, -1):
                lseeds = seeds[seeds["level"] == level].sort_values("pos")
                if is_test:
                    prefix = pd.Series(lseeds.loc[lseeds["kind"] == "test", "seed_value"].to_numpy())
                    y = pd.concat([prefix, x], ignore_index=True)
                    for i in range(p):
                        y.iloc[i::p] = y.iloc[i::p].cumsum()
                    x = y.iloc[p:].reset_index(drop=True)
                else:
                    tr = lseeds[lseeds["kind"] == "train"]
                    ts_to_val = dict(zip(tr["seed_ts"], tr["seed_value"]))
                    mask = pdf[ts_col].map(lambda t: t in ts_to_val)
                    x.loc[mask.to_numpy()] = pdf.loc[mask.to_numpy(), ts_col].map(ts_to_val).to_numpy()
                    for i in range(p):
                        x.iloc[i::p] = x.iloc[i::p].cumsum()
            pdf[in_col] = x.to_numpy()
            return pdf[cols]

        return (
            data.groupBy(*keys)
            .cogroup(state.groupBy(*keys))
            .applyInPandas(kernel, schema=schema)
        )
