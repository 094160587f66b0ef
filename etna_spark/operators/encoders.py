"""Categorical encoders.

Reference semantics:

- ``MeanEncoderTransform`` (/root/reference/etna/transforms/encoders/
  mean_encoder.py:45-343): expanding mean-target encoding
  ``(cat_cumsum + running_mean·smoothing) / (cat_cumcount + smoothing)``
  where all statistics EXCLUDE the current row (per-segment mode) or the
  current timestamp entirely (macro mode); first occurrence of a category →
  null; null categories form their own category ('category' mode) or take
  the running mean ('global_mean' mode); rows after the fitted range take
  the fit-time per-category mean, falling back to the global target mean.
  The reference's numba kernel (:170-201) becomes a plain cumulative window.
- ``MeanSegmentEncoderTransform`` (mean_segment_encoder.py:10-79): the same
  with the segment itself as category and smoothing=0 — i.e. the segment's
  expanding target mean.
- ``LabelEncoderTransform`` (categorical.py:69-188): codes 0..n-1 over
  SORTED fit categories; unseen values at transform → -1 ('new_value') /
  mean of encoded seen rows in the same frame ('mean') / null ('none').
- ``SegmentEncoderTransform`` (segment_encoder.py:11-85): ordinal id per
  segment over sorted fit segments.
- ``OneHotEncoderTransform`` (categorical.py:191-291): one 0/1 column per
  fit category; unseen → all zeros.

All are native DataFrame ops: window cumulatives + broadcast joins against
tiny fitted dimension tables (the Spark twin of fitted sklearn state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.plans.state import materialize

_NULL_TOKEN = "\x00__null__"


class MeanEncoder:
    def __init__(
        self,
        in_col: str,
        out_col: str,
        target_col: str = "target",
        mode: str = "per-segment",
        handle_missing: str = "category",
        smoothing: float = 1.0,
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        if mode not in ("per-segment", "macro"):
            raise ValueError(f"bad mode {mode}")
        if handle_missing not in ("category", "global_mean"):
            raise ValueError(f"bad handle_missing {handle_missing}")
        self.in_col = in_col
        self.out_col = out_col
        self.target_col = target_col
        self.mode = mode
        self.handle_missing = handle_missing
        self.smoothing = smoothing
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self._cat_means: DataFrame | None = None
        self._global_means: DataFrame | None = None
        self._last_ts = None

    def _keys(self) -> list[str]:
        return self.series_cols if self.mode == "per-segment" else []

    def fit(self, df: DataFrame) -> "MeanEncoder":
        keys = self._keys()
        t = self.target_col
        cat = F.coalesce(F.col(self.in_col).cast("string"), F.lit(_NULL_TOKEN))
        spark = df.sparkSession
        cm = df.groupBy(*keys, cat.alias("_cat")).agg(F.avg(t).alias("_cat_mean"))
        gm = (
            df.groupBy(*keys).agg(F.avg(t).alias("_global_mean"))
            if keys
            else df.agg(F.avg(t).alias("_global_mean"))
        )
        self._cat_means = materialize(cm)
        self._global_means = materialize(gm)
        self._last_ts = df.agg(F.max(self.ts_col)).collect()[0][0]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._cat_means is None:
            raise ValueError("The transform isn't fitted!")
        keys = self._keys()
        t, ts = self.target_col, self.ts_col
        cat = F.coalesce(F.col(self.in_col).cast("string"), F.lit(_NULL_TOKEN))
        base = df.withColumn("_cat", cat)

        if self.mode == "per-segment":
            # per-row exclusion: everything strictly before the current row
            w_run = (
                Window.partitionBy(*self.series_cols)
                .orderBy(ts)
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            w_cat = (
                Window.partitionBy(*self.series_cols, "_cat")
                .orderBy(ts)
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            base = (
                base.withColumn("_run_mean", F.avg(t).over(w_run))
                .withColumn("_cumsum", F.sum(t).over(w_cat))
                .withColumn("_cumcount", F.count(t).over(w_cat))
            )
        else:
            # macro excludes the whole current timestamp (all segments). A
            # global rangeBetween window would pull EVERY row into one task;
            # instead pre-aggregate per timestamp (distributed), run the
            # prefix window over the tiny per-ts frame, and join back —
            # identical values because the exclusion boundary is the
            # timestamp itself.
            per_ts = base.groupBy(ts).agg(
                F.sum(t).alias("_s"), F.count(t).alias("_c")
            )
            w_ts = Window.orderBy(ts).rowsBetween(Window.unboundedPreceding, -1)
            run = per_ts.select(
                ts,
                (F.sum("_s").over(w_ts) / F.sum("_c").over(w_ts)).alias(
                    "_run_mean"
                ),
            )
            per_cat_ts = base.groupBy("_cat", ts).agg(
                F.sum(t).alias("_s"), F.count(t).alias("_c")
            )
            w_cat_ts = (
                Window.partitionBy("_cat")
                .orderBy(ts)
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            catrun = per_cat_ts.select(
                "_cat", ts,
                F.sum("_s").over(w_cat_ts).alias("_cumsum"),
                F.coalesce(F.sum("_c").over(w_cat_ts), F.lit(0)).alias(
                    "_cumcount"
                ),
            )
            base = base.join(run, on=ts, how="left").join(
                catrun, on=["_cat", ts], how="left"
            )

        running_mean = F.col("_run_mean")
        cumcount = F.col("_cumcount")
        cumsum = F.when(cumcount > 0, F.col("_cumsum"))  # no previous valid → null
        cumcount_n = F.when(cumcount > 0, cumcount)
        feature = (cumsum + running_mean * F.lit(self.smoothing)) / (
            cumcount_n + F.lit(self.smoothing)
        )
        if self.handle_missing == "global_mean":
            feature = F.when(F.col(self.in_col).isNull(), running_mean).otherwise(
                feature
            )

        # future rows (after fitted range): fit-time category mean, falling
        # back to the fit-time global mean
        enc = base.join(
            F.broadcast(self._cat_means), on=[*keys, "_cat"], how="left"
        )
        enc = (
            enc.join(F.broadcast(self._global_means), on=keys, how="left")
            if keys
            else enc.crossJoin(F.broadcast(self._global_means))
        )
        future_feature = F.coalesce(F.col("_cat_mean"), F.col("_global_mean"))
        out = enc.withColumn(
            self.out_col,
            F.when(F.col(ts) > F.lit(self._last_ts), future_feature).otherwise(
                feature
            ),
        )
        return out.drop(
            "_cat", "_cat_mean", "_global_mean", "_run_mean", "_cumsum",
            "_cumcount",
        )


def mean_segment_encoder(
    df: DataFrame,
    target_col: str = "target",
    out_col: str = "segment_mean",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> "MeanEncoder":
    """Fitted MeanSegmentEncoder: segment-as-category, smoothing=0."""
    enc = MeanEncoder(
        in_col=series_cols[0],
        out_col=out_col,
        target_col=target_col,
        mode="per-segment",
        smoothing=0.0,
        series_cols=series_cols,
        ts_col=ts_col,
    )
    return enc.fit(df)


class LabelEncoder:
    def __init__(self, in_col: str, out_col: str, strategy: str = "mean"):
        if strategy not in ("new_value", "mean", "none"):
            raise ValueError(f"The strategy '{strategy}' doesn't exist")
        self.in_col = in_col
        self.out_col = out_col
        self.strategy = strategy
        self._mapping: DataFrame | None = None

    def fit(self, df: DataFrame) -> "LabelEncoder":
        m = (
            df.select(F.col(self.in_col).cast("string").alias("_val"))
            .filter(F.col("_val").isNotNull())
            .distinct()
            .withColumn(
                "_code",
                (F.dense_rank().over(Window.orderBy("_val")) - 1).cast("double"),
            )
        )
        self._mapping = materialize(m)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._mapping is None:
            raise ValueError("The transform isn't fitted!")
        joined = df.join(
            F.broadcast(self._mapping),
            on=df[self.in_col].cast("string") == self._mapping["_val"],
            how="left",
        ).drop("_val")
        if self.strategy == "new_value":
            out = joined.withColumn(
                self.out_col, F.coalesce(F.col("_code"), F.lit(-1.0))
            )
        elif self.strategy == "none":
            out = joined.withColumn(self.out_col, F.col("_code"))
        else:  # mean of encoded SEEN rows within this frame
            w = Window.partitionBy()
            out = joined.withColumn(
                self.out_col, F.coalesce(F.col("_code"), F.avg("_code").over(w))
            )
        return out.drop("_code")


class SegmentEncoder:
    """Ordinal segment id (sorted fit segments) as a float feature."""

    def __init__(self, series_cols: Sequence[str] = ("series",), out_col: str = "segment_code"):
        self.series_cols = list(series_cols)
        self.out_col = out_col
        self._mapping: DataFrame | None = None

    def fit(self, df: DataFrame) -> "SegmentEncoder":
        m = (
            df.select(*self.series_cols)
            .distinct()
            .withColumn(
                self.out_col,
                (F.dense_rank().over(Window.orderBy(*self.series_cols)) - 1).cast(
                    "double"
                ),
            )
        )
        self._mapping = materialize(m)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._mapping is None:
            raise ValueError("The transform isn't fitted!")
        return df.join(F.broadcast(self._mapping), on=self.series_cols, how="left")


class OneHotEncoder:
    """One 0/1 column per fit category; unseen values → all zeros
    (categorical.py:191-291)."""

    def __init__(self, in_col: str, out_prefix: str | None = None):
        self.in_col = in_col
        self.out_prefix = out_prefix or in_col
        self._categories: list[str] | None = None

    def fit(self, df: DataFrame) -> "OneHotEncoder":
        rows = (
            df.select(F.col(self.in_col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .orderBy("v")
            .collect()
        )
        self._categories = [r["v"] for r in rows]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._categories is None:
            raise ValueError("The transform isn't fitted!")
        c = F.col(self.in_col).cast("string")
        cols = {
            f"{self.out_prefix}_{i}": (c == F.lit(cat)).cast("int")
            for i, cat in enumerate(self._categories)
        }
        return df.withColumns(cols)
