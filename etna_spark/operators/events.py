"""Event proximity features.

Reference: ``EventTransform``
(/root/reference/etna/transforms/timestamp/event.py:29-196): from a binary
event-indicator column, derive ``{out}_pre`` (reaction to the NEXT event
within ``n_pre`` rows) and ``{out}_post`` (reaction to the PREVIOUS event
within ``n_post`` rows). Modes: 'binary' (0/1) and 'distance' (1/d, d = row
distance to the nearest event). Event rows themselves get 0 in both columns.

Spark mapping: nearest-event row distance via running F.last(ignorenulls)
windows in both time directions (the DESC trick keeps the backward lookup
O(n) — same as spine.interpolate_linear).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transform(
    df: DataFrame,
    in_col: str,
    out_col: str,
    n_pre: int,
    n_post: int,
    mode: str = "binary",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    if n_pre < 1 or n_post < 1:
        raise ValueError(
            f"`n_pre` and `n_post` must be greater than zero, given {n_pre} and {n_post}"
        )
    if mode not in ("binary", "distance"):
        raise NotImplementedError(f"{mode} is not a valid mode")

    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    w_fwd = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rn = F.row_number().over(w)
    base = df.withColumn("_rn", rn).withColumn(
        "_event_rn", F.when(F.col(in_col) == 1, F.col("_rn"))
    )
    base = base.withColumn(
        "_next", F.last("_event_rn", ignorenulls=True).over(w_fwd)
    ).withColumn("_prev", F.last("_event_rn", ignorenulls=True).over(w_bwd))

    def proximity(dist: F.Column, max_distance: int) -> F.Column:
        value = F.lit(1.0) if mode == "binary" else 1.0 / dist
        return F.when(
            dist.isNotNull() & (dist >= 1) & (dist <= max_distance), value
        ).otherwise(F.lit(0.0))

    pre = proximity(F.col("_next") - F.col("_rn"), n_pre)
    post = proximity(F.col("_rn") - F.col("_prev"), n_post)
    return (
        base.withColumn(f"{out_col}_pre", pre)
        .withColumn(f"{out_col}_post", post)
        .drop("_rn", "_event_rn", "_next", "_prev")
    )
