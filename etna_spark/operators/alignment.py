"""Misalignment handling: per-series realignment to integer timestamps.

Reference: ``infer_alignment`` / ``apply_alignment`` /
``make_timestamp_df_from_alignment``
(/root/reference/etna/datasets/utils.py:576-732) and
``TSDataset.create_from_misaligned`` (tsdataset.py:168-269): series whose
calendars don't line up are re-indexed onto an integer timeline so the LAST
observation of every series lands on index 0 (earlier points get negative
indices), which lets per-series operators run on a shared grid.

Spark mapping: one row_number window per series — alignment is just
``rn − count`` and the original timestamp is kept as a payload column for
the inverse mapping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def infer_alignment(
    df: DataFrame,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """(series..., last_ts) — the per-series anchor (last observation)."""
    return df.groupBy(*series_cols).agg(F.max(ts_col).alias("last_ts"))


def apply_alignment(
    df: DataFrame,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
    out_col: str = "aligned_idx",
) -> DataFrame:
    """Append the integer index: last observation → 0, previous → -1, ...

    Keeps ``ts_col`` so ``make_timestamp_df`` (the inverse mapping) is just a
    projection of (series, aligned_idx, ts).
    """
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    cnt = Window.partitionBy(*series_cols)
    return df.withColumn(
        out_col, (F.row_number().over(w) - F.count("*").over(cnt)).cast("long")
    )
