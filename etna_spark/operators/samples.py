"""Training-sample generation: one series → N (context, target) windows.

Reference: ``TSDataset.to_torch_dataset(make_samples)``
(/root/reference/etna/datasets/tsdataset.py:1851-1875) — a UDTF-like
per-segment sample generator feeding NN models. Spark mapping: sliding
windows materialized as array columns via native expressions (no Python):
for each anchor row, ``x`` = the previous ``context`` values and ``y`` = the
next ``horizon`` values, produced with collect-free slicing over a bounded
window frame.

Scale note: output rows carry O(context+horizon) values each — the natural
format for feeding Arrow batches to a training loop (e.g. Petastorm-style
readers); partitioned by series so sample locality follows series locality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def make_training_samples(
    df: DataFrame,
    context: int,
    horizon: int,
    in_col: str = "value",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
    drop_incomplete: bool = True,
) -> DataFrame:
    """(series..., anchor_ts, x: array<double>[context], y: array<double>[horizon]).

    ``x`` ends at the anchor row (inclusive); ``y`` starts right after it.
    With ``drop_incomplete`` only fully-populated windows survive (the
    reference's samplers emit complete windows only).
    """
    w_ctx = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rowsBetween(-(context - 1), 0)
    )
    w_hor = (
        Window.partitionBy(*series_cols).orderBy(ts_col).rowsBetween(1, horizon)
    )
    out = df.select(
        *series_cols,
        F.col(ts_col).alias("anchor_ts"),
        F.collect_list(F.col(in_col).cast("double")).over(w_ctx).alias("x"),
        F.collect_list(F.col(in_col).cast("double")).over(w_hor).alias("y"),
    )
    if drop_incomplete:
        out = out.filter(
            (F.size("x") == context) & (F.size("y") == horizon)
        )
    return out
