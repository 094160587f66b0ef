"""Temporal set operations: train/test split, future extension, backtest folds.

Reference:
- ``TSDataset.train_test_split`` (/root/reference/etna/datasets/
  tsdataset.py:1064-1257): border resolution across (train_start, train_end,
  test_start, test_end, test_size) with adjacency defaults — a missing
  test_start is one step after train_end and vice versa.
- ``make_future`` (tsdataset.py:400-496): extend the shared grid
  ``future_steps`` beyond the last timestamp, null target, carry
  known-future exog (a left join on the extended spine).
- backtest fold masks (/root/reference/etna/pipeline/base.py:690-771):
  rolling-origin folds from the end of the timeline — expanding or constant
  train windows, fixed-size test windows, stride between fold starts.

All are pure filters / generated spines — Catalyst prunes partitions on the
timestamp predicates.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step(step_seconds: int) -> dt.timedelta:
    return dt.timedelta(seconds=step_seconds)


def train_test_split(
    df: DataFrame,
    ts_col: str = "ts",
    train_start=None,
    train_end=None,
    test_start=None,
    test_end=None,
    test_size: int | None = None,
    step_seconds: int = 86400,
) -> tuple[DataFrame, DataFrame]:
    """Resolve borders like the reference's 6-way logic, then two filters."""
    step = _step(step_seconds)
    bounds = df.agg(
        F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx")
    ).collect()[0]
    mn, mx = bounds["mn"], bounds["mx"]

    if test_end is None:
        test_end = mx
    if test_size is not None and test_start is None:
        test_start = test_end - step * (test_size - 1)
    if train_end is None and test_start is not None:
        train_end = test_start - step
    if test_start is None and train_end is not None:
        test_start = train_end + step
    if train_start is None:
        train_start = mn
    if train_end is None or test_start is None:
        raise ValueError(
            "One of train_end, test_start or test_size should be defined"
        )
    train = df.filter(
        (F.col(ts_col) >= F.lit(train_start)) & (F.col(ts_col) <= F.lit(train_end))
    )
    test = df.filter(
        (F.col(ts_col) >= F.lit(test_start)) & (F.col(ts_col) <= F.lit(test_end))
    )
    return train, test


def make_future(
    df: DataFrame,
    future_steps: int,
    step_seconds: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
    target_cols: Sequence[str] = ("value",),
    exog: DataFrame | None = None,
    tail_steps: int = 0,
) -> DataFrame:
    """Rows for the next ``future_steps`` grid points per series (null
    targets, exog joined in when provided), optionally preceded by the last
    ``tail_steps`` of history (model context)."""
    bounds = df.agg(F.max(ts_col).alias("mx"))
    series = df.select(*series_cols).distinct()
    spine = series.crossJoin(F.broadcast(bounds)).select(
        *series_cols,
        F.explode(
            F.sequence(
                F.col("mx") + F.expr(f"interval {step_seconds} seconds"),
                F.col("mx") + F.expr(f"interval {future_steps * step_seconds} seconds"),
                F.expr(f"interval {step_seconds} seconds"),
            )
        ).alias(ts_col),
    )
    future = spine
    if exog is not None:
        future = future.join(exog, on=[*series_cols, ts_col], how="left")
    other_cols = [
        c for c in df.columns if c not in (*series_cols, ts_col, *future.columns)
    ]
    for c in other_cols:
        future = future.withColumn(c, F.lit(None).cast(df.schema[c].dataType))
    future = future.select(*df.columns)
    if tail_steps > 0:
        mx = df.agg(F.max(ts_col)).collect()[0][0]
        tail_start = mx - _step(step_seconds) * (tail_steps - 1)
        tail = df.filter(F.col(ts_col) >= F.lit(tail_start))
        return tail.unionByName(future)
    return future


def generate_folds(
    last_ts,
    n_folds: int,
    horizon: int,
    step_seconds: int,
    mode: str = "expanding",
    stride: int | None = None,
    first_ts=None,
) -> list[dict]:
    """Rolling-origin fold masks from the end of the timeline backwards
    (pipeline/base.py:690-771). Returns fold dicts newest-last."""
    if mode not in ("expanding", "constant"):
        raise ValueError(f"bad mode {mode}")
    stride = stride if stride is not None else horizon
    step = _step(step_seconds)
    folds = []
    for i in range(n_folds):
        offset = (n_folds - 1 - i) * stride
        test_end = last_ts - step * offset
        test_start = test_end - step * (horizon - 1)
        train_end = test_start - step
        if mode == "expanding":
            train_start = first_ts
        else:
            train_start = None  # caller supplies fixed-window length via first_ts
        folds.append(
            {
                "fold": i,
                "train_start": train_start,
                "train_end": train_end,
                "test_start": test_start,
                "test_end": test_end,
            }
        )
    return folds


def apply_fold(
    df: DataFrame, fold: dict, ts_col: str = "ts"
) -> tuple[DataFrame, DataFrame]:
    train = df.filter(F.col(ts_col) <= F.lit(fold["train_end"]))
    if fold.get("train_start") is not None:
        train = train.filter(F.col(ts_col) >= F.lit(fold["train_start"]))
    test = df.filter(
        (F.col(ts_col) >= F.lit(fold["test_start"]))
        & (F.col(ts_col) <= F.lit(fold["test_end"]))
    )
    return train, test


def estimate_max_n_folds(
    df: DataFrame,
    horizon: int,
    context_size: int,
    stride: int | None = None,
    ts_col: str = "ts",
    step_seconds: int = 86400,
) -> int:
    """Maximum rolling-origin fold count the data supports (reference
    commands/utils.py:76-140):

        max_n_folds = floor((num_points − horizon + stride − context) / stride)

    ``num_points`` is the shared-grid length (distinct timestamps — the
    reference counts wide-frame index rows). Raises when even one fold
    doesn't fit, like the reference."""
    if context_size < 1:
        raise ValueError(
            "Pipeline `context_size` parameter must be positive integer!"
        )
    stride = stride if stride is not None else horizon
    # grid length from the TIME span, not the row count: generate_folds
    # slices train/test windows by time arithmetic, so a gappy history must
    # not inflate the estimate
    bounds = df.agg(
        F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx")
    ).collect()[0]
    if bounds["mn"] is None:
        raise ValueError("Not enough data points: empty input")
    span = bounds["mx"] - bounds["mn"]
    n = int(span.total_seconds()) // step_seconds + 1
    max_folds = (n - horizon + stride - context_size) // stride
    if max_folds < 1:
        raise ValueError(
            f"Not enough data points: {n} timestamps cannot fit a single "
            f"fold with horizon={horizon}, context_size={context_size}"
        )
    return int(max_folds)
