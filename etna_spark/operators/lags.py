"""Lag features and exogenous-column shifts.

Reference: ``LagTransform`` (k-step backward shift, list of lags or 1..k —
/root/reference/etna/transforms/math/lags.py:16-109) and ``ExogShiftTransform``
(shift exog columns FORWARD so future-unknown columns become usable at
horizon h — lags.py:112-313, auto mode derives the shift from the last
non-null timestamp vs the end of the target).

Spark mapping: ``F.lag(col, k)`` over (series, ts-ordered) windows — pure
WindowExec, one shuffle on the series key shared by all lags.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lag_transform(
    df: DataFrame,
    in_col: str,
    lags: Sequence[int] | int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
    out_prefix: str | None = None,
) -> DataFrame:
    """Append one column per lag: ``{prefix}_{k}`` = in_col shifted back k.

    ``lags`` as int means 1..lags (reference lags.py:60-66); each lag must be
    positive (shifting forward would leak the future into features).
    """
    if isinstance(lags, int):
        if lags < 1:
            raise ValueError("lags must be >= 1")
        lags = list(range(1, lags + 1))
    if any(k <= 0 for k in lags):
        raise ValueError("all lags must be positive")
    prefix = out_prefix or f"{in_col}_lag"
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    cols = {f"{prefix}_{k}": F.lag(in_col, k).over(w) for k in lags}
    return df.withColumns(cols)


def exog_shift(
    df: DataFrame,
    cols: Sequence[str],
    horizon: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Shift exog columns forward ``horizon`` steps (rename ``c`` →
    ``c_shift_{h}``) so models at forecast time only see values that were
    known then. The simple fixed-lag mode of ExogShiftTransform."""
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_shift_{horizon}", F.lag(c, horizon).over(w)).drop(c)
    return out
