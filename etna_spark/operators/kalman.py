"""Kalman filter, local-level model, per segment.

The simplest state-space smoother (Harvey's local level / random-walk-
plus-noise): for observation variance R and process variance Q,

    predict:  a_pred = a,            p_pred = p + Q
    gain:     K = p_pred / (p_pred + R)
    update:   a = a_pred + K * (y - a_pred),  p = (1 - K) * p_pred

initialized diffusely-but-simply at a_1 = y_1, p_1 = R. The reference
reaches this family through statsmodels' state-space wrappers (SARIMAX
et al., external-library rows of SURVEY.md §2.13); this module is the
from-scratch distributed core: one applyInPandas per segment, scalar
float recursion in a FIXED IEEE op order, so an ANSI-SQL oracle can
replay the filter bit-for-bit with a recursive CTE carrying (a, p) —
the same replay pattern as the autoregressive imputer and Croston
oracles.

Scale shape: segment-parallel (state rides with the group); a 100 TB
corpus of series filters in one shuffle on the segment key.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (registry callers)


def kalman_level(
    df: DataFrame,
    q_var: float,
    r_var: float,
    in_col: str = "target",
    series_cols: Sequence[str] = ("segment",),
    ts_col: str = "timestamp",
    out_col: str = "level",
) -> DataFrame:
    """Filtered level per observation. Output column order and types:
    (*series_cols, ts_col, out_col double) — the level is NOT rounded
    here; round at the query boundary."""
    keys = list(series_cols)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[in_col].to_numpy(np.float64)
        n = len(y)
        out = np.empty(n)
        a = y[0]
        p = r_var
        out[0] = a
        for t in range(1, n):
            p_pred = p + q_var
            k = p_pred / (p_pred + r_var)
            a = a + k * (y[t] - a)
            p = (1.0 - k) * p_pred
            out[t] = a
        res = pdf[[*keys, ts_col]].copy()
        res[out_col] = out
        return res

    key_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keys
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    return df.groupBy(*keys).applyInPandas(
        kern, f"{key_schema}, {ts_col} {ts_type}, {out_col} double"
    )


def kalman_smooth(
    df: DataFrame,
    q_var: float,
    r_var: float,
    in_col: str = "target",
    series_cols: Sequence[str] = ("segment",),
    ts_col: str = "timestamp",
    out_col: str = "level_smooth",
) -> DataFrame:
    """Rauch–Tung–Striebel smoother for the local-level model: forward
    Kalman pass (same chain as ``kalman_level``), then the backward
    recursion

        s_n = a_n
        s_t = a_t + (p_t / (p_t + Q)) * (s_{t+1} - a_t)

    (the one-step prediction from t is a_t itself in the local-level
    model). Both passes are fixed-order scalar float chains, so the SQL
    twin replays forward AND backward recursions bit-for-bit."""
    keys = list(series_cols)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[in_col].to_numpy(np.float64)
        n = len(y)
        a_arr = np.empty(n)
        p_arr = np.empty(n)
        a = y[0]
        p = r_var
        a_arr[0], p_arr[0] = a, p
        for t in range(1, n):
            p_pred = p + q_var
            k = p_pred / (p_pred + r_var)
            a = a + k * (y[t] - a)
            p = (1.0 - k) * p_pred
            a_arr[t], p_arr[t] = a, p
        s = np.empty(n)
        s[n - 1] = a_arr[n - 1]
        for t in range(n - 2, -1, -1):
            g = p_arr[t] / (p_arr[t] + q_var)
            s[t] = a_arr[t] + g * (s[t + 1] - a_arr[t])
        res = pdf[[*keys, ts_col]].copy()
        res[out_col] = s
        return res

    key_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keys
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    return df.groupBy(*keys).applyInPandas(
        kern, f"{key_schema}, {ts_col} {ts_type}, {out_col} double"
    )
