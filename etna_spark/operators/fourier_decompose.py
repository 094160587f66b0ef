"""FourierDecomposeTransform: FFT-based series decomposition.

Reference: ``FourierDecomposeTransform``
(/root/reference/etna/transforms/decomposition/dft_based.py:11-210) — per
series, FFT the valid range, pick the top-``k`` positive frequencies by
amplitude, inverse-FFT each selected frequency row separately into a
``dft_{i}`` component column (+ optional ``dft_residuals`` so components
sum to the series). In-sample only: rows outside the fitted range get
NaN components. Middle NaNs raise; ``k`` must not exceed the minimum
positive-frequency count across series.

Spark surface: per-series ``applyInPandas`` numpy kernel (FFT is inherently
per-series); output joined back so untouched columns/rows survive.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fourier_decompose"]


def _num_pos_freqs(n: int) -> int:
    return int(np.ceil((n - 1) / 2) + 1)


def _dft_components(y: np.ndarray, k: int, residuals: bool) -> np.ndarray:
    """(k[+1], n) component matrix for one gap-free series (reference
    _dft_components, dft_based.py:89-124)."""
    num_pos = _num_pos_freqs(len(y))
    dft = np.fft.fft(y)
    abs_pos = np.abs(dft)[:num_pos]
    top_k = np.argpartition(abs_pos, num_pos - k)[-k:]
    freq_matrix = np.diag(dft)[:num_pos]
    comps = np.fft.ifft(freq_matrix[top_k]).real
    if residuals:
        comps = np.vstack([comps, y - comps.sum(axis=0)])
    return comps


def fourier_decompose(
    df: DataFrame,
    k: int,
    in_col: str = "value",
    residuals: bool = False,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Append ``dft_0..dft_{k-1}`` (+ ``dft_residuals``) per series."""
    if k <= 0:
        raise ValueError("Parameter `k` must be positive integer!")
    keys = list(series_cols)
    comp_cols = [f"dft_{i}" for i in range(k)] + (
        ["dft_residuals"] if residuals else []
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
        valid = np.flatnonzero(~np.isnan(y))
        out = pdf[[*keys, ts_col]].copy()
        for c in comp_cols:
            out[c] = np.nan
        if len(valid) == 0:
            return out
        lo, hi = valid[0], valid[-1]
        yy = y[lo : hi + 1]
        if np.isnan(yy).any():
            raise ValueError(
                f"Feature `{in_col}` contains missing values in segments!"
            )
        if k > _num_pos_freqs(len(yy)):
            raise ValueError(
                f"Parameter `k` must not be greater then "
                f"{_num_pos_freqs(len(yy))} for the provided dataset!"
            )
        comps = _dft_components(yy, k, residuals)
        for i, c in enumerate(comp_cols):
            col = np.full(len(y), np.nan)
            col[lo : hi + 1] = comps[i]
            out[c] = col
        return out

    key_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keys
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    comps_schema = ", ".join(f"{c} double" for c in comp_cols)
    comp_df = df.groupBy(*keys).applyInPandas(
        kern, f"{key_schema}, {ts_col} {ts_type}, {comps_schema}"
    )
    return df.join(comp_df, on=[*keys, ts_col], how="left")
