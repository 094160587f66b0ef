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


def _dft_components_direct(y: np.ndarray, k: int, residuals: bool) -> np.ndarray:
    """Exact-mode twin of ``_dft_components``: direct DFT with scalar
    left-to-right float accumulation and glibc cos/sin. Same semantics,
    O(n²) — every float op is a fixed sequential chain a SQL oracle can
    replay bit-for-bit (DuckDB's cos/sin and Python's math.cos/sin are the
    same libm on this platform; verified over 1800-2100-style angle sets).
    Component rows come out in DESCENDING amplitude order (ties → lower
    frequency first) instead of argpartition's unspecified order."""
    import math

    n = len(y)
    num_pos = _num_pos_freqs(n)
    two_pi = 2 * math.pi
    re = [0.0] * num_pos
    im = [0.0] * num_pos
    for f in range(num_pos):
        sr = 0.0
        si = 0.0
        for t in range(n):
            ang = two_pi * f * t / n
            sr = sr + y[t] * math.cos(ang)
            si = si - y[t] * math.sin(ang)
        re[f] = sr
        im[f] = si
    amp2 = [re[f] * re[f] + im[f] * im[f] for f in range(num_pos)]
    top = sorted(range(num_pos), key=lambda f: (-amp2[f], f))[:k]
    comps = np.empty((k + (1 if residuals else 0), n))
    for row, f in enumerate(top):
        for t in range(n):
            ang = two_pi * f * t / n
            comps[row, t] = (re[f] * math.cos(ang) - im[f] * math.sin(ang)) / n
    if residuals:
        for t in range(n):
            acc = y[t]
            for row in range(k):
                acc = acc - comps[row, t]
            comps[k, t] = acc
    return comps


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
    method: str = "fft",
) -> DataFrame:
    """Append ``dft_0..dft_{k-1}`` (+ ``dft_residuals``) per series.

    ``method='fft'`` (default): numpy FFT — the production path.
    ``method='direct'``: exact sequential DFT (same decomposition, fixed
    float op order, deterministic component ordering) — the cross-engine-
    reproducible mode used by oracle queries; O(n²) per series, intended
    for short series (daily tiers, seasonal profiles)."""
    if k <= 0:
        raise ValueError("Parameter `k` must be positive integer!")
    if method not in ("fft", "direct"):
        raise ValueError(f"unknown method '{method}'")
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
        comps = (
            _dft_components(yy, k, residuals)
            if method == "fft"
            else _dft_components_direct(yy, k, residuals)
        )
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


def model_decompose(
    df: DataFrame,
    model: str = "stl",
    in_col: str = "value",
    residuals: bool = False,
    period: int = 24,
    window: int = 5,
    seasonality: int = 1,
    robust: bool = False,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """ModelDecomposeTransform (reference decomposition/model_based.py:42):
    per-series decomposition via the engine's own models — in-sample only,
    NaN outside the fitted range, optional residuals so components sum back
    to the series.

    Models (the reference's statsmodels/prophet zoo is unavailable; these
    are the engine's numpy equivalents):
    - 'stl':  components = target_seasonality + target_trend (Cleveland STL,
      operators/stl.py);
    - 'holt': component = target_level (additive-trend exponential smoothing
      in-sample one-step prediction);
    - 'sma':  component = target_prediction (seasonal moving average
      in-sample one-step prediction, plans/pipeline.py kernel).
    """
    from etna_spark.operators.stl import _fit_holt, stl_decompose

    if model not in ("stl", "holt", "sma"):
        raise ValueError(
            f"Model type `{model}` is not supported! Supported: stl, holt, sma"
        )
    keys = list(series_cols)
    if model == "stl":
        comp_cols = ["target_seasonality", "target_trend"]
    elif model == "holt":
        comp_cols = ["target_level"]
    else:
        comp_cols = ["target_prediction"]
    if residuals:
        comp_cols = comp_cols + ["target_residuals"]

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
        out = pdf[[*keys, ts_col]].copy()
        for c in comp_cols:
            out[c] = np.nan
        valid = np.flatnonzero(~np.isnan(y))
        if len(valid) < 3:
            return out
        lo, hi = valid[0], valid[-1]
        yy = y[lo : hi + 1]
        if np.isnan(yy).any():
            raise ValueError(
                f"Feature `{in_col}` contains missing values in segments!"
            )
        if model == "stl":
            season, trend, resid = stl_decompose(yy, period, robust=robust)
            comps = [season, trend]
            rr = resid
        elif model == "holt":
            pred, _ = _fit_holt(yy)
            comps = [pred]
            rr = yy - pred
        else:  # sma in-sample one-step prediction
            w, s = window, seasonality
            pred = np.full(len(yy), np.nan)
            for i in range(len(yy)):
                idx = np.arange(i - s, i - s * (w + 1), -s)
                idx = idx[idx >= 0]
                if len(idx):
                    pred[i] = np.nanmean(yy[idx])
            comps = [pred]
            with np.errstate(invalid="ignore"):
                rr = yy - pred
        for i, c in enumerate(comp_cols):
            col = np.full(len(y), np.nan)
            col[lo : hi + 1] = comps[i] if i < len(comps) else rr
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


def periodogram_topk(
    df: DataFrame,
    k: int = 3,
    in_col: str = "target",
    series_cols: Sequence[str] = ("segment",),
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-segment periodogram peaks: the k positive frequencies (DC
    excluded) with the largest spectral power P(f) = (re^2 + im^2) / n,
    via the exact direct DFT (same sequential float chain as
    ``_dft_components_direct``, so a SQL oracle replays it bit-for-bit).

    The reference exposes this as periodogram-based EDA
    (``/root/reference/etna/analysis/eda/plots.py:156``
    ``plot_periodogram``, scipy.signal backend); at
    scale each segment's O(n^2) scan rides one applyInPandas group —
    segment-parallel, state-free.
    """
    import math

    keys = list(series_cols)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[in_col].to_numpy(np.float64)
        n = len(y)
        num_pos = _num_pos_freqs(n)
        two_pi = 2 * math.pi
        pw = []
        for f in range(1, num_pos):
            sr = 0.0
            si = 0.0
            for t in range(n):
                ang = two_pi * f * t / n
                sr = sr + y[t] * math.cos(ang)
                si = si - y[t] * math.sin(ang)
            pw.append((f, (sr * sr + si * si) / n))
        top = sorted(pw, key=lambda p: (-p[1], p[0]))[:k]
        return pd.DataFrame(
            {
                **{c: [pdf[c].iloc[0]] * len(top) for c in keys},
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
                "freq": np.array([f for f, _ in top], dtype=np.int64),
                "power": np.array([p for _, p in top], dtype=np.float64),
            }
        )

    key_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keys
    )
    return df.groupBy(*keys).applyInPandas(
        kern, f"{key_schema}, rank int, freq long, power double"
    )
