"""STL decomposition transform (season + trend removal, reversible).

Reference: ``STLTransform``
(/root/reference/etna/transforms/decomposition/stl.py:25-270) — per-segment
statsmodels ``STLForecast``: STL (Cleveland et al. 1990, "STL: A
Seasonal-Trend decomposition procedure based on Loess") decomposes the
series; a trend model (``"arima"`` → ARIMA(1,1,0), ``"holt"`` → additive-
trend exponential smoothing) is fit on the deseasonalized series; transform
subtracts ``season + model-in-sample-prediction``; beyond the fitted range
the model forecast plus a seasonal-naive repetition of the last fitted
period is used (statsmodels ``STLForecastResults.get_prediction``).

statsmodels is not available in this environment, so the STL inner/outer
LOESS loops and both trend models are implemented from scratch in numpy
(public algorithm, Cleveland 1990 §2):

- inner loop: detrend → per-phase cycle-subseries LOESS (window =
  ``seasonal``), extended one period each side → low-pass (two MA(period),
  one MA(3), LOESS window ``low_pass``) → seasonal = subseries − low-pass →
  trend = LOESS(deseasonalized, window ``trend``);
- outer loop (robust mode): bisquare weights on residuals re-weight every
  LOESS fit;
- ARIMA(1,1,0) via conditional least squares on the differenced series
  (no constant, matching statsmodels' default for d=1); Holt via SSE-
  minimizing (alpha, beta) found with a small Nelder-Mead.

Spark surface: per-segment ``applyInPandas`` kernel at fit time; the fitted
state stays DISTRIBUTED — a long (series, ts, season_trend) table joined on
(series, ts) at transform time (never collected to the driver), plus a
per-series parameter row used to extrapolate ``season_trend`` for future
timestamps with native expressions only.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stl_decompose", "STLTransform"]


# ---------------------------------------------------------------------------
# numpy LOESS + STL (Cleveland 1990)
# ---------------------------------------------------------------------------

def _next_odd(x: float) -> int:
    k = int(np.ceil(x))
    return k if k % 2 == 1 else k + 1


def _loess(
    y: np.ndarray,
    q: int,
    xeval: np.ndarray | None = None,
    rho: np.ndarray | None = None,
) -> np.ndarray:
    """Degree-1 LOESS of ``y`` (observed at positions 0..n-1) evaluated at
    ``xeval`` (may extrapolate). ``q`` = neighborhood size; Cleveland's
    lambda_q(x) = distance to the q-th nearest point, scaled by q/n when
    q > n. ``rho`` multiplies the tricube weights (robustness)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0:
        return np.zeros(0)
    if n == 1:
        return np.full(len(xeval) if xeval is not None else 1, y[0])
    x = np.arange(n, dtype=np.float64)
    if xeval is None:
        xeval = x
    xeval = np.asarray(xeval, dtype=np.float64)
    q_eff = min(q, n)
    # window start per eval point: the q_eff nearest integer positions
    starts = np.clip(
        np.round(xeval).astype(np.int64) - (q_eff - 1) // 2, 0, n - q_eff
    )
    idx = starts[:, None] + np.arange(q_eff)[None, :]          # (E, q)
    yw = y[idx]
    d = np.abs(idx - xeval[:, None])
    lam = d.max(axis=1)
    if q > n:
        lam = lam * (q / n)
    lam = np.maximum(lam, 1e-12)
    w = (1.0 - np.minimum(d / lam[:, None], 1.0) ** 3) ** 3    # tricube
    if rho is not None:
        w = w * np.asarray(rho, dtype=np.float64)[idx]
    u = idx - xeval[:, None]
    sw = w.sum(axis=1)
    swu = (w * u).sum(axis=1)
    swuu = (w * u * u).sum(axis=1)
    swy = (w * yw).sum(axis=1)
    swuy = (w * u * yw).sum(axis=1)
    denom = sw * swuu - swu * swu
    # degree-1 fit evaluated at x0; degenerate window → weighted mean
    with np.errstate(divide="ignore", invalid="ignore"):
        deg1 = (swuu * swy - swu * swuy) / denom
        deg0 = swy / np.maximum(sw, 1e-300)
    out = np.where(np.abs(denom) > 1e-10 * np.maximum(sw * swuu, 1e-300), deg1, deg0)
    return out


def _ma(y: np.ndarray, width: int) -> np.ndarray:
    """Simple moving average, output length len(y) - width + 1."""
    c = np.cumsum(np.concatenate(([0.0], y)))
    return (c[width:] - c[:-width]) / width


def stl_decompose(
    y: np.ndarray,
    period: int,
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    robust: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cleveland STL: returns (seasonal, trend, resid); y must be gap-free.

    Defaults follow statsmodels.tsa.seasonal.STL: seasonal=7,
    trend = next odd >= 1.5*period/(1-1.5/seasonal), low_pass = next odd
    > period; non-robust (inner=2, outer=0), robust (inner=1, outer=15).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if period < 2:
        raise ValueError("period must be >= 2")
    if n < 2 * period:
        raise ValueError(
            f"series is too short for STL: {n} observations < 2 full "
            f"periods ({2 * period})"
        )
    if trend is None:
        trend = _next_odd(1.5 * period / (1.0 - 1.5 / seasonal))
    if low_pass is None:
        low_pass = _next_odd(period + 0.5)  # smallest odd > period
    inner, outer = (1, 15) if robust else (2, 0)
    rho = np.ones(n)
    season = np.zeros(n)
    trend_c = np.zeros(n)
    for o in range(outer + 1):
        for _ in range(inner):
            detr = y - trend_c
            # step 2: cycle-subseries smoothing, extended one period each side
            C = np.empty(n + 2 * period)
            for k in range(period):
                sub = detr[k::period]
                m = len(sub)
                ev = np.arange(-1, m + 1, dtype=np.float64)
                sm = _loess(sub, seasonal, xeval=ev, rho=rho[k::period])
                # extended time positions: k - period, k, ..., k + m*period
                C[k::period] = sm  # C index t+period ≡ times k-period+j*period
            # step 3: low-pass filter of C → L (length n)
            L = _ma(_ma(_ma(C, period), period), 3)
            L = _loess(L, low_pass)
            # step 4/5: seasonal + deseasonalize
            season = C[period : period + n] - L
            deseason = y - season
            # step 6: trend smoothing
            trend_c = _loess(deseason, trend, rho=rho)
        if o < outer:
            r = np.abs(y - season - trend_c)
            # floor h so a (near-)perfect fit on noise-free data does not
            # zero-weight points with numerically-tiny residuals
            h = max(6.0 * float(np.median(r)), 1e-8 * max(1.0, float(r.max())))
            u = np.minimum(r / h, 1.0)
            rho = (1.0 - u * u) ** 2
    return season, trend_c, y - season - trend_c


# ---------------------------------------------------------------------------
# trend models on the deseasonalized series (statsmodels STLForecast analog)
# ---------------------------------------------------------------------------

def _fit_arima110(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ARIMA(1,1,0), no constant (statsmodels default for d=1), fit by
    conditional least squares on the differenced series. Returns
    (in-sample one-step predictions, params [phi, z_T, dz_T])."""
    n = len(z)
    pred = np.empty(n)
    if n < 3:
        phi = 0.0
        pred[:] = z[0] if n else 0.0
        if n == 2:
            pred[1] = z[0]
    else:
        d = np.diff(z)
        num = float(np.dot(d[:-1], d[1:]))
        den = float(np.dot(d[:-1], d[:-1]))
        phi = num / den if den > 0 else 0.0
        phi = float(np.clip(phi, -0.999, 0.999))
        pred[0] = z[0]
        pred[1] = z[0]
        pred[2:] = z[1:-1] + phi * d[:-1]
    dz_T = float(z[-1] - z[-2]) if n >= 2 else 0.0
    return pred, np.array([phi, float(z[-1]), dz_T])


def _holt_sse(z: np.ndarray, alpha: float, beta: float) -> tuple[float, np.ndarray, float, float]:
    level, b = z[0], (z[1] - z[0]) if len(z) > 1 else 0.0
    pred = np.empty(len(z))
    pred[0] = z[0]
    sse = 0.0
    for t in range(1, len(z)):
        pred[t] = level + b
        e = z[t] - pred[t]
        sse += e * e
        new_level = alpha * z[t] + (1 - alpha) * (level + b)
        b = beta * (new_level - level) + (1 - beta) * b
        level = new_level
    return sse, pred, level, b


def _fit_holt(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Additive-trend exponential smoothing (Holt); (alpha, beta) by SSE
    minimization with Nelder-Mead (numpy-only). Returns
    (in-sample one-step preds, params [level_T, trend_T])."""
    if len(z) < 3:
        pred = np.full(len(z), z[0] if len(z) else 0.0)
        return pred, np.array([float(z[-1]) if len(z) else 0.0, 0.0])

    def obj(p):
        a = min(max(p[0], 1e-4), 0.9999)
        bt = min(max(p[1], 1e-4), 0.9999)
        return _holt_sse(z, a, bt)[0]

    # Nelder-Mead on the 2-d simplex
    pts = np.array([[0.5, 0.1], [0.9, 0.1], [0.5, 0.5]], dtype=np.float64)
    vals = np.array([obj(p) for p in pts])
    for _ in range(80):
        order = np.argsort(vals)
        pts, vals = pts[order], vals[order]
        if abs(vals[-1] - vals[0]) < 1e-12:
            break
        centroid = pts[:-1].mean(axis=0)
        xr = centroid + (centroid - pts[-1])
        fr = obj(xr)
        if fr < vals[0]:
            xe = centroid + 2 * (centroid - pts[-1])
            fe = obj(xe)
            pts[-1], vals[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < vals[-2]:
            pts[-1], vals[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (pts[-1] - centroid)
            fc = obj(xc)
            if fc < vals[-1]:
                pts[-1], vals[-1] = xc, fc
            else:
                pts[1:] = pts[0] + 0.5 * (pts[1:] - pts[0])
                vals[1:] = [obj(p) for p in pts[1:]]
    best = pts[int(np.argmin(vals))]
    a = float(min(max(best[0], 1e-4), 0.9999))
    bt = float(min(max(best[1], 1e-4), 0.9999))
    _, pred, level, b = _holt_sse(z, a, bt)
    return pred, np.array([level, b])


# ---------------------------------------------------------------------------
# Spark transform
# ---------------------------------------------------------------------------

_NAN_MSG = "The input column contains NaNs in the middle of the series!"


class STLTransform:
    """Subtract ``season + trend-model prediction`` per series (reversible).

    Fitted state is a distributed long table (series, ts, season_trend) —
    joined back on (series, ts); future timestamps get
    ``model_forecast(h) + season_tail[(h-1) mod period]`` computed with
    native column expressions from a small broadcast per-series param row.
    """

    def __init__(
        self,
        period: int,
        model: str = "arima",
        robust: bool = False,
        seasonal: int = 7,
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
        step_seconds: int = 86400,
    ):
        if model not in ("arima", "holt"):
            raise ValueError("Model should be a string or TimeSeriesModel")
        self.period = period
        self.model = model
        self.robust = robust
        self.seasonal = seasonal
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self.step_seconds = step_seconds
        self._state: DataFrame | None = None   # series..., ts, season_trend
        self._params: DataFrame | None = None  # series..., last_ts, p0, p1, p2, season_tail

    def fit(self, df: DataFrame) -> "STLTransform":
        period, seasonal, robust, model = (
            self.period, self.seasonal, self.robust, self.model,
        )
        in_col, ts_col, step = self.in_col, self.ts_col, self.step_seconds
        keys = self.series_cols

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
            ts = pdf[ts_col].to_numpy("datetime64[s]").astype(np.int64)
            valid = np.flatnonzero(~np.isnan(y))
            if len(valid) == 0:
                return pdf.iloc[:0][keys].assign(
                    ts_epoch=pd.Series(dtype="int64"),
                    season_trend=pd.Series(dtype="float64"),
                    last_ts=pd.Series(dtype="int64"),
                    p0=pd.Series(dtype="float64"),
                    p1=pd.Series(dtype="float64"),
                    p2=pd.Series(dtype="float64"),
                    season_tail=pd.Series(dtype="object"),
                )
            lo, hi = valid[0], valid[-1]
            y, ts = y[lo : hi + 1], ts[lo : hi + 1]
            # regular grid check: middle gaps or NaNs are the same error the
            # reference raises (stl.py:104-106)
            if np.isnan(y).any() or np.any(np.diff(ts) != step):
                raise ValueError(_NAN_MSG)
            season, trend_c, _ = stl_decompose(
                y, period, seasonal=seasonal, robust=robust
            )
            z = y - season  # deseasonalized: trend model input
            if model == "arima":
                pred, params = _fit_arima110(z)
            else:
                pred, params = _fit_holt(z)
            st = pred + season
            head = pdf.iloc[:1][keys]
            out = pd.DataFrame(
                {k: np.repeat(head[k].to_numpy(), len(y)) for k in keys}
            )
            out["ts_epoch"] = ts
            out["season_trend"] = st
            out["last_ts"] = ts[-1]
            out["p0"] = params[0]
            out["p1"] = params[1] if len(params) > 1 else 0.0
            out["p2"] = params[2] if len(params) > 2 else 0.0
            tail = season[-period:] if len(season) >= period else season
            out["season_tail"] = [tail.tolist()] * len(y)
            return out

        key_schema = ", ".join(
            f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
        )
        long = df.groupBy(*keys).applyInPandas(
            kern,
            f"{key_schema}, ts_epoch long, season_trend double, last_ts long, "
            "p0 double, p1 double, p2 double, season_tail array<double>",
        )
        long = long.cache()
        # distributed state: never collected to the driver
        self._state = long.select(
            *keys, F.col("ts_epoch").alias("_st_ts"),
            F.col("season_trend").alias("_st"),
        )
        self._params = (
            long.filter(F.col("ts_epoch") == F.col("last_ts"))
            .select(*keys, "last_ts", "p0", "p1", "p2", "season_tail")
        )
        return self

    def _extrapolated(self) -> F.Column:
        """season_trend for ts beyond the fitted range, native expressions:
        h = steps ahead; arima: z_T + dz_T*phi*(1-phi^h)/(1-phi) (limit h*dz_T
        at phi→1); holt: level + h*trend; + season_tail[(h-1) mod |tail|]."""
        h = (
            (F.col(self.ts_col).cast("long") - F.col("last_ts"))
            / F.lit(self.step_seconds)
        ).cast("long")
        if self.model == "arima":
            phi, z_t, dz = F.col("p0"), F.col("p1"), F.col("p2")
            geom = F.when(
                F.abs(phi - 1.0) < 1e-9, h.cast("double") * dz
            ).otherwise(dz * phi * (1.0 - F.pow(phi, h.cast("double"))) / (1.0 - phi))
            model_pred = z_t + geom
        else:
            model_pred = F.col("p0") + h.cast("double") * F.col("p1")
        tail_n = F.size("season_tail")
        seas = F.element_at(
            "season_tail", (F.pmod(h - 1, tail_n.cast("long")) + 1).cast("int")
        )
        return model_pred + seas

    def _with_season_trend(self, df: DataFrame) -> DataFrame:
        if self._state is None:
            raise ValueError("Transform is not fitted!")
        keys = self.series_cols
        j = (
            df.withColumn("_ts_epoch", F.col(self.ts_col).cast("long"))
            .join(
                self._state.withColumnRenamed("_st_ts", "_ts_epoch"),
                on=[*keys, "_ts_epoch"],
                how="left",
            )
            .join(F.broadcast(self._params), on=keys, how="left")
        )
        st = F.when(F.col("_st").isNotNull(), F.col("_st")).otherwise(
            F.when(
                F.col("_ts_epoch") > F.col("last_ts"), self._extrapolated()
            )
        )
        return j.withColumn("_season_trend", st).drop(
            "_ts_epoch", "_st", "last_ts", "p0", "p1", "p2", "season_tail"
        )

    def transform(self, df: DataFrame) -> DataFrame:
        j = self._with_season_trend(df)
        return j.withColumn(
            self.in_col, F.col(self.in_col) - F.col("_season_trend")
        ).drop("_season_trend")

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        j = self._with_season_trend(df)
        return j.withColumn(
            self.in_col, F.col(self.in_col) + F.col("_season_trend")
        ).drop("_season_trend")

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)
