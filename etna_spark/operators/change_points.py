"""Change-point-based transforms: trend / level removal and segmentation.

Reference: ``ChangePointsTrendTransform`` / ``ChangePointsLevelTransform`` /
``ChangePointsSegmentationTransform``
(/root/reference/etna/transforms/decomposition/change_points_based/
detrend.py:45, level.py:42, segmentation.py:56) — each series is split into
intervals by a change-point model (default: ``ruptures`` Binseg, n_bkps=5),
a per-interval model (linear regression on the timestamp / constant mean)
is fitted, and its prediction is subtracted (trend/level, reversible) or
the interval index is emitted (segmentation, irreversible). The last
interval extends to +inf so future rows use the last fitted model.

ruptures/sklearn are unavailable here: change points come from a from-
scratch numpy BINARY SEGMENTATION (the standard greedy binseg splitter)
with an O(1)-per-split cumulative-sum cost — 'linear' (RSS around the
per-segment OLS line; localizes slope AND level changes, the analogue of
the reference's ruptures default) for the trend transform, 'l2' (mean
shifts) for the level transform. Per-interval OLS is closed-form numpy;
breakpoint recovery on step/slope series is pinned by tests.

Spark surface: per-series ``applyInPandas`` fit producing a tiny interval
state table (n_bkps+1 rows per series, persisted via plans/state), applied
with a broadcast interval-range join + native expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etna_spark.plans.state import materialize

__all__ = ["binseg", "ChangePointsTrend", "ChangePointsLevel",
           "ChangePointsSegmentation", "TrendTransform"]


class _Cums:
    """Cumulative sums for O(1) segment costs: l2 (deviation around the
    mean) and linear (RSS around the per-segment OLS line on the index)."""

    def __init__(self, y: np.ndarray, model: str):
        n = len(y)
        x = np.arange(n, dtype=np.float64)
        z = np.zeros(1)
        self.model = model
        self.cy = np.concatenate([z, np.cumsum(y)])
        self.cyy = np.concatenate([z, np.cumsum(y * y)])
        if model == "linear":
            self.cx = np.concatenate([z, np.cumsum(x)])
            self.cxx = np.concatenate([z, np.cumsum(x * x)])
            self.cxy = np.concatenate([z, np.cumsum(x * y)])

    def cost(self, lo, hi):
        """Segment cost over [lo, hi); lo/hi may be arrays."""
        ln = hi - lo
        sy = self.cy[hi] - self.cy[lo]
        syy = self.cyy[hi] - self.cyy[lo]
        dev_yy = syy - sy * sy / ln
        if self.model == "l2":
            return dev_yy
        sx = self.cx[hi] - self.cx[lo]
        sxx = self.cxx[hi] - self.cxx[lo]
        sxy = self.cxy[hi] - self.cxy[lo]
        dev_xx = sxx - sx * sx / ln
        dev_xy = sxy - sx * sy / ln
        with np.errstate(divide="ignore", invalid="ignore"):
            rss = dev_yy - np.where(dev_xx > 0, dev_xy * dev_xy
                                    / np.where(dev_xx > 0, dev_xx, 1.0), 0.0)
        return rss


def _best_split(c: _Cums, a: int, b: int, min_size: int) -> tuple[int, float]:
    """Best split point of [a, b) and its cost gain (vectorized over t)."""
    n = b - a
    if n < 2 * min_size:
        return -1, 0.0
    t = np.arange(a + min_size, b - min_size + 1)
    split_cost = c.cost(np.full_like(t, a), t) + c.cost(t, np.full_like(t, b))
    k = int(np.argmin(split_cost))
    gain = float(c.cost(a, b) - split_cost[k])
    return int(t[k]), gain


def binseg(y: np.ndarray, n_bkps: int, min_size: int = 2,
           model: str = "linear", tie_break: str = "order") -> list[int]:
    """Greedy binary segmentation: returns sorted breakpoint indices (each
    b splits segments as [.., b), [b, ..)). ``model``: 'linear' (RSS around
    per-segment OLS — localizes slope AND level changes; the analogue of
    the reference's ruptures default) or 'l2' (mean shifts only).

    ``tie_break``: which segment wins when two have EXACTLY equal best
    gain — 'order' (list insertion order, the classic binseg walk) or
    'start' (smallest segment start; stateless, so an SQL twin can
    replicate the greedy with ORDER BY gain DESC, a ASC). Identical
    picks except on exact float ties."""
    if model not in ("linear", "l2"):
        raise ValueError(f"bad binseg model {model}")
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    c = _Cums(y, model)
    segments: list[tuple[int, int]] = [(0, n)]
    bkps: list[int] = []
    for _ in range(n_bkps):
        best = (1e-9, -1, -1)  # gain, split, seg index
        seg_iter = (
            sorted(enumerate(segments), key=lambda kv: kv[1])
            if tie_break == "start" else list(enumerate(segments))
        )
        for si, (a, b) in seg_iter:
            t, gain = _best_split(c, a, b, min_size)
            if t >= 0 and gain > best[0]:
                best = (gain, t, si)
        if best[1] < 0:
            break
        _, t, si = best
        a, b = segments.pop(si)
        segments.extend([(a, t), (t, b)])
        bkps.append(t)
    return sorted(bkps)


class ChangePointsTrend:
    """Binseg intervals + per-interval OLS trend on the epoch timestamp,
    subtracted at transform, restored at inverse (detrend.py:45)."""

    _MODEL = "linear"

    def __init__(
        self,
        in_col: str = "value",
        n_bkps: int = 5,
        min_size: int = 2,
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
        tie_break: str = "order",
        solver: str = "cov",
        step_seconds: int = 3600,
    ):
        """``solver='cov'`` (default) fits each interval's OLS with numpy
        covariance on the raw epoch timestamp — fastest, but its float
        reduction order is not replayable outside numpy. ``solver='cramer'``
        computes the same line from INTEGER sufficient statistics on the
        scaled local index ``x = (ts − interval_start_ts) / step_seconds``
        with one fixed closed-form op sequence (slope = (nΣxy − ΣxΣy) /
        (nΣxx − ΣxΣx), intercept = (Σy − slope·Σx)/n) — bit-replayable in
        an SQL oracle when the input is integer-valued on a step-aligned
        grid (raises loudly otherwise). ``tie_break`` passes through to
        :func:`binseg` ('start' makes the greedy stateless for SQL twins).
        """
        if solver not in ("cov", "cramer"):
            raise ValueError(f"bad solver {solver!r}")
        if solver == "cramer" and self._MODEL != "linear":
            raise ValueError("solver='cramer' applies to the linear model")
        self.in_col = in_col
        self.n_bkps = n_bkps
        self.min_size = min_size
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self.tie_break = tie_break
        self.solver = solver
        self.step_seconds = step_seconds
        self._state: DataFrame | None = None

    def fit(self, df: DataFrame) -> "ChangePointsTrend":
        in_col, ts_col = self.in_col, self.ts_col
        keys = self.series_cols
        n_bkps, min_size, model = self.n_bkps, self.min_size, self._MODEL
        tie_break, solver, step = self.tie_break, self.solver, self.step_seconds

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            pdf = pdf[~pdf[in_col].isna()]
            y = pdf[in_col].to_numpy(np.float64)
            ts = pdf[ts_col].to_numpy("datetime64[s]").astype(np.int64)
            out = {"itv": [], "start_ts": [], "end_ts": [],
                   "slope": [], "intercept": [], "x0": []}
            if len(y):
                cost = "linear" if model == "linear" else "l2"
                bounds = [0, *binseg(y, n_bkps, min_size, model=cost,
                                     tie_break=tie_break), len(y)]
                for i in range(len(bounds) - 1):
                    a, b = bounds[i], bounds[i + 1]
                    xs, ys = ts[a:b].astype(np.float64), y[a:b]
                    x0 = None
                    if model == "linear" and solver == "cramer":
                        x0 = int(ts[a])
                        xi = ts[a:b] - ts[a]
                        if np.any(xi % step != 0):
                            raise ValueError(
                                "solver='cramer' needs a step-aligned grid"
                            )
                        xi //= step
                        yi = y[a:b].astype(np.int64)
                        if not np.array_equal(yi.astype(np.float64), y[a:b]):
                            raise ValueError(
                                "solver='cramer' needs integer-valued input"
                            )
                        n = b - a
                        sx, sxx = int(xi.sum()), int((xi * xi).sum())
                        sy, sxy = int(yi.sum()), int((xi * yi).sum())
                        num, den = n * sxy - sx * sy, n * sxx - sx * sx
                        for v in (num, den, sy, sx):
                            if abs(v) >= 2**53:
                                raise ValueError(
                                    "cramer sufficient statistic "
                                    f"{v} breaks the 2^53 float-exact bound"
                                )
                        if den > 0 and n > 1:
                            slope = float(num) / float(den)
                            intercept = (float(sy) - slope * float(sx)) / n
                        else:
                            slope, intercept = 0.0, float(sy) / n
                    elif model == "linear" and len(xs) > 1 and xs.std() > 0:
                        slope = float(np.cov(xs, ys, bias=True)[0, 1]
                                      / xs.var())
                        intercept = float(ys.mean() - slope * xs.mean())
                    else:  # constant (level) model or degenerate interval
                        slope, intercept = 0.0, float(ys.mean())
                    out["itv"].append(i)
                    # first interval reaches -inf, last +inf (future rows)
                    out["start_ts"].append(None if i == 0 else int(ts[a]))
                    out["end_ts"].append(
                        None if b == len(y) else int(ts[b])
                    )
                    out["slope"].append(slope)
                    out["intercept"].append(intercept)
                    out["x0"].append(x0)
            res = pd.DataFrame(out)
            for k in keys:
                res[k] = pdf[k].iloc[0] if len(pdf) else None
            return res[[*keys, "itv", "start_ts", "end_ts", "slope",
                        "intercept", "x0"]]

        key_schema = ", ".join(
            f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
        )
        state = df.groupBy(*keys).applyInPandas(
            kern,
            f"{key_schema}, itv int, start_ts long, end_ts long, "
            "slope double, intercept double, x0 long",
        )
        self._state = materialize(state)
        return self

    def _joined(self, df: DataFrame) -> DataFrame:
        if self._state is None:
            raise ValueError("Transform is not fitted!")
        ts_l = F.col(self.ts_col).cast("long")
        cond = (
            (F.col("start_ts").isNull() | (ts_l >= F.col("start_ts")))
            & (F.col("end_ts").isNull() | (ts_l < F.col("end_ts")))
        )
        st = F.broadcast(self._state)
        return df.join(st, on=[*self.series_cols], how="left").filter(cond)

    def _pred(self) -> F.Column:
        if self.solver == "cramer":
            # scaled local index: exact float division on a step-aligned
            # grid (difference is an exact int multiple of step)
            x = (
                (F.col(self.ts_col).cast("long") - F.col("x0"))
                .cast("double") / F.lit(float(self.step_seconds))
            )
            return F.col("intercept") + F.col("slope") * x
        return (
            F.col("intercept")
            + F.col("slope") * F.col(self.ts_col).cast("double")
        )

    _STATE_COLS = ("itv", "start_ts", "end_ts", "slope", "intercept", "x0")

    def transform(self, df: DataFrame) -> DataFrame:
        j = self._joined(df)
        return j.withColumn(
            self.in_col, F.col(self.in_col) - self._pred()
        ).drop(*self._STATE_COLS)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        j = self._joined(df)
        return j.withColumn(
            self.in_col, F.col(self.in_col) + self._pred()
        ).drop(*self._STATE_COLS)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


class ChangePointsLevel(ChangePointsTrend):
    """Per-interval CONSTANT (mean) model — level shifts (level.py:42)."""

    _MODEL = "mean"


class ChangePointsSegmentation(ChangePointsTrend):
    """Label each timestamp with its interval index (segmentation.py:56);
    irreversible — inverse returns the frame unchanged."""

    def __init__(self, in_col: str = "value", out_col: str = "interval",
                 n_bkps: int = 5, min_size: int = 2,
                 series_cols: Sequence[str] = ("series",), ts_col: str = "ts"):
        super().__init__(in_col=in_col, n_bkps=n_bkps, min_size=min_size,
                         series_cols=series_cols, ts_col=ts_col)
        self.out_col = out_col

    def transform(self, df: DataFrame) -> DataFrame:
        j = self._joined(df)
        return j.withColumn(self.out_col, F.col("itv")).drop(*self._STATE_COLS)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        return df


class TrendTransform(ChangePointsTrend):
    """Add the per-interval trend prediction as a feature column
    (reference change_points_based/trend.py:59 — irreversible; the
    detrend variant subtracts it instead)."""

    def __init__(self, in_col: str = "value", out_col: str = "trend",
                 n_bkps: int = 5, min_size: int = 2,
                 series_cols: Sequence[str] = ("series",), ts_col: str = "ts"):
        super().__init__(in_col=in_col, n_bkps=n_bkps, min_size=min_size,
                         series_cols=series_cols, ts_col=ts_col)
        self.out_col = out_col

    def transform(self, df: DataFrame) -> DataFrame:
        j = self._joined(df)
        return j.withColumn(self.out_col, self._pred()).drop(*self._STATE_COLS)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        return df


def find_change_points(
    df: DataFrame,
    in_col: str = "value",
    n_bkps: int = 5,
    min_size: int = 2,
    model: str = "linear",
    series_cols=("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Per-series change-point timestamps (reference analysis/
    decomposition/search.py:11-40, ruptures→binseg): one row per detected
    break — the interval starts of the fitted segmentation, excluding the
    −inf opener."""
    if model not in ("linear", "l2"):
        raise ValueError(f"bad find_change_points model '{model}'")
    cls = ChangePointsTrend if model == "linear" else ChangePointsLevel
    t = cls(
        in_col=in_col, n_bkps=n_bkps, min_size=min_size,
        series_cols=series_cols, ts_col=ts_col,
    ).fit(df)
    return t._state.filter(F.col("start_ts").isNotNull()).select(
        *series_cols,
        F.col("start_ts").cast("timestamp").alias("change_point_ts"),
    )


def cusum_max(
    df: "DataFrame",
    series_cols=("segment",),
    ts_col: str = "timestamp",
    value_col: str = "target",
) -> "DataFrame":
    """Page-style CUSUM change statistic per segment, fully integer-exact:
    D_t = n*S_t - t*S_n over prefix sums S_t of the integer values; the
    reported statistic is max |D_t| with its argmax position (smallest t
    on ties). A mean shift at position t* makes |D| peak there — this is
    the scan statistic behind the classic single-change-point test, and
    the zero-float companion of the binseg discovery above.

    One window pass (prefix sums) + one rank per segment; BIGINT
    throughout, so ANSI overflow raises rather than degrading.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    keys = list(series_cols)
    word = W.partitionBy(*keys).orderBy(ts_col)
    wseg = W.partitionBy(*keys)
    run = word.rowsBetween(W.unboundedPreceding, W.currentRow)
    d = df.select(
        *keys,
        F.row_number().over(word).alias("t"),
        F.count("*").over(wseg).alias("n"),
        F.sum(value_col).over(run).alias("st"),
        F.sum(value_col).over(wseg).alias("sn"),
    ).select(
        *keys, "t", "n",
        F.abs(F.col("n") * F.col("st") - F.col("t") * F.col("sn"))
        .alias("absd"),
    )
    ranked = d.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy(*keys).orderBy(F.col("absd").desc(), F.col("t"))
        ),
    )
    return ranked.filter(F.col("rk") == 1).select(
        *keys, F.col("n").alias("n_obs"),
        F.col("absd").alias("cusum_max"),
        F.col("t").alias("argmax_t"),
    )
