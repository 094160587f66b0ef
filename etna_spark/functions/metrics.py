"""Forecast-quality metrics as null-aware aggregate expressions.

Reference: /root/reference/etna/metrics/functional_metrics.py (mse:39,
mae:91, mape:143, smape:205, r2:265, medae:347, sign:399, max_deviation:452,
rmse:505, msle:547, wape:606, count_missing:679) and the per-segment /
"macro" aggregation classes in metrics.py:18-595.

Missing-value discipline: a pair contributes only when BOTH sides are
non-null (the reference's nan-propagation through ``t - p``); storage uses
null, so Spark's null-skipping aggregates implement nan-skipping exactly.
MedAE uses the EXACT percentile (never approx). R2 reproduces sklearn-style
edge cases (0/0 → 1, den=0 → 0, <2 valid pairs → null).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

METRICS = (
    "mae", "mse", "rmse", "mape", "smape", "medae", "msle", "sign",
    "wape", "r2", "max_deviation", "count_missing",
)


def _pairwise(t: Column, p: Column) -> Column:
    """diff that is null unless both sides are present."""
    return t - p


def metric_expr(name: str, true_col: str, pred_col: str, eps: float = 1e-15) -> Column:
    t, p = F.col(true_col), F.col(pred_col)
    d = _pairwise(t, p)
    valid = t.isNotNull() & p.isNotNull()
    if name == "mae":
        return F.avg(F.abs(d))
    if name == "mse":
        return F.avg(d * d)
    if name == "rmse":
        return F.sqrt(F.avg(d * d))
    if name == "mape":
        return F.avg(F.abs(d / t)) * 100.0
    if name == "smape":
        return (
            F.avg(2.0 * F.abs(p - t) / F.greatest(F.abs(t) + F.abs(p), F.lit(eps)))
            * 100.0
        )
    if name == "medae":
        return F.percentile(F.abs(d), F.lit(0.5))
    if name == "msle":
        return F.avg(F.pow(F.log1p(t) - F.log1p(p), 2))
    if name == "sign":
        return F.avg(F.signum(d))
    if name == "wape":
        return F.sum(F.abs(d)) / F.sum(F.when(valid, F.abs(t)))
    if name == "count_missing":
        return F.sum(F.when(t.isNull(), 1).otherwise(0)).cast("double")
    if name == "r2":
        n = F.count(F.when(valid, 1))
        num = F.avg(d * d)  # MSE over valid pairs
        den = F.var_pop(F.when(valid, t))
        base = (
            F.when((num != 0) & (den != 0), 1.0 - num / den)
            .when((num != 0) & (den == 0), F.lit(0.0))
            .otherwise(F.lit(1.0))
        )
        return F.when(n < 2, F.lit(None).cast("double")).otherwise(base)
    raise ValueError(f"unknown metric {name}")


def compute_metrics(
    df: DataFrame,
    true_col: str = "value",
    pred_col: str = "prediction",
    metrics: Sequence[str] = ("mae", "mse", "rmse", "smape"),
    mode: str = "per-segment",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """One row per series (or one row total in 'macro' mode) with one column
    per metric. ``max_deviation`` (a prefix-sum metric) is computed via a
    cumulative window then max — the only metric needing time order."""
    simple = [m for m in metrics if m != "max_deviation"]
    keys = list(series_cols) if mode == "per-segment" else []
    exprs = [metric_expr(m, true_col, pred_col).alias(m) for m in simple]
    out = df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
    if "max_deviation" in metrics:
        if keys:
            w = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(
                Window.unboundedPreceding, 0
            )
            prefix = df.withColumn(
                "_dev", F.sum(F.col(pred_col) - F.col(true_col)).over(w)
            )
            md = prefix.groupBy(*keys).agg(
                F.max(F.abs("_dev")).alias("max_deviation")
            )
            out = out.join(md, on=keys)
        else:
            # macro: a global row-window would drag every row into ONE task.
            # Pre-aggregate the deviation per timestamp (distributed), prefix
            # over the tiny per-ts frame instead — same boundary values (the
            # intra-timestamp order is undefined anyway).
            per_ts = df.groupBy(ts_col).agg(
                F.sum(F.col(pred_col) - F.col(true_col)).alias("_d")
            )
            w = Window.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
            md = per_ts.withColumn("_dev", F.sum("_d").over(w)).agg(
                F.max(F.abs("_dev")).alias("max_deviation")
            )
            out = out.crossJoin(md)
    return out


def interval_metrics(
    df: DataFrame,
    true_col: str = "value",
    lower_col: str = "lower",
    upper_col: str = "upper",
    metrics: Sequence[str] = ("coverage", "width"),
    mode: str = "per-segment",
    missing_mode: str = "error",
    series_cols: Sequence[str] = ("series",),
) -> DataFrame:
    """Prediction-interval metrics (reference metrics/intervals_metrics.py:
    60-320):

    - coverage = share of samples with lower <= y_true <= upper;
    - width    = mean |upper - lower|.

    ``missing_mode='error'`` raises on any missing y_true (the reference's
    default); ``'ignore'`` skips missing rows, with sums computed over
    exact sufficient statistics (one division at the end) so results are
    aggregation-order-independent for integer-valued inputs."""
    for m in metrics:
        if m not in ("coverage", "width"):
            raise ValueError(f"unknown interval metric '{m}'")
    if missing_mode not in ("error", "ignore"):
        raise ValueError(f"unknown missing_mode '{missing_mode}'")
    y = F.col(true_col)
    lo, hi = F.col(lower_col), F.col(upper_col)
    if missing_mode == "error":
        if df.filter(y.isNull()).limit(1).count() > 0:
            raise ValueError(
                "There are NaNs in y_true; "
                "use missing_mode='ignore' to skip them"
            )
    keys = list(series_cols) if mode == "per-segment" else []
    exprs = []
    for m in metrics:
        if m == "coverage":
            # a NULL bound means NOT covered (the reference's y >= NaN is
            # False) — coalesce keeps the row in the denominator instead of
            # silently inflating coverage
            hit = F.when(
                y.isNotNull(),
                F.coalesce(
                    ((y >= lo) & (y <= hi)).cast("long"), F.lit(0)
                ),
            )
            exprs.append(
                (F.sum(hit).cast("double") / F.count(hit)).alias("coverage")
            )
        else:
            # a NULL bound on a valid row poisons the mean with NaN, like
            # the reference's NaN propagation — coverage above instead
            # counts the same row as a miss (y >= NaN is False there)
            w = F.when(
                y.isNotNull(),
                F.coalesce(F.abs(hi - lo), F.lit(float("nan"))),
            )
            exprs.append(
                (F.sum(w) / F.count(w)).alias("width")
            )
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
