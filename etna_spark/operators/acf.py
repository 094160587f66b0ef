"""Autocorrelation / stationarity EDA over per-segment integer series.

Parity target: the reference's ACF analysis plots and statsmodels-backed
stationarity checks (``/root/reference/etna/analysis/eda/plots.py:523``
``acf_plot``, ``:35-36`` ``plot_acf``/``plot_pacf`` re-exports) —
re-expressed as exact distributed statistics instead of driver-side
statsmodels calls.

Cross-engine exactness strategy (SURVEY.md §4.3, same discipline as
``detrend_linear_1h``): every statistic is assembled from BIGINT
sufficient sums over integer (cent-scaled) observations, so partial
aggregation order cannot perturb it; the final float step is a fixed,
identical IEEE op sequence in Spark and any ANSI-SQL oracle. Magnitudes
are bounded by the scaled-sum guard — ANSI mode makes any int64 overflow
raise loudly rather than wrap.

Deviations are taken against the FLOOR of the segment mean (an integer),
with the remainder ``r = sum(y) mod n`` carried symbolically:

  z_t   = y_t - floor(mean)          (integer)
  n^2 * num_k = n^2 * sum(z_t z_{t-k})
              - n * r * (sum_{t>k} z_t + sum_{t<=n-k} z_t)
              + (n-k) * r^2
  n^2 * den   = n^2 * sum(z_t^2) - n * r^2
  acf_k = (n^2 * num_k) / (n^2 * den)   -- one exact-int division

This is the classic biased sample ACF (denominator over the full
series), evaluated over the observed row sequence in time order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _deviations(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Attach per-segment row index ``t`` (1-based, time order), count
    ``n``, integer deviation ``z`` and mean remainder ``r``."""
    keys = [F.col(c) for c in series_cols]
    w = Window.partitionBy(*keys).orderBy(ts_col)
    wseg = Window.partitionBy(*keys)
    sy = F.sum(F.col(value_col)).over(wseg)
    n = F.count("*").over(wseg)
    r = F.pmod(sy, n)
    # floor-div via pmod: (sy - r) is divisible by n; the double division
    # is exact only below 2^53, so the bound is enforced LOUDLY (same
    # guard as ThetaModel's integer normal equations)
    guarded_sy = F.when(
        F.assert_true(
            F.abs(sy) < F.lit(float(2 ** 53)),
            F.lit("acf: |segment sum| >= 2^53 — rescale the value column"),
        ).isNull(),
        sy,
    )
    ybar_floor = ((guarded_sy - r) / n).cast("long")
    return df.select(
        *series_cols,
        F.row_number().over(w).alias("t"),
        n.alias("n"),
        r.alias("r"),
        (F.col(value_col) - ybar_floor).alias("z"),
    )


def acf(
    df: DataFrame,
    lags: Sequence[int],
    series_cols: Sequence[str] = ("segment",),
    ts_col: str = "timestamp",
    value_col: str = "target",
) -> DataFrame:
    """Per-segment sample ACF at the given lags over an integer-valued
    column. Returns one row per (segment, lag) with ``acf`` rounded to 6.

    One window pass + one hash aggregation per segment — the shuffle is
    keyed by the segment columns and the output is segment-sized, so the
    plan is a single exchange at any input scale.
    """
    dev = _deviations(df, series_cols, ts_col, value_col)
    keys = [F.col(c) for c in series_cols]
    w = Window.partitionBy(*keys).orderBy("t")
    lagged = dev.select(
        *series_cols, "t", "n", "r", "z",
        *[F.lag("z", k).over(w).alias(f"zl{k}") for k in lags],
    )
    aggs = [
        F.first("n").alias("n"),
        F.first("r").alias("r"),
        F.sum(F.col("z") * F.col("z")).alias("szz0"),
    ]
    for k in lags:
        aggs += [
            F.sum(F.col("z") * F.col(f"zl{k}")).alias(f"szz{k}"),
            F.sum(F.when(F.col("t") > k, F.col("z"))).alias(f"a{k}"),
            F.sum(
                F.when(F.col("t") <= F.col("n") - k, F.col("z"))
            ).alias(f"b{k}"),
        ]
    s = lagged.groupBy(*series_cols).agg(*aggs)
    nn = F.col("n") * F.col("n")
    den = (nn * F.col("szz0") - F.col("n") * F.col("r") * F.col("r"))
    per_lag = []
    for k in lags:
        num = (
            nn * F.col(f"szz{k}")
            - F.col("n") * F.col("r") * (F.col(f"a{k}") + F.col(f"b{k}"))
            + (F.col("n") - k) * F.col("r") * F.col("r")
        )
        per_lag.append(
            s.select(
                *series_cols,
                F.lit(k).cast("int").alias("lag"),
                F.round(
                    num.cast("double") / den.cast("double"), 6
                ).alias("acf"),
            )
        )
    out = per_lag[0]
    for p in per_lag[1:]:
        out = out.unionByName(p)
    return out


def pacf_lag2(
    df: DataFrame,
    series_cols: Sequence[str] = ("segment",),
    ts_col: str = "timestamp",
    value_col: str = "target",
) -> DataFrame:
    """Partial autocorrelation at lag 2 via Durbin–Levinson:
    ``phi22 = (r2 - r1^2) / (1 - r1^2)`` with r1, r2 the ROUND-6 sample
    ACFs (both engines consume the identical rounded ratios, which is
    what keeps the gate exact). Near |r1| -> 1 the formula is
    ill-conditioned — the 5e-7 rounding error is amplified by
    1/(1 - r1^2) — so treat pacf2 as unreliable for near-unit-root
    segments (the ADF query is the right tool there)."""
    a = acf(df, [1, 2], series_cols, ts_col, value_col)
    # recompute unrounded ratios: pivot the two lags side by side
    wide = (
        a.groupBy(*series_cols)
        .pivot("lag", [1, 2])
        .agg(F.first("acf"))
        .withColumnRenamed("1", "r1")
        .withColumnRenamed("2", "r2")
    )
    # r1/r2 are round6 already; the float chain below is identical in the
    # SQL twin (which also feeds round6 ratios), so the comparison stays
    # bit-exact as long as both engines consume the SAME rounded inputs.
    phi = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        F.lit(1.0) - F.col("r1") * F.col("r1")
    )
    return wide.select(*series_cols, F.round(phi, 6).alias("pacf2"))


def adf_stat(
    df: DataFrame,
    series_cols: Sequence[str] = ("segment",),
    ts_col: str = "timestamp",
    value_col: str = "target",
) -> DataFrame:
    """Dickey–Fuller unit-root regression (no augmenting lags):
    ``dy_t = alpha + rho * y_{t-1} + e_t`` per segment, returning the
    OLS ``rho`` and its t-statistic — the stationarity score the
    reference reads off statsmodels' ``adfuller``.

    Exactness: BIGINT sufficient statistics (n', Sx, Sw, Sxx, Sxw, Sww)
    feed a fixed Cramer chain; the only non-exact float ops are the two
    final divisions and one sqrt, identical in both engines.
    """
    keys = [F.col(c) for c in series_cols]
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(value_col)).over(w)
    xy = df.select(
        *series_cols,
        prev.alias("x"),
        (F.col(value_col) - prev).alias("dy"),
    ).filter(F.col("x").isNotNull())
    s = xy.groupBy(*series_cols).agg(
        F.count("*").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("dy").alias("sw"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).alias("sxw"),
        F.sum(F.col("dy") * F.col("dy")).alias("sww"),
    )
    dn = (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
    bnum = (F.col("np") * F.col("sxw") - F.col("sx") * F.col("sw"))
    b = bnum.cast("double") / dn.cast("double")
    sse_n = (
        (F.col("np") * F.col("sww") - F.col("sw") * F.col("sw"))
        .cast("double")
        - b * bnum.cast("double")
    )
    s2 = sse_n / F.col("np").cast("double") / (F.col("np") - 2).cast("double")
    se = F.sqrt(s2 * F.col("np").cast("double") / dn.cast("double"))
    return s.select(
        *series_cols,
        F.col("np").alias("n_obs"),
        F.round(b, 6).alias("rho"),
        F.round(b / se, 6).alias("t_stat"),
    )
