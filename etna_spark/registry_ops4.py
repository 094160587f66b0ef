"""Round-2 registry batch: power transforms, outlier detectors with real
DuckDB twins, and oracle upgrades for previously rows-only components."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.registry import epoch, register
from etna_spark.registry_ops2 import _H_SERIES, _events_1h


# ---------------------------------------------------------------------------
# Yeo-Johnson with a fixed λ over per-series hourly diffs (both sign
# branches exercised; integer input keeps the float chain per-row
# deterministic). λ-MLE itself is pinned by tests/test_power.py — the grid
# search is not reasonably SQL-expressible, the transform is.
# ---------------------------------------------------------------------------

@register(
    "power_yeojohnson_1h",
    _H_SERIES
    + """
, diffs AS (
  SELECT event_type, bucket_ts,
    CAST(value_cents - lag(value_cents) OVER
      (PARTITION BY event_type ORDER BY bucket_ts) AS DOUBLE) AS d
  FROM series
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(CASE
    WHEN d >= 0 THEN (sqrt(1.0 + d) - 1.0) / 0.5
    ELSE -(((1.0 - d) * sqrt(1.0 - d)) - 1.0) / 1.5
  END, 6) AS yj
FROM diffs
WHERE d IS NOT NULL
""",
)
def q_power_yj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YeoJohnsonTransform application path (reference math/power.py:26):
    ψ_YJ(diff, λ=1/2) over per-series hourly diffs. λ=1/2 is chosen so ψ
    reduces to sqrt/×/÷ — all IEEE-754 correctly-rounded ops that bit-match
    across engines (a general exp(λ·ln(1+x)) chain differs at 1 ulp between
    JVM and libm and flips round6 on big magnitudes). The λ-MLE fit and the
    generic-λ path are pinned by tests/test_power.py."""
    s = _events_1h(spark, sf_dir)
    w = F.lag("value_cents").over(
        Window.partitionBy("event_type").orderBy("bucket_ts")
    )
    d_ = s.withColumn("d", (F.col("value_cents") - w).cast("double")).filter(
        F.col("d").isNotNull()
    )
    d = F.col("d")
    psi = F.when(
        d >= 0, (F.sqrt(1.0 + d) - 1.0) / 0.5
    ).otherwise(-(((1.0 - d) * F.sqrt(1.0 - d)) - 1.0) / 1.5)
    return d_.select("event_type", epoch(), F.round(psi, 6).alias("yj"))


# ---------------------------------------------------------------------------
# IQR / MAD point-outlier detectors with real DuckDB twins (pure window SQL;
# integer-cent inputs make rolling quantiles land on exact quarter-steps, so
# the flag inequality is bit-deterministic cross-engine).
# ---------------------------------------------------------------------------

@register(
    "outliers_iqr_1h",
    _H_SERIES
    + """
, q AS (
  SELECT event_type, bucket_ts, CAST(value_cents AS DOUBLE) AS v,
    quantile_cont(CAST(value_cents AS DOUBLE), 0.25) OVER w AS q25,
    quantile_cont(CAST(value_cents AS DOUBLE), 0.75) OVER w AS q75
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts
FROM q
WHERE v < q25 - 1.5 * (q75 - q25) OR v > q75 + 1.5 * (q75 - q25)
""",
)
def q_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR detector (reference analysis/outliers/rolling_statistics.py:
    219-300): trailing-10 exact rolling quartiles, flag outside
    [q25−1.5·IQR, q75+1.5·IQR]."""
    from etna_spark.operators.outliers import detect_outliers_iqr

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_iqr(
        s, in_col="v", window_size=10, iqr_scale=1.5,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


@register(
    "outliers_mad_1h",
    _H_SERIES
    + """
, med AS (
  SELECT event_type, bucket_ts, CAST(value_cents AS DOUBLE) AS v,
    median(CAST(value_cents AS DOUBLE)) OVER w AS m
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
), mad AS (
  SELECT event_type, bucket_ts, v, m,
    median(abs(v - m)) OVER w AS md
  FROM med
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts
FROM mad WHERE abs(v - m) > 3.0 * md
""",
)
def q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD detector (rolling_statistics.py:303-385): trailing-10 rolling
    median + rolling MAD, flag |x−med| > 3·MAD."""
    from etna_spark.operators.outliers import detect_outliers_mad

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_mad(
        s, in_col="v", window_size=10, mad_scale=3.0,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


@register("outliers_density_1h", None)
def q_outliers_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density rule (reference density_outliers.py:53-216): windowed-
    neighbor counting is not reasonably SQL-expressible → rows-only;
    golden-array semantics pinned in tests/test_outliers2.py."""
    from etna_spark.operators.outliers import detect_outliers_density

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_density(
        s, in_col="v", window_size=15, distance_coef=3.0, n_neighbors=3,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


@register("outliers_iforest_1h", None)
def q_outliers_iforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation forest (reference isolation_forest_outliers.py:59-66),
    numpy reimplementation — randomized model, deterministic via seed;
    rows-only."""
    from etna_spark.operators.outliers import detect_outliers_isolation_forest

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_isolation_forest(
        s, in_col="v", contamination=0.02, seed=7,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())
