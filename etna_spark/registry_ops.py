"""Operator-level registry entries (SURVEY.md §2 coverage): window features,
encoders, scalers, metrics, calendar flags, describe — each as a Spark query
built from engine operators plus an exact DuckDB oracle twin.

Float discipline: every float output is round(x, 6) in both engines; sums
that feed divisions are integer-exact (value cents / token counts) so the
division is a single IEEE op on identical operands in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.functions.calendar import add_date_flags, add_time_flags, add_fourier_features
from etna_spark.functions.metrics import compute_metrics
from etna_spark.operators.encoders import MeanEncoder
from etna_spark.operators.lags import lag_transform
from etna_spark.operators.scalers import Scaler
from etna_spark.operators.spine import regularize
from etna_spark.operators.window_stats import window_stat
from etna_spark.registry import _events_1m, epoch, register
from etna_spark.sources.testdata import load_table

# Shared oracle CTE: the events 1m cents series.
_SERIES_CTE = """
WITH series AS (
  SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
)
"""

_FRAME = (
    "PARTITION BY event_type ORDER BY bucket_ts "
    "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW"
)


@register(
    "lag_1m",
    _SERIES_CTE
    + """
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
       lag(value_cents, 1) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS value_cents_lag_1,
       lag(value_cents, 3) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS value_cents_lag_3
FROM series
""",
)
def q_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LagTransform (reference lags.py:16-109) on the 1m tier."""
    s = _events_1m(spark, sf_dir).select("event_type", "bucket_ts", "value_cents")
    out = lag_transform(s, "value_cents", [1, 3], series_cols=("event_type",), ts_col="bucket_ts")
    return out.select(
        "event_type", epoch(), "value_cents_lag_1", "value_cents_lag_3"
    )


@register(
    "window_stats_1m",
    _SERIES_CTE
    + f"""
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  CAST(sum(value_cents) OVER ({_FRAME}) AS BIGINT) AS w_sum,
  min(value_cents) OVER ({_FRAME}) AS w_min,
  max(value_cents) OVER ({_FRAME}) AS w_max,
  max(value_cents) OVER ({_FRAME}) - min(value_cents) OVER ({_FRAME}) AS w_mmd,
  round(CAST(sum(value_cents) OVER ({_FRAME}) AS DOUBLE)
        / CAST(count(value_cents) OVER ({_FRAME}) AS DOUBLE), 6) AS w_mean
FROM series
""",
)
def q_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowStatisticsTransform family, native path (statistics.py:18-131):
    current-row-inclusive 5-point trailing windows."""
    s = _events_1m(spark, sf_dir).select("event_type", "bucket_ts", "value_cents")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-4, 0)
    )
    v = F.col("value_cents")
    return s.select(
        "event_type",
        epoch(),
        F.sum(v).over(w).alias("w_sum"),
        F.min(v).over(w).alias("w_min"),
        F.max(v).over(w).alias("w_max"),
        (F.max(v).over(w) - F.min(v).over(w)).alias("w_mmd"),
        F.round(
            F.sum(v).over(w).cast("double") / F.count(v).over(w).cast("double"), 6
        ).alias("w_mean"),
    )


@register(
    "window_median_1m",
    _SERIES_CTE
    + f"""
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(median(CAST(value_cents AS DOUBLE)) OVER ({_FRAME}), 6) AS w_median
FROM series
""",
)
def q_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact windowed median via the strided numpy kernel (pUDF path;
    statistics.py:514-571 — never percentile_approx)."""
    s = _events_1m(spark, sf_dir).select(
        "event_type", "bucket_ts", F.col("value_cents").cast("double").alias("vc")
    )
    out = window_stat(
        s, "vc", "w_median", "median", 5, min_periods=1, fillna=float("nan"),
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch(), F.round("w_median", 6).alias("w_median"))


@register(
    "expanding_mean_encoder",
    """
SELECT doc_id, lang, source,
  round(
    (sum(n_chars) OVER w_cat + (avg(n_chars) OVER w_run) * 1.0)
    / (count(n_chars) OVER w_cat + 1.0), 6) AS enc
FROM documents
WINDOW
  w_cat AS (PARTITION BY lang, source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
  w_run AS (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
""",
)
def q_mean_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanEncoderTransform (mean_encoder.py:45-343) — expanding mean-target
    encoding of `source` within `lang`, target=n_chars, order=doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    enc = MeanEncoder(
        in_col="source", out_col="enc", target_col="n_chars",
        smoothing=1.0, series_cols=("lang",), ts_col="doc_id",
    ).fit(docs)
    out = enc.transform(docs)
    return out.select("doc_id", "lang", "source", F.round("enc", 6).alias("enc"))


@register(
    "describe_series_1m",
    _SERIES_CTE
    + """
, bounds AS (SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM series)
SELECT event_type,
  count(*) AS n_points,
  CAST(epoch(min(bucket_ts)) AS BIGINT) AS start_ts,
  CAST(epoch(max(bucket_ts)) AS BIGINT) AS end_ts,
  CAST((SELECT epoch(mx) - epoch(mn) FROM bounds) / 60 + 1 - count(*) AS BIGINT)
    AS n_missing
FROM series GROUP BY event_type
""",
)
def q_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSDataset.describe/info (tsdataset.py:1626-1764): per-series length,
    bounds, missing-bucket count on the shared 1m grid."""
    s = _events_1m(spark, sf_dir).select("event_type", "bucket_ts", "value_cents")
    reg = regularize(s, "1m", series_cols=("event_type",))
    return reg.groupBy("event_type").agg(
        F.count("value_cents").alias("n_points"),
        F.min(F.when(F.col("value_cents").isNotNull(), F.col("bucket_ts")))
        .cast("long")
        .alias("start_ts"),
        F.max(F.when(F.col("value_cents").isNotNull(), F.col("bucket_ts")))
        .cast("long")
        .alias("end_ts"),
        F.sum(F.when(F.col("value_cents").isNull(), 1).otherwise(0)).alias("n_missing"),
    )


@register(
    "date_flags",
    """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events)
SELECT CAST(epoch(d) AS BIGINT) AS day_ts,
  CAST(isodow(d) - 1 AS INTEGER) AS day_number_in_week,
  CAST(dayofmonth(d) AS INTEGER) AS day_number_in_month,
  CAST(CASE WHEN NOT ((year(d) % 4 = 0 AND year(d) % 100 <> 0) OR year(d) % 400 = 0)
            AND month(d) >= 3
       THEN dayofyear(d) + 1 ELSE dayofyear(d) END AS INTEGER) AS day_number_in_year,
  CAST(ceil((dayofmonth(d) + isodow(date_trunc('month', d)) - 1) / 7.0) AS INTEGER)
    AS week_number_in_month,
  CAST(weekofyear(d) AS INTEGER) AS week_number_in_year,
  CAST(month(d) AS INTEGER) AS month_number_in_year,
  CAST((month(d) % 12) // 3 + 1 AS INTEGER) AS season_number,
  CAST(year(d) AS INTEGER) AS year_number,
  CAST(isodow(d) - 1 IN (5, 6) AS INTEGER) AS is_weekend
FROM days
""",
)
def q_date_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateFlagsTransform (date_flags.py:18-430) over the events day grid."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("d")).distinct()
    out = add_date_flags(days, "d")
    return out.select(
        F.col("d").cast("long").alias("day_ts"),
        F.col("day_number_in_week").cast("int").alias("day_number_in_week"),
        F.col("day_number_in_month").cast("int").alias("day_number_in_month"),
        F.col("day_number_in_year").cast("int").alias("day_number_in_year"),
        F.col("week_number_in_month").cast("int").alias("week_number_in_month"),
        F.col("week_number_in_year").cast("int").alias("week_number_in_year"),
        F.col("month_number_in_year").cast("int").alias("month_number_in_year"),
        F.col("season_number").cast("int").alias("season_number"),
        F.col("year_number").cast("int").alias("year_number"),
        F.col("is_weekend").cast("int").alias("is_weekend"),
    )


@register(
    "time_flags",
    """
WITH mins AS (SELECT DISTINCT date_trunc('minute', ts) AS m FROM events)
SELECT CAST(epoch(m) AS BIGINT) AS minute_ts,
  CAST(minute(m) AS INTEGER) AS minute_in_hour_number,
  CAST(minute(m) // 15 AS INTEGER) AS fifteen_minutes_in_hour_number,
  CAST(minute(m) // 30 AS INTEGER) AS half_hour_number,
  CAST(hour(m) AS INTEGER) AS hour_number,
  CAST(hour(m) // 12 AS INTEGER) AS half_day_number,
  CAST(hour(m) // 8 AS INTEGER) AS one_third_day_number
FROM mins
""",
)
def q_time_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeFlagsTransform (time_flags.py:16-281) over the events minute grid."""
    ev = load_table(spark, sf_dir, "events")
    mins = ev.select(F.date_trunc("minute", "ts").alias("m")).distinct()
    out = add_time_flags(mins, "m")
    return out.select(
        F.col("m").cast("long").alias("minute_ts"),
        *[F.col(c).cast("int").alias(c) for c in (
            "minute_in_hour_number", "fifteen_minutes_in_hour_number",
            "half_hour_number", "hour_number", "half_day_number",
            "one_third_day_number",
        )],
    )


@register(
    "fourier_daily",
    _SERIES_CTE
    + """
, anchored AS (
  SELECT event_type, bucket_ts,
    (epoch(bucket_ts) - (SELECT epoch(min(bucket_ts)) FROM series)) / 60.0 / 1440.0
      AS elapsed
  FROM series
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(sin(2 * pi() * 1 * elapsed), 6) + 0.0 AS fourier_1,
  round(sin(2 * pi() * 1 * elapsed + pi() / 2), 6) + 0.0 AS fourier_2,
  round(sin(2 * pi() * 2 * elapsed), 6) + 0.0 AS fourier_3,
  round(sin(2 * pi() * 2 * elapsed + pi() / 2), 6) + 0.0 AS fourier_4
FROM anchored
""",
)
def q_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FourierTransform (fourier.py:22-386): order-2 daily harmonics on the
    1m grid, anchored at the global first bucket."""
    s = _events_1m(spark, sf_dir).select("event_type", "bucket_ts")
    out = add_fourier_features(
        s, period=1440, order=2, ts_col="bucket_ts", step_seconds=60
    )
    return out.select(
        "event_type",
        epoch(),
        # + 0.0 normalizes IEEE −0.0: sin(kπ) lands within an ulp of zero
        # with engine-dependent SIGN, and a value-hash distinguishes the two
        *[
            (F.round(f"fourier_{m}", 6) + F.lit(0.0)).alias(f"fourier_{m}")
            for m in (1, 2, 3, 4)
        ],
    )


@register(
    "metrics_naive_1h",
    """
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), paired AS (
  SELECT event_type, bucket_ts,
         CAST(value_cents AS DOUBLE) AS y_true,
         CAST(lag(value_cents, 1) OVER
              (PARTITION BY event_type ORDER BY bucket_ts) AS DOUBLE) AS y_pred
  FROM series
)
SELECT event_type,
  round(avg(abs(y_true - y_pred)), 6) AS mae,
  round(avg((y_true - y_pred) * (y_true - y_pred)), 6) AS mse,
  round(quantile_cont(abs(y_true - y_pred), 0.5), 6) AS medae,
  round(100 * avg(2 * abs(y_pred - y_true) / (abs(y_true) + abs(y_pred))), 6) AS smape,
  round(sum(abs(y_true - y_pred))
        / sum(CASE WHEN y_pred IS NOT NULL THEN abs(y_true) END), 6) AS wape,
  round(avg(sign(y_true - y_pred)), 6) AS sign
FROM paired
GROUP BY event_type
""",
)
def q_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric layer (functional_metrics.py) against a naive lag-1 forecast
    on the 1h tier."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.withColumn("vc", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(F.sum("vc").alias("value_cents"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    paired = s.select(
        "event_type",
        "bucket_ts",
        F.col("value_cents").cast("double").alias("value"),
        F.lag("value_cents", 1).over(w).cast("double").alias("prediction"),
    )
    m = compute_metrics(
        paired, true_col="value", pred_col="prediction",
        metrics=("mae", "mse", "medae", "smape", "wape", "sign"),
        mode="per-segment", series_cols=("event_type",), ts_col="bucket_ts",
    )
    return m.select(
        "event_type",
        *[F.round(c, 6).alias(c) for c in ("mae", "mse", "medae", "smape", "wape", "sign")],
    )


_SCALER_SQL = """
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT {part} avg(CAST(value_cents AS DOUBLE)) AS m,
         stddev_pop(CAST(value_cents AS DOUBLE)) AS sd,
         min(value_cents) AS mn, max(value_cents) AS mx,
         quantile_cont(CAST(value_cents AS DOUBLE), 0.5) AS med,
         quantile_cont(CAST(value_cents AS DOUBLE), 0.75)
           - quantile_cont(CAST(value_cents AS DOUBLE), 0.25) AS iqr
  FROM series {group}
)
SELECT s.event_type, CAST(epoch(s.bucket_ts) AS BIGINT) AS bucket_ts,
  round((s.value_cents - t.m) / (CASE WHEN t.sd = 0 THEN 1 ELSE t.sd END), 6)
    AS standard_scaled,
  round(CAST(s.value_cents - t.mn AS DOUBLE)
        / (CASE WHEN t.mx - t.mn = 0 THEN 1 ELSE CAST(t.mx - t.mn AS DOUBLE) END), 6)
    AS minmax_scaled,
  round((s.value_cents - t.med) / (CASE WHEN t.iqr = 0 THEN 1 ELSE t.iqr END), 6)
    AS robust_scaled
FROM series s {join}
"""


@register(
    "scalers_per_segment_1h",
    _SCALER_SQL.format(
        part="event_type,", group="GROUP BY event_type",
        join="JOIN stats t USING (event_type)",
    ),
)
def q_scalers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scalers(spark, sf_dir, "per-segment")


@register(
    "scalers_macro_1h",
    _SCALER_SQL.format(part="", group="", join="CROSS JOIN stats t"),
)
def q_scalers_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scalers(spark, sf_dir, "macro")


def _scalers(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    """Scaler family (scalers.py:18-269, sklearn.py:30-311) on the 1h tier."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.withColumn("vc", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(F.sum("vc").cast("double").alias("value_cents"))
    )
    out = s
    for kind, name in (
        ("standard", "standard_scaled"),
        ("minmax", "minmax_scaled"),
        ("robust", "robust_scaled"),
    ):
        sc = Scaler(
            in_col="value_cents", kind=kind, mode=mode, series_cols=("event_type",)
        ).fit(s)
        scaled = sc.transform(s).withColumnRenamed("value_cents", name)
        out = out.join(scaled, on=["event_type", "bucket_ts"])
    return out.select(
        "event_type",
        epoch(),
        *[
            F.round(c, 6).alias(c)
            for c in ("standard_scaled", "minmax_scaled", "robust_scaled")
        ],
    )
