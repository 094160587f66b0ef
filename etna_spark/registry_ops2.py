"""Second operator registry batch: differencing, imputer-mean on the spine,
linear detrend, daily deseasonality, holiday flags, alignment."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.functions.holidays import (
    country_holiday_calendar,
    easter_sql_cte,
    holiday_transform,
    weekly_holiday_calendar,
)
from etna_spark.operators.alignment import apply_alignment
from etna_spark.operators.decomposition import Deseasonality
from etna_spark.operators.differencing import Differencing
from etna_spark.operators.imputation import TimeSeriesImputer
from etna_spark.operators.spine import regularize
from etna_spark.registry import _events_1m, epoch, register
from etna_spark.sources.testdata import load_table

_H_SERIES = """
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
)
"""


def _events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("vc", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(F.sum("vc").alias("value_cents"))
    )


@register(
    "differencing_1h",
    _H_SERIES
    + """
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  value_cents - lag(value_cents, 2) OVER
    (PARTITION BY event_type ORDER BY bucket_ts) AS diff_p2
FROM series
""",
)
def q_differencing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DifferencingTransform forward pass, period=2
    (differencing.py:140-172)."""
    s = _events_1h(spark, sf_dir).withColumnRenamed("value_cents", "diff_p2")
    d = Differencing(in_col="diff_p2", period=2, order=1,
                     series_cols=("event_type",), ts_col="bucket_ts").fit(s)
    return d.transform(s).select("event_type", epoch(), "diff_p2")


@register(
    "imputer_mean_1m",
    """
WITH agg AS (
  SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg
), spine AS (
  SELECT et.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE))
              AS bucket_ts FROM bounds) g
), joined AS (
  SELECT s.event_type, s.bucket_ts, a.value_cents
  FROM spine s LEFT JOIN agg a USING (event_type, bucket_ts)
), marked AS (
  SELECT *,
    min(CASE WHEN value_cents IS NOT NULL THEN bucket_ts END)
      OVER (PARTITION BY event_type) AS first_valid,
    avg(CAST(value_cents AS DOUBLE)) OVER (PARTITION BY event_type)
      AS series_mean
  FROM joined
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(CASE WHEN value_cents IS NULL AND bucket_ts >= first_valid
        THEN series_mean ELSE CAST(value_cents AS DOUBLE) END, 6) AS value_imputed
FROM marked
""",
)
def q_imputer_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeSeriesImputer(strategy='mean') on the gap-materialized 1m grid —
    train-global per-series mean, leading nulls preserved
    (imputation.py:173-175, 177-178)."""
    agg = _events_1m(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("value_imputed"),
    )
    reg = regularize(agg, "1m", series_cols=("event_type",))
    imp = TimeSeriesImputer(
        strategy="mean", in_col="value_imputed",
        series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(reg)
    out = imp.transform(reg)
    return out.select(
        "event_type", epoch(), F.round("value_imputed", 6).alias("value_imputed")
    )


@register(
    "detrend_linear_1h",
    _H_SERIES
    + """
, xy AS (
  SELECT event_type, bucket_ts,
    CAST((epoch(bucket_ts) - (SELECT min(epoch(bucket_ts)) FROM series)) / 3600
         AS BIGINT) AS x,
    value_cents AS y
  FROM series
), sums AS (
  -- integer-exact sufficient statistics: the slope/intercept float chain is
  -- then a handful of identical IEEE ops in any engine (no partial-agg
  -- reorder sensitivity)
  SELECT event_type, count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY event_type
), params AS (
  SELECT event_type,
    CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
    sx, sy, n
  FROM sums
)
SELECT xy.event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(y - ((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n + slope * x), 6)
    AS detrended
FROM xy JOIN params USING (event_type)
""",
)
def q_detrend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LinearTrendTransform via closed-form OLS (detrend.py:140) —
    slope/intercept from integer-exact sufficient statistics so the float
    chain is engine-independent (SURVEY.md §4.3)."""
    s = _events_1h(spark, sf_dir)
    gmin = s.agg(F.min(F.col("bucket_ts").cast("long")).alias("g"))
    xy = s.crossJoin(F.broadcast(gmin)).select(
        "event_type",
        "bucket_ts",
        ((F.col("bucket_ts").cast("long") - F.col("g")) / 3600)
        .cast("long")
        .alias("x"),
        F.col("value_cents").alias("y"),
    )
    sums = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    params = sums.select(
        "event_type",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("slope"),
        "sx", "sy", "n",
    )
    out = xy.join(F.broadcast(params), on="event_type").select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.round(
            F.col("y")
            - (
                (F.col("sy").cast("double") - F.col("slope") * F.col("sx").cast("double"))
                / F.col("n")
                + F.col("slope") * F.col("x")
            ),
            6,
        ).alias("detrended"),
    )
    return out


@register(
    "deseasonality_daily_1h",
    _H_SERIES
    + """
, anchored AS (
  SELECT event_type, bucket_ts, CAST(value_cents AS DOUBLE) AS y,
    min(bucket_ts) OVER (PARTITION BY event_type) AS anchor
  FROM series
), phased AS (
  SELECT *,
    CAST((epoch(bucket_ts) - epoch(anchor)) / 3600 AS BIGINT) % 24 AS phase
  FROM anchored
), means AS (
  SELECT event_type, phase, avg(y) AS seasonal
  FROM phased GROUP BY 1, 2
)
SELECT p.event_type, CAST(epoch(p.bucket_ts) AS BIGINT) AS bucket_ts,
  round(p.y - m.seasonal, 6) AS deseasonalized
FROM phased p JOIN means m ON p.event_type = m.event_type AND p.phase = m.phase
""",
)
def q_deseasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeseasonalityTransform, period=24h on the 1h tier
    (deseasonal.py:34-230)."""
    s = _events_1h(spark, sf_dir).withColumn(
        "deseasonalized", F.col("value_cents").cast("double")
    ).select("event_type", "bucket_ts", "deseasonalized")
    tr = Deseasonality(period=24, in_col="deseasonalized",
                       series_cols=("event_type",), ts_col="bucket_ts",
                       step_seconds=3600).fit(s)
    out = tr.transform(s)
    return out.select(
        "event_type", epoch(), F.round("deseasonalized", 6).alias("deseasonalized")
    )


@register(
    "holiday_binary",
    """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events)
SELECT CAST(epoch(d) AS BIGINT) AS day_ts,
       CAST(isodow(d) - 1 = 6 AS INTEGER) AS holiday
FROM days
""",
)
def q_holiday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HolidayTransform binary mode against a generated weekly calendar
    (holiday.py:53-348; dimension-table broadcast join)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("d")).distinct()
    cal = weekly_holiday_calendar(spark, "2024-01-01", "2024-12-31", weekday=6)
    out = holiday_transform(days, cal, ts_col="d", mode="binary")
    return out.select(F.col("d").cast("long").alias("day_ts"), "holiday")


_HOLIDAY_DAYS_COUNT_SQL = "WITH " + easter_sql_cte(1992, 1998) + """
, cal AS (
  -- DE statutory calendar re-derived in SQL (COUNTRY_RULES['DE'])
  SELECT CAST(easter - INTERVAL 2 DAY AS DATE) AS date FROM easters   -- Karfreitag
  UNION ALL SELECT CAST(easter + INTERVAL 1 DAY AS DATE) FROM easters -- Ostermontag
  UNION ALL SELECT CAST(easter + INTERVAL 39 DAY AS DATE) FROM easters
  UNION ALL SELECT CAST(easter + INTERVAL 50 DAY AS DATE) FROM easters
  UNION ALL SELECT make_date(CAST(y AS INTEGER), 1, 1) FROM easters
  UNION ALL SELECT make_date(CAST(y AS INTEGER), 5, 1) FROM easters
  UNION ALL SELECT make_date(CAST(y AS INTEGER), 10, 3) FROM easters
  UNION ALL SELECT make_date(CAST(y AS INTEGER), 12, 25) FROM easters
  UNION ALL SELECT make_date(CAST(y AS INTEGER), 12, 26) FROM easters
), bounds AS (
  SELECT min(date_trunc('month', o_orderdate)) AS mn,
         max(date_trunc('month', o_orderdate)) AS mx
  FROM orders
), months AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS mon FROM bounds
), shares AS (
  SELECT mon,
         avg(CASE WHEN c.date IS NOT NULL THEN 1.0 ELSE 0.0 END) AS share
  FROM (SELECT mon, unnest(generate_series(mon, last_day(mon), INTERVAL 1 DAY)) AS day
        FROM months) d
  LEFT JOIN cal c ON CAST(d.day AS DATE) = c.date
  GROUP BY mon
)
SELECT CAST(epoch(date_trunc('month', o.o_orderdate)) AS BIGINT) AS month_ts,
       count(*) AS n_orders,
       round(max(s.share), 6) AS holiday_share
FROM orders o
JOIN shares s ON date_trunc('month', o.o_orderdate) = s.mon
GROUP BY 1
"""


@register("holiday_days_count", _HOLIDAY_DAYS_COUNT_SQL)
def q_holiday_days_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HolidayTransform days_count mode (holiday.py:251-262: share of
    holiday days inside each period bucket) against a generated DE
    statutory calendar — fixed dates + Easter-computus offsets
    (functions/holidays.py). The oracle re-derives the computus in SQL,
    so the calendar itself is cross-verified, not just the join."""
    orders = load_table(spark, sf_dir, "orders")
    cal = country_holiday_calendar(spark, "DE", 1992, 1998)
    out = holiday_transform(
        orders.select(F.col("o_orderdate").alias("d")),
        cal, ts_col="d", mode="days_count", out_col="share", period="month",
    )
    return (
        out.groupBy(F.date_trunc("month", "d").alias("_mon"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.max("share"), 6).alias("holiday_share"),
        )
        .select(
            F.col("_mon").cast("long").alias("month_ts"),
            "n_orders", "holiday_share",
        )
    )


@register(
    "aligned_index",
    _H_SERIES
    + """
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts)
       - count(*) OVER (PARTITION BY event_type) AS BIGINT) AS aligned_idx
FROM series
""",
)
def q_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply_alignment: per-series integer timeline with the last observation
    at index 0 (utils.py:576-732)."""
    s = _events_1h(spark, sf_dir)
    out = apply_alignment(s, series_cols=("event_type",), ts_col="bucket_ts")
    return out.select("event_type", epoch(), "aligned_idx")
