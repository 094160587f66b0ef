"""Holiday features from a holiday dimension table.

Reference: ``HolidayTransform``
(/root/reference/etna/transforms/timestamp/holiday.py:53-348) with modes
binary / category / days_count (share of holiday days inside each period
bucket, holiday.py:251-262). The reference pulls calendars from the
``holidays`` package (not in this container); here the calendar is an
explicit dimension DataFrame ``(date, holiday_name)`` — which is also the
scale-correct design: a generated dimension table broadcast-joined against
the fact table (SURVEY.md §2.8), identical for any calendar source.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def weekly_holiday_calendar(
    spark: SparkSession, start: str, end: str, weekday: int = 6,
    name: str = "sunday",
) -> DataFrame:
    """Deterministic demo calendar: every `weekday` (Mon=0) in [start, end]."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"),
                    F.lit(end).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("date")
        )
        .filter(F.weekday("date") == weekday)
        .withColumn("holiday_name", F.lit(name))
    )


def holiday_transform(
    df: DataFrame,
    calendar: DataFrame,
    ts_col: str = "ts",
    mode: str = "binary",
    out_col: str = "holiday",
    period: str = "week",
) -> DataFrame:
    """binary → 0/1; category → holiday name or 'NO_HOLIDAY'; days_count →
    share of holiday days in the `period` bucket containing the row."""
    if mode not in ("binary", "category", "days_count"):
        raise ValueError(f"bad mode {mode}")
    cal = F.broadcast(calendar)
    if mode in ("binary", "category"):
        j = df.join(
            cal, on=F.to_date(F.col(ts_col)) == calendar["date"], how="left"
        ).drop("date")
        if mode == "binary":
            return j.withColumn(
                out_col, F.col("holiday_name").isNotNull().cast("int")
            ).drop("holiday_name")
        return j.withColumn(
            out_col, F.coalesce(F.col("holiday_name"), F.lit("NO_HOLIDAY"))
        ).drop("holiday_name")

    # days_count: per period bucket, share of days that are holidays
    bucket = F.date_trunc(period, ts_col)
    spark = df.sparkSession
    bounds = df.agg(
        F.min(F.date_trunc(period, ts_col)).alias("mn"),
        F.max(F.date_trunc(period, ts_col)).alias("mx"),
    )
    step = {"week": "7 days", "month": "1 month", "day": "1 day"}[period]
    buckets = bounds.select(
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr(f"interval {step}"))
        ).alias("_bucket")
    )
    days = buckets.select(
        "_bucket",
        F.explode(
            F.sequence(
                F.to_date("_bucket"),
                F.last_day("_bucket") if period == "month"
                else F.to_date(F.col("_bucket") + F.expr("interval 6 days")),
                F.expr("interval 1 day"),
            )
        ).alias("_day"),
    ) if period in ("week", "month") else buckets.select(
        "_bucket", F.to_date("_bucket").alias("_day")
    )
    shares = (
        days.join(cal, on=days["_day"] == calendar["date"], how="left")
        .groupBy("_bucket")
        .agg(F.avg(F.col("holiday_name").isNotNull().cast("double")).alias(out_col))
    )
    return df.join(
        F.broadcast(shares), on=bucket == shares["_bucket"], how="left"
    ).drop("_bucket")
