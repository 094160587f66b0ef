"""Calendar feature functions: date flags, time flags, Fourier harmonics.

Reference kernels (semantics matched 1:1, all pure column expressions —
whole-stage codegen, no Python):

- DateFlagsTransform (/root/reference/etna/transforms/timestamp/date_flags.py:18-430):
  day_number_in_week (Monday=0), day_number_in_month, day_number_in_year
  (LEAP-YEAR NUMERATION: +1 after Feb in non-leap years so features align
  across years), week_number_in_month (months start at week 1 regardless of
  weekday), week_number_in_year (ISO), month_number_in_year, season_number
  (Dec-Feb=1 ... Sep-Nov=4), year_number, is_weekend (Sat/Sun).
- TimeFlagsTransform (/root/reference/etna/transforms/timestamp/time_flags.py:16-281):
  minute_in_hour, fifteen_minutes_in_hour (minute//15), half_hour
  (minute//30), hour, half_day (hour//12), one_third_day (hour//8).
- FourierTransform (/root/reference/etna/transforms/timestamp/fourier.py:22-386):
  for each mod m in the order-derived list [1..2·order)∩[1,period):
  sin(2π·⌈m/2⌉·elapsed + π/2·[m even]) where elapsed = steps-since-reference
  / period; reference = first timestamp of the fitted frame.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATE_FLAGS = (
    "day_number_in_week",
    "day_number_in_month",
    "day_number_in_year",
    "week_number_in_month",
    "week_number_in_year",
    "month_number_in_year",
    "season_number",
    "year_number",
    "is_weekend",
)

TIME_FLAGS = (
    "minute_in_hour_number",
    "fifteen_minutes_in_hour_number",
    "half_hour_number",
    "hour_number",
    "half_day_number",
    "one_third_day_number",
)


def _is_leap(year: Column) -> Column:
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def date_flag(ts: str | Column, flag: str) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    if flag == "day_number_in_week":
        return F.weekday(ts)
    if flag == "day_number_in_month":
        return F.dayofmonth(ts)
    if flag == "day_number_in_year":
        doy = F.dayofyear(ts)
        return F.when(
            ~_is_leap(F.year(ts)) & (F.month(ts) >= 3), doy + 1
        ).otherwise(doy)
    if flag == "week_number_in_month":
        first_dow = F.weekday(F.trunc(ts, "month"))
        return F.ceil((F.dayofmonth(ts) + first_dow) / 7.0).cast("int")
    if flag == "week_number_in_year":
        return F.weekofyear(ts)
    if flag == "month_number_in_year":
        return F.month(ts)
    if flag == "season_number":
        # month%12 // 3 + 1 → Dec-Feb=1, Mar-May=2, Jun-Aug=3, Sep-Nov=4
        return F.floor((F.month(ts) % 12) / 3).cast("int") + 1
    if flag == "year_number":
        return F.year(ts)
    if flag == "is_weekend":
        return F.weekday(ts).isin(5, 6)
    raise ValueError(f"unknown date flag {flag}")


def time_flag(ts: str | Column, flag: str) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    if flag == "minute_in_hour_number":
        return F.minute(ts)
    if flag == "fifteen_minutes_in_hour_number":
        return (F.minute(ts) / 15).cast("int")
    if flag == "half_hour_number":
        return (F.minute(ts) / 30).cast("int")
    if flag == "hour_number":
        return F.hour(ts)
    if flag == "half_day_number":
        return (F.hour(ts) / 12).cast("int")
    if flag == "one_third_day_number":
        return (F.hour(ts) / 8).cast("int")
    raise ValueError(f"unknown time flag {flag}")


def add_date_flags(
    df: DataFrame, ts_col: str = "ts", flags: Sequence[str] = DATE_FLAGS,
    prefix: str = "",
) -> DataFrame:
    return df.withColumns({f"{prefix}{f}": date_flag(ts_col, f) for f in flags})


def add_time_flags(
    df: DataFrame, ts_col: str = "ts", flags: Sequence[str] = TIME_FLAGS,
    prefix: str = "",
) -> DataFrame:
    return df.withColumns({f"{prefix}{f}": time_flag(ts_col, f) for f in flags})


def fourier_mods(period: float, order: int | None, mods: Sequence[int] | None) -> list[int]:
    if period < 2:
        raise ValueError("Period should be at least 2")
    if order is not None and mods is None:
        if order < 1 or order > math.ceil(period / 2):
            raise ValueError("Order should be within [1, ceil(period/2)] range")
        return [m for m in range(1, 2 * order + 1) if m < period]
    if mods is not None and order is None:
        if min(mods) < 1 or max(mods) >= period:
            raise ValueError("Every mod should be within [1, int(period)) range")
        return list(mods)
    raise ValueError("There should be exactly one option set: order or mods")


def add_fourier_features(
    df: DataFrame,
    period: float,
    order: int | None = None,
    mods: Sequence[int] | None = None,
    ts_col: str = "ts",
    step_seconds: int = 86400,
    reference_ts: object | None = None,
    out_prefix: str = "fourier",
) -> DataFrame:
    """Seasonal sin/cos harmonics over the regular grid.

    ``reference_ts`` anchors step counting (the fitted frame's first
    timestamp in the reference); when None it is derived as the global min —
    a 1-row aggregate broadcast-joined, no driver collect.
    """
    the_mods = fourier_mods(period, order, mods)
    if reference_ts is None:
        ref = df.agg(F.min(ts_col).alias("__ref_ts__"))
        base = df.crossJoin(F.broadcast(ref))
        ref_col = F.col("__ref_ts__")
    else:
        base = df.withColumn("__ref_ts__", F.lit(reference_ts).cast("timestamp"))
        ref_col = F.col("__ref_ts__")
    steps = (
        F.col(ts_col).cast("double") - ref_col.cast("double")
    ) / F.lit(float(step_seconds))
    elapsed = steps / F.lit(float(period))
    cols = {}
    for m in the_mods:
        harmonic = (m + 1) // 2
        is_cos = 1.0 if m % 2 == 0 else 0.0
        cols[f"{out_prefix}_{m}"] = F.sin(
            2 * math.pi * harmonic * elapsed + math.pi / 2 * is_cos
        )
    return base.withColumns(cols).drop("__ref_ts__")
