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


def easter_date(year: int) -> dt.date:
    """Gregorian Easter Sunday via the Anonymous Gregorian (Meeus/Jones/
    Butcher) computus — pure integer arithmetic, so a SQL oracle can
    reproduce it exactly (see ``EASTER_SQL``)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month = (h + l - 7 * m + 114) // 31
    day = (h + l - 7 * m + 114) % 31 + 1
    return dt.date(year, month, day)


def easter_sql_cte(year_start: int, year_end: int, name: str = "easters") -> str:
    """DuckDB CTE fragment ``{name}(y, easter)`` — an independent SQL
    re-derivation of ``easter_date`` for oracle queries (same public
    computus, staged through nested selects so each intermediate matches
    the scalar algorithm exactly; all operands positive, so SQL ``%``
    agrees with Python's)."""
    return f"""{name} AS (
  SELECT y, make_date(CAST(y AS INTEGER),
                      CAST((h + l - 7*m + 114) // 31 AS INTEGER),
                      CAST((h + l - 7*m + 114) % 31 + 1 AS INTEGER)) AS easter
  FROM (
    SELECT y, h, l, (a + 11*h + 22*l) // 451 AS m
    FROM (
      SELECT y, a,
             (19*a + b - d - g + 15) % 30 AS h,
             (32 + 2*e + 2*i - ((19*a + b - d - g + 15) % 30) - k) % 7 AS l
      FROM (
        SELECT y, y % 19 AS a, y // 100 AS b,
               y // 100 // 4 AS d, y // 100 % 4 AS e,
               (y // 100 - (y // 100 + 8) // 25 + 1) // 3 AS g,
               y % 100 // 4 AS i, y % 100 % 4 AS k
        FROM (SELECT unnest(range({year_start}, {year_end + 1})) AS y)
      )
    )
  )
)"""


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> dt.date:
    """n-th `weekday` (Mon=0) of `month`; n=-1 → last such weekday."""
    if n > 0:
        first = dt.date(year, month, 1)
        off = (weekday - first.weekday()) % 7 + 7 * (n - 1)
        return first + dt.timedelta(days=off)
    nxt = dt.date(year + (month == 12), month % 12 + 1, 1)
    last = nxt - dt.timedelta(days=1)
    return last - dt.timedelta(days=(last.weekday() - weekday) % 7)


# Rule tuples: ("fixed", month, day) | ("nth", month, weekday, n) |
# ("easter", day_offset). Public statutory calendars (fixed-date + Easter
# computus + nth-weekday rules); observed-day shifting is intentionally not
# applied — the calendar records the holiday's calendar date.
COUNTRY_RULES: dict[str, list[tuple]] = {
    "US": [
        ("New Year's Day", "fixed", 1, 1),
        ("Martin Luther King Jr. Day", "nth", 1, 0, 3),
        ("Washington's Birthday", "nth", 2, 0, 3),
        ("Memorial Day", "nth", 5, 0, -1),
        ("Independence Day", "fixed", 7, 4),
        ("Labor Day", "nth", 9, 0, 1),
        ("Columbus Day", "nth", 10, 0, 2),
        ("Veterans Day", "fixed", 11, 11),
        ("Thanksgiving", "nth", 11, 3, 4),
        ("Christmas Day", "fixed", 12, 25),
    ],
    "DE": [
        ("Neujahr", "fixed", 1, 1),
        ("Karfreitag", "easter", -2),
        ("Ostermontag", "easter", 1),
        ("Tag der Arbeit", "fixed", 5, 1),
        ("Christi Himmelfahrt", "easter", 39),
        ("Pfingstmontag", "easter", 50),
        ("Tag der Deutschen Einheit", "fixed", 10, 3),
        ("1. Weihnachtstag", "fixed", 12, 25),
        ("2. Weihnachtstag", "fixed", 12, 26),
    ],
}


def country_holiday_calendar(
    spark: SparkSession, country: str, year_start: int, year_end: int
) -> DataFrame:
    """Deterministic statutory-holiday dimension ``(date, holiday_name)``.

    Reference ``HolidayTransform`` leans on the ``holidays`` package
    (holiday.py:53-348, absent from this container); this generates the
    same kind of calendar from public rules. Driver-side O(years × rules)
    work building a tiny dim table that downstream transforms broadcast —
    the scale-correct shape regardless of calendar source."""
    rules = COUNTRY_RULES.get(country)
    if rules is None:
        raise ValueError(f"no rules for country {country!r}; "
                         f"have {sorted(COUNTRY_RULES)}")
    rows = []
    for y in range(year_start, year_end + 1):
        easter = easter_date(y)
        for name, kind, *args in rules:
            if kind == "fixed":
                d = dt.date(y, args[0], args[1])
            elif kind == "nth":
                d = _nth_weekday(y, *args)
            else:
                d = easter + dt.timedelta(days=args[0])
            rows.append((d, name))
    return spark.createDataFrame(
        sorted(rows), "date date, holiday_name string"
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
