"""Cohort retention and ordered-funnel analytics over event streams.

The standard product-analytics companions to sessionization
(operators/sessionize.py): both are pure DataFrame compositions —
hash aggregations and broadcast-able per-user joins, no windows over
the raw stream, no Python — so they scale as a handful of user-keyed
shuffles at any input size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-grain retention triangle: users are cohorted by their first
    active day; each (cohort_day, offset_days) cell counts the distinct
    users of that cohort active ``offset_days`` after it.

    Shape: one distinct over (user, day) — corpus-sized hash agg — then
    a per-user min (user-dim sized) joined back on the user key. The
    join's right side is the user dimension; at 100 TB it is still tiny
    relative to the event stream and shuffles on the same user key the
    distinct already established.
    """
    day = F.date_trunc("day", F.col(ts_col).cast("timestamp"))
    active = df.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    first = active.groupBy("u").agg(F.min("d").alias("cohort_day"))
    joined = active.join(first, on="u")
    return (
        joined.groupBy(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            # datediff on the truncated days, not epoch-second division:
            # with a non-UTC session timezone DST makes truncated days
            # 23/25h apart and the old double division truncated to a
            # wrong offset (r5 ADVICE). Identical values under the UTC
            # harness; correct everywhere.
            F.datediff(F.col("d"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step k at the earliest
    event of type ``steps[k]`` that happens strictly after their step-k-1
    time (microsecond precision). Returns one row per step with the
    reaching-user count.

    Each stage is a filter + per-user min + an equi-join against the
    (shrinking) per-user frontier — user-dim-sized state only.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"),
        us.alias("us"),
    )
    frontier = None
    counts = []
    for i, step in enumerate(steps):
        stage = ev.filter(F.col("et") == step)
        if frontier is not None:
            stage = stage.join(frontier, on="u").filter(
                F.col("us") > F.col("t_prev")
            )
        frontier = stage.groupBy("u").agg(F.min("us").alias("t_prev"))
        counts.append((i + 1, step, frontier))
    out = None
    for i, step, fr in counts:
        row = fr.agg(F.count("*").alias("n_users")).select(
            F.lit(i).cast("int").alias("step"),
            F.lit(step).alias("step_name"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out
