"""Gap-based sessionization: split each key's event stream into sessions
wherever the inter-event gap exceeds a timeout, then aggregate per session.

The canonical clickstream/training-log operator (the reference's tier
pipelines group by fixed calendar buckets; sessions are the data-driven
alternative a web-scale event store needs). Spark-first shape: one window
over (key, ts) to flag session starts, a running sum to number them, one
hash aggregation — a single shuffle on the key columns, no Python, no
driver state. At 100 TB the window partitions by user key (high
cardinality, naturally balanced) and the aggregation reuses the same
partitioning, so AQE plans exactly one exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    gap_s: int = 14400,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add a per-key ``session_idx`` (1-based, in time order) to ``df``.

    A new session starts at the first event of a key and whenever
    ``ts - previous ts > gap_s`` seconds. Ties on ``ts`` never split a
    session (the gap rule only consults ``ts``), so the numbering is
    deterministic regardless of the tiebreak ordering.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_tiebreak]
    )
    prev = F.lag(F.col(ts_col)).over(w)
    # gap on exact microseconds (sub-second timestamps must not alias
    # into the same second before the comparison)
    is_start = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > int(gap_s) * 1_000_000
        ),
        1,
    ).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_tiebreak]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(is_start).over(running))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    gap_s: int = 14400,
    value_col: str | None = None,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-session aggregate: start/end epoch seconds, duration, event
    count, and (optionally) an integer-exact value sum."""
    s = sessionize(
        df, key_cols=key_cols, ts_col=ts_col, gap_s=gap_s,
        order_tiebreak=order_tiebreak,
    )
    aggs = [
        F.min(F.col(ts_col).cast("timestamp").cast("long")).alias("session_start"),
        F.max(F.col(ts_col).cast("timestamp").cast("long")).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    out = s.groupBy(*key_cols, "session_idx").agg(*aggs)
    return out.withColumn(
        "duration_s", F.col("session_end") - F.col("session_start")
    )
