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


def session_stats_two_phase(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    gap_s: int = 14400,
    value_col: str | None = None,
    chunk_s: int = 86400,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Skew-robust sessionization: identical output to
    :func:`session_stats`, computed in two phases so a single hot key
    (a bot user owning half the stream) never funnels into one window
    partition.

    Phase 1 sessionizes within (key, time-chunk) partitions — the hot
    key's events split across ``chunk_s``-sized chunks, bounding any
    one partition. Phase 2 re-applies the SAME gap rule to the
    per-chunk session summaries (a table orders of magnitude smaller
    than the input), merging boundary sessions algebraically
    (min start / max end / sum counts / sum values): two sessions merge
    iff the next session's first event is within ``gap_s`` of the
    previous session's last event — exactly the single-phase rule,
    because within-chunk boundaries already satisfy it.

    ``chunk_s`` must be > ``gap_s`` (a chunk shorter than the gap could
    produce adjacent empty chunks whose sessions still merge — the rule
    still holds, but the phase-2 chain stays O(#chunks) only when
    chunks are gap-wide).
    """
    if chunk_s <= gap_s:
        raise ValueError("chunk_s must exceed gap_s")
    keys = [F.col(c) for c in key_cols]
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    chunk = F.floor(us / (int(chunk_s) * 1_000_000)).cast("long")
    with_chunk = df.withColumn("_chunk", chunk)
    phase1 = sessionize(
        with_chunk,
        key_cols=[*key_cols, "_chunk"],
        ts_col=ts_col,
        gap_s=gap_s,
        order_tiebreak=order_tiebreak,
    )
    aggs = [
        F.min(us).alias("_start_us"),
        F.max(us).alias("_end_us"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    local = phase1.groupBy(*key_cols, "_chunk", "session_idx").agg(*aggs)
    # phase 2: gap rule between consecutive LOCAL sessions of a key
    w = Window.partitionBy(*keys).orderBy("_start_us")
    prev_end = F.lag("_end_us").over(w)
    is_start = F.when(
        prev_end.isNull()
        | (F.col("_start_us") - prev_end > int(gap_s) * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy("_start_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    merged = local.withColumn("session_idx", F.sum(is_start).over(run))
    aggs2 = [
        F.floor(F.min("_start_us") / 1_000_000).cast("long")
        .alias("session_start"),
        F.floor(F.max("_end_us") / 1_000_000).cast("long")
        .alias("session_end"),
        F.sum("n_events").alias("n_events"),
    ]
    if value_col is not None:
        aggs2.append(F.sum("value_sum").alias("value_sum"))
    out = merged.groupBy(*key_cols, "session_idx").agg(*aggs2)
    return out.withColumn(
        "duration_s", F.col("session_end") - F.col("session_start")
    )
