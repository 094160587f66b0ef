"""Structured Streaming sessionization via native session windows.

The streaming twin of operators/sessionize.py: Spark's
``F.session_window`` merges events whose timestamps are within ``gap``
of each other (boundary INCLUSIVE: an exactly-gap-later event still
merges, so sessions split only when the inter-event gap is strictly
greater than ``gap`` — the same rule as the batch operator; pinned by
pytest). State is
per-(user, open-session) and is evicted once the watermark passes a
session's end — the engine-managed equivalent of the
applyInPandasWithState detectors elsewhere in this package, here with
zero custom state code.

Tested with the drain-everything availableNow recipe (single input
file + flush sentinel + 0-second watermark) shared with
streaming/rollup_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    schema,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 14_400,
    value_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user session aggregates from a streaming source.

    Emits (user, session_start, session_end, n_events[, value_sum]) with
    start/end as floored epoch seconds of the first/last event —
    ``session_window.end`` is last-event + gap by definition, so the
    last-event time is recovered exactly in integer microseconds."""
    # one source of truth for the gap: the interval string and the
    # microsecond recovery offset are both derived from gap_s
    gap_us = int(gap_s) * 1_000_000
    src = spark.readStream.schema(schema).parquet(input_path)
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    w = F.session_window(F.col(ts_col), f"{int(gap_s)} seconds")
    out = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), w.alias("w"))
        .agg(*aggs)
    )
    # floor (not truncate-toward-zero): matches the batch operator and
    # the epoch_us // 1000000 oracle for pre-1970 timestamps too
    start_s = F.floor(
        F.unix_micros(F.col("w.start")) / 1_000_000
    ).cast("long")
    end_s = F.floor(
        (F.unix_micros(F.col("w.end")) - F.lit(gap_us)) / 1_000_000
    ).cast("long")
    cols = [
        F.col(user_col),
        start_s.alias("session_start"),
        end_s.alias("session_end"),
        F.col("n_events"),
    ]
    if value_col is not None:
        cols.append(F.col("value_sum"))
    return out.select(*cols)
