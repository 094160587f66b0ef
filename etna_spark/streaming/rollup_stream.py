"""Structured Streaming variant of the tier rollup.

The reference is batch-only (SURVEY.md §2.12) and the engine's primary
refresh path is batch-incremental from snapshot watermarks
(plans/tiers.py) — this module is the streaming twin for deployments that
want push-based 1m aggregates: ``readStream`` over the input table's
directory, event-time tumbling window + watermark for late data, append-mode
sink. The aggregates are the same algebraic set, so a streaming 1m tier can
feed the batch 1h/1d cascade unchanged.

Tested with the availableNow trigger (process-everything-then-stop), which
is also the production pattern for periodic micro-batch backfills.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.operators.rollup import TIERS


def stream_rollup(
    spark: SparkSession,
    input_path: str,
    schema,
    tier: str = "1m",
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tier aggregation with late-data handling.

    Late rows within the watermark update their window; older rows are
    dropped by the engine (the batch refresh path instead re-aggregates
    affected partitions — both are deterministic because the aggregates are
    algebraic)."""
    seconds, _ = TIERS[tier]
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # one file per micro-batch, files ordered by mtime — the
        # deterministic multi-batch recipe for watermark/late-data tests
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)
    v = F.col(value_col)
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(*series_cols, F.window(ts_col, f"{seconds} seconds").alias("w"))
        .agg(
            F.count(v).alias("point_count"),
            F.sum(v.cast("long")).alias("value_sum"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
            # full algebraic set (matches _agg_exprs) so this tier can feed
            # the batch 1h/1d cascade, which references value_sumsq
            F.sum(v.cast("long") * v.cast("long")).alias("value_sumsq"),
        )
        .select(
            *series_cols,
            F.col("w.start").alias("bucket_ts"),
            "point_count",
            "value_sum",
            "value_min",
            "value_max",
            "value_sumsq",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, out_path: str
) -> None:
    """Drain everything currently in the source, then stop (micro-batch
    backfill pattern); parquet append sink + checkpoint for exactly-once."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
