"""Per-series introspection.

Reference: ``TSDataset.describe`` / ``info``
(/root/reference/etna/datasets/tsdataset.py:1626-1764): per-segment
start/end timestamps, length, missing counts over the regular grid.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etna_spark.operators.spine import regularize


def describe_series(
    df: DataFrame,
    tier: str = "1m",
    in_col: str = "value_sum",
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """(series..., start_ts, end_ts, length, num_missing) over the shared
    dense grid (gaps materialized first, like the reference's asfreq)."""
    reg = regularize(df, tier, series_cols=series_cols, ts_col=ts_col)
    c = F.col(in_col)
    return reg.groupBy(*series_cols).agg(
        F.min(F.when(c.isNotNull(), F.col(ts_col))).alias("start_ts"),
        F.max(F.when(c.isNotNull(), F.col(ts_col))).alias("end_ts"),
        F.count("*").alias("length"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("num_missing"),
    )


def benford_digits(
    df: DataFrame,
    value_col: str,
    series_cols=("segment",),
) -> DataFrame:
    """First-significant-digit distribution of a positive integer measure
    per segment — the Benford's-law data-quality audit (fabricated or
    unit-mangled measures skew the digit histogram). Digit extraction is
    string-based (substr of the decimal rendering), so it is exact in
    any engine; output counts are integers. One hash aggregation."""
    keys = list(series_cols)
    digit = F.substring(F.col(value_col).cast("string"), 1, 1).cast("int")
    return (
        df.filter(F.col(value_col) > 0)
        .groupBy(*keys, digit.alias("digit"))
        .agg(F.count("*").alias("n"))
    )
