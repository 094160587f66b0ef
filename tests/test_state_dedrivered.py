"""Fitted state must never be collected to the driver (scale guard).

Round-1 transforms pinned per-series statistics with
``createDataFrame(df.collect())`` — a driver materialization that fails at
10^5+ series. This test fits several transforms over a few thousand series
with ``DataFrame.collect`` spied on: only scalar lookups (<= 1 row) may pass
through the driver during fit + transform."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@pytest.fixture()
def many_series_df(spark):
    # 3000 series × 8 points, built without a driver-side loop
    return (
        spark.range(3000 * 8)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 3000).cast("string")).alias(
                "series"
            ),
            (
                F.lit(dt.datetime(2021, 1, 1)).cast("timestamp")
                + F.make_interval(hours=(F.col("id") / 3000).cast("int"))
            ).alias("ts"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 10).alias(
                "value"
            ),
            F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("cat"),
        )
    )


def test_fit_state_never_collected_to_driver(spark, many_series_df, monkeypatch):
    from etna_spark.operators.decomposition import LinearTrend
    from etna_spark.operators.encoders import MeanEncoder
    from etna_spark.operators.scalers import Scaler

    orig = DataFrame.collect
    collected_sizes: list[int] = []

    def spy(self):
        rows = orig(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)

    df = many_series_df
    s = Scaler(in_col="value", kind="standard", series_cols=("series",)).fit(df)
    assert s.transform(df).count() == 24000

    e = MeanEncoder(
        in_col="cat", out_col="enc", target_col="value",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    assert e.transform(df).count() == 24000

    lt = LinearTrend(
        in_col="value", series_cols=("series",), ts_col="ts",
        step_seconds=3600,
    ).fit(df)
    assert lt.transform(df).count() == 24000

    assert all(n <= 1 for n in collected_sizes), (
        f"driver-side state materialization detected: collect() returned "
        f"row counts {sorted(collected_sizes, reverse=True)[:5]}"
    )
