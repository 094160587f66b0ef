"""Training-sample generator + describe."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from etna_spark.operators.describe import describe_series
from etna_spark.operators.rollup import rollup
from etna_spark.operators.samples import make_training_samples
from etna_spark.synth import token_table


def test_make_training_samples(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = [("s", t0 + dt.timedelta(days=i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = make_training_samples(
        df, context=3, horizon=2, in_col="value",
        series_cols=("series",), ts_col="ts",
    ).orderBy("anchor_ts").collect()
    # anchors with full context start at i=2; full horizon needs i<=7 → 6 rows
    assert len(out) == 6
    first = out[0]
    np.testing.assert_allclose(first["x"], [0, 1, 2])
    np.testing.assert_allclose(first["y"], [3, 4])
    last = out[-1]
    np.testing.assert_allclose(last["x"], [5, 6, 7])
    np.testing.assert_allclose(last["y"], [8, 9])


def test_describe_series(spark):
    tt = token_table(spark, 2000, with_tokens=False)
    tier = rollup(tt, "1h")
    d = describe_series(tier, tier="1h", in_col="value_sum",
                        series_cols=("source",), ts_col="bucket_ts")
    rows = {r["source"]: r for r in d.collect()}
    # all series share the global grid length
    lengths = {r["length"] for r in rows.values()}
    assert len(lengths) == 1
    # hot source has no missing hours; cold tail sources have gaps
    assert rows["src_0"]["num_missing"] == 0
    coldest = max(rows.values(), key=lambda r: r["num_missing"])
    assert coldest["num_missing"] > 0
    for r in rows.values():
        assert r["start_ts"] is not None and r["end_ts"] >= r["start_ts"]
