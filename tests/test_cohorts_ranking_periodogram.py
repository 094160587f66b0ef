"""Unit tests for the tenth operator batch: cohort retention, funnels,
exact-rational BM25, periodogram peaks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_cohort_retention_triangle(spark):
    from etna_spark.operators.cohorts import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),  # same day
        (1, "2024-01-03 09:00:00"),                              # offset 2
        (2, "2024-01-02 08:00:00"), (2, "2024-01-03 08:00:00"),  # offsets 0,1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = cohort_retention(df)
    got = {(r["cohort_day"], r["offset_days"]): r["n_users"]
           for r in out.collect()}
    d1 = 1704067200  # 2024-01-01 UTC
    d2 = d1 + 86400
    assert got == {(d1, 0): 1, (d1, 2): 1, (d2, 0): 1, (d2, 1): 1}


def test_funnel_strict_ordering(spark):
    from etna_spark.operators.cohorts import funnel

    rows = [
        # user 1 completes in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:10:00"),
        (1, "purchase", "2024-01-01 00:20:00"),
        # user 2: click BEFORE view -> never reaches step 2
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 00:10:00"),
        # user 3: view only
        (3, "view", "2024-01-01 00:00:00"),
        # user 4: simultaneous view+click (strict > excludes the click)
        (4, "view", "2024-01-01 00:00:00"),
        (4, "click", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = funnel(df, steps=("view", "click", "purchase"))
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {1: 4, 2: 1, 3: 1}


def test_bm25_rational_ranks_by_tf_and_idf(spark):
    from etna_spark.data.ranking import bm25_rational_topk

    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),   # tf(cat)=3
            (2, "cat dog dog dog"),   # tf(cat)=1
            (3, "bird bird bird xx"), # no query terms
        ],
        "doc_id long, text string",
    )
    out = bm25_rational_topk(docs, ("cat",), k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    # exact check: L=12, N=3, df=2, dl=4
    # s = 22*L*tf*N / ((10*L*tf + 3*L + 9*dl*N)*df)
    L, N, df_, dl = 12, 3, 2, 4
    for r, tf in ((out[0], 3), (out[1], 1)):
        expect = (22 * L * tf * N) / ((10 * L * tf + 3 * L + 9 * dl * N) * df_)
        assert r["score"] == pytest.approx(expect, abs=1e-6)


def test_periodogram_finds_planted_frequency(spark):
    from etna_spark.operators.fourier_decompose import periodogram_topk

    n = 96
    t = np.arange(n)
    y = 1000 * np.cos(2 * np.pi * 4 * t / n)  # pure f=4 tone
    rows = [("s", int(i), float(v)) for i, v in zip(t, y)]
    df = spark.createDataFrame(rows, "segment string, ts long, v double")
    out = periodogram_topk(df, k=3, in_col="v", series_cols=("segment",),
                           ts_col="ts").collect()
    top = sorted(out, key=lambda r: r["rank"])
    assert top[0]["freq"] == 4
    # planted tone carries essentially all power
    assert top[0]["power"] > 100 * max(top[1]["power"], 1e-9)
