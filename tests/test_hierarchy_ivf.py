"""Hierarchy rollup across series + IVF ANN."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from etna_spark.data.ivf import cosine_topk_ivf, train_centroids
from etna_spark.data.similarity import cosine_topk_bruteforce
from etna_spark.operators.hierarchy import hierarchy_rollup

from .conftest import SF_DIR


def test_hierarchy_rollup_sums_children(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for seg, region in (("a1", "A"), ("a2", "A"), ("b1", "B")):
        for i in range(4):
            rows.append((seg, t0 + dt.timedelta(days=i), float(i + 1)))
    df = spark.createDataFrame(rows, "segment string, ts timestamp, value double")
    mapping = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B")], "segment string, region string"
    )
    out = hierarchy_rollup(df, mapping, "segment", "region", ["value"], ts_col="ts")
    got = {(r["region"], r["ts"].day): r["value"] for r in out.collect()}
    assert got[("A", 1)] == 2.0 and got[("A", 4)] == 8.0
    assert got[("B", 1)] == 1.0
    # two-level cascade: regions → total
    totals = hierarchy_rollup(
        out.withColumnRenamed("region", "segment"),
        spark.createDataFrame([("A", "total"), ("B", "total")],
                              "segment string, level string"),
        "segment", "level", ["value"], ts_col="ts",
    )
    t = {r["ts"].day: r["value"] for r in totals.collect()}
    assert t[1] == 3.0 and t[4] == 12.0


def test_ivf_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 15")
    exact = cosine_topk_bruteforce(queries, emb, k=1).collect()
    cents = train_centroids(emb, n_cells=8, seed=42)
    assert len(cents) == 8 and len(cents[0]) == 64
    approx = cosine_topk_ivf(queries, emb, k=1, n_cells=8, n_probe=4,
                             centroids=cents).collect()
    exact_top = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx_top = {r["query_id"]: r["neighbor_id"] for r in approx}
    assert len(approx_top) == 15  # every query probed a non-empty cell
    hits = sum(1 for q, n in approx_top.items() if exact_top[q] == n)
    assert hits / 15 >= 0.5  # probing half the cells → decent recall

    # determinism: same seed → same centroids
    cents2 = train_centroids(emb, n_cells=8, seed=42)
    np.testing.assert_allclose(np.array(cents), np.array(cents2))
