"""Unit tests for the ninth operator batch: sessionization, exact
ACF/PACF/Dickey-Fuller EDA, quantized k-means, BPE merge learning."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_sessionize_splits_on_gap(spark):
    from etna_spark.operators.sessionize import session_stats

    rows = [
        (1, "2024-01-01 00:00:00", 100),
        (1, "2024-01-01 00:30:00", 200),   # same session (30 min)
        (1, "2024-01-01 06:00:00", 300),   # new session (5.5 h gap)
        (2, "2024-01-01 12:00:00", 400),   # other user: one session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, vc long") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = session_stats(
        df, key_cols=("user_id",), ts_col="ts", gap_s=14400, value_col="vc"
    )
    got = {(r["user_id"], r["session_idx"]): (r["n_events"], r["value_sum"],
                                              r["duration_s"])
           for r in out.collect()}
    assert got == {
        (1, 1): (2, 300, 1800),
        (1, 2): (1, 300, 0),
        (2, 1): (1, 400, 0),
    }


def test_sessionize_boundary_is_exclusive(spark):
    """A gap of exactly gap_s seconds does NOT split (rule is gap > gap_s)."""
    from etna_spark.operators.sessionize import session_stats

    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 04:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = session_stats(df, key_cols=("user_id",), ts_col="ts", gap_s=14400)
    assert [r["n_events"] for r in out.collect()] == [2]


def _np_acf(y: np.ndarray, k: int) -> float:
    m = y.mean()
    z = y - m
    return float((z[k:] * z[:-k]).sum() / (z * z).sum())


def test_acf_matches_numpy(spark):
    from etna_spark.operators.acf import acf

    rng = np.random.default_rng(7)
    y = rng.integers(-500, 500, size=60).cumsum()  # integer random walk
    rows = [("s", int(t), int(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "segment string, t long, y long")
    out = acf(df, [1, 2, 3], series_cols=("segment",), ts_col="t",
              value_col="y")
    got = {r["lag"]: r["acf"] for r in out.collect()}
    for k in (1, 2, 3):
        assert got[k] == pytest.approx(_np_acf(y.astype(float), k), abs=2e-6)


def test_pacf_lag2_matches_durbin_levinson(spark):
    from etna_spark.operators.acf import pacf_lag2

    rng = np.random.default_rng(11)
    y = rng.integers(0, 1000, size=80).cumsum()
    rows = [("s", int(t), int(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "segment string, t long, y long")
    got = pacf_lag2(df, series_cols=("segment",), ts_col="t",
                    value_col="y").collect()[0]["pacf2"]
    yf = y.astype(float)
    r1, r2 = _np_acf(yf, 1), _np_acf(yf, 2)
    assert got == pytest.approx((r2 - r1 * r1) / (1 - r1 * r1), abs=5e-6)


def test_adf_matches_numpy_ols(spark):
    from etna_spark.operators.acf import adf_stat

    rng = np.random.default_rng(3)
    y = rng.integers(-200, 200, size=100).cumsum() + 10_000
    rows = [("s", int(t), int(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "segment string, t long, y long")
    got = adf_stat(df, series_cols=("segment",), ts_col="t",
                   value_col="y").collect()[0]
    x = y[:-1].astype(float)
    dy = np.diff(y.astype(float))
    X = np.column_stack([np.ones_like(x), x])
    beta, *_ = np.linalg.lstsq(X, dy, rcond=None)
    resid = dy - X @ beta
    n = len(dy)
    s2 = (resid @ resid) / (n - 2)
    sxx_c = ((x - x.mean()) ** 2).sum()
    t_stat = beta[1] / math.sqrt(s2 / sxx_c)
    assert got["rho"] == pytest.approx(beta[1], abs=1e-6)
    assert got["t_stat"] == pytest.approx(t_stat, rel=1e-4)


def test_kmeans_quantized_two_clusters(spark):
    from etna_spark.data.kmeans import kmeans_quantized

    # two tight groups on a 2-dim space; init = ids 0 and 1 (one in each)
    vecs = [
        (0, [0.10, 0.10]), (2, [0.12, 0.08]), (4, [0.09, 0.11]),
        (1, [-0.50, -0.50]), (3, [-0.48, -0.52]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = kmeans_quantized(df, k=2, rounds=2, scale=100)
    got = {r["vec_id"]: (r["cluster_r1"], r["cluster_r2"])
           for r in out.collect()}
    assert got[0] == (0, 0) and got[2] == (0, 0) and got[4] == (0, 0)
    assert got[1] == (1, 1) and got[3] == (1, 1)


def test_kmeans_centroid_update_floor_rule(spark):
    """Centroid update floors the mean: members {3, 4} -> centroid 3."""
    from etna_spark.data.kmeans import kmeans_quantized

    vecs = [(0, [0.03]), (1, [0.04]), (2, [0.90])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = kmeans_quantized(df, k=2, rounds=2, scale=100)
    r = {x["vec_id"]: x for x in out.collect()}
    # cluster 0 after r1 = {0, 1} (codes 3, 4) -> centroid floor(7/2) = 3
    # vec 0 (code 3) distance to it = 0
    assert r[0]["cluster_r2"] == 0 and r[0]["dist"] == 0
    assert r[1]["cluster_r2"] == 0 and r[1]["dist"] == 1
    assert r[2]["cluster_r2"] == 1


def test_bpe_greedy_fold_on_runs(spark):
    """'aaaa' with merge (a,a): greedy left-to-right -> [aa, aa], so the
    round-2 count sees pair (aa, aa)."""
    from etna_spark.data.bpe import learn_bpe_merges

    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    out = learn_bpe_merges(spark, docs, n_merges=2).collect()
    m = {r["merge_rank"]: (r["left_sym"], r["right_sym"], r["pair_count"])
         for r in out}
    # word type 'aaaa' occurs twice: pairs (a,a) x3 per occurrence -> 6
    assert m[1] == ("a", "a", 6)
    # after greedy fold: [aa, aa] -> merge 2 = (aa, aa), weight 2
    assert m[2] == ("aa", "aa", 2)


def test_bpe_weighted_counts_and_tiebreak(spark):
    from etna_spark.data.bpe import learn_bpe_merges

    # 'ab' appears in two word types with total weight 3; 'cd' weight 2
    docs = spark.createDataFrame(
        [(1, "abx abx cd"), (2, "aby cd")], "doc_id long, text string"
    )
    out = learn_bpe_merges(spark, docs, n_merges=1).collect()
    assert (out[0]["left_sym"], out[0]["right_sym"]) == ("a", "b")
    assert out[0]["pair_count"] == 3


def test_bpe_driver_loop_matches_spark_loop(spark):
    """r6: the heap-based driver-side merge loop (1 Spark job) must learn
    exactly the merges of the per-round Spark aggregation loop (2 jobs per
    round) — winner selection, tie-breaks, greedy application and counts."""
    from pyspark.sql import functions as F

    from etna_spark.data.bpe import learn_bpe_merges

    docs = spark.range(0, 300).select(
        F.concat_ws(
            " ",
            F.concat(F.lit("pre"), F.pmod(F.xxhash64("id"), F.lit(7)).cast("string")),
            F.concat(F.lit("ban"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)).cast("string"), F.lit("ana")),
            F.lit("the the aaaa abab"),
        ).alias("text")
    )
    # hash-derived digits are stripped by the [a-z]+ tokenization, leaving
    # a small weighted word-type table with real ties and repeats
    drv = learn_bpe_merges(spark, docs, n_merges=6).collect()
    dist = learn_bpe_merges(spark, docs, n_merges=6,
                            max_driver_types=0).collect()
    as_t = lambda rows: [  # noqa: E731
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in rows
    ]
    assert as_t(drv) == as_t(dist)
    assert len(drv) == 6
