"""Unit tests for the eleventh operator batch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_rolling_corr_pair_matches_numpy(spark):
    from etna_spark.operators.window_stats import rolling_corr_pair

    rng = np.random.default_rng(5)
    x = rng.integers(0, 1000, 40)
    y = x + rng.integers(-100, 100, 40)  # strongly correlated
    rows = [(int(t), int(a), int(b)) for t, (a, b) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, "ts long, x long, y long")
    out = {r["ts"]: r["corr"]
           for r in rolling_corr_pair(df, "x", "y", window=10,
                                      ts_col="ts").collect()}
    assert min(out) == 9 and max(out) == 39  # full windows only
    for t in (9, 20, 39):
        w = slice(t - 9, t + 1)
        expect = np.corrcoef(x[w], y[w])[0, 1]
        assert out[t] == pytest.approx(expect, abs=2e-6)


def test_rolling_corr_zero_variance_is_null(spark):
    from etna_spark.operators.window_stats import rolling_corr_pair

    rows = [(t, 5, t) for t in range(6)]  # x constant
    df = spark.createDataFrame(rows, "ts long, x long, y long")
    out = rolling_corr_pair(df, "x", "y", window=3, ts_col="ts").collect()
    assert all(r["corr"] is None for r in out)


def test_cusum_max_detects_mean_shift(spark):
    from etna_spark.operators.change_points import cusum_max

    y = [100] * 50 + [500] * 50  # shift at position 50
    rows = [("s", t, v) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "segment string, t long, y long")
    r = cusum_max(df, series_cols=("segment",), ts_col="t",
                  value_col="y").collect()[0]
    assert r["argmax_t"] == 50  # peak at the last pre-shift prefix
    # D_50 = n*S_50 - 50*S_n = 100*5000 - 50*30000 = -1_000_000
    assert r["cusum_max"] == 1_000_000
    assert r["n_obs"] == 100


def test_bigram_pmi_favors_exclusive_pairs(spark):
    from etna_spark.data.text import bigram_pmi

    # token 7 always followed by 8 (exclusive); 1/2 mixed everywhere
    seqs = [[7, 8, 1, 2, 1] for _ in range(5)] + [[2, 1, 2, 1, 2]] * 5
    df = spark.createDataFrame([(s,) for s in seqs], "tokens array<int>")
    out = bigram_pmi(df, min_count=5, top_k=5).collect()
    top = sorted(out, key=lambda r: r["rank"])[0]
    assert (top["w1"], top["w2"]) == (7, 8)


def test_benford_digits(spark):
    from etna_spark.operators.describe import benford_digits

    rows = [("a", 123), ("a", 19), ("a", 999), ("a", 20), ("a", -5),
            ("b", 7)]
    df = spark.createDataFrame(rows, "segment string, v long")
    out = {(r["segment"], r["digit"]): r["n"]
           for r in benford_digits(df, "v").collect()}
    assert out == {("a", 1): 2, ("a", 9): 1, ("a", 2): 1, ("b", 7): 1}


def test_stream_sessionize_matches_batch_rule(spark, tmp_path):
    import datetime as dt

    from etna_spark.streaming.rollup_stream import run_available_now
    from etna_spark.streaming.session_stream import stream_sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10), (1, base + dt.timedelta(hours=1), 20),
        # exactly gap later -> session_window still MERGES (inclusive
        # boundary, same as the batch strict-> rule)
        (1, base + dt.timedelta(hours=5), 30),
        (2, base, 40),
        # sentinel to flush
        (-1, base + dt.timedelta(days=2), 0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, vc long")
    in_path, out_path, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    df.coalesce(1).write.parquet(in_path)
    sdf = stream_sessionize(
        spark, in_path, df.schema, gap_s=14_400, value_col="vc",
        watermark="0 seconds",
    )
    run_available_now(sdf, ckpt, out_path)
    out = spark.read.parquet(out_path).filter("user_id >= 0").collect()
    got = {(r["user_id"], r["session_start"]): (r["n_events"], r["value_sum"],
                                                r["session_end"])
           for r in out}
    e0 = int(base.timestamp())
    assert got == {
        (1, e0): (3, 60, e0 + 5 * 3600),
        (2, e0): (1, 40, e0),
    }


def test_chunk_with_overlap_covers_and_overlaps(spark):
    from etna_spark.data.packing import chunk_with_overlap

    toks = list(range(1, 101))  # 100 tokens
    df = spark.createDataFrame([(1, toks)], "doc_id long, tokens array<int>")
    out = sorted(
        chunk_with_overlap(df, chunk_size=64, stride=48).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0, 48, 96 -> lens 64, 52, 4
    assert [(r["chunk_idx"], r["chunk_len"]) for r in out] == [
        (0, 64), (1, 52), (2, 4)
    ]
    # checksum of chunk 2 = tokens[96..99] position-weighted:
    # 97*1 + 98*2 + 99*3 + 100*4 = 990
    assert out[2]["chunk_checksum"] == 990
    # short doc -> exactly one chunk
    df2 = spark.createDataFrame([(2, [5, 6])], "doc_id long, tokens array<int>")
    out2 = chunk_with_overlap(df2, chunk_size=64, stride=48).collect()
    assert len(out2) == 1 and out2[0]["chunk_len"] == 2


def test_kalman_level_matches_scalar_reference(spark):
    import numpy as np

    from etna_spark.operators.kalman import kalman_level

    rng = np.random.default_rng(2)
    y = (1000 + rng.normal(0, 50, 80).cumsum()).round(0)
    rows = [("s", int(t), float(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "segment string, ts long, y double")
    out = {r["ts"]: r["level"]
           for r in kalman_level(df, q_var=25.0, r_var=400.0, in_col="y",
                                 series_cols=("segment",),
                                 ts_col="ts").collect()}
    # scalar replay
    a, p = y[0], 400.0
    assert out[0] == a
    for t in range(1, len(y)):
        p_pred = p + 25.0
        k = p_pred / (p_pred + 400.0)
        a = a + k * (y[t] - a)
        p = (1.0 - k) * p_pred
        assert out[t] == a  # bit-identical scalar chain
    # steady-state gain sanity: level tracks between y and previous level
    assert abs(out[79] - y[79]) < abs(y[79] - y[78]) + 50


def test_hll_estimate_accuracy_and_determinism(spark):
    from etna_spark.data.sketches import hll_cardinality

    rows = [("g", k) for k in range(2000)] + [("h", k) for k in range(50)]
    df = spark.createDataFrame(rows, "grp string, k long")
    a = {r["grp"]: r["hll_estimate"]
         for r in hll_cardinality(df, "k", ("grp",)).collect()}
    b = {r["grp"]: r["hll_estimate"]
         for r in hll_cardinality(df, "k", ("grp",)).collect()}
    assert a == b  # fully deterministic
    # m=64 raw estimator: ~13% typical error at n >> m
    assert abs(a["g"] - 2000) / 2000 < 0.35


def test_cms_never_undercounts(spark):
    from etna_spark.data.sketches import cms_build, cms_estimate
    from pyspark.sql import functions as F

    rows = [(t,) for t in [1] * 50 + [2] * 30 + list(range(100, 400))]
    df = spark.createDataFrame(rows, "token long")
    sketch = cms_build(df, "token")
    keys = df.distinct()
    est = {r["token"]: r["cms_estimate"]
           for r in cms_estimate(sketch, keys, "token").collect()}
    true = {r["token"]: r["cnt"]
            for r in df.groupBy("token").agg(F.count("*").alias("cnt"))
            .collect()}
    assert all(est[t] >= c for t, c in true.items())
    assert est[1] >= 50 and est[2] >= 30


def test_bloom_no_false_negatives(spark):
    from etna_spark.data.sketches import bloom_build, bloom_contains

    members = spark.createDataFrame([(k,) for k in range(0, 50)], "k long")
    others = spark.createDataFrame([(k,) for k in range(50, 500)], "k long")
    bloom = bloom_build(members, "k")
    got_m = bloom_contains(bloom, members, "k").collect()
    assert all(r["in_bloom"] for r in got_m)  # never a false negative
    got_o = bloom_contains(bloom, others, "k").collect()
    fp = sum(1 for r in got_o if r["in_bloom"])
    # 150 bits set of 1024 -> fp rate ~ (150/1024)^3 ~ 0.3%; allow slack
    assert fp < 30


def test_kalman_smooth_matches_scalar_rts(spark):
    import numpy as np

    from etna_spark.operators.kalman import kalman_smooth

    rng = np.random.default_rng(9)
    y = (500 + rng.normal(0, 30, 60).cumsum()).round(0)
    rows = [("s", int(t), float(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "segment string, ts long, y double")
    out = {r["ts"]: r["level_smooth"]
           for r in kalman_smooth(df, q_var=25.0, r_var=400.0, in_col="y",
                                  series_cols=("segment",),
                                  ts_col="ts").collect()}
    n = len(y)
    a_arr, p_arr = np.empty(n), np.empty(n)
    a, p = y[0], 400.0
    a_arr[0], p_arr[0] = a, p
    for t in range(1, n):
        p_pred = p + 25.0
        k = p_pred / (p_pred + 400.0)
        a = a + k * (y[t] - a)
        p = (1.0 - k) * p_pred
        a_arr[t], p_arr[t] = a, p
    s = np.empty(n)
    s[n - 1] = a_arr[n - 1]
    for t in range(n - 2, -1, -1):
        g = p_arr[t] / (p_arr[t] + 25.0)
        s[t] = a_arr[t] + g * (s[t + 1] - a_arr[t])
    for t in range(n):
        assert out[t] == s[t]  # bit-identical two-pass chain


def test_winsorize_exact_bounds(spark):
    from etna_spark.operators.outliers import winsorize_exact

    vals = list(range(1, 101))  # 1..100
    rows = [("s", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "segment string, t long, v long")
    out = winsorize_exact(df, "v", lo_pct=5, hi_pct=95,
                          series_cols=("segment",)).collect()
    wins = {r["v"]: r["v_wins"] for r in out}
    # q5 = min{v: cum >= 5} = 5; q95 = min{v: cum >= 95} = 95
    assert wins[1] == 5 and wins[4] == 5 and wins[5] == 5
    assert wins[50] == 50
    assert wins[95] == 95 and wins[100] == 95


def test_quota_per_stratum_cap_and_determinism(spark):
    from etna_spark.data.sampling import quota_per_stratum

    rows = [(k, "a") for k in range(200)] + [(k, "b") for k in range(1000, 1010)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = quota_per_stratum(df, "doc_id", "source", quota=20)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"a": 20, "b": 10}  # capped vs under-quota stratum
    first = sorted(r["doc_id"] for r in out.filter("source='a'").collect())
    second = sorted(r["doc_id"] for r in
                    quota_per_stratum(df, "doc_id", "source", quota=20)
                    .filter("source='a'").collect())
    assert first == second  # deterministic membership


def test_hll_merge_equals_full_build(spark):
    from pyspark.sql import functions as F

    from etna_spark.data.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    rows = [("g", k) for k in range(500)]
    df = spark.createDataFrame(rows, "grp string, k long")
    h0 = df.filter(F.col("k") % 2 == 0)
    h1 = df.filter(F.col("k") % 2 == 1)
    merged = (
        hll_registers(h0, "k", ("grp",))
        .unionByName(hll_registers(h1, "k", ("grp",)))
        .groupBy("grp", "b").agg(F.max("r").alias("r"))
    )
    full = hll_registers(df, "k", ("grp",))
    groups = df.select("grp").distinct()
    em = hll_estimate_from_registers(merged, groups, ("grp",)).collect()
    ef = hll_estimate_from_registers(full, groups, ("grp",)).collect()
    assert em[0]["hll_estimate"] == ef[0]["hll_estimate"]


def test_croston_sba_is_scaled_croston(spark):
    import numpy as np

    from etna_spark.plans.pipeline import CrostonModel

    y = np.array([0, 0, 4, 0, 0, 0, 6, 0, 2, 0], dtype=float)
    base = CrostonModel(alpha=0.5).kernel(y, 3)
    sba = CrostonModel(alpha=0.5, sba=True).kernel(y, 3)
    assert np.all(sba == base * 0.75)  # dyadic factor, bit-exact
