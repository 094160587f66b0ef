"""Encoders, scalers, metrics, elementwise math — vs pandas/sklearn-formula
oracles mirroring the reference semantics (SURVEY.md §2.4, §2.8)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etna_spark.functions.math_ops import (
    add_const,
    add_const_inverse,
    binary_operation,
    binary_operation_inverse,
    lambda_transform,
    limit_inverse,
    limit_transform,
    log_inverse,
    log_transform,
)
from etna_spark.functions.metrics import compute_metrics
from etna_spark.operators.encoders import (
    LabelEncoder,
    MeanEncoder,
    OneHotEncoder,
    SegmentEncoder,
    mean_segment_encoder,
)
from etna_spark.operators.scalers import Scaler


def _panel(spark, values_by_seg, cats_by_seg=None):
    t0 = dt.datetime(2020, 1, 1)
    rows = []
    for seg, vals in values_by_seg.items():
        cats = cats_by_seg.get(seg) if cats_by_seg else [None] * len(vals)
        for i, v in enumerate(vals):
            rows.append(
                (seg, t0 + dt.timedelta(days=i),
                 None if v is None else float(v), cats[i])
            )
    return spark.createDataFrame(
        rows, "series string, ts timestamp, target double, cat string"
    )


def _col(df, seg, col):
    rows = df.filter(f"series='{seg}'").orderBy("ts").select(col).collect()
    return np.array(
        [np.nan if r[0] is None else float(r[0]) for r in rows]
    )


# ---------------------------------------------------------------------------
# mean encoder
# ---------------------------------------------------------------------------

def _mean_encoder_oracle(target, cats, smoothing):
    """Per-segment expanding mean-target encoding, reference formula."""
    t = np.asarray(target, dtype=float)
    n = len(t)
    out = np.full(n, np.nan)
    for i in range(n):
        prev = t[:i]
        valid_prev = prev[~np.isnan(prev)]
        rm = valid_prev.mean() if len(valid_prev) else np.nan
        same = [j for j in range(i) if cats[j] == cats[i]]
        vals = t[same]
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            cs, cc = np.nan, np.nan
        else:
            cs, cc = vals.sum(), float(len(vals))
        out[i] = (cs + rm * smoothing) / (cc + smoothing)
    return out


def test_mean_encoder_per_segment(spark):
    vals = {"s1": [1, 2, 4, 8, 16, 32], "s2": [3, 1, 4, 1, 5, 9]}
    cats = {"s1": ["a", "b", "a", "b", "a", "a"], "s2": ["x", "x", "y", "y", "x", "y"]}
    df = _panel(spark, vals, cats)
    enc = MeanEncoder(
        in_col="cat", out_col="enc", target_col="target", smoothing=1.0,
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = enc.transform(df)
    for seg in vals:
        expected = _mean_encoder_oracle(vals[seg], cats[seg], 1.0)
        np.testing.assert_allclose(_col(out, seg, "enc"), expected, rtol=1e-12)


def test_mean_encoder_future_rows(spark):
    vals = {"s1": [1, 2, 4, 8]}
    cats = {"s1": ["a", "b", "a", "b"]}
    df = _panel(spark, vals, cats)
    enc = MeanEncoder(
        in_col="cat", out_col="enc", target_col="target",
        series_cols=("series",), ts_col="ts",
    ).fit(df)
    t0 = dt.datetime(2020, 1, 10)
    fut = spark.createDataFrame(
        [("s1", t0, None, "a"), ("s1", t0 + dt.timedelta(days=1), None, "zz")],
        "series string, ts timestamp, target double, cat string",
    )
    out = enc.transform(fut).orderBy("ts").collect()
    assert out[0]["enc"] == pytest.approx((1 + 4) / 2)  # fit mean of 'a'
    assert out[1]["enc"] == pytest.approx(np.mean([1, 2, 4, 8]))  # global


def test_mean_segment_encoder_is_expanding_mean(spark):
    vals = {"s1": [2.0, 4.0, 6.0, 8.0]}
    df = _panel(spark, vals)
    enc = mean_segment_encoder(df, target_col="target",
                               series_cols=("series",), ts_col="ts")
    v = _col(enc.transform(df), "s1", "segment_mean")
    assert np.isnan(v[0])
    np.testing.assert_allclose(v[1:], [2.0, 3.0, 4.0])


def test_mean_encoder_macro_excludes_current_timestamp(spark):
    vals = {"s1": [1, 3], "s2": [2, 4]}
    cats = {"s1": ["a", "a"], "s2": ["a", "a"]}
    df = _panel(spark, vals, cats)
    enc = MeanEncoder(
        in_col="cat", out_col="enc", target_col="target", mode="macro",
        smoothing=0.0, series_cols=("series",), ts_col="ts",
    ).fit(df)
    out = enc.transform(df)
    # t0: no prior timestamp → null; t1: mean of both t0 rows = 1.5
    v1 = _col(out, "s1", "enc")
    v2 = _col(out, "s2", "enc")
    assert np.isnan(v1[0]) and np.isnan(v2[0])
    assert v1[1] == pytest.approx(1.5) and v2[1] == pytest.approx(1.5)


# ---------------------------------------------------------------------------
# label / segment / one-hot
# ---------------------------------------------------------------------------

def test_label_encoder_strategies(spark):
    df = _panel(spark, {"s1": [1, 2, 3]}, {"s1": ["b", "a", "b"]})
    enc = LabelEncoder("cat", "code", strategy="new_value").fit(df)
    np.testing.assert_allclose(_col(enc.transform(df), "s1", "code"), [1, 0, 1])

    new = _panel(spark, {"s1": [1, 2, 3]}, {"s1": ["b", "zz", "a"]})
    np.testing.assert_allclose(_col(enc.transform(new), "s1", "code"), [1, -1, 0])

    enc_mean = LabelEncoder("cat", "code", strategy="mean").fit(df)
    v = _col(enc_mean.transform(new), "s1", "code")
    np.testing.assert_allclose(v, [1, 0.5, 0])  # mean of seen codes (1,0)

    enc_none = LabelEncoder("cat", "code", strategy="none").fit(df)
    v = _col(enc_none.transform(new), "s1", "code")
    assert v[0] == 1 and np.isnan(v[1]) and v[2] == 0


def test_segment_encoder(spark):
    df = _panel(spark, {"s1": [1], "s2": [2], "s3": [3]})
    enc = SegmentEncoder(series_cols=("series",)).fit(df)
    out = enc.transform(df)
    codes = {r["series"]: r["segment_code"] for r in out.collect()}
    assert codes == {"s1": 0.0, "s2": 1.0, "s3": 2.0}


def test_one_hot_encoder(spark):
    df = _panel(spark, {"s1": [1, 2, 3]}, {"s1": ["b", "a", "b"]})
    enc = OneHotEncoder("cat").fit(df)
    out = enc.transform(df)
    np.testing.assert_allclose(_col(out, "s1", "cat_0"), [0, 1, 0])  # 'a'
    np.testing.assert_allclose(_col(out, "s1", "cat_1"), [1, 0, 1])  # 'b'
    new = _panel(spark, {"s1": [1]}, {"s1": ["zz"]})
    row = enc.transform(new).collect()[0]
    assert row["cat_0"] == 0 and row["cat_1"] == 0


# ---------------------------------------------------------------------------
# scalers
# ---------------------------------------------------------------------------

VALS = {"s1": [1, 2, 3, 4, 10], "s2": [100, 50, 0, -50, 25]}


@pytest.mark.parametrize("mode", ["per-segment", "macro"])
@pytest.mark.parametrize("kind", ["standard", "minmax", "maxabs", "robust"])
def test_scaler_matches_formula_and_inverts(spark, kind, mode):
    df = _panel(spark, VALS)
    sc = Scaler(in_col="target", kind=kind, mode=mode,
                series_cols=("series",)).fit(df)
    out = sc.transform(df)

    def expected(seg):
        x = np.array(VALS[seg], float)
        pool = (
            x if mode == "per-segment"
            else np.array(VALS["s1"] + VALS["s2"], float)
        )
        if kind == "standard":
            sd = pool.std()
            return (x - pool.mean()) / (sd if sd else 1)
        if kind == "minmax":
            span = pool.max() - pool.min()
            return (x - pool.min()) / (span if span else 1)
        if kind == "maxabs":
            m = np.abs(pool).max()
            return x / (m if m else 1)
        med = np.percentile(pool, 50)
        iqr = np.percentile(pool, 75) - np.percentile(pool, 25)
        return (x - med) / (iqr if iqr else 1)

    for seg in VALS:
        np.testing.assert_allclose(_col(out, seg, "target"), expected(seg), rtol=1e-9)
    rt = sc.inverse_transform(out)
    for seg in VALS:
        np.testing.assert_allclose(
            _col(rt, seg, "target"), np.array(VALS[seg], float), rtol=1e-9
        )


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_metrics_vs_numpy(spark):
    t0 = dt.datetime(2020, 1, 1)
    true = [1.0, 2.0, None, 4.0, 8.0]
    pred = [1.5, 1.0, 3.0, 4.0, 6.0]
    rows = [
        ("s", t0 + dt.timedelta(days=i), true[i], pred[i]) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, value double, prediction double"
    )
    out = compute_metrics(
        df, metrics=("mae", "mse", "rmse", "mape", "smape", "medae", "msle",
                     "sign", "wape", "r2", "max_deviation", "count_missing"),
        series_cols=("series",),
    ).collect()[0]
    t = np.array([v if v is not None else np.nan for v in true])
    p = np.array(pred)
    d = t - p
    assert out["mae"] == pytest.approx(np.nanmean(np.abs(d)))
    assert out["mse"] == pytest.approx(np.nanmean(d**2))
    assert out["rmse"] == pytest.approx(np.sqrt(np.nanmean(d**2)))
    assert out["mape"] == pytest.approx(np.nanmean(np.abs(d / t)) * 100)
    assert out["smape"] == pytest.approx(
        100 * np.nanmean(2 * np.abs(p - t) / (np.abs(t) + np.abs(p)))
    )
    assert out["medae"] == pytest.approx(np.nanmedian(np.abs(d)))
    assert out["msle"] == pytest.approx(np.nanmean((np.log1p(t) - np.log1p(p)) ** 2))
    assert out["sign"] == pytest.approx(np.nanmean(np.sign(d)))
    assert out["wape"] == pytest.approx(
        np.nansum(np.abs(d)) / np.nansum(np.abs(t * ~np.isnan(d)))
    )
    valid = ~np.isnan(d)
    r2 = 1 - np.nanmean(d**2) / np.var(t[valid])
    assert out["r2"] == pytest.approx(r2)
    assert out["max_deviation"] == pytest.approx(
        np.max(np.abs(np.nancumsum(p - t)))
    )
    assert out["count_missing"] == 1.0


# ---------------------------------------------------------------------------
# elementwise math
# ---------------------------------------------------------------------------

def test_add_const_log_roundtrip(spark):
    df = _panel(spark, {"s1": [0, 1, 9, 99]})
    out = add_const(df, "target", 5.0)
    np.testing.assert_allclose(_col(out, "s1", "target"), [5, 6, 14, 104])
    back = add_const_inverse(out, "target", 5.0)
    np.testing.assert_allclose(_col(back, "s1", "target"), [0, 1, 9, 99])

    lg = log_transform(df, "target", base=10)
    np.testing.assert_allclose(_col(lg, "s1", "target"), [0, np.log10(2), 1, 2])
    rt = log_inverse(lg, "target", base=10)
    np.testing.assert_allclose(_col(rt, "s1", "target"), [0, 1, 9, 99], rtol=1e-12)


def test_limit_scaled_logit_roundtrip(spark):
    df = _panel(spark, {"s1": [1, 5, 9]})
    out = limit_transform(df, "target", lower_bound=0, upper_bound=10)
    rt = limit_inverse(out, "target", lower_bound=0, upper_bound=10)
    np.testing.assert_allclose(_col(rt, "s1", "target"), [1, 5, 9], rtol=1e-9)
    with pytest.raises(Exception, match="out of limit"):
        limit_transform(df, "target", lower_bound=2, upper_bound=10).collect()


def test_binary_operation_and_inverse(spark):
    t0 = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [("s", t0, 6.0, 3.0), ("s", t0 + dt.timedelta(days=1), 5.0, 0.0)],
        "series string, ts timestamp, a double, b double",
    )
    out = binary_operation(df, "a", "b", "/", "q").orderBy("ts").collect()
    assert out[0]["q"] == 2.0 and out[1]["q"] == float("inf")
    add = binary_operation(df, "a", "b", "+", "s2")
    back = binary_operation_inverse(add, "a", "b", "+", "s2").orderBy("ts").collect()
    assert back[0]["s2"] == 6.0
    cmp_ = binary_operation(df, "a", "b", ">", "gt").orderBy("ts").collect()
    assert cmp_[0]["gt"] == 1.0 and cmp_[1]["gt"] == 1.0


def test_lambda_transform(spark):
    df = _panel(spark, {"s1": [1, 2, 3]})
    out = lambda_transform(df, "target", lambda s: s * 2 + 1, out_col="y")
    np.testing.assert_allclose(_col(out, "s1", "y"), [3, 5, 7])
