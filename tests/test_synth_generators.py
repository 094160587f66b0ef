"""Synthetic generator family (reference datasets_generation.py:26-325):
shapes, determinism at any parallelism, pattern repetition, AR dynamics,
hierarchy invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.synth_generators import (
    generate_ar_df,
    generate_const_df,
    generate_from_patterns_df,
    generate_hierarchical_df,
    generate_periodic_df,
)


def test_ar_df_shape_and_determinism(spark):
    a = generate_ar_df(spark, periods=40, n_segments=3, random_seed=7).toPandas()
    b = (
        generate_ar_df(spark, periods=40, n_segments=3, random_seed=7)
        .repartition(16)
        .toPandas()
    )
    assert len(a) == 120
    assert set(a.segment) == {"segment_0", "segment_1", "segment_2"}
    m_a = a.sort_values(["segment", "timestamp"]).target.to_numpy()
    m_b = b.sort_values(["segment", "timestamp"]).target.to_numpy()
    np.testing.assert_array_equal(m_a, m_b)  # parallelism-independent


def test_ar_coef_dynamics(spark):
    # ar_coef=[1] is a random walk: variance grows with t
    df = generate_ar_df(spark, periods=200, ar_coef=[1], sigma=1,
                        n_segments=20, random_seed=0).toPandas()
    by_t = df.sort_values("timestamp").groupby("timestamp").target.var()
    assert by_t.iloc[-1] > by_t.iloc[10]


def test_from_patterns(spark):
    df = generate_from_patterns_df(
        spark, periods=7, patterns=[[1.0, 2.0], [5.0, 6.0, 7.0]]
    ).toPandas()
    s0 = df[df.segment == "segment_0"].sort_values("timestamp").target.tolist()
    s1 = df[df.segment == "segment_1"].sort_values("timestamp").target.tolist()
    assert s0 == [1, 2, 1, 2, 1, 2, 1]
    assert s1 == [5, 6, 7, 5, 6, 7, 5]


def test_periodic_df(spark):
    df = generate_periodic_df(
        spark, periods=30, period=5, scale=10, n_segments=2, random_seed=3
    ).toPandas()
    for seg, g in df.groupby("segment"):
        v = g.sort_values("timestamp").target.to_numpy()
        np.testing.assert_array_equal(v[:25], v[5:30])  # x[i+period] == x[i]
        assert (v >= 0).all() and (v < 10).all()


def test_const_df(spark):
    df = generate_const_df(spark, periods=10, scale=7, n_segments=2).toPandas()
    assert (df.target == 7.0).all()


def test_hierarchical_df(spark):
    df = generate_hierarchical_df(
        spark, periods=20, n_segments=[2, 3, 6], random_seed=1
    )
    pdf = df.toPandas()
    assert set(pdf.columns) == {"timestamp", "level_0", "level_1", "level_2",
                                "target"}
    assert pdf.level_2.nunique() == 6
    assert pdf.level_0.nunique() <= 2
    # every child maps to exactly one parent, every parent has >= 1 child
    l12 = pdf[["level_1", "level_2"]].drop_duplicates()
    assert l12.groupby("level_2").size().max() == 1
    l01 = pdf[["level_0", "level_1"]].drop_duplicates()
    assert l01.groupby("level_1").size().max() == 1
    assert pdf.level_1.nunique() == 3


def test_hierarchical_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        generate_hierarchical_df(spark, 10, [])
    with pytest.raises(ValueError, match="positive"):
        generate_hierarchical_df(spark, 10, [2, 0])
    with pytest.raises(ValueError, match="non-decreasing"):
        generate_hierarchical_df(spark, 10, [3, 2])
