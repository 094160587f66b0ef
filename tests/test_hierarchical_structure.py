"""First-class multi-level hierarchy (reference
hierarchical_structure.py:18-192): tree validation, level bookkeeping,
any-pair summing-matrix mapping, multi-hop rollup, and reconciliation fed
from the structure at an arbitrary (source, target) level pair."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from etna_spark.operators.hierarchy import HierarchicalStructure
from etna_spark.operators.reconciliation import TopDownReconciliator

START = dt.datetime(2020, 1, 1)

TREE = {
    "total": ["X", "Y"],
    "X": ["a", "b"],
    "Y": ["c", "d"],
    "a": ["a1", "a2"],
    "b": ["b1"],
    "c": ["c1", "c2"],
    "d": ["d1"],
}
LEVELS = ["total", "market", "product", "sku"]


def _leaf_panel(spark, n=6):
    rows = [
        (leaf, START + dt.timedelta(days=i), float(base * (i + 1)))
        for leaf, base in (
            ("a1", 1), ("a2", 2), ("b1", 3), ("c1", 4), ("c2", 5), ("d1", 6)
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "segment string, ts timestamp, value double")


def test_structure_bookkeeping():
    h = HierarchicalStructure(TREE, LEVELS)
    assert h.root == "total"
    assert h.get_level_segments("market") == ["X", "Y"]
    assert h.get_level_segments("sku") == ["a1", "a2", "b1", "c1", "c2", "d1"]
    assert h.get_segment_level("c2") == "sku"
    assert h.ancestor_at("c2", "market") == "Y"
    assert h.ancestor_at("c2", "total") == "total"
    assert h.level_mapping("product", "market") == [
        ("a", "X"), ("b", "X"), ("c", "Y"), ("d", "Y")
    ]
    # default level names
    h2 = HierarchicalStructure(TREE)
    assert h2.level_names == ["level_0", "level_1", "level_2", "level_3"]


def test_structure_validations():
    with pytest.raises(ValueError, match="unable to find root"):
        HierarchicalStructure({"X": ["a"], "Y": ["b"]})
    with pytest.raises(ValueError, match="repeated child"):
        HierarchicalStructure({"total": ["X", "Y"], "X": ["Y"]})
    with pytest.raises(ValueError, match="repeated child"):
        HierarchicalStructure(
            {"total": ["X", "Y"], "X": ["Z"], "Y": ["Z"]}  # diamond, not tree
        )
    with pytest.raises(ValueError, match="leaves must be on the same"):
        HierarchicalStructure({"total": ["X", "Y"], "X": ["a"]})
    with pytest.raises(ValueError, match="Length of `level_names`"):
        HierarchicalStructure(TREE, ["a", "b"])
    h = HierarchicalStructure(TREE, LEVELS)
    with pytest.raises(ValueError, match="higher or equal"):
        h.level_mapping("market", "sku")
    with pytest.raises(ValueError, match="Invalid level name"):
        h.get_level_segments("nope")


def test_multihop_rollup_matches_stepwise(spark):
    """sku → total in ONE join must equal sku → product → market → total
    walked stepwise (associativity of the summing matrix)."""
    h = HierarchicalStructure(TREE, LEVELS)
    df = _leaf_panel(spark)
    direct = h.rollup(df, "sku", "total", ["value"])
    step = df
    for src, tgt in (("sku", "product"), ("product", "market"),
                     ("market", "total")):
        step = h.rollup(step, src, tgt, ["value"])
    d = {(r["segment"], r["ts"]): r["value"] for r in direct.collect()}
    s = {(r["segment"], r["ts"]): r["value"] for r in step.collect()}
    assert d == s
    # day i: total = (1+2+3+4+5+6)·(i+1) = 21·(i+1)
    assert d[("total", START)] == 21.0
    # intermediate 2-hop: sku → market
    mk = {
        (r["segment"], r["ts"]): r["value"]
        for r in h.rollup(df, "sku", "market", ["value"]).collect()
    }
    assert mk[("X", START)] == 6.0 and mk[("Y", START)] == 15.0


def test_reconciliation_from_structure_any_pair(spark):
    """The structure's mapping_df feeds TopDownReconciliator at a 2-hop
    (sku, market) level pair; PHA proportions share each market total
    across its skus and sum to 1."""
    h = HierarchicalStructure(TREE, LEVELS)
    df = _leaf_panel(spark)
    mapping = h.mapping_df(spark, "sku", "market",
                           child_col="segment", parent_col="market")
    rec = TopDownReconciliator(
        mapping, "segment", "market", period=6, method="PHA",
        value_col="value", ts_col="ts",
    ).fit(df)
    props = {
        (r["segment"], r["market"]): r["_w"]
        for r in rec._proportions.collect()
    }
    # X = a1 + a2 + b1 with bases 1,2,3 → shares 1/6, 2/6, 3/6
    np.testing.assert_allclose(props[("a1", "X")], 1 / 6)
    np.testing.assert_allclose(props[("b1", "X")], 3 / 6)
    for market, segs in (("X", ["a1", "a2", "b1"]), ("Y", ["c1", "c2", "d1"])):
        np.testing.assert_allclose(
            sum(props[(s, market)] for s in segs), 1.0
        )
    # reconcile a parent forecast down to skus: shares recompose the parent
    parent_fc = spark.createDataFrame(
        [("X", START + dt.timedelta(days=9), 60.0),
         ("Y", START + dt.timedelta(days=9), 150.0)],
        "market string, ts timestamp, value double",
    )
    child = {r["segment"]: r["value"]
             for r in rec.reconcile(parent_fc).collect()}
    np.testing.assert_allclose(child["a1"], 10.0)
    np.testing.assert_allclose(child["c2"], 50.0)
    np.testing.assert_allclose(sum(child.values()), 210.0)
