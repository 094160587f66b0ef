"""The project's main correctness gate, run locally: every registry query
with an oracle is executed in Spark AND DuckDB at sf0.01 and compared
exactly — the same check the driver records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from etna_spark.registry import REGISTRY, queries

from .conftest import SF_DIR, compare_to_oracle

queries()  # force-load sibling registry modules before parametrization

ORACLE_NAMES = sorted(n for n, e in REGISTRY.items() if e.sql is not None)
ROWS_ONLY_NAMES = sorted(n for n, e in REGISTRY.items() if e.sql is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    e = REGISTRY[name]
    df = e.spark(spark, SF_DIR)
    compare_to_oracle(df, ddb, e.sql)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):
    e = REGISTRY[name]
    df = e.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_gorilla_roundtrip_query_verifies(spark):
    """rows-only for the driver, but locally the round-trip flag must hold"""
    rows = REGISTRY["gorilla_roundtrip"].spark(spark, SF_DIR).collect()
    assert rows and all(r["all_match"] == 1 for r in rows)


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
