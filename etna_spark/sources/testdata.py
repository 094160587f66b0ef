"""Readers for the driver-generated parquet test tables (TESTDATA.md).

Equivalent surface in the reference: the CSV source in
/root/reference/etna/commands/forecast_command.py:132-142 (long frame in);
ours is a parquet/Iceberg scan, so Catalyst predicate pushdown and column
pruning apply to every downstream operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
