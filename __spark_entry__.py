"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etna_spark.registry``; this module is a thin
adapter so the engine package stays importable on its own.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etna_spark import registry  # noqa: E402
from etna_spark.operators.rollup import rollup, rollup_cascade  # noqa: E402
from etna_spark.operators.spine import ffill, regularize  # noqa: E402
from etna_spark.synth import doc_token_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.1 slice):
    1m token rollup per source → gap-filled with forward-fill → 1h tier
    derived algebraically from the 1m tier."""
    from etna_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    sf_dir = "/root/testdata/sf0.001"
    tt = doc_token_table(spark, sf_dir)
    r1m = rollup(tt, "1m", series_cols=("source",), ts_col="event_ts", value_col="n_tok")
    reg = regularize(r1m, "1m", series_cols=("source",))
    filled = ffill(reg, ["value_sum"], series_cols=("source",))
    r1h = rollup_cascade(r1m, "1h", series_cols=("source",))
    return filled.join(
        r1h.select(
            "source",
            "bucket_ts",
            r1h["value_sum"].alias("hour_tok_sum"),
        ),
        on=["source", "bucket_ts"],
        how="left",
    ).select("source", "bucket_ts", "point_count", "value_sum", "hour_tok_sum")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
