"""Hierarchical rollup across the SERIES axis.

Reference: the sparse summing-matrix multiply that aggregates child segments
into parent-level series (``get_level_dataframe``,
/root/reference/etna/datasets/utils.py:292-359; ``get_level_dataset``,
tsdataset.py:1391-1455) with the level tree from
hierarchical_structure.py:1-192.

Spark mapping: the summing matrix IS a groupBy — broadcast-join the
(child → parent) mapping, aggregate per (parent, ts). Repeated application
walks the level tree (segment → region → total), exactly like the time-axis
tier cascade; all aggregates stay algebraic so levels can be derived from
the previous level without touching leaves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hierarchy_rollup(
    df: DataFrame,
    mapping: DataFrame,
    child_col: str,
    parent_col: str,
    value_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Aggregate child-level series to the parent level: one row per
    (parent, ts) with summed values. ``mapping`` is the tiny (child, parent)
    dimension — broadcast."""
    joined = df.join(F.broadcast(mapping), on=child_col, how="inner")
    return joined.groupBy(parent_col, ts_col).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )
