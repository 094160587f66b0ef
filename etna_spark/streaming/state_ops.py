"""Custom stateful streaming operators (applyInPandasWithState).

The reference's anomaly detectors are batch-only (SURVEY.md §2.10 /
analysis/outliers); this is their streaming twin: per-series RUNNING
sufficient statistics (n, Σx, Σx²) ride in the group state across
micro-batches, each incoming point is z-scored against the state BEFORE
being absorbed, and only flagged rows are emitted (append mode).

Why applyInPandasWithState and not a windowed aggregate: the detector's
state is unbounded-history (a running baseline), not a tumbling window —
exactly the case Structured Streaming's built-in aggregations can't
express and the task's custom-stateful escape hatch exists for. State is
three scalars per series: O(#series) store, no row retention.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)


def stream_detect_anomalies(
    spark: SparkSession,
    input_path: str,
    schema: StructType,
    threshold: float = 3.0,
    min_history: int = 10,
    series_col: str = "source",
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming z-score outlier flags per series.

    A point is flagged when its |z| against the series' RUNNING mean/std
    exceeds ``threshold`` (only once at least ``min_history`` points have
    been absorbed — the cold-start guard). Every point then updates the
    state, flagged or not, matching the batch detectors' fit-on-everything
    semantics."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path).select(series_col, ts_col, value_col)

    # series/ts types follow the INPUT schema — the API is generic over
    # key and timestamp types, so the output must be too
    out_schema = StructType([
        StructField(series_col, schema[series_col].dataType),
        StructField(ts_col, schema[ts_col].dataType),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("ss", DoubleType()),
    ])

    def detect(key, pdfs, state: GroupState):
        n, s, ss = state.get if state.exists else (0, 0.0, 0.0)
        rows = []
        # a group's micro-batch may arrive as SEVERAL Arrow chunks whose
        # time ranges interleave — concatenate before the single sort so
        # points are absorbed in true timestamp order
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col, kind="mergesort")
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                if v is None or v != v:
                    continue
                v = float(v)
                if n >= min_history:
                    mean = s / n
                    var = max(ss / n - mean * mean, 0.0)
                    sd = var ** 0.5
                    dev = v - mean
                    if sd > 0 and abs(dev) > threshold * sd:
                        rows.append((key[0], ts, v, dev / sd))
                    elif sd == 0 and dev != 0:
                        # constant baseline: ANY deviation is an outlier
                        # (the batch MAD twin flags it too); z = signed inf
                        rows.append(
                            (key[0], ts, v, math.copysign(math.inf, dev))
                        )
                n, s, ss = n + 1, s + v, ss + v * v
        state.update((n, s, ss))
        if rows:
            yield pd.DataFrame(rows, columns=[series_col, ts_col, "value", "z"])

    return (
        src.groupBy(series_col)
        .applyInPandasWithState(
            detect, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
