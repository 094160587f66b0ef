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
    ArrayType, DoubleType, LongType, StructField, StructType,
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


def stream_dedup_first_seen(
    spark: SparkSession,
    input_path: str,
    schema: StructType,
    key_col: str = "doc_id",
    order_col: str = "crawl_id",
    n_shards: int = 16,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming EXACT dedup: emit each key's FIRST occurrence only —
    re-crawl suppression at the ingest edge, the streaming twin of the
    batch ``dedup_exact`` hash-aggregate.

    Keys are sharded by ``pmod(xxhash64(key), n_shards)`` so group state
    and per-group batch size stay balanced regardless of key skew; each
    shard's state is its seen-key list, and inside a micro-batch rows are
    absorbed in deterministic ``(order_col, key_col)`` order, so which
    duplicate survives is engine-independent (the lowest
    ``(order_col, key_col)`` row wins within a shard's stream history).

    State is O(unique keys) across the stream — exact by design, which is
    the verification contract here. A production deployment at 10^12
    sequences bounds it per key-range with state TTL
    (``GroupStateTimeout``) or swaps the list for a Bloom/sketch state
    accepting false drops; the operator shape (shard → stateful group →
    append) is identical.
    """
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path).withColumn(
        "_shard", F.pmod(F.xxhash64(key_col), F.lit(n_shards))
    )

    out_schema = StructType(list(schema))
    state_schema = StructType([
        StructField("seen", ArrayType(LongType())),
    ])
    in_cols = [f.name for f in schema]

    def dedup(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks).sort_values(
                [order_col, key_col], kind="mergesort"
            )
            keep_rows = []
            for row in pdf.itertuples(index=False):
                k = int(getattr(row, key_col))
                if k not in seen:
                    seen.add(k)
                    keep_rows.append(row)
            if keep_rows:
                out = pd.DataFrame(keep_rows, columns=list(pdf.columns))
                yield out[in_cols]
        state.update((sorted(seen),))

    return src.groupBy("_shard").applyInPandasWithState(
        dedup, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
