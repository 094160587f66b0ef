"""Fitted-state materialization without a driver round-trip.

Transforms fit small per-series statistics tables that later joins consume.
Round 1 pinned them with ``createDataFrame(df.collect(), schema)`` — a
driver materialization that caps the engine at driver-memory series counts
(10^5+ series × stats would OOM the driver long before the cluster is
busy). The scale-correct pin is cache + count: the state stays executor-
side, the lineage is cut at the cache, and broadcast-join collection (when
a join chooses broadcast) is handled by Spark's own size-limited machinery.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_STATE_ROOT: str | None = None


def materialize(df: DataFrame) -> DataFrame:
    """Pin a fitted-state DataFrame as a persisted state table.

    The state is written to parquet (distributed, executors write their own
    partitions — nothing passes the driver) and read back, which yields a
    FRESH logical plan with new attribute ids: transform(df) can join state
    fitted from the same df without ambiguous-self-join errors, exactly the
    property the old driver round-trip provided. (``localCheckpoint`` is not
    enough — it truncates physical lineage but keeps the attribute ids.)

    The state table is also the checkpoint/resume artifact: on a real
    cluster point ``SPARK_GRAFT_STATE_DIR`` at shared storage (the warehouse
    dir) and fitted transforms survive executor loss and job restarts.
    """
    global _STATE_ROOT
    if _STATE_ROOT is None:
        explicit = os.environ.get("SPARK_GRAFT_STATE_DIR")
        _STATE_ROOT = explicit or tempfile.mkdtemp(prefix="etna_spark_state-")
        if not explicit:
            # best-effort retention: session-scoped temp state is deleted at
            # interpreter exit (an explicit SPARK_GRAFT_STATE_DIR is durable
            # checkpoint storage and is left alone)
            atexit.register(shutil.rmtree, _STATE_ROOT, ignore_errors=True)
    path = os.path.join(_STATE_ROOT, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
