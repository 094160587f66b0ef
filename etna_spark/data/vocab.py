"""Vocabulary truncation: global top-K keep-set + UNK remap of token
arrays — the vocab-pruning step before embedding-table sizing.

r6 scale shape (r5 verdict #5): the keep-set is top-K by (count desc,
token asc), collected driver-side (K rows — a model artifact, not data).
The REMAP has two execution paths:

- ``literal`` — the keep-set inlined as an ``isin`` literal inside a JVM
  higher-order function. Zero Python, but the PLAN grows linearly with K:
  fine for the K=50 oracle query, catastrophic at a real K=256k vocab
  (the literal list explodes analysis/codegen).
- ``broadcast`` — an Arrow-batched kernel whose keep-set ships with the
  task closure (Spark torrent-broadcasts large command payloads), doing
  membership via ``np.searchsorted`` on the sorted keep array. Plan size
  is K-INDEPENDENT (pinned by tests/test_vocab_trunc.py); the K bound is
  executor memory for one sorted int64 array (256k ids = 2 MB).

``mode="auto"`` picks ``literal`` below ``literal_max`` (default 1024)
and ``broadcast`` above. Both paths produce identical arrays (pinned by
an equality property test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType


def vocab_topk(
    df: DataFrame, tokens_col: str = "tokens", k: int = 50
) -> list[int]:
    """Top-``k`` token ids by global count (count desc, token asc
    tie-break), collected driver-side — bounded by K, never by data."""
    counts = (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    # distributed top-k (TakeOrderedAndProject), NOT an unpartitioned
    # row_number window — the window form funnels the vocab-sized count
    # table into ONE task for a global sort, the exact single-task
    # bottleneck this module exists to avoid (r6 review fix; same rows,
    # same (cnt desc, token) order, so the returned list is identical)
    return [
        r["token"]
        for r in counts.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
        .select("token")
        .collect()
    ]


def truncate_vocab(
    df: DataFrame,
    tokens_col: str = "tokens",
    k: int = 50,
    unk_id: int = 0,
    mode: str = "auto",
    literal_max: int = 1024,
    out_col: str | None = None,
) -> DataFrame:
    """Remap every token outside the global top-``k`` to ``unk_id``.

    Adds ``out_col`` (default: overwrite ``tokens_col``) with the
    remapped arrays. Token ids must be non-null integers."""
    keep = vocab_topk(df, tokens_col=tokens_col, k=k)
    if mode == "auto":
        mode = "literal" if k <= literal_max else "broadcast"
    out_col = out_col or tokens_col
    elem_type = df.schema[tokens_col].dataType.elementType
    if mode == "literal":
        mapped = F.transform(
            tokens_col,
            lambda x: F.when(x.isin(keep), x).otherwise(
                F.lit(unk_id).cast(elem_type)
            ),
        )
        return df.withColumn(out_col, mapped)
    if mode != "broadcast":
        raise ValueError(f"unknown mode {mode!r}")
    keep_arr = np.sort(np.asarray(keep, dtype=np.int64))
    unk = int(unk_id)

    @pandas_udf(ArrayType(elem_type))
    def _remap(s: pd.Series) -> pd.Series:
        lens = np.fromiter((len(a) for a in s), dtype=np.int64, count=len(s))
        if lens.sum() == 0:
            return pd.Series([np.asarray(a) for a in s])
        flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in s])
        idx = np.searchsorted(keep_arr, flat)
        idx[idx >= len(keep_arr)] = 0
        kept = keep_arr[idx] == flat if len(keep_arr) else np.zeros(
            len(flat), dtype=bool
        )
        flat = np.where(kept, flat, unk)
        return pd.Series(np.split(flat, np.cumsum(lens)[:-1]))

    return df.withColumn(out_col, _remap(F.col(tokens_col)))
