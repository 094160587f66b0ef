"""Sequence packing: concatenate pre-tokenized documents in a deterministic
global order and chunk the stream into fixed-size training blocks.

The standard LLM-training data op (GPT-style "concat-and-chunk" packing):
given ``(doc_id, tokens, n_tok)``, produce blocks of exactly ``block_size``
tokens (the final partial block keeps its remainder) where block ``b`` holds
global token positions ``[b·B, (b+1)·B)`` of the concatenation of all
documents ordered by ``doc_id``.

Scale shape (the part that matters at 10^12 sequences):

- the global token offset of every document comes from a TWO-PHASE
  distributed prefix sum — a range repartition on the order key, a
  within-partition running sum, and a partition-offset table that is
  ``num_partitions`` rows (a broadcast), so no stage ever sees a
  single-task global window;
- each document then explodes into at most ``⌈n_tok/B⌉ + 1`` per-block
  slices (`F.slice` on the token array — JVM-side, no Python), and the
  final ``groupBy(block_id)`` is perfectly balanced BY CONSTRUCTION:
  every group is exactly ``block_size`` tokens, so the packing shuffle
  has zero skew regardless of the input length distribution.

The reference has no packing operator (its unit is the aligned time-series
segment, not the token stream); this extends the engine's token-payload
surface the same way the dedup/ANN family does. Determinism: output depends
only on (input rows, order key, block_size) — never on partitioning, which
the ``tok_pack_blocks`` oracle proves against a single-threaded DuckDB
replay of the same concatenation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _global_offsets(
    df: DataFrame,
    order_col: str,
    n_col: str,
    num_partitions: int,
) -> DataFrame:
    """Add ``_start`` = exact global prefix sum of ``n_col`` in ``order_col``
    order, via the two-phase (per-partition sum + partition-offset
    broadcast) scheme. Output keeps all input columns."""
    parts = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # partition totals → cumulative offset per partition (tiny: one row per
    # partition, window over it is driver-scale work, then broadcast back)
    offsets = (
        parts.groupBy("_pid")
        .agg(F.sum(n_col).alias("_ptotal"))
        .withColumn(
            "_poffset",
            F.coalesce(
                F.sum("_ptotal").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("_pid", "_poffset")
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        parts.join(F.broadcast(offsets), on="_pid")
        .withColumn(
            "_start",
            F.col("_poffset")
            + F.sum(n_col).over(w).cast("long")
            - F.col(n_col).cast("long"),
        )
        .drop("_pid", "_poffset")
    )


def pack_sequences(
    df: DataFrame,
    block_size: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    num_partitions: int = 64,
) -> DataFrame:
    """Pack token sequences into fixed-size blocks.

    Returns ``(block_id, tokens, n_tokens, n_docs)`` where ``tokens`` is the
    packed ``array`` of exactly ``block_size`` tokens (fewer only in the
    last block) and ``n_docs`` counts the documents contributing to the
    block. Documents are concatenated in ascending ``id_col`` order; a
    document crossing a block boundary is split across the adjacent blocks
    (no padding, no document loss — token-count conservation is pinned by
    pytest and the oracle).
    """
    if block_size < 1:
        raise ValueError("block_size must be >= 1")
    base = df.select(
        F.col(id_col).alias("_oid"),
        F.col(tokens_col).alias("_toks"),
        F.col(n_tok_col).cast("long").alias("_n"),
    )
    off = _global_offsets(base, "_oid", "_n", num_partitions)
    B = F.lit(int(block_size)).cast("long")
    first_b = (F.col("_start") / B).cast("long")
    last_b = ((F.col("_start") + F.col("_n") - 1) / B).cast("long")
    ex = off.filter(F.col("_n") > 0).select(
        "_oid",
        "_toks",
        "_n",
        "_start",
        F.explode(F.sequence(first_b, last_b)).alias("block_id"),
    )
    lo = F.greatest(F.col("_start"), F.col("block_id") * B)
    hi = F.least(F.col("_start") + F.col("_n"), (F.col("block_id") + 1) * B)
    slices = ex.select(
        "block_id",
        lo.alias("_gpos"),
        F.slice(
            "_toks",
            (lo - F.col("_start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("_slice"),
    )
    packed = (
        slices.groupBy("block_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_gpos"), F.col("_slice")))
            ).alias("_sorted"),
        )
        .select(
            "block_id",
            F.flatten(F.expr("transform(_sorted, s -> s._slice)")).alias(
                "tokens"
            ),
            F.size(F.expr("transform(_sorted, s -> s._slice)")).alias("n_docs"),
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
    return packed.select("block_id", "tokens", "n_tokens", "n_docs")


def block_checksums(packed: DataFrame) -> DataFrame:
    """Integer-exact per-block invariants for the value gate: token sum and
    a position-weighted checksum (flips under ANY within-block reorder)."""
    idx = F.sequence(F.lit(1), F.size("tokens"))
    return packed.select(
        "block_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("tok_sum"),
        F.aggregate(
            F.zip_with("tokens", idx, lambda t, p: t.cast("long") * p.cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("pos_checksum"),
    )


def chunk_with_overlap(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the
    context-window preparation step for long-document training and RAG
    indexing (each chunk re-reads ``chunk_size - stride`` tokens of its
    predecessor so no span is ever split across a boundary unseen).

    Chunk ``i`` covers token positions ``[i*stride, i*stride +
    chunk_size)`` clipped to the document; every start below ``n_tok``
    emits a chunk, so short non-empty documents yield exactly one and
    empty documents yield none. Pure JVM HOFs
    (sequence + posexplode + slice), no shuffle at all — the op is
    embarrassingly parallel over documents.

    Returns (id, chunk_idx, chunk_len, chunk_checksum) where the
    checksum is the position-weighted token sum — the same
    reorder-sensitive value gate used by tok_vocab_truncate /
    tok_dup_span_removal.
    """
    toks = F.col(tokens_col)
    n = F.size(toks)
    max_i = F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    # empty token arrays emit ZERO chunks (F.sequence(0, -1) would
    # otherwise produce the descending [0, -1] and two phantom chunks)
    df = df.filter(n >= 1)
    exploded = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.posexplode(F.sequence(F.lit(0), max_i)).alias("chunk_idx", "_i"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.slice(
            F.col("_t"), F.col("_i") * stride + 1, chunk_size
        ).alias("_c"),
    )
    pos_weighted = F.zip_with(
        F.col("_c").cast("array<long>"),
        F.sequence(F.lit(1), F.size("_c")).cast("array<long>"),
        lambda t, j: t * j,
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size("_c").alias("chunk_len"),
        F.aggregate(
            pos_weighted, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("chunk_checksum"),
    )
