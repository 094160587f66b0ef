"""Deterministic synthesis of the primary input table.

Schema per BASELINE.json ``input_hint``:
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``
plus the engine-derived ``event_ts`` (the derivation recipe is part of the
spec — FIXTURES.md §A).

Everything is hash-derived (``xxhash64``), no RNG state, no wall clock — the
same recipe at any N yields the same rows, and generation is fully
distributed (``spark.range`` → expressions), so the identical job synthesizes
a 10^12-row table on a cluster. No external data is read.

Reference anchor: ETNA's seeded synthetic generators
(/root/reference/etna/datasets/datasets_generation.py:26-127) play the same
role for its test-suite; ours are hash-based instead of RNG-based so that
generation order and partitioning cannot change the content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

T0 = "2026-01-01 00:00:00"
VOCAB = 50257
WINDOW_SECONDS_DEFAULT = 3 * 86400  # 3 days → empty minutes exist (gap-fill)


def token_table(
    spark: SparkSession,
    n_rows: int,
    n_sources: int = 8,
    window_seconds: int = WINDOW_SECONDS_DEFAULT,
    with_tokens: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """The FIXTURES.md §A token-sequence table.

    - ``doc_id = f"doc_{i:012d}"``
    - ``source``: Zipf-like skew — ``src_k`` takes ~2^-(k+1) of rows (src_0
      ~50%), exercising the salting/AQE paths.
    - ``n_tok = 16 + xxhash64(doc_id, 1) mod 497``
    - ``tokens[j] = xxhash64(doc_id, 2 + j) mod 50257`` (int32)
    - ``event_ts = T0 + (xxhash64(doc_id, 3) mod window_seconds) seconds``

    ``with_tokens=False`` skips materializing the token arrays (cheap variant
    for throughput benches where only ``n_tok`` is aggregated).
    """
    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    df = rng.select(F.format_string("doc_%012d", F.col("id")).alias("doc_id"))
    h01 = F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000)) / 1_000_000.0
    src_idx = F.least(
        F.floor(-F.log2(1.0 - h01)).cast("int"), F.lit(n_sources - 1)
    )
    df = df.withColumn("source", F.format_string("src_%d", src_idx))
    df = df.withColumn(
        "n_tok", (16 + F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(497))).cast("int")
    )
    if with_tokens:
        df = df.withColumn(
            "tokens",
            F.expr(
                f"transform(sequence(0, n_tok - 1),"
                f" j -> cast(pmod(xxhash64(doc_id, j + 2), {VOCAB}) as int))"
            ),
        )
    df = df.withColumn(
        "event_ts",
        F.expr(
            f"timestamp'{T0}' + make_interval(0, 0, 0, 0, 0, 0,"
            f" pmod(xxhash64(doc_id, 3), {window_seconds}))"
        ),
    )
    cols = ["doc_id", "tokens", "n_tok", "source", "event_ts"] if with_tokens else [
        "doc_id", "n_tok", "source", "event_ts"
    ]
    return df.select(*cols)


# ---------------------------------------------------------------------------
# Oracle-matchable token table derived from the driver's `documents` table.
#
# The driver's correctness gate compares Spark vs DuckDB on the shared parquet
# views. xxhash64 is not available in DuckDB, so this variant derives tokens
# from the integer doc_id using pure 64-bit arithmetic — expressible
# identically in both engines (see __spark_entry__.oracle_sql). It exists so
# token-table rollups get the STRONG value-hash check, not rows-only.
# ---------------------------------------------------------------------------

# LCG-ish mixing constants (Knuth multiplicative hashing), all < 2^32 so
# products with small operands stay well inside int64.
_MIX_A = 2654435761
_MIX_B = 1000003
_MIX_C = 10007


def doc_token_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token table derived arithmetically from ``documents`` at ``sf_dir``.

    Columns: doc_id (int), source, n_tok, tokens (array<int>), event_ts.
    The SQL twin of this derivation lives in ``__spark_entry__.DOC_TOKEN_SQL``.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        "source",
        (16 + F.pmod(F.col("doc_id") * _MIX_A, F.lit(497))).cast("int").alias("n_tok"),
    ).withColumns(
        {
            "tokens": F.expr(
                f"transform(sequence(0, n_tok - 1),"
                f" j -> cast(pmod((doc_id + 1) * {_MIX_B} + j * {_MIX_C}, {VOCAB}) as int))"
            ),
            "event_ts": F.expr(
                f"timestamp'{T0}' + make_interval(0, 0, 0, 0, 0, 0,"
                f" pmod(doc_id * {_MIX_A}, {WINDOW_SECONDS_DEFAULT}))"
            ),
        }
    )


DOC_TOKEN_SQL = f"""
SELECT
  doc_id,
  source,
  CAST(16 + ((doc_id * {_MIX_A}) % 497) AS INTEGER) AS n_tok,
  list_transform(
    range(0, CAST(16 + ((doc_id * {_MIX_A}) % 497) AS BIGINT)),
    j -> CAST(((doc_id + 1) * {_MIX_B} + j * {_MIX_C}) % {VOCAB} AS INTEGER)
  ) AS tokens,
  TIMESTAMP '{T0}' + INTERVAL (doc_id * {_MIX_A} % {WINDOW_SECONDS_DEFAULT}) SECOND AS event_ts
FROM documents
"""


def corpus_table(
    spark: SparkSession,
    n_docs: int,
    n_words: int = 40,
    vocab: int = 50_000,
    dup_mod: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic text corpus for dedup benchmarks.

    ``doc_id``, ``text`` (``n_words`` hash-derived vocab words). Every
    ``dup_mod``-th document is a NEAR-COPY of its predecessor with exactly
    one word substituted at a hash-chosen position — a planted ~97%-Jaccard
    near-duplicate population (10% of the corpus) for the MinHash/LSH
    path. Pure JVM expressions (xxhash64 → word ids), no RNG state: the
    same recipe yields the same corpus at any scale or partitioning."""
    rng = spark.range(0, n_docs, numPartitions=num_partitions)
    is_dup = F.pmod(F.col("id"), F.lit(dup_mod)) == dup_mod - 1
    base = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    df = rng.select(
        F.col("id").alias("doc_id"), is_dup.alias("_d"), base.alias("_b")
    )
    word = lambda seed_col, j: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(seed_col, j), F.lit(vocab))
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda j: word(F.col("_b"), j),
    )
    pos = F.pmod(F.xxhash64("doc_id", F.lit(777)), F.lit(n_words))
    perturbed = F.transform(
        arr,
        lambda w, j: F.when(
            F.col("_d") & (j == pos),
            word(F.col("doc_id"), F.lit(999_999)),
        ).otherwise(w),
    )
    return df.select(
        "doc_id", F.array_join(perturbed, " ").alias("text")
    )


def embedding_table(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 32,
    dup_mod: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic embedding table for ANN/near-dup benchmarks.

    ``vec_id``, ``embedding`` (array<double>, hash-derived uniform in
    [-1, 1]). Every ``dup_mod``-th vector is its predecessor plus a tiny
    hash-derived perturbation (cosine ≈ 0.999) — the planted near-dup
    population the LSH tables must recall."""
    rng = spark.range(0, n_vecs, numPartitions=num_partitions)
    is_dup = F.pmod(F.col("id"), F.lit(dup_mod)) == dup_mod - 1
    base = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    df = rng.select(
        F.col("id").alias("vec_id"), is_dup.alias("_d"), base.alias("_b")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(F.col("_b"), j), F.lit(2001)) - 1000)
            / 1000.0
            + F.when(
                F.col("_d"),
                (F.pmod(F.xxhash64(F.col("vec_id"), j + 5000), F.lit(21))
                 - 10) / 10_000.0,
            ).otherwise(F.lit(0.0))
        ),
    )
    return df.select("vec_id", vec.alias("embedding"))
