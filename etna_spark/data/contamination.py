"""Token n-gram contamination + novelty over pre-tokenized corpora.

Two standard LLM-training-data ops the reference has no counterpart for
(its unit is the aligned time series; these extend the engine's
token-payload surface like data/dedup.py does):

- **benchmark decontamination**: flag training documents that share any
  token ``n``-gram with a held-out benchmark/eval set (the GPT-3 appendix-C
  / PaLM 13-gram style check). Candidates come from an equi-join on the
  exact n-gram key — never a cross join; the benchmark side of the join is
  the DISTINCT gram set of the (small) eval corpus, which Spark broadcasts.
- **n-gram novelty**: per document, how many of its token n-gram positions
  are globally novel, i.e. the gram's FIRST occurrence (minimum doc id
  over the whole corpus) is this document. A duplication-aware freshness
  signal: heavily duplicated documents score near zero.

Gram keys are the comma-joined token substrings themselves (exact, no hash
collisions, reproducible verbatim in the DuckDB oracles). At 10^12-sequence
scale the keys would be hashed to fixed-width ints; the join/aggregate
shapes below are unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_exprs(tokens_col: str, n: int):
    """Column of comma-joined ``n``-gram strings (one per start position,
    ``size - n + 1`` of them; shorter docs yield an empty array — guarded
    explicitly because ``sequence(0, -1)`` would DESCEND, not be empty)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN"
        f" transform(sequence(0, size({tokens_col}) - {n}),"
        f" j -> array_join(slice({tokens_col}, j + 1, {n}), ','))"
        f" ELSE array() END"
    )


def benchmark_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, n_shared_grams)`` for every training doc sharing at least
    one token ``n``-gram with the benchmark corpus.

    ``n_shared_grams`` counts DISTINCT contaminated grams per doc (a doc
    repeating one leaked gram five times counts 1). The benchmark gram set
    is deduplicated before the join and is broadcast-sized by assumption
    (eval sets are tiny next to training corpora); the training side
    explodes lazily and never materializes grams outside the join.
    """
    bench_grams = (
        benchmark.select(F.explode(_gram_exprs(tokens_col, n)).alias("_gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_gram_exprs(tokens_col, n)).alias("_gram"),
    ).distinct()
    return (
        train_grams.join(F.broadcast(bench_grams), on="_gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, n_grams, n_novel)`` — per document, the number of n-gram
    positions and how many of them hold a gram whose corpus-wide first
    occurrence (min ``id_col``) is this document.

    Shape: explode positions → global ``min(id)`` per gram (map-side
    partial agg; gram cardinality ≤ corpus token count) → shuffle join
    back on the gram key → per-doc count. Duplicated grams WITHIN their
    first document still count as novel (first occurrence is doc-level,
    matching the dedup use: a doc is "stale" only via other docs).
    """
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_gram_exprs(tokens_col, n)).alias("_gram"),
    )
    first_seen = pos.groupBy("_gram").agg(F.min("doc_id").alias("_first"))
    return (
        pos.join(first_seen, on="_gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                (F.col("_first") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
    )
