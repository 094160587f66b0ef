"""Distributed byte-pair-encoding merge learning over a document corpus.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") trains on the WORD-TYPE frequency table, not
the raw corpus: aggregate the corpus once into (word, count), then run
the merge loop on that vocabulary-sized table. That is exactly the
Spark-friendly shape — the only corpus-sized operation is one
explode + hash aggregation; every merge round touches a table bounded
by the vocabulary, and the single winning pair per round is a one-row
driver collect (bounded by n_merges, never by the data).

Semantics pinned here (and replayed exactly by the SQL oracle):
- words: maximal [a-z]+ runs of the lowercased text, length >= 2;
- pair counts: adjacent symbol pairs within each word type, weighted by
  the word count, overlapping occurrences all counted;
- winner per round: max count, ties broken by pair string ascending;
- merge application: single greedy left-to-right fold (after merging at
  position i the scan resumes at i+2), the reference algorithm's
  behavior on runs like "aaa".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt) frequency table. The one corpus-sized pass."""
    w = F.explode(
        F.split(F.lower(F.col(text_col)), "[^a-z]+")
    ).alias("w")
    return (
        docs.select(w)
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _adjacent_pairs(syms: F.Column) -> F.Column:
    """Space-joined adjacent symbol pairs of an array column. Symbols are
    alphabetic (merges concatenate without separators), so the space is
    an unambiguous pair delimiter."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge fold: replace each non-overlapping
    (left, right) adjacency with the concatenated symbol."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges. Returns one row per merge:
    (merge_rank, left_sym, right_sym, pair_count)."""
    wt = word_types(docs, text_col=text_col).withColumn(
        "syms", F.split("w", "")
    )
    learned: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            wt.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                      "cnt")
            .groupBy("p")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["p"].split(" ")
        learned.append((rank, left, right, int(top[0]["c"])))
        wt = wt.withColumn(
            "syms", _apply_merge(F.col("syms"), left, right)
        )
        # vocabulary-sized state: keep each round's symbols materialized
        # locally so the k-round loop doesn't stack k fold expressions
        wt = wt.localCheckpoint(eager=False)
    return spark.createDataFrame(
        learned,
        "merge_rank int, left_sym string, right_sym string, pair_count long",
    )
