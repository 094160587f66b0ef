"""Exact-rational BM25 document ranking.

BM25 (Robertson/Okapi) per-term component with k1 = 6/5, b = 3/4:

    s_t(d) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) * idf

Two deliberate, documented choices make the whole score a ratio of two
BIGINTs (then ONE float division — bit-identical in any IEEE engine):

- k1 and b are small rationals, and avgdl = L/N is kept symbolic, so
  clearing denominators by 10*L gives
      s_t(d) = (22*L*tf*N) / ((10*L*tf + 3*L + 9*dl*N) * df)
- idf uses the RAW-RATIO variant idf = N/df instead of the logarithmic
  Robertson idf. ln() is NOT bit-portable across engines (Spark's JVM
  libm and DuckDB's glibc disagree at 1 ulp on this platform — measured),
  so the log variant cannot be value-hash-gated; the raw-idf variant is
  a standard TF-IDF family member and preserves per-term ranking (the
  transform is monotone in df).

Multi-term scores add the per-term components in the FIXED literal query
order (missing terms contribute +0.0), keeping the float chain identical
across engines.

Scale shape: one corpus-sized tokenize+aggregate produces (doc, term)
tf and per-doc dl; document frequencies and the corpus totals are
vocabulary-/scalar-sized frames broadcast back. Ranking the final
per-doc scores is a distributed top-k (TakeOrdered), not a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_rational_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for ``query_terms`` under the exact-rational BM25
    above. Words are maximal [a-z]+ runs of the lowercased text with
    length >= 2 (the corpus-wide tokenization rule shared with
    data/bpe.py). Returns (doc_id, score, rank)."""
    # dedupe (order-preserving) and validate the term list: duplicate
    # terms would produce duplicate pivot columns and an
    # ambiguous-column error downstream (r5 ADVICE)
    query_terms = list(dict.fromkeys(query_terms))
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    words = (
        docs.select(
            F.col(id_col).alias("d"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("w"),
        )
        .filter(F.length("w") >= 2)
    )
    dl = words.groupBy("d").agg(F.count("*").alias("dl"))
    totals = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        words.agg(F.count("*").alias("corpus_len"))
    )
    tf = (
        words.filter(F.col("w").isin(*query_terms))
        .groupBy("d", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), on="w")
        .join(dl, on="d")
        .crossJoin(F.broadcast(totals))
        .select(
            "d", "w",
            # loud overflow guard (repo-standard assert_true-in-column
            # trick, r5 ADVICE): the exact-rational products are raw
            # int64 chains; verify their double-precision estimates stay
            # below 2^62 so the bigint arithmetic provably cannot hit
            # ANSI overflow. The guard rides inside the score column so
            # column pruning cannot elide it; the scored values are
            # UNCHANGED (the int chain still computes them).
            F.when(
                F.assert_true(
                    (
                        F.lit(22.0)
                        * F.col("corpus_len").cast("double")
                        * F.col("tf").cast("double")
                        * F.col("n_docs").cast("double")
                        < F.lit(float(2**62))
                    )
                    & (
                        (
                            F.lit(10.0)
                            * F.col("corpus_len").cast("double")
                            * F.col("tf").cast("double")
                            + F.lit(3.0) * F.col("corpus_len").cast("double")
                            + F.lit(9.0)
                            * F.col("dl").cast("double")
                            * F.col("n_docs").cast("double")
                        )
                        * F.col("df").cast("double")
                        < F.lit(float(2**62))
                    ),
                    F.lit(
                        "bm25_rational_topk: exact-rational product "
                        "exceeds 2^62 — corpus too large for the int64 "
                        "chain; shard the corpus or rescale"
                    ),
                ).isNull(),
                (
                    F.lit(22) * F.col("corpus_len") * F.col("tf")
                    * F.col("n_docs")
                ).cast("double")
                / (
                    (
                        F.lit(10) * F.col("corpus_len") * F.col("tf")
                        + F.lit(3) * F.col("corpus_len")
                        + F.lit(9) * F.col("dl") * F.col("n_docs")
                    )
                    * F.col("df")
                ).cast("double"),
            ).alias("s"),
        )
    )
    # fixed-order sum over the literal term list (absent term -> +0.0)
    per_doc = scored.groupBy("d").pivot("w", list(query_terms)).agg(
        F.first("s")
    )
    total = F.lit(0.0)
    for t in query_terms:
        total = total + F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
    ranked = (
        per_doc.select(F.col("d").alias(id_col), total.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return ranked.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select(id_col, F.round("score", 6).alias("score"), "rank")
